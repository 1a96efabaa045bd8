"""Golden generator for the em_agreement_histogram / em_stats driver queries —
an INDEPENDENT implementation (fresh pure-Python Jaro-Winkler + EM; no imports
from the engine's matching/em modules) of entry point C over the fixed fixture
input tests/golden/pprl_input.csv.

Only the INPUT is shared with the engine (same pattern as the JDK PPRL
goldens): fields are re-derived from the uid/content, the deterministic
sample filter uses a SEPARATELY-written XXH64 below (from the public spec,
github.com/Cyan4973/xxHash — no import from the engine's core/xxhash64, so
a transcription bug on either side surfaces as an oracle mismatch), and
every operator step — JW similarity, agreement packing, histogram, EM, FS
weights — is reimplemented here from the published algorithms.

Float discipline: EM follows the engine's numpy association orders exactly
(product over fields FIRST, then scale by p; sums ascending over pattern
index — numpy is sequential for multiply.reduce and for add.reduce under the
pairwise blocksize at 2^F=8 cells), so converged values match to the last
ulp and round(…, 6) is stable.

Usage: python tools/gen_em_golden.py   # writes tests/golden/em_*.csv
"""

from __future__ import annotations

import base64
import csv
import math
import os
import struct

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
INPUT = os.path.join(GOLDEN_DIR, "pprl_input.csv")
OUT_HIST = os.path.join(GOLDEN_DIR, "em_agreement_histogram.csv")
OUT_STATS = os.path.join(GOLDEN_DIR, "em_stats.csv")

FIELDS = ["path", "lang", "content24"]
SAMPLE_MOD = 2
M0, U0, P0 = 0.9, 0.1, 0.001
JW_THRESHOLD = 0.70
MAX_ITER, EPS = 1000, 1e-5


# --- XXH64, written fresh from the public spec (sample-filter parity with
# Spark's xxhash64(uid) at seed 42: one string column = UTF-8 byte stream) ---

_PRIMES = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
           0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5)
_U64 = 0xFFFFFFFFFFFFFFFF


def _rot(x: int, r: int) -> int:
    x &= _U64
    return ((x << r) & _U64) | (x >> (64 - r))


def _round64(acc: int, lane: int) -> int:
    return (_rot(acc + lane * _PRIMES[1], 31) * _PRIMES[0]) & _U64


def xxh64(data: bytes, seed: int = 42) -> int:
    p1, p2, p3, p4, p5 = _PRIMES
    n, pos = len(data), 0
    if n >= 32:
        acc = [(seed + p1 + p2) & _U64, (seed + p2) & _U64,
               seed & _U64, (seed - p1) & _U64]
        while pos + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, pos)
            acc = [_round64(a, l) for a, l in zip(acc, lanes)]
            pos += 32
        h = (_rot(acc[0], 1) + _rot(acc[1], 7)
             + _rot(acc[2], 12) + _rot(acc[3], 18)) & _U64
        for a in acc:
            h = ((h ^ _round64(0, a)) * p1 + p4) & _U64
    else:
        h = (seed + p5) & _U64
    h = (h + n) & _U64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        h = ((_rot(h ^ _round64(0, lane), 27)) * p1 + p4) & _U64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (_rot(h ^ (lane * p1) & _U64, 23) * p2 + p3) & _U64
        pos += 4
    while pos < n:
        h = (_rot(h ^ (data[pos] * p5) & _U64, 11) * p1) & _U64
        pos += 1
    h ^= h >> 33
    h = (h * p2) & _U64
    h ^= h >> 29
    h = (h * p3) & _U64
    return h ^ (h >> 32)


def sample_hash(uid: str) -> int:
    """Signed-int64 view of xxh64(uid), as Spark's xxhash64 column yields."""
    h = xxh64(uid.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


# --- Jaro-Winkler, written fresh from the published definition --------------

def jw(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    window = max(n1, n2) // 2 - 1
    used = [False] * n2
    pairs1 = []  # matched chars of s1 in order
    for i in range(n1):
        for j in range(max(0, i - window), min(n2, i + window + 1)):
            if not used[j] and s2[j] == s1[i]:
                used[j] = True
                pairs1.append(s1[i])
                break
    m = len(pairs1)
    if m == 0:
        return 0.0
    pairs2 = [s2[j] for j in range(n2) if used[j]]
    transpositions = sum(c1 != c2 for c1, c2 in zip(pairs1, pairs2)) // 2
    sim = (m / n1 + m / n2 + (m - transpositions) / m) / 3.0
    if sim > 0.7:
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 != c2:
                break
            prefix += 1
        sim += prefix * 0.1 * (1.0 - sim)
    return sim


# --- EM over the 2^F histogram, written fresh -------------------------------

def run_em(freq: list[int], nf: int):
    size = 1 << nf
    bit = [[(i >> j) & 1 for j in range(nf)] for i in range(size)]
    pair_count = float(sum(freq))
    m = [M0] * nf
    u = [U0] * nf
    p = P0
    for _ in range(MAX_ITER):
        g_m, g_u = [0.0] * size, [0.0] * size
        for i in range(size):
            pm = 1.0
            pu = 1.0
            for j in range(nf):
                pm *= m[j] if bit[i][j] else 1.0 - m[j]
                pu *= u[j] if bit[i][j] else 1.0 - u[j]
            a = p * pm            # product over fields first, then scale —
            b = (1.0 - p) * pu    # same association as the engine's numpy
            if a + b > 0:
                g_m[i] = a / (a + b)
                g_u[i] = b / (a + b)
        m_sum = 0.0
        u_sum = 0.0
        for i in range(size):  # ascending i, like add.reduce
            m_sum += g_m[i] * freq[i]
        for i in range(size):
            u_sum += g_u[i] * freq[i]
        if m_sum <= 0.0 or u_sum <= 0.0:
            break
        new_m, new_u = [], []
        for j in range(nf):
            num_m = 0.0
            num_u = 0.0
            for i in range(size):
                if bit[i][j]:
                    num_m += g_m[i] * freq[i]
                    num_u += g_u[i] * freq[i]
            new_m.append(min(max(num_m / m_sum, 0.0), 1.0))
            new_u.append(min(max(num_u / u_sum, 0.0), 1.0))
        new_p = min(max(m_sum / pair_count, 0.0), 1.0)
        done = (
            max(abs(a - b) for a, b in zip(new_m, m)) <= EPS
            and max(abs(a - b) for a, b in zip(new_u, u)) <= EPS
            and abs(new_p - p) <= EPS
        )
        m, u, p = new_m, new_u, new_p
        if done:
            break
    return m, u, p


def main() -> None:
    records = []
    with open(INPUT, newline="") as f:
        for row in csv.DictReader(f):
            uid = row["uid"]
            if sample_hash(uid) % SAMPLE_MOD != 0:
                continue
            content = base64.b64decode(row["content_b64"]).decode("utf-8")
            path = uid.split(":", 1)[1].rsplit("@", 1)[0]
            lang = path.rsplit(".", 1)[1]
            records.append((uid, path, lang, content[:24]))
    records.sort()
    print(f"sampled {len(records)} of the fixture records")

    nf = len(FIELDS)
    freq = [0] * (1 << nf)
    for x in range(len(records)):
        for y in range(x + 1, len(records)):
            idx = 0
            for j in range(nf):
                if jw(records[x][1 + j], records[y][1 + j]) >= JW_THRESHOLD:
                    idx += 1 << j
            freq[idx] += 1

    with open(OUT_HIST, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["vec_idx", "pair_count"])
        for i, n in enumerate(freq):
            if n > 0:
                w.writerow([i, n])
    print(f"histogram ({sum(freq)} pairs) -> {OUT_HIST}")

    m, u, p = run_em(freq, nf)

    # weight epsilon, mirrored in q_em_stats: boundary-converged estimates
    # (m=1) have infinite FS weight; clamp into (eps, 1-eps) for the log only
    def _w(x: float) -> float:
        return min(max(x, 1e-9), 1.0 - 1e-9)

    with open(OUT_STATS, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["field", "m", "u", "w_agree", "w_disagree", "p"])
        for j, name in enumerate(FIELDS):
            w.writerow([
                name,
                repr(round(m[j], 6)),
                repr(round(u[j], 6)),
                repr(round(math.log(_w(m[j]) / _w(u[j])), 6)),
                repr(round(math.log((1.0 - _w(m[j])) / (1.0 - _w(u[j]))), 6)),
                repr(round(p, 6)),
            ])
    print(f"EM stats -> {OUT_STATS}")


if __name__ == "__main__":
    main()
