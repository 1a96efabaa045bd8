"""Keyed double-hashing kernels with bit-exact Java parity.

Parity target ``lib/encoding/BloomFilter.java``:

- Secret HMAC key ``"ZIKRETQI"`` (:22).
- V3 (the ACTIVE scheme, selected in ``addData`` :202-228):
  ``hashes[i] = Math.abs((sha1 + (i+1)*md5) % N)`` where ``sha1``/``md5`` are
  ``new BigInteger(hmacDigest).intValue()`` — i.e. the LAST FOUR BYTES of the
  HMAC digest interpreted as a big-endian SIGNED int32 — and the arithmetic is
  overflowing Java 32-bit int with Java ``%`` (sign of dividend) (:184-194).
- V1 (dead code, :121-135): full-BigInteger ``(SHA1 + (i+1)*MD5) mod N``.
- V2 (dead code, :150-170): salted repeated HMAC-MD5, four big-endian int32
  words per 16-byte digest, ``Math.abs(h % N)``.

The per-unique-q-gram memoization of the reference (:231-242) is mirrored by
``hash_unique_grams`` operating on a deduplicated gram table per Arrow batch.
"""

from __future__ import annotations

import hashlib
import hmac
from typing import Iterable, Sequence

import numpy as np

SECRET_KEY = b"ZIKRETQI"

_INT32_MIN = -(1 << 31)
_UINT32 = 1 << 32


def _low32_signed(digest: bytes) -> int:
    """BigInteger(digest).intValue(): low-order 32 bits, signed."""
    return int.from_bytes(digest[-4:], "big", signed=True)


def _java_int32(x: np.ndarray) -> np.ndarray:
    """Wrap int64 values to Java int32 overflow semantics."""
    return ((x - _INT32_MIN) % _UINT32 + _INT32_MIN).astype(np.int64)


def hashes_v3(data: bytes, n_bits: int, k: int) -> np.ndarray:
    """K bit positions in [0, n_bits) — the active Kirsch-Mitzenmacher scheme."""
    sha1 = _low32_signed(hmac.new(SECRET_KEY, data, hashlib.sha1).digest())
    md5 = _low32_signed(hmac.new(SECRET_KEY, data, hashlib.md5).digest())
    i = np.arange(1, k + 1, dtype=np.int64)
    x = _java_int32(_java_int32(sha1 + _java_int32(i * md5)))
    # Java %: truncated division, result carries the dividend's sign.
    r = np.fmod(x, n_bits)
    out = np.abs(r)
    # Math.abs(Integer.MIN_VALUE) stays negative in Java, but |r| < N <= 2^31
    # so that branch is unreachable; nothing to reproduce.
    return out.astype(np.int32)


def hashes_v1(data: bytes, n_bits: int, k: int) -> np.ndarray:
    """Dead-code V1 kept for operator-inventory parity (X4)."""
    sha1 = int.from_bytes(hmac.new(SECRET_KEY, data, hashlib.sha1).digest(), "big", signed=True)
    md5 = int.from_bytes(hmac.new(SECRET_KEY, data, hashlib.md5).digest(), "big", signed=True)
    out = np.empty(k, dtype=np.int32)
    for i in range(k):
        res = (md5 * (i + 1) + sha1) % n_bits  # BigInteger.mod: non-negative
        v = res - _UINT32 if res & (1 << 31) else res  # .intValue() truncation
        out[i] = abs(v)
    return out


def hashes_v2(data: bytes, n_bits: int, k: int) -> np.ndarray:
    """Dead-code V2 kept for operator-inventory parity (X5)."""
    out = np.empty(k, dtype=np.int32)
    filled = 0
    salt = 0
    while filled < k:
        mac = hmac.new(SECRET_KEY, digestmod=hashlib.md5)
        mac.update(bytes([salt & 0xFF]))
        salt += 1
        mac.update(data)
        digest = mac.digest()
        for i in range(len(digest) // 4):
            if filled >= k:
                break
            h = int.from_bytes(digest[i * 4 : i * 4 + 4], "big", signed=True)
            r = h - int(h / n_bits) * n_bits  # Java truncated %
            out[filled] = abs(r)
            filled += 1
    return out


def hash_unique_grams(grams: Sequence[str], n_bits: int, k: int) -> np.ndarray:
    """(G, K) int32 position matrix for a deduplicated gram table.

    HMAC cost is paid once per unique gram per batch — the vectorized
    equivalent of the reference's dictionary cache.
    """
    out = np.empty((len(grams), k), dtype=np.int32)
    for gi, g in enumerate(grams):
        out[gi] = hashes_v3(g.encode("utf-8"), n_bits, k)
    return out


HASH_VERSIONS = {"v1": hashes_v1, "v2": hashes_v2, "v3": hashes_v3}


class GramHashCache:
    """Cross-batch memo of gram -> (K,) positions, bounded in size.

    ``version`` selects the hash scheme: "v3" is the reference's ACTIVE
    scheme; "v1" matches its older checked-in encoded fixtures
    (clk_voters_{a,b} were generated before the V3 switch).
    """

    def __init__(self, n_bits: int, k: int, max_entries: int = 1 << 20,
                 version: str = "v3") -> None:
        self.n_bits = n_bits
        self.k = k
        self.max_entries = max_entries
        self._fn = HASH_VERSIONS[version]
        self._cache: dict[bytes, np.ndarray] = {}

    def positions_bytes(self, gram: bytes) -> np.ndarray:
        pos = self._cache.get(gram)
        if pos is None:
            pos = self._fn(gram, self.n_bits, self.k)
            if len(self._cache) < self.max_entries:
                self._cache[gram] = pos
        return pos

    def positions(self, gram: str) -> np.ndarray:
        return self.positions_bytes(gram.encode("utf-8"))
