"""Golden generator for the ann_lsh_topk driver query — an INDEPENDENT
implementation (pure Python + core/xxhash64, no Spark JVM) of the whole
operator: deterministic synthetic vectors -> hyperplane-LSH buckets ->
bucket-candidate exact cosine rescoring -> top-k.

Every float operation replicates Spark's fold order (F.aggregate is a left
fold), so results are bit-exact, not just close.

Usage: python tools/gen_ann_golden.py   # writes tests/golden/ann_lsh_topk.csv
"""

from __future__ import annotations

import csv
import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pprl_scaling_framework_spark.core.xxhash64 import spark_xxhash64  # noqa: E402
from pprl_scaling_framework_spark.entry_queries import (  # noqa: E402
    _ANN_DIM,
    _ANN_IVF_CELLS,
    _ANN_IVF_PROBE,
    _ANN_IVF_SEED,
    _ANN_K,
    _ANN_LSH_SEED,
    _ANN_N,
    _ANN_PLANES,
    _ANN_QUERIES,
    _ANN_SEED,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
OUT = os.path.join(GOLDEN_DIR, "ann_lsh_topk.csv")
OUT_NEAR_DUP = os.path.join(GOLDEN_DIR, "emb_near_dup_lsh.csv")
OUT_IVF = os.path.join(GOLDEN_DIR, "ann_ivf_topk.csv")
NEAR_DUP_THRESHOLD = 0.2  # matches q_emb_near_dup_lsh


def synth_vector(vec_id: int) -> list[float]:
    return [
        (spark_xxhash64(("long", vec_id), ("int", _ANN_SEED), ("int", i)) % 1000) / 500.0 - 1.0
        for i in range(_ANN_DIM)
    ]


def centroid_vector(cell: int) -> list[float]:
    # component formula of similarity_search.synthetic_centroids
    return [
        (spark_xxhash64(("long", cell), ("int", _ANN_IVF_SEED), ("int", i)) % 1000) / 500.0 - 1.0
        for i in range(_ANN_DIM)
    ]


def hyperplane_bucket(vec: list[float]) -> int:
    bucket = 0
    for p in range(_ANN_PLANES):
        proj = 0.0  # left fold, like F.aggregate
        for i in range(_ANN_DIM):
            coeff = 1.0 if spark_xxhash64(
                ("int", _ANN_LSH_SEED), ("int", p), ("int", i)) % 2 == 0 else -1.0
            proj += vec[i] * coeff
        if proj >= 0:
            bucket += 1 << p
    return bucket


def cosine(a: list[float], b: list[float]) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return dot / denom if denom > 0 else 0.0


def round6(x: float) -> float:
    # Spark F.round(double, 6): BigDecimal.valueOf -> HALF_UP
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def main() -> None:
    vecs = {i: synth_vector(i) for i in range(_ANN_N)}
    buckets = {i: hyperplane_bucket(v) for i, v in vecs.items()}
    rows = []
    for q in range(_ANN_QUERIES):
        cands = [
            (round6(cosine(vecs[q], vecs[c])), c)
            for c in range(_ANN_N)
            if c != q and buckets[c] == buckets[q]
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (sim, c) in enumerate(cands[:_ANN_K], start=1):
            rows.append((q, c, rank, sim))
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query_id", "neighbor_id", "rank", "cosine_sim"])
        for r in rows:
            w.writerow([r[0], r[1], r[2], repr(r[3])])
    print(f"golden written: {len(rows)} rows -> {OUT}")

    # bucketed near-dup pairs: all same-bucket (a < b) pairs above threshold
    nd = []
    for a in range(_ANN_N):
        for b in range(a + 1, _ANN_N):
            if buckets[a] != buckets[b]:
                continue
            sim = round6(cosine(vecs[a], vecs[b]))
            if sim >= NEAR_DUP_THRESHOLD:
                nd.append((a, b, sim))
    with open(OUT_NEAR_DUP, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id_a", "id_b", "cosine_sim"])
        for r in nd:
            w.writerow([r[0], r[1], repr(r[2])])
    print(f"golden written: {len(nd)} rows -> {OUT_NEAR_DUP}")

    # IVF-Flat: argmax-cell assignment (sim desc, cell asc on ties), n_probe
    # nearest cells per query, exact rescore within probed cells
    cents = {c: centroid_vector(c) for c in range(_ANN_IVF_CELLS)}

    def cell_scores(vec: list[float]) -> list[tuple[float, int]]:
        # (sim, -cell): same tuple Spark's array_max/array_sort compares
        return [(cosine(vec, cents[c]), -c) for c in range(_ANN_IVF_CELLS)]

    assign = {i: -max(cell_scores(v))[1] for i, v in vecs.items()}
    ivf_rows = []
    for qid in range(_ANN_QUERIES):
        probed = [-s[1] for s in sorted(cell_scores(vecs[qid]), reverse=True)[:_ANN_IVF_PROBE]]
        cands = [
            (round6(cosine(vecs[qid], vecs[c])), c)
            for c in range(_ANN_N)
            if c != qid and assign[c] in probed
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (sim, c) in enumerate(cands[:_ANN_K], start=1):
            ivf_rows.append((qid, c, rank, sim))
    with open(OUT_IVF, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query_id", "neighbor_id", "rank", "cosine_sim"])
        for r in ivf_rows:
            w.writerow([r[0], r[1], r[2], repr(r[3])])
    print(f"golden written: {len(ivf_rows)} rows -> {OUT_IVF}")


if __name__ == "__main__":
    main()
