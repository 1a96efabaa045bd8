"""Micro-bench of the minhash exact-verify stage (guide §1.4: noop-style
isolation via count on the filter; guide §4.1: prefer built-ins, but check
WHICH built-in plan is cheapest).

Hypothesis: jaccard_of_arrays duplicates the array_intersect subtree (it
appears in the filter condition, the numerator and the denominator after
ProjectCollapsing), so the verify stage pays for ~3 intersects per pair.

Variants (all over the IDENTICAL pair set + gram arrays):
  v0  current jaccard_of_arrays filter (baseline)
  v1  union>0 replaced by na+nb>0 (equivalent: union >= max(na,nb)),
      intersect referenced twice
  v2  single intersect reference: filter on  inter*(1+t) >= t*(na+nb)
      (exact integer-free rearrangement of inter/(na+nb-inter) >= t)
  v3  pandas UDF merge-intersect on sorted arrays (for the record)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else bench.SF_DIR
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pprl_scaling_framework_spark.ops import bucket_join, dedup

    spark = bench.build_spark(bench.CPUS)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench._ceiling_probe(spark, 300_000_000)
    print(f"probe {bench._ceiling_probe(spark, 3_000_000_000):.2f}s", flush=True)

    q, num_hashes, bands, threshold, seed = 3, 16, 4, 0.5, 7
    rows_per_band = num_hashes // bands
    spread = max(spark.sparkContext.defaultParallelism, 8)
    base = docs.repartition(spread).select(
        F.col("doc_id").alias("id"),
        dedup.gram_hashes(dedup.char_shingles("text", q)).alias("hg"),
    ).withColumn("sig", dedup.signature_from_hashes(F.col("hg"), num_hashes, seed))
    base = base.persist()
    base.count()

    banded = base.select(
        "id", F.size("hg").alias("ng"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
            )
        ).alias("band", "band_sig"),
    ).withColumn("bucket", F.sha2(F.concat_ws(",", F.col("band"), F.concat_ws("-", "band_sig")), 256))
    cands = bucket_join.salted_pair_candidates(
        banded.select("bucket", "id", "ng"), ["bucket"], payload_cols=("ng",),
        hot_threshold=2000, shards=16,
    ).filter(
        F.least("ng_a", "ng_b").cast("double")
        >= F.lit(threshold) * F.greatest("ng_a", "ng_b")
    ).drop("ng_a", "ng_b").repartition(spread).persist()
    print("cand pairs:", cands.count(), flush=True)

    hashes_only = base.select("id", "hg")
    with_hashes = (
        cands.join(hashes_only.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("hg", "g_a"), "id_a")
        .join(hashes_only.withColumnRenamed("id", "id_b")
              .withColumnRenamed("hg", "g_b"), "id_b")
    )

    t = threshold
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    na, nb = F.size("g_a").cast("double"), F.size("g_b").cast("double")

    variants = {
        "v0_current": with_hashes.withColumn(
            "jaccard", dedup.jaccard_of_arrays(F.col("g_a"), F.col("g_b"))
        ).filter(F.col("jaccard") >= t),
        "v1_twice": with_hashes.filter(
            (na + nb > 0) & (inter / (na + nb - inter) >= t)
        ),
        "v2_once": with_hashes.filter(inter * (1.0 + t) >= t * (na + nb)),
    }

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def inter_np(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np
        return pd.Series([
            np.intersect1d(np.asarray(x, dtype=np.int64),
                           np.asarray(y, dtype=np.int64),
                           assume_unique=True).size
            for x, y in zip(a, b)
        ])

    variants["v3_pandas"] = with_hashes.withColumn(
        "i", inter_np("g_a", "g_b")
    ).filter(F.col("i").cast("double") * (1.0 + t) >= t * (na + nb))

    for name, df in variants.items():
        best, n = None, None
        for _ in range(repeat):
            s = time.time()
            n = df.count()
            dt = time.time() - s
            best = dt if best is None else min(best, dt)
        print(f"{name:12s} best {best:6.2f}s  rows {n}", flush=True)
    print(f"probe end {bench._ceiling_probe(spark, 3_000_000_000):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
