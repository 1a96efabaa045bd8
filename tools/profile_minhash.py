"""Phase breakdown of dedup_minhash_lsh at sf0.1 (round-6 verdict item 8).

Where do the warm ~7.4 s go — signature compute, band join, or verify?
Measured by progressive cuts of the SAME operator plan (the persisted base
is shared, exactly as inside the operator):

- cut1  base.count()            -> shingle + 16 minhash signature (persist)
- cut2  candidate pairs .count() -> banded explode + salted bucket join +
                                    dedup + invariant prune  (base cached)
- cut3  full operator .count()  -> cut2's plan recomputed + gram re-attach
                                    joins + array_intersect verify

phase estimates: sig = cut1, band_join = cut2, verify = cut3 - cut2
(cut3 recomputes the band join, so verify is cut3 minus that recompute;
the residual bias is the band join's cache-vs-recompute delta, small).

Each cut runs REPEAT times (default 3) on a warm JVM; min is reported.
A pure-codegen noise probe brackets the session health like bench.py.

Usage: python tools/profile_minhash.py [sf_dir] [repeat]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pprl_scaling_framework_spark.ops import bucket_join, dedup
    from pprl_scaling_framework_spark.ops.dedup import (
        char_shingles,
        gram_hashes,
        minhash_lsh_pairs,
        signature_from_hashes,
    )

    spark = bench.build_spark(bench.CPUS)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench._ceiling_probe(spark, 300_000_000)  # JIT warm-up, unmeasured
    probe = bench._ceiling_probe(spark, 3_000_000_000)

    # mirror the q_dedup_minhash_lsh registry parameters
    kw = dict(q=3, num_hashes=16, bands=4, threshold=0.5, seed=7)

    def timed(label, fn):
        best = None
        for _ in range(repeat):
            bucket_join.release_persists()
            s = time.time()
            n = fn()
            el = time.time() - s
            best = el if best is None else min(best, el)
        return {"label": label, "best_sec": round(best, 2), "rows": n}

    spread = max(spark.sparkContext.defaultParallelism, 8)

    def base_df():
        return docs.repartition(spread).select(
            F.col("doc_id").alias("id"),
            gram_hashes(char_shingles("text", kw["q"])).alias("hg"),
        ).withColumn(
            "sig", signature_from_hashes(F.col("hg"), kw["num_hashes"], kw["seed"])
        )

    def cut1():
        b = bucket_join.track_persist(base_df())
        return b.count()

    def cut2():
        # the operator's own plan up to the pruned candidate set: reuse its
        # internals by running the full op but counting the pre-verify set —
        # cheapest faithful proxy: pairs that share a band bucket, deduped,
        # count-ratio pruned (no gram re-attach, no intersect)
        b = bucket_join.track_persist(base_df())
        b.count()
        rows_per_band = kw["num_hashes"] // kw["bands"]
        banded = b.select(
            "id", F.size("hg").alias("ng"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(kw["bands"] - 1)),
                    lambda x: F.slice(F.col("sig"), x * rows_per_band + 1, rows_per_band),
                )
            ).alias("band", "band_sig"),
        ).withColumn(
            "bucket",
            F.sha2(F.concat_ws(",", F.col("band"), F.concat_ws("-", "band_sig")), 256),
        )
        cands = bucket_join.salted_pair_candidates(
            banded.select("bucket", "id", "ng"), ["bucket"], payload_cols=("ng",),
            hot_threshold=2000, shards=16,
        ).filter(
            F.least("ng_a", "ng_b").cast("double")
            >= F.lit(kw["threshold"]) * F.greatest("ng_a", "ng_b")
        )
        return cands.count()

    def cut3():
        return minhash_lsh_pairs(docs, "doc_id", "text", **kw).count()

    out = {
        "sf_dir": sf_dir, "cpus": bench.CPUS, "repeat": repeat,
        "noise_probe_sec": round(probe, 2),
        "cuts": [timed("sig_base", cut1), timed("band_join_prune", cut2),
                 timed("full_op", cut3)],
    }
    c = {x["label"]: x["best_sec"] for x in out["cuts"]}
    # each cut re-materializes the earlier phases (release_persists between
    # reps), so the increments are the phase costs
    out["phases"] = {
        "signature": c["sig_base"],
        "band_join_incremental": round(c["band_join_prune"] - c["sig_base"], 2),
        "verify_incremental": round(c["full_op"] - c["band_join_prune"], 2),
        "full_op": c["full_op"],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
