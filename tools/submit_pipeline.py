"""spark-submit entry point for the PPRL pipeline (north_rule run mode).

Usage (cluster):
    spark-submit --py-files pprl_scaling_framework_spark.zip \\
        tools/submit_pipeline.py \\
        --input /path/to/repos_parquet --output /path/to/run_dir \\
        [--mode dedup|linkage] [--input-b ...] [--resume]

The input is a parquet/Iceberg table with columns
(repo, path, commit, lang, content); add ``--synthetic N`` to run on the
deterministic synthetic table instead. Every stage snapshots into
``--output`` with a manifest (rows, seconds, per-partition lineage); a rerun
with the same output dir resumes from the last completed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir of (repo,path,commit,lang,content)")
    ap.add_argument("--input-b", help="second party input (linkage mode)")
    ap.add_argument("--output", required=True, help="run directory for stage snapshots")
    ap.add_argument("--mode", choices=["dedup", "linkage"], default="dedup")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic entities instead of --input")
    ap.add_argument("--n-bits", type=int, default=4096)
    ap.add_argument("--hash-k", type=int, default=8)
    ap.add_argument("--q", type=int, default=2)
    ap.add_argument("--hlsh-k", type=int, default=30)
    ap.add_argument("--seed", type=int, default=420)
    ap.add_argument("--delta", type=float, default=0.01)
    ap.add_argument("--theta", type=int, default=None)
    ap.add_argument("--method", default="dice", choices=["dice", "jaccard", "hamming"])
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--max-bucket", type=int, default=4096)
    ap.add_argument("--fields", default="content", help="comma-separated encoded fields")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pprl_scaling_framework_spark.encoding import schemes
    from pprl_scaling_framework_spark.pipeline.linkage import (
        LinkageConfig, run_dedup_pipeline, run_linkage_pipeline,
    )
    from pprl_scaling_framework_spark.pipeline.stages import StageRunner
    from pprl_scaling_framework_spark.sources import repos as repos_src

    # under spark-submit the session/master/conf come from the submit args;
    # plain `python` invocation falls back to local[*]
    builder = SparkSession.builder.appName("pprl-pipeline")
    import pyspark
    if not pyspark.SparkConf().contains("spark.master") and "MASTER" not in os.environ:
        builder = builder.master(os.environ.get("PPRL_MASTER", "local[*]"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if args.synthetic:
        records = repos_src.with_uid_and_sha(
            repos_src.synth_repos(spark, n_entities=args.synthetic, seed=42)
        )
    else:
        if not args.input:
            ap.error("--input or --synthetic required")
        records = repos_src.with_uid_and_sha(spark.read.parquet(args.input))

    cfg = LinkageConfig(
        encoding=schemes.clk(args.fields.split(","), N=args.n_bits,
                             K=args.hash_k, Q=args.q),
        hlsh_K=args.hlsh_k, hlsh_seed=args.seed, delta=args.delta,
        theta=args.theta, method=args.method, threshold=args.threshold,
        max_bucket=args.max_bucket,
    )
    runner = StageRunner(spark, args.output)

    if args.mode == "dedup":
        res = run_dedup_pipeline(spark, records, cfg, runner=runner)
    else:
        if not args.input_b:
            ap.error("--input-b required for linkage mode")
        records_b = repos_src.with_uid_and_sha(spark.read.parquet(args.input_b))
        res = run_linkage_pipeline(spark, records, records_b, cfg, runner=runner)

    print(json.dumps({
        "plan": {"C": res.plan.C, "L": res.plan.L, "theta": res.plan.theta},
        "stages": runner.metrics(),
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
