"""Export the fixed PPRL fixture input (entry_queries._pprl_records) to CSV
for the independent plain-Java golden generator (tests/gen_pprl_golden.java).

The fixture is sf-independent (synth_repos n_entities=300, seed=42), so the
goldens generated from this export are valid for every driver run.

Usage:  python tools/export_pprl_input.py   # writes tests/golden/pprl_input.csv
"""

from __future__ import annotations

import base64
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .getOrCreate()
    )
    from pprl_scaling_framework_spark.entry_queries import _pprl_records, _pprl_config

    recs = _pprl_records(spark)
    rows = (
        recs.select(
            "uid",
            # party split exactly as q_pprl_two_party does it
            F.when(F.col("path").rlike(r"_0\.\w+$"), F.lit("a")).otherwise(F.lit("b")).alias("party"),
            "content",
        )
        .orderBy("uid")
        .collect()
    )
    cfg = _pprl_config()
    plan = cfg.plan()

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "pprl_input.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["uid", "party", "content_b64"])
        for r in rows:
            w.writerow([r["uid"], r["party"], base64.b64encode(r["content"].encode()).decode()])
    with open(os.path.join(out_dir, "pprl_plan.properties"), "w") as f:
        f.write(f"C={plan.C}\nL={plan.L}\nN={cfg.encoding.N}\nK={cfg.encoding.K}\n"
                f"Q={cfg.encoding.Q}\nhlsh_K={cfg.hlsh_K}\nhlsh_seed={cfg.hlsh_seed}\n"
                f"threshold={cfg.threshold}\n")
    print(f"exported {len(rows)} records; plan C={plan.C} L={plan.L}")
    spark.stop()


if __name__ == "__main__":
    main()
