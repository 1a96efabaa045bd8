"""Stage checkpointing, lineage metrics, and resume.

Spark-first replacement for the reference's per-MR-job HDFS materialization
with ``FAILED_*`` rename recovery and counter threading
(``mr-blocking/HammingLSHFPSToolV0.java:158-177,219-236``): every stage
writes a parquet snapshot + a manifest entry with row counts, wall time and a
per-partition row histogram (lineage). A re-run with the same run directory
skips completed stages and reads their snapshots — any stage is resumable
mid-run.

(The same code drives an Iceberg catalog by swapping ``parquet`` for
``writeTo(table)`` — this sandbox has no Iceberg jars, so the snapshot
directory layout stands in for table snapshots; the manifest is the stage
ledger either way.)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageMetrics:
    name: str
    rows: int
    seconds: float
    partitions: int
    partition_rows: dict[str, int]
    extra: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "rows": self.rows,
            "seconds": self.seconds,
            "partitions": self.partitions,
            "partition_rows": self.partition_rows,
            "extra": self.extra,
        }


class StageRunner:
    """Run named stages with parquet snapshots + manifest-driven resume."""

    def __init__(self, spark: SparkSession, run_dir: str, collect_lineage: bool = True) -> None:
        self.spark = spark
        self.run_dir = run_dir
        self.collect_lineage = collect_lineage
        os.makedirs(run_dir, exist_ok=True)
        self.manifest_path = os.path.join(run_dir, "manifest.json")
        self.manifest: dict = {"stages": {}}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    def _save_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def _snapshot_path(self, name: str) -> str:
        return os.path.join(self.run_dir, name)

    def completed(self, name: str) -> bool:
        entry = self.manifest["stages"].get(name)
        return bool(entry and entry.get("status") == "ok"
                    and os.path.exists(self._snapshot_path(name)))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._snapshot_path(name))

    def run(
        self,
        name: str,
        build: Callable[[], DataFrame],
        repartition: int | None = None,
        extra_metrics: dict | None = None,
    ) -> DataFrame:
        """Build + snapshot the stage unless already completed (resume)."""
        if self.completed(name):
            return self.read(name)
        path = self._snapshot_path(name)
        t0 = time.time()
        df = build()
        if repartition:
            df = df.repartition(repartition)
        try:
            df.write.mode("overwrite").parquet(path)
        except Exception:
            # reference behavior: failed stage output renamed FAILED_* & abort
            failed = os.path.join(self.run_dir, f"FAILED_{name}")
            if os.path.exists(path):
                os.replace(path, failed)
            self.manifest["stages"][name] = {"status": "failed", "ts": time.time()}
            self._save_manifest()
            raise
        out = self.spark.read.parquet(path)
        seconds = time.time() - t0

        if self.collect_lineage:
            pr = {
                str(r["pid"]): r["n"]
                for r in out.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count("*").alias("n")).collect()
            }
            rows = sum(pr.values())
            partitions = len(pr)
        else:
            pr, rows, partitions = {}, out.count(), out.rdd.getNumPartitions()

        metrics = StageMetrics(
            name=name, rows=rows, seconds=round(seconds, 3),
            partitions=partitions, partition_rows=pr, extra=extra_metrics or {},
        )
        self.manifest["stages"][name] = {
            "status": "ok",
            "ts": time.time(),
            "metrics": metrics.to_dict(),
        }
        self._save_manifest()
        return out

    def metrics(self) -> list[dict]:
        return [
            e["metrics"] for e in self.manifest["stages"].values()
            if e.get("status") == "ok" and "metrics" in e
        ]
