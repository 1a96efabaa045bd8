"""Stateful streaming FPS: collision counts must accumulate ACROSS
micro-batches and emit each frequent pair exactly once at count==C."""

import time

import pytest
from pyspark.sql import functions as F

from pprl_scaling_framework_spark.streaming.stateful import incremental_frequent_pairs


def test_incremental_frequent_pairs_across_batches(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    schema = "id_a string, id_b string"

    # batch files processed one per trigger: pair (a,b) collides once per
    # batch -> must only emit after the second batch; (x,y) collides twice
    # in batch 1 -> emits immediately; (lone, pair) never reaches C=2.
    spark.createDataFrame(
        [("a", "b"), ("x", "y"), ("x", "y"), ("lone", "pair")], schema.split(", ")
    ).toDF("id_a", "id_b").coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame([("a", "b")], ["id_a", "id_b"]).coalesce(1).write.parquet(
        str(src / "b2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    out = incremental_frequent_pairs(stream, C=2)
    q = (
        out.writeStream.format("memory").queryName("freq_mem")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = {(r["id_a"], r["id_b"]): r["collisions"]
            for r in spark.sql("SELECT * FROM freq_mem").collect()}
    assert rows.get(("x", "y")) == 2
    assert rows.get(("a", "b")) == 2          # accumulated across batches
    assert ("lone", "pair") not in rows
    # emitted exactly once each
    assert spark.sql("SELECT count(*) c FROM freq_mem").collect()[0]["c"] == 2
