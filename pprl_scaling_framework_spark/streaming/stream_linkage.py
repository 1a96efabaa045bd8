"""Structured-Streaming incremental encode/block.

The reference is batch-only MR; this is new-in-rebuild surface: a stream of
repo-file records is encoded and blocked incrementally — the same vectorized
UDFs run unchanged on a streaming DataFrame, so a 100 TB backfill and a
trickle of new commits share one code path. Candidate generation against an
existing (static) index is a stream-static join, which Spark supports
without watermarks; stream-stream self-joins of blocking keys would need an
event-time watermark on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..blocking import hlsh
from ..encoding.encode import encode_udf
from ..encoding.schemes import EncodingConfig


def encode_stream(
    stream_df: DataFrame, config: EncodingConfig, uid_col: str = "uid"
) -> DataFrame:
    """Streaming encode: identical UDF as batch (works on readStream DFs)."""
    udf = encode_udf(config)
    return stream_df.select(
        F.col(uid_col).alias("uid"),
        udf(*[F.col(f) for f in config.fields]).alias("bf"),
    )


def blocking_keys_stream(
    encoded_stream: DataFrame, positions, n_bits: int
) -> DataFrame:
    """Streaming HLSH keys: posexplode of the key-array UDF."""
    udf = hlsh.hlsh_keys_udf(positions, n_bits)
    return encoded_stream.select(
        "uid", F.posexplode(udf(F.col("bf"))).alias("group_id", "key")
    )


def stream_candidates_against_index(
    key_stream: DataFrame, static_keys: DataFrame, C: int
) -> DataFrame:
    """Stream-static join: new records probe the existing blocking index.

    Emits (id_new, id_indexed, collisions >= C) per micro-batch. The static
    side is the snapshot of a prior batch run (e.g. the ``block`` stage
    parquet) — the streaming analog of the reference's V1 'buckets in
    distributed cache' design (``mr-blocking/FPSMapperV1.java:158-209``).
    """
    s = key_stream.select(
        F.col("uid").alias("id_new"), "group_id", "key"
    )
    idx = static_keys.select(
        F.col("uid").alias("id_indexed"), "group_id", "key"
    )
    return (
        s.join(idx, ["group_id", "key"])
        .filter(F.col("id_new") != F.col("id_indexed"))
        .groupBy("id_new", "id_indexed")
        .agg(F.count("*").alias("collisions"))
        .filter(F.col("collisions") >= C)
    )


def windowed_event_counts(
    events_stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregation (late-data-safe throughput metrics).

    Used for per-window pipeline metrics over an event stream; also serves
    as the streaming-agg coverage for the engine surface.
    """
    # watermarks need TIMESTAMP (with timezone); parquet NTZ columns are cast
    events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )
