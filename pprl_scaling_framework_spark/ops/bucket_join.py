"""Skew-safe bucketed self-join for candidate-pair generation.

Shared by the LSH dedup/similarity operators (minhash bands, simhash bands,
hyperplane buckets, explicit blocks). Same tiering as the PPRL FPS blocking
path (``blocking/fps._salted_sides``): one degenerate bucket — empty
documents, boilerplate headers, zero vectors — otherwise lands in a single
shuffle task and goes quadratic there.

Salting is pair-set-invariant: the A side of a hot bucket is sharded
deterministically by ``xxhash64(id) % shards``; the B side is replicated
across all shards, so every (a, b) combination still meets exactly once per
bucket. The canonical ``id_a < id_b`` filter and the cross-band ``distinct``
are unchanged, hence the verified output is bit-identical with salting on or
off (asserted by ``tests/test_ops.py``).

Optional ``max_bucket`` drops buckets above a hard cap (changes the output —
off by default; for 100 TB runs where a boilerplate bucket's pairs are
worthless and quadratic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_pair_candidates(
    keyed: DataFrame,
    bucket_cols: list[str],
    id_col: str = "id",
    payload_cols: tuple[str, ...] = (),
    hot_threshold: int = 2000,
    shards: int = 16,
    max_bucket: int | None = None,
    dedup: bool = True,
) -> DataFrame:
    """-> distinct (id_a, id_b[, <payload>_a, <payload>_b]) with id_a < id_b.

    ``keyed``: one row per (bucket, member) with columns ``bucket_cols`` +
    ``id_col`` + ``payload_cols``. Keep payloads to cheap scalars (e.g. a
    simhash long); heavy arrays should be re-attached AFTER the distinct.

    ``dedup=False`` skips the final distinct — correct (and one shuffle
    cheaper) when each id appears in exactly ONE bucket (explicit blocks,
    single-signature LSH), where every pair already meets exactly once.
    """
    sizes = keyed.groupBy(*bucket_cols).agg(F.count("*").alias("_bs"))
    # proportional shard count: replication (shuffle volume) scales with the
    # actual bucket size instead of a flat `shards` factor
    n_shards = F.least(
        F.lit(shards), F.ceil(F.col("_bs") / F.lit(hot_threshold)).cast("int")
    )
    flagged = sizes.filter(F.col("_bs") > hot_threshold).select(
        *bucket_cols, n_shards.alias("_ns"),
        (F.col("_bs") > max_bucket if max_bucket is not None else F.lit(False)).alias("_mega"),
    )
    # no forced broadcast: flagged grows with the corpus; AQE broadcasts it
    # while it fits
    marked = keyed.join(flagged, bucket_cols, "left").filter(
        F.col("_mega").isNull() | ~F.col("_mega")
    )
    a = marked.withColumn(
        "salt",
        F.when(F.col("_ns").isNotNull(), F.pmod(F.xxhash64(id_col), F.col("_ns").cast("long")))
        .otherwise(F.lit(0).cast("long")),
    ).drop("_mega", "_ns")
    b = (
        marked.withColumn(
            "_salts",
            F.when(
                F.col("_ns").isNotNull(),
                F.sequence(F.lit(0).cast("long"), (F.col("_ns") - 1).cast("long")),
            ).otherwise(F.array(F.lit(0).cast("long"))),
        )
        .withColumn("salt", F.explode("_salts"))
        .drop("_salts", "_mega", "_ns")
    )
    sel_a = [F.col(f"a.{id_col}").alias("id_a")] + [
        F.col(f"a.{c}").alias(f"{c}_a") for c in payload_cols
    ]
    sel_b = [F.col(f"b.{id_col}").alias("id_b")] + [
        F.col(f"b.{c}").alias(f"{c}_b") for c in payload_cols
    ]
    out = (
        a.alias("a")
        .join(b.alias("b"), [*bucket_cols, "salt"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(*sel_a, *sel_b)
    )
    return out.distinct() if dedup else out
