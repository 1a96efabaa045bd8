"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline — broadcast the (small) query
  set against the corpus, native ``zip_with``/``aggregate`` dot products (no
  UDF), window top-k.
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; queries
  probe their bucket (+ optional multi-probe) and rescore exactly — the scale
  path: the corpus-side join key is a short int, so the candidate set per
  query is a bucket, not the corpus.

At 100 TB scale the corpus side stays partitioned by bucket; only the query
side (assumed small) is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """-> (query_id, neighbor_id, rank, cosine_sim): exact top-k per query."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    # a small/one-file corpus arrives as a single scan partition and the
    # broadcast cross join adds no exchange, so every query x corpus cosine
    # would run serially in one task; spread the corpus first (the shuffle
    # moved is just the corpus rows, the scoring then parallelizes). Only
    # widen: never repartition DOWN a corpus that is already spread.
    spread = max(corpus.sparkSession.sparkContext.defaultParallelism, 8)
    if c.rdd.getNumPartitions() < spread:
        c = c.repartition(spread)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
    if round_digits is not None:
        out = out.withColumn("cosine_sim", F.round("cosine_sim", round_digits))
    return out


def hyperplane_signature(vec: Column, dim: int, n_planes: int, seed: int = 11) -> Column:
    """int bucket id: sign pattern against pseudo-random +/-1 hyperplanes.

    Plane p coefficient for dimension i = +1 if xxhash64(seed, p, i) is even
    else -1 — deterministic, no stored model, computable natively.
    """
    bits = []
    for p in range(n_planes):
        coeffs = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        )
        proj = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, cf: x.cast("double") * cf),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


#: query sets at or below this row count are broadcast into the bucket join;
#: larger sets (corpus-sized query batches, self-ANN) go through the salted
#: shuffle bucket join — a corpus-scale query side must never be a
#: driver-built broadcast
QUERY_BROADCAST_MAX_ROWS = 100_000


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
    query_broadcast_max: int = QUERY_BROADCAST_MAX_ROWS,
    hot_threshold: int = 2000,
    shards: int = 16,
    query_count: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    Two physical paths, identical output:

    - measured-small query set (``<= query_broadcast_max`` rows): queries are
      broadcast into the bucket join — one corpus pass, no shuffle;
    - large query set: both sides are keyed by bucket and joined through the
      SALTED shuffle machinery (``ops.bucket_join.salted_sides`` — corpus
      side sharded on hot buckets, query side replicated across shards, every
      co-bucket pair meets exactly once), ids-only through the join with
      vectors re-attached for the exact rescore. This is the 100 TB path: the
      query batch partitions like any other table and is never collected.

    ``query_count``: the query-set row count if the caller knows it (keeps
    the operator fully lazy). ``query_broadcast_max <= 0`` forces the shuffle
    path with NO count at all. When the size is genuinely unknown, the
    signature-augmented query side is persisted (tracked — release with
    :func:`ops.bucket_join.release_persists`) and counted ONCE; both physical
    paths then reuse the cached signatures, so the query lineage executes
    exactly one time per call.
    """
    sig = lambda col: hyperplane_signature(col, dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("bucket", sig(F.col("c_vec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("bucket", sig(F.col("q_vec")))

    if query_count is None and query_broadcast_max > 0:
        from .bucket_join import track_persist

        q = track_persist(q)
        query_count = q.count()

    if query_count is not None and query_count <= query_broadcast_max:
        scored = (
            c.join(F.broadcast(q), "bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cosine_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        )
    else:
        from .bucket_join import salted_sides

        ca = c.select("bucket", F.col("neighbor_id").alias("id"))
        qa = q.select("bucket", F.col("query_id").alias("id"))
        side_c, side_q = salted_sides(
            ca, qa, ["bucket"], "id", hot_threshold, shards
        )
        pair_ids = (
            side_c.alias("c").join(side_q.alias("q"), ["bucket", "salt"])
            .select(
                F.col("c.id").alias("neighbor_id"),
                F.col("q.id").alias("query_id"),
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
        )
        # re-attach vectors from the RAW corpus, not the signature-augmented
        # plan `c`: joining `c` re-executes the bucket-assignment lineage
        # (the signature column is pruned, but the scan+compute subtree is
        # not shared) when its only purpose on this branch was bucketing
        scored = (
            pair_ids
            .join(corpus.select(F.col(id_col).alias("neighbor_id"),
                                F.col(vec_col).alias("c_vec")), "neighbor_id")
            .join(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("q_vec")), "query_id")
            .withColumn("cosine_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_planes: int = 8,
    seed: int = 11,
    hot_threshold: int = 2000,
    shards: int = 16,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via shared LSH bucket + exact rescore.

    The bucket self-join is salted against hot buckets (e.g. near-zero
    vectors all landing in one sign pattern) and carries ids only; vectors
    re-attach for the exact rescore after the pair set is canonical.
    """
    from .bucket_join import salted_pair_candidates

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "bucket", hyperplane_signature(F.col("vec"), dim, n_planes, seed)
    )
    cands = salted_pair_candidates(
        base.select("bucket", "id"), ["bucket"],
        hot_threshold=hot_threshold, shards=shards, dedup=False,
    )
    vecs = base.select("id", "vec")
    return (
        cands.join(vecs.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("vec", "v_a"), "id_a")
        .join(vecs.withColumnRenamed("id", "id_b")
              .withColumnRenamed("vec", "v_b"), "id_b")
        .withColumn("cosine_sim", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def synthetic_centroids(
    spark, n_cells: int, dim: int, seed: int = 17
) -> DataFrame:
    """Deterministic pseudo-random IVF centroids -> (cell int, centroid).

    Same hash-chain construction as the synthetic test embeddings: component
    i of cell c = pmod(xxhash64(c, seed, i), 1000)/500 - 1, so an
    engine-independent golden can regenerate them bit-exactly. A production
    deployment would instead k-means a corpus sample and persist the
    centroid table — everything downstream (:func:`ivf_topk`) only sees a
    (cell, centroid) DataFrame and is agnostic to where it came from.
    """
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed), i), F.lit(1000)).cast("double")
            / 500.0 - 1.0
        ),
    )
    return spark.range(0, n_cells).select(
        F.col("id").cast("int").alias("cell"), vec.alias("centroid")
    )


def _cell_scores(vec: Column) -> Column:
    """array<struct<sim,neg_cell>> of cosine vs every centroid in `cents`.

    Relies on a `cents` column (array of (cell, centroid) structs — the
    one-row collapsed centroid table crossJoin'd in by :func:`ivf_topk`).
    neg_cell makes both argmax (array_max) and descending sort break sim
    ties toward the LOWEST cell id.
    """
    return F.transform(
        F.col("cents"),
        lambda c: F.struct(
            cosine(vec, c["centroid"]).alias("sim"),
            (-c["cell"]).alias("neg_cell"),
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
    query_broadcast_max: int = QUERY_BROADCAST_MAX_ROWS,
    hot_threshold: int = 2000,
    shards: int = 16,
    query_count: int | None = None,
) -> DataFrame:
    """IVF-Flat ANN: coarse-quantize the corpus into centroid cells, probe
    the query's ``n_probe`` nearest cells, rescore exactly.

    The inverted-file counterpart to :func:`lsh_topk` (FAISS IndexIVFFlat
    semantics): recall is tuned by ``n_probe`` instead of plane count, and
    cell population follows the data distribution instead of random
    hyperplane signs.

    Scale design:

    - the centroid table is collapsed to ONE array-of-structs row and
      broadcast; cell assignment is a per-row native ``array_max`` argmax —
      zero shuffle, whole-stage codegen, O(n_cells * dim) per row. (For the
      >10^5-centroid regimes real IVF systems shard the coarse quantizer
      hierarchically; this operator targets the <=10^4-cell sweet spot.)
    - the cell is the join key: a measured-small query set broadcasts into
      the cell join; a corpus-sized one goes through the SALTED shuffle
      machinery ids-only with vectors re-attached — the same two physical
      paths, same laziness contract, and same "never an unbounded
      driver-built broadcast" invariant as :func:`lsh_topk`.
    """
    cent_row = centroids.select(
        F.struct(F.col("cell").cast("int").alias("cell"), F.col("centroid")).alias("c")
    ).agg(F.collect_list("c").alias("cents"))

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
        .crossJoin(F.broadcast(cent_row))
        .withColumn("cell", (-F.array_max(_cell_scores(F.col("c_vec")))["neg_cell"]).cast("int"))
        .drop("cents")
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .crossJoin(F.broadcast(cent_row))
        .withColumn(
            "cells",
            F.slice(F.reverse(F.array_sort(_cell_scores(F.col("q_vec")))), 1, n_probe),
        )
        .select(
            "query_id", "q_vec",
            F.explode(F.transform(
                F.col("cells"), lambda s: (-s["neg_cell"]).cast("int")
            )).alias("cell"),
        )
    )

    # gate on EXPLODED rows (what would actually be broadcast): a caller's
    # query_count is in queries, the internal count sees post-probe rows
    if query_count is not None:
        q_rows = query_count * n_probe
    elif query_broadcast_max > 0:
        from .bucket_join import track_persist

        q = track_persist(q)
        q_rows = q.count()
    else:
        q_rows = None

    if q_rows is not None and q_rows <= query_broadcast_max:
        scored = (
            c.join(F.broadcast(q), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cosine_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        )
    else:
        from .bucket_join import salted_sides

        ca = c.select("cell", F.col("neighbor_id").alias("id"))
        qa = q.select("cell", F.col("query_id").alias("id"))
        side_c, side_q = salted_sides(ca, qa, ["cell"], "id", hot_threshold, shards)
        pair_ids = (
            side_c.alias("c").join(side_q.alias("q"), ["cell", "salt"])
            .select(
                F.col("c.id").alias("neighbor_id"),
                F.col("q.id").alias("query_id"),
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
        )
        # each corpus vector lives in exactly ONE cell and a query's probed
        # cells are distinct, so every (query, neighbor) pair meets at most
        # once — no dedup needed; vectors re-attach from the PRE-explode
        # query base (the exploded q carries n_probe copies of q_vec)
        # both re-attaches read the RAW inputs: joining the derived plans
        # would re-execute the cell-assignment lineage — for `c` the pruned
        # plan still carries the 1-row centroid BroadcastNestedLoopJoin
        # (join elimination does not apply), i.e. a second full corpus
        # scan+assignment whose only purpose was the cell key
        scored = (
            pair_ids
            .join(corpus.select(F.col(id_col).alias("neighbor_id"),
                                F.col(vec_col).alias("c_vec")), "neighbor_id")
            .join(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("q_vec")), "query_id")
            .withColumn("cosine_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
