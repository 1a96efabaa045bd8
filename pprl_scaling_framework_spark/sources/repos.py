"""Deterministic synthetic source-code ``repos`` table (the authoritative
pipeline input shape per BASELINE.json:input_hint).

Columns: ``repo, path, commit, lang, content`` — all string. Truth labels are
embedded in the uid exactly like the reference's voters convention
(``[a|b](\\d+)(_\\d+)?``, ``lib/blocking/HammingLSHBlocking.java:452-458``):
entity ordinal in ``repo``/``path``, variant suffix distinguishes
near-duplicates. An explicit ``labels`` view is derivable with
:func:`true_pairs`.

Everything is generated with NATIVE Spark expressions over ``spark.range``
(xxhash64-driven vocab picks, ``transform``/``sequence`` array builders) —
no Python UDFs, no external data, fully deterministic given (n_entities,
seed), and it scales linearly with partition parallelism, so the same code
synthesizes the sf0.001 test fixture and the bench input.

Skew probe: entities where ``entity % skew_every == 0`` share ONE constant
content (a mega blocking bucket) to exercise hot-key salting (north_rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# small, code-flavored vocabulary; hash-picked per (entity, slot)
_VOCAB = [
    "def", "return", "import", "class", "self", "value", "result", "index",
    "config", "parse", "buffer", "stream", "token", "cache", "flush", "merge",
    "split", "filter", "reduce", "lambda", "assert", "yield", "await", "async",
    "count", "total", "items", "nodes", "edges", "graph", "table", "query",
    "batch", "shard", "offset", "limit", "scan", "write", "read", "close",
    "open", "init", "update", "delete", "insert", "select", "join", "group",
    "order", "where", "having", "window", "partition", "cluster", "encode",
    "decode", "hash", "digest", "block", "match", "score", "label", "train",
]

_LANGS = ["py", "py", "py", "java", "java", "c", "go", "rs", "js", "ts"]


def synth_repos(
    spark: SparkSession,
    n_entities: int = 1000,
    max_variants: int = 3,
    tokens_per_file: int = 40,
    seed: int = 42,
    skew_every: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """-> (repo, path, commit, lang, content) with uid-embedded truth.

    Each entity e gets ``1 + (xxhash64(e, seed) % max_variants)`` files that
    are near-duplicates of each other: variant v != 0 replaces ``v`` tokens of
    the base token array — bounded edits so true-pair Dice stays high.
    """
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    vlen = len(_VOCAB)
    langs = F.array(*[F.lit(l) for l in _LANGS])

    df = spark.range(0, n_entities, 1, partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumnRenamed("id", "entity")
    df = df.withColumn(
        "n_variants",
        (F.pmod(F.xxhash64("entity", F.lit(seed)), F.lit(max_variants)) + 1).cast("int"),
    )
    df = df.withColumn("variant", F.explode(F.sequence(F.lit(0), F.col("n_variants") - 1)))

    # base token stream of the entity; variant v swaps token at slots
    # hash(entity, seed, 'edit', j) for j in 1..v (deterministic small edits)
    # token = vocab word + entity-specific 4-char base36 suffix:
    # near-duplicates share ~(1 - edits/tokens) of their q-grams while
    # distinct entities share little — mirrors identifier-renamed source
    # files. Base36 (not hex): a 16-char alphabet would put every suffix in
    # a 256-bigram space and make ALL entity pairs gram-similar at scale.
    def _token(i, salt):
        h = F.xxhash64(F.col("entity"), F.lit(salt), i)
        sfx = F.lower(F.lpad(F.conv(
            F.pmod(F.xxhash64(h), F.lit(36 ** 4)).cast("string"), 10, 36), 4, "0"))
        word = F.element_at(vocab, (F.pmod(h, F.lit(vlen)) + 1).cast("int"))
        return F.format_string("%s_%s", word, sfx)

    tok = F.transform(
        F.sequence(F.lit(1), F.lit(tokens_per_file)),
        lambda i: _token(i, seed),
    )
    df = df.withColumn("_base_tokens", tok)
    edit_slots = F.transform(
        F.sequence(F.lit(1), F.greatest(F.col("variant"), F.lit(1))),
        lambda j: F.when(
            F.col("variant") > 0,
            F.pmod(F.xxhash64(F.col("entity"), F.lit(seed + 1), F.col("variant"), j),
                   F.lit(tokens_per_file)).cast("int"),
        ).otherwise(F.lit(-1)),
    )
    df = df.withColumn("_edits", edit_slots)
    edited = F.transform(
        F.col("_base_tokens"),
        lambda t, i: F.when(
            F.array_contains(F.col("_edits"), i.cast("int")),
            _token(i + F.col("variant") * 1000, seed + 2),
        ).otherwise(t),
    )
    content = F.concat_ws(" ", edited)
    # skew probe: a constant mega-bucket content for entity % skew_every == 0
    if skew_every and skew_every > 0:
        content = F.when(
            F.pmod(F.col("entity"), F.lit(skew_every)) == 0,
            F.lit("import os import sys " * 10),
        ).otherwise(content)

    df = df.withColumn("content", content)
    df = df.withColumn("lang", F.element_at(
        langs, (F.pmod(F.xxhash64("entity", F.lit(seed + 3)), F.lit(len(_LANGS))) + 1).cast("int")
    ))
    df = df.withColumn("repo", F.format_string("org/repo-%05d", F.col("entity")))
    df = df.withColumn(
        "path", F.format_string("src/e%d_%d.%s", F.col("entity"), F.col("variant"), F.col("lang"))
    )
    df = df.withColumn(
        "commit",
        F.substring(F.sha2(F.concat_ws("|", "repo", "path", F.lit(seed)), 256), 1, 40),
    )
    return df.select("repo", "path", "commit", "lang", "content")


def with_uid_and_sha(df: DataFrame) -> DataFrame:
    """Stage 0 (O6 + X13): deterministic uid + per-row sha256 invariant.

    uid = repo:path@commit (deterministic record key — replaces the
    reference's ordinal uid assignment, ``lib/datasets/DatasetsUtil.java:933-1002``);
    sha256 via native ``sha2`` — no UDF.
    """
    return df.withColumn(
        "uid", F.concat_ws("", F.col("repo"), F.lit(":"), F.col("path"),
                           F.lit("@"), F.col("commit"))
    ).withColumn("sha256", F.sha2(F.col("content"), 256))


def entity_of_uid() -> F.Column:
    """Truth extraction: entity ordinal parsed from the uid (J9 convention)."""
    return F.regexp_extract(F.col("uid"), r"src/e(\d+)_", 1).cast("long")


def true_pairs(records: DataFrame) -> DataFrame:
    """Labels table (id_a, id_b), id_a < id_b.

    True match <=> same entity ordinal (uid-embedded truth) OR identical
    content (the skew-probe rows share one constant content across entities —
    byte-identical files are the same entity by definition of dedup).
    """
    ents = records.select(
        "uid", entity_of_uid().alias("entity"), F.sha2("content", 256).alias("_sha")
    )
    a, b = ents.alias("a"), ents.alias("b")
    same_entity = (
        a.join(b, (F.col("a.entity") == F.col("b.entity")) & (F.col("a.uid") < F.col("b.uid")))
        .select(F.col("a.uid").alias("id_a"), F.col("b.uid").alias("id_b"))
    )
    same_sha = (
        a.join(b, (F.col("a._sha") == F.col("b._sha")) & (F.col("a.uid") < F.col("b.uid")))
        .select(F.col("a.uid").alias("id_a"), F.col("b.uid").alias("id_b"))
    )
    return same_entity.unionByName(same_sha).distinct()
