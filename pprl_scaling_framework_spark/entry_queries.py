"""Query registry for the driver contract (__spark_entry__.py).

Each entry is one implemented operator/query from SURVEY.md section 2 (or a
new-in-rebuild training-data op), expressed over the driver-provided parquet
tables, plus — where ANSI-SQL-expressible — a DuckDB oracle that computes the
IDENTICAL result (same column names, same rounding) for the correctness gate.

PPRL-specific stages (HMAC Bloom encodings, HLSH keys, popcount matching,
connected components) are not expressible in DuckDB SQL; those run as
rows-only checks over the deterministic synthetic repos table.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ops import dedup, similarity_search, text
from .ops.dedup import MERSENNE31, minhash_coefficients

# ---------------------------------------------------------------------------
# helpers

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


# --- blocking keys over documents used by several queries -------------------
# three cheap key families: lang, size bucket, source — the J1/F2/A1 analogs

def _doc_keys(d: DataFrame) -> DataFrame:
    return d.select(
        F.col("doc_id"),
        F.explode(
            F.array(
                F.concat_ws(":", F.lit("lang"), F.col("lang")),
                F.concat_ws(":", F.lit("size"), (F.col("n_chars") / 64).cast("long").cast("string")),
                F.concat_ws(":", F.lit("src"), F.col("source")),
            )
        ).alias("key"),
    )


_DOC_KEYS_SQL = """
    SELECT doc_id, key FROM documents, UNNEST([
        'lang:' || lang,
        'size:' || CAST(CAST(floor(n_chars / 64) AS BIGINT) AS VARCHAR),
        'src:' || source
    ]) AS t(key)
"""


def _pair_collisions(d: DataFrame) -> DataFrame:
    k = _doc_keys(d)
    a = k.select(F.col("doc_id").alias("id_a"), "key")
    b = k.select(F.col("doc_id").alias("id_b"), "key")
    return (
        a.join(b, "key")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("collisions"))
    )


_PAIR_COLLISIONS_SQL = f"""
    WITH keys AS ({_DOC_KEYS_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS collisions
    FROM keys a JOIN keys b USING (key)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# query implementations

def q_sha256_invariant(spark, sf_dir):
    """X13: per-row content sha256 (native sha2, no UDF)."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("sha256")
    )


def q_qgram_stats(spark, sf_dir):
    """A4: per-lang q-gram statistics via arithmetic (sums; exact ints)."""
    d = _docs(spark, sf_dir)
    return d.groupBy(F.col("lang").alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("sum_len"),
        F.sum(text.qgram_count_expr("text", 2)).alias("sum_2grams"),
        F.sum(text.qgram_count_expr("text", 3)).alias("sum_3grams"),
        F.sum(text.qgram_count_expr("text", 4)).alias("sum_4grams"),
    )


def _qgram_count_sql(q: int) -> str:
    # count = max(len(proper) - q + 1, 0), proper = collapse ws + pad "_"
    return f"""
        CASE WHEN length(text) = 0 THEN 0 ELSE greatest(
            length(regexp_replace(text, '\\s+', '_', 'g'))
            + CASE WHEN starts_with(regexp_replace(text, '\\s+', '_', 'g'), '_') THEN 0 ELSE 1 END
            + CASE WHEN length(regexp_replace(text, '\\s+', '_', 'g')) > 0
                    AND regexp_replace(text, '\\s+', '_', 'g') LIKE '%\\_' ESCAPE '\\'
                   THEN 0 ELSE 1 END
            - {q} + 1, 0) END
    """


def q_qgram_freq(spark, sf_dir):
    """X2: 2-gram generation + global frequency, deterministic top-20."""
    d = _docs(spark, sf_dir)
    grams = d.select(
        F.explode(
            F.when(
                F.length("text") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - 1),
                    lambda i: F.col("text").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    return (
        grams.groupBy("gram").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(20)
    )


def q_frequent_pairs(spark, sf_dir):
    """F2/A1: blocking-key collision counting, frequent iff count >= 2."""
    return _pair_collisions(_docs(spark, sf_dir)).filter(F.col("collisions") >= 2)


def q_collision_histogram(spark, sf_dir):
    """A1 histogram: #pairs per collision count."""
    return (
        _pair_collisions(_docs(spark, sf_dir))
        .groupBy("collisions")
        .agg(F.count("*").alias("pair_count"))
    )


def q_blocking_join(spark, sf_dir):
    """J1: equi-join candidate generation on one blocking key family."""
    d = _docs(spark, sf_dir)
    k = d.select(
        "doc_id", F.concat_ws("|", "lang", (F.col("n_chars") / 64).cast("long")).alias("bkey")
    )
    a = k.select(F.col("doc_id").alias("id_a"), "bkey")
    b = k.select(F.col("doc_id").alias("id_b"), "bkey")
    return a.join(b, "bkey").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "bkey")


def q_semi_join(spark, sf_dir):
    """F3: records participating in >= 1 frequent pair (left semi)."""
    d = _docs(spark, sf_dir)
    freq = q_frequent_pairs(spark, sf_dir)
    ids = freq.select(F.col("id_a").alias("doc_id")).unionByName(
        freq.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    return d.join(ids, "doc_id", "left_semi").select("doc_id", "lang", "n_chars")


def q_agreement_histogram(spark, sf_dir):
    """A5/K7: bit-packed agreement-vector histogram over blocked pairs."""
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", "lang", "source", "n_chars",
                    (F.col("n_chars") / 64).cast("long").alias("szb"))
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang")) & (F.col("a.szb") == F.col("b.szb"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    vec = (
        F.when(F.col("a.source") == F.col("b.source"), 1).otherwise(0)
        + F.when(F.col("a.n_chars") == F.col("b.n_chars"), 2).otherwise(0)
        + F.when(
            F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 8, 4
        ).otherwise(0)
    )
    return pairs.select(vec.alias("vec_idx")).groupBy("vec_idx").agg(
        F.count("*").alias("pair_count")
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: sha256 hash-groupBy, groups with > 1 member."""
    return dedup.exact_duplicates(_docs(spark, sf_dir), "doc_id", "text").select(
        "digest", "dup_count", "representative"
    )


def q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs, banded buckets + exact-Jaccard verify."""
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text",
        q=3, num_hashes=16, bands=4, threshold=0.5, seed=7,
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Blocked n-gram Jaccard dedup (lang + size-bucket blocks)."""
    d = _docs(spark, sf_dir).withColumn(
        "blk", F.concat_ws("|", "lang", (F.col("n_chars") / 16).cast("long"))
    )
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", "blk", q=3, threshold=0.4)


def q_dedup_simhash(spark, sf_dir):
    """SimHash fingerprints (56-bit, md5-derived, native bit math)."""
    return dedup.simhash(_docs(spark, sf_dir), "doc_id", "text", q=3, bits=16)


def q_text_quality(spark, sf_dir):
    """Quality scoring: length/punct/digit/stopword components."""
    return text.quality_metrics(_docs(spark, sf_dir), "doc_id", "text")


def q_text_lang_id(spark, sf_dir):
    """Stopword-marker language-ID heuristic."""
    return text.lang_id(_docs(spark, sf_dir), "doc_id", "text")


def q_text_fingerprint(spark, sf_dir):
    """Token-sort md5 fingerprint (document fingerprinting)."""
    return text.fingerprint(_docs(spark, sf_dir), "doc_id", "text")


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-3 for the first 5 vectors (exact baseline)."""
    e = _emb(spark, sf_dir)
    return similarity_search.brute_force_topk(
        e, e.filter(F.col("vec_id") < 5), k=3, round_digits=4
    )


def q_emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs among first 100 vectors (exact)."""
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 100)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(similarity_search.cosine(F.col("v_a"), F.col("v_b")), 4))
        .filter(F.col("cosine_sim") >= 0.8)
        .select("id_a", "id_b", "cosine_sim")
    )


def q_agg_pricing(spark, sf_dir):
    """A1-style partial+final aggregation (TPC-H q1 shape on lineitem)."""
    return (
        _lineitem(spark, sf_dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_customer_orders(spark, sf_dir):
    """Multi-way equi-join + agg (broadcastable dim side)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_total_sort(spark, sf_dir):
    """O1/O7: total-order sort + head-25 report."""
    return (
        _docs(spark, sf_dir)
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(25)
        .select("doc_id", "lang", "n_chars")
    )


def q_limit_scan(spark, sf_dir):
    """O4: deterministic limit-k scan."""
    return _docs(spark, sf_dir).orderBy("doc_id").limit(10).select("doc_id", "source")


def q_union_tag(spark, sf_dir):
    """S4/O5: two-source union with discriminator tag column."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("doc_id") % 2 == 0).withColumn("src", F.lit("A"))
    b = d.filter(F.col("doc_id") % 2 == 1).withColumn("src", F.lit("B"))
    return a.unionByName(b).groupBy("src", "lang").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# PPRL pipeline queries (rows-only checks: HMAC/popcount not SQL-expressible)

_PPRL_ENTITIES = 300


def _pprl_records(spark):
    from .sources import repos as repos_src

    return repos_src.with_uid_and_sha(
        repos_src.synth_repos(spark, n_entities=_PPRL_ENTITIES, seed=42, skew_every=50)
    )


def _pprl_config():
    from .encoding import schemes
    from .pipeline.linkage import LinkageConfig

    return LinkageConfig(
        encoding=schemes.clk(["content"], N=4096, K=8, Q=2),
        hlsh_K=30, hlsh_seed=420, delta=0.01, theta=164,
        method="dice", threshold=0.8, hot_threshold=50, salt_shards=4,
    )


def q_pprl_encode(spark, sf_dir):
    """X6-X8: CLK Bloom-filter encoding (vectorized Arrow UDF)."""
    from .encoding.encode import encode_dataframe

    recs = _pprl_records(spark)
    enc = encode_dataframe(recs, _pprl_config().encoding, included=["uid"])
    return enc.select("uid", F.sha2(F.hex(F.col("bf")), 256).alias("bf_digest"))


def q_pprl_blocking_keys(spark, sf_dir):
    """X12: HLSH key generation (seeded, L x K sampled bits -> int64 keys)."""
    from .blocking import hlsh
    from .encoding.encode import encode_dataframe

    cfg = _pprl_config()
    plan = cfg.plan()
    recs = _pprl_records(spark)
    enc = encode_dataframe(recs, cfg.encoding, included=["uid"])
    pos = hlsh.position_matrix(plan.L, cfg.hlsh_K, cfg.encoding.total_bits, cfg.hlsh_seed)
    return hlsh.blocking_keys(enc, "uid", "bf", pos, cfg.encoding.total_bits)


def q_pprl_candidates(spark, sf_dir):
    """J1+F2: salted blocking join + collision count >= C."""
    from .pipeline.linkage import run_dedup_pipeline

    res = run_dedup_pipeline(spark, _pprl_records(spark), _pprl_config(), cluster=False)
    return res.candidate_pairs


def q_pprl_matched_pairs(spark, sf_dir):
    """Flagship: encode -> block -> candidates -> Dice >= t classify."""
    from .pipeline.linkage import run_dedup_pipeline

    res = run_dedup_pipeline(spark, _pprl_records(spark), _pprl_config(), cluster=False)
    return res.matched_pairs.select("id_a", "id_b", F.round("sim", 6).alias("sim"))


def q_pprl_clusters(spark, sf_dir):
    """Connected components: matched pairs -> entity_id."""
    from .pipeline.linkage import run_dedup_pipeline

    res = run_dedup_pipeline(spark, _pprl_records(spark), _pprl_config(), cluster=True)
    return res.clusters


def q_pprl_two_party(spark, sf_dir):
    """Alice x Bob linkage (the reference's flagship block_encoded_data)."""
    from .pipeline.linkage import run_linkage_pipeline

    records = _pprl_records(spark)
    a = records.filter(F.col("path").rlike(r"_0\.\w+$"))
    b = records.filter(~F.col("path").rlike(r"_0\.\w+$"))
    res = run_linkage_pipeline(spark, a, b, _pprl_config())
    return res.matched_pairs.select("id_a", "id_b", F.round("sim", 6).alias("sim"))


# ---------------------------------------------------------------------------
# DuckDB oracles

def _minhash_sql() -> str:
    coeffs = minhash_coefficients(16, seed=7)
    P = MERSENNE31
    sig_terms = ",\n            ".join(
        f"list_min(list_transform(hv, h -> ({a}::BIGINT * h + {b}) % {P}))"
        for a, b in coeffs
    )
    return f"""
        WITH grams AS (
            SELECT doc_id,
                   list_sort(list_distinct(list_transform(
                       generate_series(1, greatest(length(text) - 2, 0)),
                       i -> substr(text, i, 3)))) AS g
            FROM documents
        ),
        hashed AS (
            -- 56-bit gram hashes: signature and exact verify both run on
            -- these (mirrors gram_hashes/signature_from_hashes in Spark)
            SELECT doc_id,
                   list_sort(list_distinct(list_transform(
                       g, x -> ('0x' || substr(md5(x), 1, 14))::BIGINT))) AS hg,
                   list_transform(
                       list_sort(list_distinct(list_transform(
                           g, x -> ('0x' || substr(md5(x), 1, 14))::BIGINT))),
                       h -> h % {P}) AS hv
            FROM grams
        ),
        sigs AS (
            SELECT doc_id, hg, [
            {sig_terms}
            ] AS sig
            FROM hashed
        ),
        banded AS (
            SELECT doc_id, hg, band,
                   sha256(CAST(band AS VARCHAR) || ',' ||
                          array_to_string(sig[band*4+1 : band*4+4], '-')) AS bucket
            FROM sigs, UNNEST([0, 1, 2, 3]) AS t(band)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.hg AS g_a, b.hg AS g_b
            FROM banded a JOIN banded b USING (bucket)
            WHERE a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               round(len(list_intersect(g_a, g_b))::DOUBLE /
                     (len(g_a) + len(g_b) - len(list_intersect(g_a, g_b)))::DOUBLE, 6) AS jaccard
        FROM cand
        WHERE len(g_a) + len(g_b) - len(list_intersect(g_a, g_b)) > 0
          AND len(list_intersect(g_a, g_b))::DOUBLE /
              (len(g_a) + len(g_b) - len(list_intersect(g_a, g_b)))::DOUBLE >= 0.5
    """


def _simhash_sql(bits: int = 16) -> str:
    bit_sums = ",\n            ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN 1::BIGINT ELSE 0 END << {j})" for j in range(bits)
    )
    return f"""
        WITH grams AS (
            SELECT doc_id, UNNEST(list_distinct(list_transform(
                       generate_series(1, greatest(length(text) - 2, 0)),
                       i -> substr(text, i, 3)))) AS g
            FROM documents
        ),
        hashed AS (
            SELECT doc_id, ('0x' || substr(md5(g), 1, 14))::BIGINT AS h FROM grams
        ),
        sums AS (
            SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id
        )
        SELECT doc_id AS id, {packed} AS simhash FROM sums
    """


_STOPWORDS_EN = "('the', 'and', 'of', 'to', 'is')"


def _quality_sql() -> str:
    # score computed from the ROUNDED components in a subquery — identical
    # double inputs and association order as the Spark side
    return f"""
        SELECT id, n_chars, n_tokens, punct_ratio, digit_ratio, stopword_ratio,
               round(
                   least(n_tokens::DOUBLE / 100.0, 1.0) * 0.4
                 + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.3
                 + (1.0 - least(digit_ratio * 4.0, 1.0)) * 0.2
                 + least(stopword_ratio * 5.0, 1.0) * 0.1
               , 4) AS quality_score
        FROM (
            SELECT doc_id AS id,
                   length(text) AS n_chars,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   round(CASE WHEN length(text) > 0 THEN
                       (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                       / length(text) ELSE 0.0 END, 6) AS punct_ratio,
                   round(CASE WHEN length(text) > 0 THEN
                       (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                       / length(text) ELSE 0.0 END, 6) AS digit_ratio,
                   round(CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0 THEN
                       len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           w -> lower(w) IN {_STOPWORDS_EN}))::DOUBLE
                       / len(regexp_split_to_array(trim(text), '\\s+')) ELSE 0.0 END, 6) AS stopword_ratio
            FROM documents
        )
    """


_LANG_MARKERS_SQL = {
    "en": "('the', 'and', 'of', 'to', 'is')",
    "es": "('el', 'la', 'de', 'que', 'los')",
    "de": "('der', 'die', 'und', 'das', 'ist')",
    "fr": "('le', 'la', 'et', 'les', 'des')",
}


def _lang_id_sql() -> str:
    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    hits = {
        l: f"len(list_filter({toks}, w -> w IN {m}))" for l, m in _LANG_MARKERS_SQL.items()
    }
    langs = list(_LANG_MARKERS_SQL)
    best = f"greatest({', '.join(hits.values())})"
    guess = "'und'"
    for l in reversed(langs):
        guess = f"CASE WHEN {hits[l]} = {best} THEN '{l}' ELSE {guess} END"
    return f"""
        SELECT doc_id AS id,
               CASE WHEN {best} > 0 THEN {guess} ELSE 'und' END AS lang_guess,
               CAST({best} AS INT) AS lang_score
        FROM documents
    """


def _cosine_sql(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    na = f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))"
    return f"CASE WHEN {na} * {nb} > 0 THEN {dot} / ({na} * {nb}) ELSE 0.0 END"


ORACLES: dict[str, str] = {
    "x13_sha256_invariant": "SELECT doc_id, sha256(text) AS sha256 FROM documents",
    "a4_qgram_stats": f"""
        SELECT lang AS grp, COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS sum_len,
               CAST(SUM({_qgram_count_sql(2)}) AS BIGINT) AS sum_2grams,
               CAST(SUM({_qgram_count_sql(3)}) AS BIGINT) AS sum_3grams,
               CAST(SUM({_qgram_count_sql(4)}) AS BIGINT) AS sum_4grams
        FROM documents GROUP BY lang
    """,
    "x2_qgram_freq": """
        SELECT gram, COUNT(*) AS cnt FROM (
            SELECT substr(text, i, 2) AS gram
            FROM documents, UNNEST(generate_series(1, greatest(length(text) - 1, 0))) AS t(i)
            WHERE length(text) >= 2
        ) GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT 20
    """,
    "f2_frequent_pairs": _PAIR_COLLISIONS_SQL + " HAVING COUNT(*) >= 2",
    "a1_collision_histogram": f"""
        SELECT collisions, COUNT(*) AS pair_count
        FROM ({_PAIR_COLLISIONS_SQL}) GROUP BY collisions
    """,
    "j1_blocking_join": """
        WITH k AS (
            SELECT doc_id, lang || '|' || CAST(CAST(floor(n_chars / 64) AS BIGINT) AS VARCHAR) AS bkey
            FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, bkey
        FROM k a JOIN k b USING (bkey) WHERE a.doc_id < b.doc_id
    """,
    "f3_semi_join": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE doc_id IN (
            SELECT id_a FROM ({_PAIR_COLLISIONS_SQL} HAVING COUNT(*) >= 2)
            UNION SELECT id_b FROM ({_PAIR_COLLISIONS_SQL} HAVING COUNT(*) >= 2)
        )
    """,
    "a5_agreement_histogram": """
        SELECT (CASE WHEN a.source = b.source THEN 1 ELSE 0 END
              + CASE WHEN a.n_chars = b.n_chars THEN 2 ELSE 0 END
              + CASE WHEN abs(a.n_chars - b.n_chars) <= 8 THEN 4 ELSE 0 END) AS vec_idx,
               COUNT(*) AS pair_count
        FROM documents a JOIN documents b
          ON a.lang = b.lang
         AND CAST(floor(a.n_chars / 64) AS BIGINT) = CAST(floor(b.n_chars / 64) AS BIGINT)
         AND a.doc_id < b.doc_id
        GROUP BY 1
    """,
    "dedup_exact": """
        SELECT sha256(text) AS digest, COUNT(*) AS dup_count, MIN(doc_id) AS representative
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1
    """,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_ngram_jaccard": """
        WITH g AS (
            SELECT doc_id,
                   lang || '|' || CAST(CAST(floor(n_chars / 16) AS BIGINT) AS VARCHAR) AS blk,
                   list_sort(list_distinct(list_transform(
                       generate_series(1, greatest(length(text) - 2, 0)),
                       i -> substr(text, i, 3)))) AS grams
            FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                     (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))::DOUBLE,
                     6) AS jaccard
        FROM g a JOIN g b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) > 0
          AND len(list_intersect(a.grams, b.grams))::DOUBLE /
              (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))::DOUBLE >= 0.4
    """,
    "dedup_simhash": _simhash_sql(16),
    "text_quality": _quality_sql(),
    "text_lang_id": _lang_id_sql(),
    "text_fingerprint": """
        SELECT doc_id AS id,
               md5(array_to_string(list_sort(regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')), ' ')) AS fingerprint
        FROM documents
    """,
    "ann_cosine_topk": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cosine_sql('q.qv', 'e.embedding')} AS cs
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id ASC) AS rank,
                   cs
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, round(cs, 4) AS cosine_sim
        FROM ranked WHERE rank <= 3
    """,
    "emb_near_dup": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_cosine_sql('a.embedding', 'b.embedding')}, 4) AS cosine_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 100 AND b.vec_id < 100
          AND round({_cosine_sql('a.embedding', 'b.embedding')}, 4) >= 0.8
    """,
    "a1_agg_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(SUM(l_quantity), 2) AS sum_qty,
               round(SUM(l_extendedprice), 2) AS sum_base_price,
               round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "j2_customer_orders": """
        SELECT c_mktsegment, COUNT(*) AS n_orders, round(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "o1_total_sort": """
        SELECT doc_id, lang, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id ASC LIMIT 25
    """,
    "o4_limit_scan": "SELECT doc_id, source FROM documents ORDER BY doc_id LIMIT 10",
    "s4_union_tag": """
        SELECT src, lang, COUNT(*) AS n FROM (
            SELECT 'A' AS src, lang FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT 'B' AS src, lang FROM documents WHERE doc_id % 2 = 1
        ) GROUP BY src, lang
    """,
}


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # SURVEY §2 operator analogs over the provided tables (oracle-checked)
    "x13_sha256_invariant": q_sha256_invariant,
    "a4_qgram_stats": q_qgram_stats,
    "x2_qgram_freq": q_qgram_freq,
    "f2_frequent_pairs": q_frequent_pairs,
    "a1_collision_histogram": q_collision_histogram,
    "j1_blocking_join": q_blocking_join,
    "f3_semi_join": q_semi_join,
    "a5_agreement_histogram": q_agreement_histogram,
    "a1_agg_pricing": q_agg_pricing,
    "j2_customer_orders": q_join_customer_orders,
    "o1_total_sort": q_total_sort,
    "o4_limit_scan": q_limit_scan,
    "s4_union_tag": q_union_tag,
    # training-data ops (oracle-checked)
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "ann_cosine_topk": q_ann_topk,
    "emb_near_dup": q_emb_near_dup,
    # PPRL pipeline (rows-only: not ANSI-SQL-expressible)
    "pprl_encode_clk": q_pprl_encode,
    "pprl_blocking_keys": q_pprl_blocking_keys,
    "pprl_candidate_pairs": q_pprl_candidates,
    "pprl_matched_pairs": q_pprl_matched_pairs,
    "pprl_clusters": q_pprl_clusters,
    "pprl_two_party_linkage": q_pprl_two_party,
}
