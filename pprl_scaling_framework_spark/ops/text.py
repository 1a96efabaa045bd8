"""Text-analysis operators (training-data pipeline): token counting, quality
scoring, language-ID heuristic, fingerprinting, q-gram statistics (A4).

All native Column expressions — no UDFs — so each is oracle-checkable in
DuckDB and stays inside whole-stage codegen at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def token_count(col: str | Column) -> Column:
    """Whitespace tokenization count (0 for empty/blank)."""
    t = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(t)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# GPT-2-style pre-tokenizer alternation, simplified to the lookahead-free
# subset shared by Java regex (Spark) and RE2 (DuckDB): contractions, an
# optional-leading-space letter run, digit run, other-symbol run, then bare
# whitespace runs. Every character lands in exactly one leftmost-first match,
# so the match COUNT is a well-defined token count on both engines.
BPE_ISH_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(col: str | Column) -> Column:
    """BPE-ish token count: number of GPT-2-style pre-tokenizer matches
    (the standard LLM-training proxy for tokens-per-document when the real
    BPE vocab isn't loaded). Native `regexp_extract_all` — stays in codegen."""
    t = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(col: str | Column) -> Column:
    t = F.col(col) if isinstance(col, str) else col
    n = F.length(t)
    punct = n - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def digit_ratio(col: str | Column) -> Column:
    t = F.col(col) if isinstance(col, str) else col
    n = F.length(t)
    digits = n - F.length(F.regexp_replace(t, r"[0-9]", ""))
    return F.when(n > 0, digits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    stopwords = stopwords or LANG_MARKERS["en"]
    t = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(t), r"\s+")
    hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(stopwords)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def quality_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, n_chars, n_tokens, punct_ratio, digit_ratio, stopword_ratio,
    quality_score) — a simple linear quality score over the components."""
    t = F.col(text_col)
    out = df.select(
        F.col(id_col).alias("id"),
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(digit_ratio(t), 6).alias("digit_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
    )
    # the score is computed FROM the rounded components (same in the SQL
    # oracle) so both engines combine bit-identical double inputs
    score = (
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.3
        + (1.0 - F.least(F.col("digit_ratio") * 4.0, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.1
    )
    return out.withColumn("quality_score", F.round(score, 4))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-marker language heuristic: argmax of marker hit counts.

    -> (id, lang_guess, lang_score); ties break in fixed language order.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    def _hits(markers: list[str]) -> Column:
        # NB: one-arg lambda only — a two-arg lambda would receive the
        # element *index* as its second argument in F.filter.
        return F.size(F.filter(toks, lambda w: w.isin(markers)))

    scores = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    guess = F.lit("und")
    for l in reversed(langs):  # earlier language wins ties
        guess = F.when(scores[l] == best, F.lit(l)).otherwise(guess)
    guess = F.when(best > 0, guess).otherwise(F.lit("und"))
    return df.select(
        F.col(id_col).alias("id"),
        guess.alias("lang_guess"),
        best.cast("int").alias("lang_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalization fingerprint: lowercase, collapse whitespace, sort tokens,
    md5 — the classic key-collision dedup fingerprint."""
    norm = F.concat_ws(
        " ", F.array_sort(F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "))
    )
    return df.select(F.col(id_col).alias("id"), F.md5(norm).alias("fingerprint"))


def qgram_count_expr(col: str | Column, q: int) -> Column:
    """A4/X3: q-gram count via arithmetic on the proper string (no UDF).

    count = max(len(properString(s)) - q + 1, 0); empty source -> 0.
    Mirrors QGramUtil.calcQgramsCount exactly for strings.
    """
    t = F.col(col) if isinstance(col, str) else col
    collapsed = F.regexp_replace(t, r"\s+", "_")
    padded_len = (
        F.length(collapsed)
        + F.when(F.substring(collapsed, 1, 1) == "_", 0).otherwise(1)
        + F.when(
            (F.length(collapsed) > 0) & (F.substring(collapsed, -1, 1) == "_"), 0
        ).otherwise(1)
    )
    n = padded_len - q + 1
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.greatest(n, F.lit(0)))


def qgram_stats(df: DataFrame, group_col: str, text_col: str, qs: tuple[int, ...] = (2, 3, 4)) -> DataFrame:
    """A4: per-group average q-gram counts + avg length (one pass)."""
    aggs = [F.round(F.avg(F.length(text_col)), 6).alias("avg_len")]
    for q in qs:
        aggs.append(F.round(F.avg(qgram_count_expr(text_col, q)), 6).alias(f"avg_{q}grams"))
    return df.groupBy(F.col(group_col).alias("grp")).agg(*aggs)
