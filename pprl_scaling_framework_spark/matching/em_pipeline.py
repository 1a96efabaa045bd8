"""Statistics -> EM -> weights stage (entry point C of the reference).

Mirrors ``calc_data_stats``: q-gram statistics (A4) in one agg pass, sampled
exhaustive pair generation (J8 — ``df.alias('a').join(df.alias('b'),
a.uid < b.uid)`` instead of the reference's combinatorial rank addressing,
``lib/combinatorics/CombinatoricsUtil.java:232-296``), per-field agreement
vectors (K7, jaro_winkler@0.7 default), the 2^F similarity-vector histogram
via ``groupBy(vec_idx).count()`` (A5 — at most 2^F rows collected), then
driver-side numpy EM (A6) and Fellegi-Sunter weights (A7) which feed dynamic
FBF sizing (D2) and weighted RBF composition (D3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import em as em_core
from ..core import planner
from ..ops.text import qgram_count_expr
from .plaintext import DEFAULT_METHOD, DEFAULT_THRESHOLD, agreement_vector_column


def field_qgram_stats(df: DataFrame, fields: list[str], qs=(2, 3, 4)) -> dict:
    """A4: per-field avg length and avg q-gram counts (one aggregation)."""
    aggs = []
    for f_name in fields:
        aggs.append(F.avg(F.length(f_name)).alias(f"{f_name}__len"))
        for q in qs:
            aggs.append(F.avg(qgram_count_expr(f_name, q)).alias(f"{f_name}__{q}"))
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict = {}
    for f_name in fields:
        out[f_name] = {
            "avg_len": row[f"{f_name}__len"],
            **{f"avg_{q}grams": row[f"{f_name}__{q}"] for q in qs},
        }
    return out


def sampled_pairs(
    df: DataFrame, uid_col: str, fields: list[str],
    sample_size: int = 400, seed: int = 42,
) -> DataFrame:
    """J8 on a deterministic sample: all pairs of ~sample_size records."""
    n = df.count()
    frac = min(1.0, sample_size / max(n, 1))
    s = df.sample(withReplacement=False, fraction=frac, seed=seed).select(
        uid_col, *fields
    )
    a, b = s.alias("a"), s.alias("b")
    return a.join(b, F.col(f"a.{uid_col}") < F.col(f"b.{uid_col}"))


def similarity_histogram(
    pairs: DataFrame, fields: list[str],
    method: str = DEFAULT_METHOD, threshold: float = DEFAULT_THRESHOLD,
) -> np.ndarray:
    """A5: long[2^F] frequency vector of bit-packed agreement patterns."""
    vec = agreement_vector_column(fields, method, threshold)
    rows = pairs.select(vec.alias("vec_idx")).groupBy("vec_idx").agg(
        F.count("*").alias("n")
    ).collect()
    freq = np.zeros(1 << len(fields), dtype=np.int64)
    for r in rows:
        freq[r["vec_idx"]] = r["n"]
    return freq


@dataclass
class StatsResult:
    qgram_stats: dict
    frequencies: np.ndarray
    em: em_core.EMResult
    agree_weights: np.ndarray
    disagree_weights: np.ndarray
    normalized_range: np.ndarray
    dynamic_fbf_sizes: list[int]


def calc_data_stats(
    spark: SparkSession,
    df: DataFrame,
    uid_col: str,
    fields: list[str],
    K: int = 10,
    sample_size: int = 400,
    method: str = DEFAULT_METHOD,
    threshold: float = DEFAULT_THRESHOLD,
    m0: float = 0.9,
    u0: float = 0.1,
    p0: float = 0.001,
    seed: int = 42,
) -> StatsResult:
    """Entry point C end-to-end: stats + EM + weights + D2 sizes.

    (Default u0 is 0.1 — the reference's symmetric m0=u0=0.9 default is a
    degenerate EM fixed point; see core.em.)
    """
    qstats = field_qgram_stats(df, fields)
    pairs = sampled_pairs(df, uid_col, fields, sample_size, seed)
    freq = similarity_histogram(pairs, fields, method, threshold)
    em_res = em_core.run_em(freq, len(fields), m0=m0, u0=u0, p0=p0)
    avg2 = [qstats[f]["avg_2grams"] for f in fields]
    return StatsResult(
        qgram_stats=qstats,
        frequencies=freq,
        em=em_res,
        agree_weights=em_res.agree_weights(),
        disagree_weights=em_res.disagree_weights(),
        normalized_range=em_res.normalized_range(),
        dynamic_fbf_sizes=planner.fbf_dynamic_sizes(avg2, K),
    )
