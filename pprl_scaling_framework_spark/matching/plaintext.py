"""Plaintext field-similarity kernels (K6/K7) for the statistics/EM stage.

Reference ``lib/matching/SimilarityUtil.java:18-78`` dispatches on method
names {jaro_winkler (default, threshold 0.70), jaccard_bigrams/trigrams/
quadgrams, cosine_*, dice_*, exact}; the q-gram methods run on the proper
string. The reference delegates to the info.debatty library; here
Jaro-Winkler is implemented from the published algorithm (boost threshold
0.7, prefix scale 0.1, max prefix 4) in a vectorized Arrow UDF, and the
q-gram set similarities are pure native Column expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..ops.dedup import char_shingles

DEFAULT_METHOD = "jaro_winkler"
DEFAULT_THRESHOLD = 0.70

_WINKLER_P = 0.1
_WINKLER_BOOST = 0.7
_MAX_PREFIX = 4


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str) -> float:
    j = jaro(s1, s2)
    if j > _WINKLER_BOOST:
        prefix = 0
        for a, b in zip(s1[:_MAX_PREFIX], s2[:_MAX_PREFIX]):
            if a != b:
                break
            prefix += 1
        j = j + prefix * _WINKLER_P * (1.0 - j)
    return j


def jaro_winkler_udf():
    @F.pandas_udf(DoubleType())
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([
            jaro_winkler(x if x is not None else "", y if y is not None else "")
            for x, y in zip(a, b)
        ])

    return _jw


def _gram_sets(a: Column, b: Column, q: int) -> tuple[Column, Column, Column]:
    ga, gb = char_shingles(a, q), char_shingles(b, q)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    return ga, gb, inter


def qgram_jaccard(a: Column, b: Column, q: int) -> Column:
    ga, gb, inter = _gram_sets(a, b, q)
    union = F.size(ga) + F.size(gb) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def qgram_dice(a: Column, b: Column, q: int) -> Column:
    ga, gb, inter = _gram_sets(a, b, q)
    denom = (F.size(ga) + F.size(gb)).cast("double")
    return F.when(denom > 0, 2.0 * inter / denom).otherwise(F.lit(0.0))


def qgram_cosine(a: Column, b: Column, q: int) -> Column:
    ga, gb, inter = _gram_sets(a, b, q)
    denom = F.sqrt(F.size(ga).cast("double") * F.size(gb).cast("double"))
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


_QGRAM_OF = {"bigrams": 2, "trigrams": 3, "quadgrams": 4}


def similarity_column(method: str, a: Column, b: Column) -> Column:
    """K6 dispatch; q-gram methods run on the proper string like the ref."""
    if method == "jaro_winkler":
        return jaro_winkler_udf()(a, b)
    if method == "exact":
        return F.when(a == b, 1.0).otherwise(0.0)
    for name, q in _QGRAM_OF.items():
        proper_a = F.concat(F.lit("_"), F.regexp_replace(a, r"\s+", "_"), F.lit("_"))
        proper_b = F.concat(F.lit("_"), F.regexp_replace(b, r"\s+", "_"), F.lit("_"))
        if method == f"jaccard_{name}":
            return qgram_jaccard(proper_a, proper_b, q)
        if method == f"dice_{name}":
            return qgram_dice(proper_a, proper_b, q)
        if method == f"cosine_{name}":
            return qgram_cosine(proper_a, proper_b, q)
    raise ValueError(f"unknown plaintext similarity method {method!r}")


def agreement_vector_column(
    fields: list[str], method: str = DEFAULT_METHOD,
    threshold: float = DEFAULT_THRESHOLD,
    a_prefix: str = "a.", b_prefix: str = "b.",
) -> Column:
    """K7: bit-packed agreement index over F fields (bit j <-> field j)."""
    idx = F.lit(0)
    for j, f_name in enumerate(fields):
        sim = similarity_column(method, F.col(a_prefix + f_name), F.col(b_prefix + f_name))
        idx = idx + F.when(sim >= threshold, F.lit(1 << j)).otherwise(F.lit(0))
    return idx
