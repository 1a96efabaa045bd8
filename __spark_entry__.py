"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship PPRL query (encode -> HLSH block -> FPS
  candidates -> Dice classify) on the deterministic synthetic repos table
  plus the sf0.001 parquet dir for scale context.
- ``queries()``: one entry per implemented operator from SURVEY.md section 2
  (PPRL stages + training-data ops + engine analogs over the provided
  tables).
- ``oracle_sql()``: an exact oracle for EVERY query — DuckDB-equivalent SQL
  where ANSI-expressible; otherwise a SELECT from engine-independent goldens
  (plain-JDK PPRL pipeline, pure-Python JW+EM, independent PPM/BMP/WAV
  parsers, numpy+XXH64 ANN, xml.etree DBLP) regenerated from source by the
  tools/ generators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pprl_scaling_framework_spark.entry_queries import q_pprl_matched_pairs

    return q_pprl_matched_pairs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pprl_scaling_framework_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pprl_scaling_framework_spark.entry_queries import ORACLES

    return dict(ORACLES)
