"""Dataset ingest / uid assignment / stats-properties I/O (S1, O6, S7).

- :func:`csv_ingest` — the reference's csv2avro semantics
  (``lib/datasets/DatasetsUtil.java:332-393``) as one declarative read:
  comma split limited to the field count, empty STRING -> ``-NA-``, empty
  INT/LONG -> 0, empty DOUBLE/FLOAT -> NaN, empty BOOLEAN -> false.
- :func:`assign_uid` — O6 uid field (``DatasetsUtil.java:933-1002``):
  ordinal ``<prefix><row_number>`` over a deterministic order, or the
  preferred content-derived deterministic key.
- :func:`stats_to_properties` / :func:`properties_to_stats` — the
  ``.properties`` statistics format of the reference
  (``lib/datasets/DatasetStatistics.java:185-246``; fixture
  ``lib-test/resources/data/stats_1.properties``): keys ``record.count``,
  ``field.names``, ``f.<field>.avg.length``,
  ``f.<field>.avg[.unique].{2,3,4}grams.count``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def csv_ingest(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
) -> DataFrame:
    """S1: typed CSV scan with the reference's empty-value semantics."""
    raw = spark.read.csv(path, header=header, inferSchema=False,
                         schema=T.StructType([
                             T.StructField(f.name, T.StringType()) for f in schema.fields
                         ]))
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        empty = c.isNull() | (c == "")
        if isinstance(f.dataType, T.StringType):
            out = F.when(empty, F.lit("-NA-")).otherwise(c)
        elif isinstance(f.dataType, (T.IntegerType, T.LongType)):
            out = F.when(empty, F.lit(0)).otherwise(c).cast(f.dataType)
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            out = F.when(empty, F.lit(float("nan"))).otherwise(c).cast(f.dataType)
        elif isinstance(f.dataType, T.BooleanType):
            # Boolean.parseBoolean(null) -> false
            out = F.when(empty, F.lit(False)).otherwise(F.lower(c) == "true")
        else:
            out = c.cast(f.dataType)
        cols.append(out.alias(f.name))
    return raw.select(*cols)


def assign_uid(
    df: DataFrame,
    uid_col: str = "uid",
    prefix: str = "",
    order_by: list[str] | None = None,
) -> DataFrame:
    """O6: add an ordinal uid (``<prefix><n>``) over a deterministic order.

    The reference assigns ordinals during a single-threaded rewrite; here a
    window row_number over ``order_by`` (default: all columns) keeps it
    deterministic and distributed. Prefer a content-derived key
    (``sources.repos.with_uid_and_sha``) at scale — a global row_number is a
    single-partition sort of the key columns.
    """
    order_by = order_by or df.columns
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(
        uid_col, F.concat(F.lit(prefix), (F.row_number().over(w) - 1).cast("string"))
    )


def stats_to_properties(
    record_count: int,
    field_stats: dict[str, dict[str, float]],
    qs: tuple[int, ...] = (2, 3, 4),
) -> str:
    """S7: serialize q-gram statistics in the reference's .properties layout."""
    lines = ["#Q Count stats"]
    lines.append(f"record.count={record_count}")
    lines.append("field.names=" + ",".join(field_stats))
    for f_name, st in field_stats.items():
        if "avg_len" in st:
            lines.append(f"f.{f_name}.avg.length={st['avg_len']}")
        for q in qs:
            if f"avg_{q}grams" in st:
                lines.append(f"f.{f_name}.avg.{q}grams.count={st[f'avg_{q}grams']}")
            if f"avg_unique_{q}grams" in st:
                lines.append(
                    f"f.{f_name}.avg.unique.{q}grams.count={st[f'avg_unique_{q}grams']}"
                )
    return "\n".join(lines) + "\n"


def properties_to_stats(text: str) -> dict:
    """Parse the reference's stats .properties (incl. checked-in fixtures)."""
    out: dict = {"fields": {}}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        key, _, val = line.partition("=")
        if key == "record.count":
            out["record_count"] = int(val)
        elif key == "field.names":
            out["field_names"] = val.split(",")
        elif key.startswith("f."):
            parts = key.split(".")
            f_name = parts[1]
            out["fields"].setdefault(f_name, {})[".".join(parts[2:])] = float(val)
    return out
