"""Local mirror of the driver's correctness gate: run every queries() entry
in Spark AND its oracle_sql() in DuckDB on the same parquet dir; compare row
count, column names, and an order-insensitive value multiset.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6f}"
    except Exception:
        pass
    return str(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_value(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pprl_scaling_framework_spark.sources.session import build_session

    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
            # drop operator-internal caches between queries — 42 queries in
            # one session would otherwise pin every LSH base simultaneously
            from pprl_scaling_framework_spark.ops.bucket_join import release_persists
            release_persists()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:160]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spark_rows)} rows ({dt:.1f}s)")
            if len(spark_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            continue
        sc = [c.lower() for c in spark_cols]
        if sorted(sc) != sorted(duck_cols):
            failures.append(name)
            print(f"FAIL {name}: schema mismatch spark={sc} duck={duck_cols}")
            continue
        ms, md = row_multiset(sc, spark_rows), row_multiset(duck_cols, duck_rows)
        if len(spark_rows) != len(duck_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            _diff(ms, md)
            continue
        if ms != md:
            failures.append(name)
            print(f"FAIL {name}: value mismatch ({len(spark_rows)} rows)")
            _diff(ms, md)
            continue
        print(f"OK   {name}: {len(spark_rows)} rows match ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


def _diff(ms, md, limit=3):
    only_s = [k for k in ms if ms[k] != md.get(k, 0)][:limit]
    only_d = [k for k in md if md[k] != ms.get(k, 0)][:limit]
    for k in only_s:
        print(f"   spark has {ms[k]}x duck has {md.get(k,0)}x: {k}")
    for k in only_d:
        print(f"   duck  has {md[k]}x spark has {ms.get(k,0)}x: {k}")


if __name__ == "__main__":
    main()
