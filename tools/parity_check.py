"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, column names, and order-insensitive values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from phonlp_spark.pipeline.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entry.queries(), entry.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_bad += 1
            continue
        if name not in os_:
            print(f"rows  {name}: {len(rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(os_[name])
            ocols = [c for c in res.columns]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_bad += 1
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(cols)} != {sorted(ocols)}")
            n_bad += 1
            continue
        a, b = rows_key(rows, cols), rows_key(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL  {name}: row count {len(a)} != {len(b)}")
            n_bad += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, e.g. {diff}")
            n_bad += 1
        else:
            print(f"OK    {name}: {len(a)} rows [{time.time()-t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
