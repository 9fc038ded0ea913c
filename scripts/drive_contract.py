#!/usr/bin/env python
"""Drive the driver contract end-to-end, as the external verify harness does.

Fresh process, VANILLA SparkSession (no tuned factory), importlib-load of
__spark_entry__.py, smoke entry(), then every queries()[name] compared
against oracle_sql()[name] via DuckDB at sf0.01. Exit code 0 iff all match.
"""

from __future__ import annotations

import importlib.util
import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

REPO = "/root/repo"
SF = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        # Do NOT widen to float: the external driver stringifies values
        # post-pandas without decimal normalization, so a Spark DECIMAL
        # ('0') vs a DuckDB decimal surfacing as float64 ('0.0') is a RED
        # row there (CORRECTNESS_r05 q_try_functions). Keeping str() here
        # makes this harness flag the same mismatch instead of hiding it.
        return str(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    print(f"entry() rows: {len(rows)}")
    assert len(rows) > 0, "entry smoke failed"

    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    print(f"queries: {len(qs)}, with oracle: {len(osql)}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")

    # optional argv substrings: run only matching query names
    pats = sys.argv[1:]
    names = [n for n in sorted(qs) if not pats or any(p in n for p in pats)]

    fails = []
    for name in names:
        sdf = qs[name](spark, SF)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_cols = list(sdf.columns)
        if name not in osql:
            print(f"  {name}: rows-only, {len(s_rows)} rows")
            continue
        cur = con.execute(osql[name])
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
        ok = sorted(s_cols) == sorted(d_cols) and len(s_rows) == len(d_rows)
        if ok:
            o1 = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            o2 = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            a = sorted((tuple(norm(r[i]) for i in o1) for r in s_rows), key=str)
            b = sorted((tuple(norm(r[i]) for i in o2) for r in d_rows), key=str)
            ok = a == b
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(s_rows)} rows)")
        if not ok:
            fails.append(name)

    print("FAILS:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
