#!/usr/bin/env python
"""Ad-hoc single-query differential check: same normalization as
drive_contract.py, but only for the query names passed on argv —
the fast inner loop while developing a new registry entry."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

sys.path.insert(0, "/root/repo/scripts")
from drive_contract import TABLES, norm  # noqa: E402

SF = "/root/testdata/sf0.01"


def main(names: list[str]) -> int:
    from canary_weather_etl_spark.plans import REGISTRY
    from canary_weather_etl_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    fails = []
    for name in names:
        spec = REGISTRY[name]
        sdf = spec.fn(spark, SF)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_cols = list(sdf.columns)
        if spec.oracle is None:
            print(f"  {name}: rows-only, {len(s_rows)} rows")
            continue
        cur = con.execute(spec.oracle)
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
        ok = sorted(s_cols) == sorted(d_cols) and len(s_rows) == len(d_rows)
        if not ok:
            print(f"  {name}: SHAPE spark {len(s_rows)}x{sorted(s_cols)} "
                  f"vs oracle {len(d_rows)}x{sorted(d_cols)}")
        else:
            o1 = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            o2 = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            a = sorted((tuple(norm(r[i]) for i in o1) for r in s_rows),
                       key=str)
            b = sorted((tuple(norm(r[i]) for i in o2) for r in d_rows),
                       key=str)
            ok = a == b
            if not ok:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"  {name}: VALUE diff (first 3): {diff}")
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(s_rows)} rows)")
        if not ok:
            fails.append(name)
    print("FAILS:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
