#!/usr/bin/env python
"""Three-point (1x/10x/100x) scaling probe for the as-of join — SCALE.md's
one 4.4x/decade entry, re-measured across a SECOND decade.

Growth model (same as scripts/bench_scale.py): events amplified by copies
with shifted event_id/user_id — key count grows 10x per decade, per-user
event density constant. That is the natural axis for an as-of join (the
window partitions by user), so per-partition sorted-run length is constant
and the cost should scale with total rows / cluster width, NOT
super-linearly.

Prints one JSON line per scale: rows, best-of-N seconds.

Usage: python scripts/asof_scale.py [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.operators.temporal import asof_join  # noqa: E402
from canary_weather_etl_spark.plans.registry import load  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/asof_scale"
KEYSHIFT = 100_000_000


def amplified_events(spark, mult: int) -> str:
    dst = f"{OUT}/events_{mult}x.parquet"
    if not os.path.exists(f"{dst}/_SUCCESS"):
        base = load(spark, SF_DIR, "events")
        copies = []
        for i in range(mult):
            copies.append(base.withColumn("event_id", F.col("event_id") + F.lit(i * KEYSHIFT))
                              .withColumn("user_id", F.col("user_id") + F.lit(i * KEYSHIFT)))
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        # many-file layout, like a real ingest — avoids the single-file
        # one-input-partition artifact load_par works around
        df.repartition(32).write.mode("overwrite").parquet(dst)
    return dst


def run_asof(spark, path: str, reps: int) -> tuple[int, float]:
    ev = spark.read.parquet(path)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("value").alias("click_value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id", "value"))
    best = float("inf")
    n = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = asof_join(clicks, purchases, on="ts", by="user_id",
                        value_cols=["click_value"])
        # aggregate OVER the carried window columns — a bare count() lets
        # Catalyst prune the unused window expressions and measures only
        # union+filter, which is why a naive probe looks impossibly flat
        row = out.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("click_value_asof").alias("s"),
                      F.sum(F.unix_timestamp("ts_asof")).alias("t")).collect()[0]
        n = row["n"]
        best = min(best, time.perf_counter() - t0)
    return n, best


def main() -> None:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 3

    spark = get_spark("canary-asof-scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the window/last(ignorenulls) path outside the timed region
    run_asof(spark, amplified_events(spark, 1), 1)

    for mult in (1, 10, 100):
        path = amplified_events(spark, mult)
        rows_in = spark.read.parquet(path).count()
        out_rows, best = run_asof(spark, path, reps)
        print(json.dumps({"mult": mult, "events_rows": rows_in,
                          "asof_output_rows": out_rows,
                          "best_sec": round(best, 3), "reps": reps}))


if __name__ == "__main__":
    main()
