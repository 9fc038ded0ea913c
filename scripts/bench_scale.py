#!/usr/bin/env python
"""Second-decade bench point for the headline queries (SCALE.md evidence).

Amplifies every table a headline (bench=True) query touches to Mx sf0.1
under /tmp/bench_{M}x/, preserving join relationships:

- lineitem/orders/customer: copy i shifts the orderkey/custkey PK-FK pairs
  by i*KEYSHIFT (joins stay 1:N within a copy, never across copies);
  c_nationkey is NOT shifted, so dimension joins (nation/region, copied
  verbatim) still resolve.
- events: copy i shifts event_id and user_id — 10x more users at the same
  per-user event density, the natural growth model for as-of/range joins
  and sessionization (per-key work constant, key count grows).
- documents: copy i shifts doc_id and prefixes EVERY token (same rule as
  scripts/scale_probe.py) so copies share no shingles — near-dup pair
  counts grow linearly, not quadratically.
- embeddings: copy i shifts vec_id; the fixture query set (vec_id < 5)
  stays 5 queries against a 10x corpus.

Then runs each headline query at sf0.1 and at the amplified dir in ONE
warm session (best-of-N, default 2) and prints one JSON line per scale
with per-query seconds — the input for SCALE.md's measured-decades table.

Usage: python scripts/bench_scale.py [--reps N] [--mult M] [--force]
                                     [--only q_a,q_b,...]

--force swaps the collect() sink for a one-row xxhash64-of-all-columns
aggregate: full computation, no driver result serialization — use it to
tell "the operator scales" apart from "the output I collect grows".
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.plans import REGISTRY  # noqa: E402
from canary_weather_etl_spark.plans.registry import load  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYSHIFT = 100_000_000  # far above any sf0.1 key

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
# (table, columns to shift per copy)
SHIFTS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def amplify(spark, mult: int, tables: tuple[str, ...] = TABLES) -> str:
    # mult-scoped dir: a fixed path + _DONE marker would silently hand a
    # --mult 100 run the cached 10x tables
    out_dir = f"/tmp/bench_{mult}x"
    # the global _DONE only vouches for the FULL table set; a partial
    # build (e.g. an embeddings-only third-decade dir) resumes from the
    # per-table markers instead of silently serving missing tables
    if all(os.path.exists(f"{out_dir}/_DONE_{t}") for t in tables):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t in tables:
        dst = f"{out_dir}/{t}.parquet"
        # per-table marker: third-decade builds run tens of minutes, so a
        # killed build resumes at the first unwritten table
        if os.path.exists(f"{out_dir}/_DONE_{t}"):
            continue
        # registry.load handles events' TIMESTAMP(NANOS) rebuild; the
        # amplified copy is written back as standard micros
        base = load(spark, SF_DIR, t)
        if t not in SHIFTS:
            base.write.mode("overwrite").parquet(dst)
            open(f"{out_dir}/_DONE_{t}", "w").close()
            continue
        # crossJoin with a copy-index range instead of a mult-way union:
        # identical rows (shift cols by i*KEYSHIFT, prefix doc tokens with
        # c{i}x), but the plan stays O(1) nodes — a 1000-way unionByName
        # chain makes analysis itself the bottleneck at the third decade
        copies = spark.range(mult).select(F.col("id").alias("__copy"))
        df = base.crossJoin(F.broadcast(copies))
        for col in SHIFTS[t]:
            df = df.withColumn(col, F.col(col)
                               + F.col("__copy") * F.lit(KEYSHIFT))
        if t == "documents":
            repl = F.concat(F.lit("c"), F.col("__copy").cast("string"),
                            F.lit("x$1"))
            df = df.withColumn(
                "text", F.regexp_replace(F.col("text"), F.lit(r"(\S+)"),
                                         repl))
        df = df.drop("__copy")
        df.write.mode("overwrite").parquet(dst)
        open(f"{out_dir}/_DONE_{t}", "w").close()
    if all(os.path.exists(f"{out_dir}/_DONE_{t}") for t in TABLES):
        open(os.path.join(out_dir, "_DONE"), "w").close()
    return out_dir


def run_set(spark, sf_dir: str, reps: int, force: bool = False,
            only: set[str] | None = None) -> dict[str, float]:
    """force=True replaces .collect() with a full-computation hash sink
    (sum of xxhash64 over every output column → ONE row): the operator
    still computes everything (no column pruning — xxhash64 consumes all
    columns), but driver-side result serialization is out of the
    measurement. collect() ratios conflate the two: a query whose OUTPUT
    grows 10x pays 10x row-pickling on the driver even when the
    distributed plan scales flat."""
    timings = {}
    for name, spec in REGISTRY.items():
        # --only names override the bench flag: scale probes for queries
        # outside the headline set are run by naming them explicitly
        if (name not in only) if only else (not spec.bench):
            continue
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            if force:
                # bit_xor, not sum: the session runs ANSI mode and a long
                # sum of 64-bit hashes overflows
                df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("h")).collect()
            else:
                df.collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    return timings


def main() -> None:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 2
    mult = int(args[args.index("--mult") + 1]) if "--mult" in args else 10
    force = "--force" in args
    only = (set(args[args.index("--only") + 1].split(","))
            if "--only" in args else None)
    # --tables a,b: amplify only this subset (third-decade builds run
    # tens of minutes per table; a probe of one documents-only query
    # should not pay for lineitem). The probed queries must touch only
    # amplified tables — missing ones fail loudly at read.
    tables = (tuple(args[args.index("--tables") + 1].split(","))
              if "--tables" in args else TABLES)

    spark = get_spark("canary-bench-scale")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up

    big = amplify(spark, mult, tables=tables)
    for label, d in (("sf0.1", SF_DIR), (f"{mult}x sf0.1", big)):
        t = run_set(spark, d, reps, force=force, only=only)
        print(json.dumps({"scale": label, "sink": "hash" if force else "collect",
                          "total": round(sum(t.values()), 3),
                          "queries": t}))


if __name__ == "__main__":
    main()
