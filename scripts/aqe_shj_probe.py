#!/usr/bin/env python
"""AQE sort-merge -> shuffled-hash join experiment (VERDICT r14 #5,
guide §3.1), re-run in a verified zero-steal window.

Both knobs are runtime-settable SQL confs, so the A/B/A alternation
runs inside ONE session (no session-shape confound):

  A: session defaults (preferSortMergeJoin=true, SHJ threshold 0)
  B: spark.sql.join.preferSortMergeJoin=false
     + spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
     (AQE converts an SMJ to SHJ when every post-shuffle partition's
     build side is under the threshold — runtime-actual-size guarded)

Join-heavy five + two non-join CONTROLS, reps per leg, min reported,
TWO A legs bracket the B leg so host drift shows up as A1 != A2. After
the timing legs, one extra run per query under B records whether the
final adaptive plan actually contains a ShuffledHashJoin (a conf that
never changes the plan cannot be credited or blamed).

Usage: python scripts/aqe_shj_probe.py [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canary_weather_etl_spark.plans import REGISTRY  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
JOINS = ("q_join_inner_fact", "q_star_join_revenue", "q_tpch_q5",
         "q_tpch_q18", "q_asof_join")
CONTROLS = ("q_window_rank", "q1_groupby_avg")


def set_shj(spark, on: bool) -> None:
    spark.conf.set("spark.sql.join.preferSortMergeJoin",
                   "false" if on else "true")
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m" if on else "0")


def leg(spark, reps: int) -> dict[str, float]:
    out = {}
    for name in JOINS + CONTROLS:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 3
    spark = get_spark("aqe-shj-probe")
    from bench import warm_up
    warm_up(spark)

    legs = []
    for tag, on in (("A1", False), ("B", True), ("A2", False)):
        set_shj(spark, on)
        spark.sparkContext.setJobDescription(f"aqe-shj leg {tag}")
        legs.append((tag, on, leg(spark, reps)))
        spark.sparkContext.setJobDescription(None)
    set_shj(spark, True)
    plans = {}
    for name in JOINS:
        df = REGISTRY[name].fn(spark, SF)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        plans[name] = {"shj": p.count("ShuffledHashJoin"),
                       "smj": p.count("SortMergeJoin"),
                       "bhj": p.count("BroadcastHashJoin")}
    set_shj(spark, False)
    for tag, on, t in legs:
        print(json.dumps({"leg": tag, "shj_conf": on, "mins": t}))
    print(json.dumps({"final_plans_under_B": plans}))


if __name__ == "__main__":
    main()
