#!/usr/bin/env python
"""Checkpoint-cadence knee probe for pagerank_fixed (VERDICT r5 item 7).

pagerank_fixed's wall time on small graphs is dominated by per-round
scheduling, and every eager localCheckpoint is one extra job. Cadence k
checkpoints every k-th round: k=1 is the r4 behavior, k=2 the r5 win,
larger k stacks more optimizer-visible rounds per materialization. This
probe times the SAME query plan q_pagerank_purchases runs (customer ↔
supplier purchase graph at $SPARK_GRAFT_SF_DIR) at several cadences,
asserts the integer results are bit-identical across all of them, and
prints one JSON line per cadence. The chosen default lives in
operators/graph.py:pagerank_fixed(checkpoint_every=...).

Usage: python scripts/pagerank_cadence.py [cadence ...] (default 1 2 3 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.operators.graph import pagerank_fixed  # noqa: E402
from canary_weather_etl_spark.plans.registry import load  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 3


def purchase_graph(spark):
    """Same bipartite customer→supplier purchase edge list
    q_pagerank_purchases builds (plans/advanced_sql.py)."""
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    od = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    edges = (
        od.join(li, od["o_orderkey"] == li["l_orderkey"])
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
        .distinct()
    )
    nodes = (edges.select(F.col("src").alias("id"))
             .unionAll(edges.select(F.col("dst").alias("id"))).distinct())
    return edges.localCheckpoint(eager=True), nodes.localCheckpoint(eager=True)


def main() -> None:
    cadences = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 5]
    spark = get_spark("pagerank-cadence")
    spark.range(1000).selectExpr("sum(id)").collect()
    edges, nodes = purchase_graph(spark)

    baseline = None
    for k in cadences:
        best, result = float("inf"), None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            rows = (pagerank_fixed(edges, nodes, checkpoint_every=k)
                    .orderBy("node").collect())
            best = min(best, time.perf_counter() - t0)
            result = [(r["node"], r["units"]) for r in rows]
        if baseline is None:
            baseline = result
        assert result == baseline, (
            f"cadence {k} changed the integer ranks — checkpointing must "
            "be a pure materialization boundary; numbers not trustworthy")
        print(json.dumps({"cadence": k, "best_s": round(best, 3),
                          "n_nodes": len(result), "bit_identical": True}))


if __name__ == "__main__":
    main()
