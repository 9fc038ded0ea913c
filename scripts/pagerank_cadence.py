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

r15 (VERDICT r14 #3): also runs at the second decade by pointing
$SPARK_GRAFT_SF_DIR at a bench_scale-amplified dir (e.g.
/tmp/bench_10x — ~10M directed edges vs ~1M at sf0.1), and accepts
--layout-off to re-pin the static-side layout win on the current tree:
the variant feeds pagerank the SAME algorithm but skips the fused
repartition("src") + window-degree + sortWithinPartitions build, so
every round re-exchanges and re-sorts the edge-sized side (the r12
lesson, measured 337 -> 184 s at the 100x decade when it first landed).
Bit-identical results asserted across every variant.
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


def pagerank_layout_off(edges, nodes, iterations: int = 5,
                        checkpoint_every: int = 3):
    """pagerank_fixed's exact integer algorithm WITHOUT the fused
    static-side layout (no repartition('src'), degree via groupBy +
    join-back instead of the window, no sortWithinPartitions): the
    pre-r12 shape, kept here as the probe's layout control so the
    layout win stays pinned on the current tree."""
    ed = (edges.select(F.col("src"), F.col("dst"))
          .join(edges.groupBy("src").agg(
              F.count(F.lit(1)).alias("out_deg")), "src")
          .localCheckpoint(eager=True))
    unit_scale, damping_num, damping_den = 1_000_000, 17, 20
    base_units = (unit_scale * (damping_den - damping_num)) // damping_den
    ranks = (nodes.select(F.col("id").alias("node")).distinct()
             .withColumn("units", F.lit(unit_scale).cast("long"))
             .localCheckpoint(eager=True))
    for it in range(iterations):
        contrib = (ed.join(ranks, ed["src"] == ranks["node"])
                   .select(F.col("dst"),
                           F.expr("units div out_deg").alias("c")))
        agg = contrib.groupBy("dst").agg(F.sum("c").alias("mass"))
        ranks = (ranks.select("node")
                 .join(agg, ranks["node"] == agg["dst"], "left")
                 .select("node",
                         (F.lit(base_units).cast("long")
                          + F.expr(f"({damping_num} * coalesce(mass, 0L)) "
                                   f"div {damping_den}")).alias("units")))
        if it % checkpoint_every == checkpoint_every - 1 \
                or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def main() -> None:
    layout_off = "--layout-off" in sys.argv
    cadences = [int(a) for a in sys.argv[1:]
                if not a.startswith("-")] or [1, 2, 3, 5]
    spark = get_spark("pagerank-cadence")
    spark.range(1000).selectExpr("sum(id)").collect()
    edges, nodes = purchase_graph(spark)
    fn = pagerank_layout_off if layout_off else pagerank_fixed

    baseline = None
    for k in cadences:
        best, result = float("inf"), None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            rows = (fn(edges, nodes, checkpoint_every=k)
                    .orderBy("node").collect())
            best = min(best, time.perf_counter() - t0)
            result = [(r["node"], r["units"]) for r in rows]
        if baseline is None:
            baseline = result
            if layout_off:
                # cross-variant pin: the layout control must reproduce
                # pagerank_fixed's integer ranks bit-for-bit
                ref = [(r["node"], r["units"]) for r in
                       pagerank_fixed(edges, nodes, checkpoint_every=k)
                       .orderBy("node").collect()]
                assert ref == baseline, "layout-off variant changed ranks"
        assert result == baseline, (
            f"cadence {k} changed the integer ranks — checkpointing must "
            "be a pure materialization boundary; numbers not trustworthy")
        print(json.dumps({"sf_dir": SF, "layout": "off" if layout_off
                          else "fused", "cadence": k,
                          "best_s": round(best, 3),
                          "n_nodes": len(result), "bit_identical": True}))


if __name__ == "__main__":
    main()
