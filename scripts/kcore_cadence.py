#!/usr/bin/env python
"""Checkpoint-cadence A/B for the k-core peel rounds (VERDICT r14 #8).

q_kcore_peel checkpoints the alive set EVERY round (cadence 1): each
round's alive feeds both the next round's two semi-joins and its own
count row, so unmaterialized it would be recomputed by both consumers.
The claim to verify: per-round checkpointing is the round floor, i.e.
halving the cadence (checkpoint every 2nd round, stacking one
re-planned round in between) does not win. Same protocol as the
triangle decade probes: run at sf0.1 and at a bench_scale-amplified dir
(SPARK_GRAFT_SF_DIR=/tmp/bench_10x), reps=3, min, identical cascade
counts asserted across cadences.

Usage: python scripts/kcore_cadence.py [cadence ...]   (default 1 2)
       python scripts/kcore_cadence.py --synth N [cadence ...]

--synth N peels a synthetic dense graph of N nodes instead of the
fixture coactivity graph: blocks of 40 nodes, every same-parity pair
within a block adjacent (degree 19 >= K, so ALL nodes survive ALL
rounds — maximal per-round join work, which is what prices the peel
cadence; amplified events are useless here because the hot-cell cap
zeroes the edge list — SCALE.md r14). ~9.5 edges per node.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.plans.advanced_sql import coactivity_edges  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K, ROUNDS, REPEATS = 15, 4, 3


def peel(ed, cadence: int):
    """q_kcore_peel's peel loop with a checkpoint cadence knob
    (cadence 1 = the shipped per-round shape)."""
    counts, alive = [], None
    for rnd in range(1, ROUNDS + 1):
        if alive is None:
            deg = ed.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        else:
            ax = alive.select(F.col("node").alias("a"))
            bx = alive.select(F.col("node").alias("b"))
            deg = (ed.join(ax, "a").join(bx, "b")
                   .groupBy("a").agg(F.count(F.lit(1)).alias("d")))
        alive = (deg.filter(F.col("d") >= K)
                 .select(F.col("a").alias("node")))
        if rnd % cadence == 0 or rnd == ROUNDS:
            alive = alive.localCheckpoint(eager=True)
        counts.append(alive.agg(F.lit(rnd).alias("round"),
                                F.count(F.lit(1)).alias("n_alive")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def synth_edges(spark, n: int):
    """Blocks of 40 nodes; every same-parity pair within a block is an
    edge (u1 < u2): per-node degree 19 >= K — nothing peels, every
    round does full semi-join work over all n nodes."""
    blocks = spark.range(n // 40).select(F.col("id").alias("blk"))
    ij = spark.createDataFrame(
        [(i, j) for i in range(40) for j in range(i + 1, 40)
         if i % 2 == j % 2], "i int, j int")
    return blocks.crossJoin(F.broadcast(ij)).select(
        (F.col("blk") * 40 + F.col("i")).alias("u1"),
        (F.col("blk") * 40 + F.col("j")).alias("u2"))


def main() -> None:
    args = sys.argv[1:]
    synth_n = None
    if "--synth" in args:
        k = args.index("--synth")
        synth_n = int(args[k + 1])
        args = args[:k] + args[k + 2:]
    cadences = [int(a) for a in args] or [1, 2]
    spark = get_spark("kcore-cadence")
    spark.range(1000).selectExpr("sum(id)").collect()
    src = (synth_edges(spark, synth_n) if synth_n
           else coactivity_edges(spark, SF))
    e0 = src.localCheckpoint(eager=True)
    ed = (e0.select(F.col("u1").alias("a"), F.col("u2").alias("b"))
          .unionAll(e0.select(F.col("u2").alias("a"),
                              F.col("u1").alias("b")))
          .localCheckpoint(eager=True))

    baseline = None
    for cad in cadences:
        best, result = float("inf"), None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            rows = peel(ed, cad).collect()
            best = min(best, time.perf_counter() - t0)
            result = sorted((r["round"], r["n_alive"]) for r in rows)
        if baseline is None:
            baseline = result
        assert result == baseline, f"cadence {cad} changed the cascade"
        print(json.dumps({"graph": f"synth_{synth_n}" if synth_n else SF,
                          "cadence": cad,
                          "best_s": round(best, 3),
                          "cascade": result, "identical": True}))


if __name__ == "__main__":
    main()
