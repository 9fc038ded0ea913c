#!/usr/bin/env python
"""Scaling probe for the TRIANGLE-ENUMERATION stage alone (SCALE.md).

q_triangle_count has two phases with different scaling laws:
- edge build (co-occurrence blocking): O(Σ cell²), bounded by the
  hot-cell cap — probed via bench_scale on the events fixture;
- triangle enumeration: O(Σ_v deg(v)²) on the resulting graph — probed
  HERE on a synthetic constant-degree circulant graph (node i adjacent to
  i±1..i±d/2 mod N), where scaling N at fixed degree isolates the
  enumeration cost: triangles grow linearly with N, so a scale-healthy
  join shows ~linear wall growth.

Usage: python scripts/triangle_scale.py [N ...]   (default: 100000 1000000)
Prints one JSON line per N.

--skew mode (VERDICT r5 item 5): hub-and-spoke fixture isolating the
ORIENTATION lever. 10 hubs with the SMALLEST ids (0..9) form a clique and
each of N leaves attaches to two hubs — so id-orientation (u1 < u2) gives
every hub an out-degree of ~N/5 and the first compact-forward join builds
Σ out_deg² ≈ 10·(N/5)² wedges (quadratic in N), while
(deg, id)-orientation (operators.graph.orient_by_degree) points every
leaf→hub edge out of the degree-2 leaf, collapsing the wedge count to
~N + hub-clique wedges (linear). Triangle count is exactly N + C(10,3)
under BOTH orientations (asserted). Prints wedge counts + wall per
orientation: python scripts/triangle_scale.py --skew [N ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.operators.graph import (  # noqa: E402
    enumerate_triangles,
    orient_by_degree,
)
from canary_weather_etl_spark.session import get_spark  # noqa: E402

DEGREE = 16  # neighbors per node (d/2 = 8 forward edges per node)


def circulant_edges(spark, n: int):
    """Oriented edge list (u < v) of the circulant graph C_n(1..d/2):
    exactly n*d/2 edges, every node degree d. Triangle count for
    C_n(1..r) with r = d/2 is n*r*(r-1)/2 (each node closes a triangle
    with every ordered offset pair j < k <= r via the chord k-j <= r) —
    asserted exactly in main()."""
    half = DEGREE // 2
    return (
        spark.range(n).select(F.col("id").alias("u"))
        .join(spark.range(1, half + 1).select(F.col("id").alias("k")))
        .select("u", ((F.col("u") + F.col("k")) % n).alias("v"))
        .select(F.least("u", "v").alias("u1"), F.greatest("u", "v").alias("u2"))
        .distinct()
    )


def count_triangles(edges) -> int:
    # the SAME operator q_triangle_count runs — the probe must measure
    # the plan the query ships, not a drifting copy
    return enumerate_triangles(edges).count()


N_HUBS = 10


def hub_spoke_edges(spark, n_leaves: int):
    """Skewed fixture, adversarial for ID-orientation: 10 hubs sit in the
    MIDDLE of the id range (ids n/2 .. n/2+9, complete clique among them)
    and n leaves — half with ids below the hubs, half above — each attach
    to two hubs. Every leaf closes exactly ONE triangle with its two hubs
    (hubs are all adjacent), and the clique adds C(10,3)=120 — total
    n_leaves + 120.

    Why mid-range ids: compact-forward's first join builds a→b→c paths,
    so its row count is Σ_b in_deg(b)·out_deg(b). Under u1<u2 orientation
    a mid-id hub has ~n/10 in-edges (lower-id leaves) AND ~n/10 out-edges
    (higher-id leaves) → ~n²/10 wedge rows total, the quadratic skew
    failure. Degree-orientation points every spoke OUT of its degree-2
    leaf, so hubs keep ≤9 out-edges (clique only) and the wedge count
    collapses to O(n)."""
    mid = n_leaves // 2
    hub_pairs = (
        spark.range(mid, mid + N_HUBS).select(F.col("id").alias("a"))
        .join(spark.range(mid, mid + N_HUBS).select(F.col("id").alias("b")),
              F.col("a") < F.col("b"))
    )
    leaves = (
        spark.range(mid).select(F.col("id").alias("leaf"))
        .unionAll(spark.range(mid + N_HUBS, n_leaves + N_HUBS)
                  .select(F.col("id").alias("leaf")))
    )
    spokes = leaves.select(
        F.col("leaf"),
        F.explode(F.array((F.col("leaf") % N_HUBS) + mid,
                          ((F.col("leaf") + 1) % N_HUBS) + mid)).alias("hub"))
    spoke_edges = spokes.select(F.least("leaf", "hub").alias("a"),
                                F.greatest("leaf", "hub").alias("b"))
    return hub_pairs.unionAll(spoke_edges).select(
        F.col("a").alias("u1"), F.col("b").alias("u2"))


def wedge_count(edges) -> int:
    """Row count of compact-forward's FIRST join (a→b ⨝ b→c on the middle
    node) — the cost driver: Σ_b in_deg(b)·out_deg(b)."""
    e = edges.select("u1", "u2")
    i = e.groupBy(F.col("u2").alias("node")).agg(
        F.count(F.lit(1)).alias("ind"))
    o = e.groupBy(F.col("u1").alias("node")).agg(
        F.count(F.lit(1)).alias("outd"))
    return (i.join(o, "node")
            .select(F.sum(F.col("ind") * F.col("outd"))).collect()[0][0])


def skew_mode(sizes) -> None:
    spark = get_spark("triangle-skew")
    spark.range(1000).selectExpr("sum(id)").collect()
    for n in sizes:
        raw = hub_spoke_edges(spark, n).localCheckpoint(eager=True)
        want = n + N_HUBS * (N_HUBS - 1) * (N_HUBS - 2) // 6
        row = {"n_leaves": n, "triangles_want": want}
        for label, oriented in (
                ("id_order", raw),  # u1 < u2 already holds by construction
                ("deg_order",
                 orient_by_degree(raw).localCheckpoint(eager=True))):
            wedges = int(wedge_count(oriented))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                tri = enumerate_triangles(oriented).count()
                best = min(best, time.perf_counter() - t0)
            assert tri == want, (
                f"{label}: expected {want} triangles, got {tri} — "
                "orientation broke the exactly-once invariant")
            row[f"{label}_wedges"] = wedges
            row[f"{label}_best_s"] = round(best, 3)
        print(json.dumps(row))


def main() -> None:
    if "--skew" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--skew"]
        skew_mode([int(a) for a in args] or [100_000, 300_000])
        return
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("triangle-scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    for n in sizes:
        edges = circulant_edges(spark, n).localCheckpoint(eager=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            tri = count_triangles(edges)
            best = min(best, time.perf_counter() - t0)
        r = DEGREE // 2
        want = n * r * (r - 1) // 2
        assert tri == want, (
            f"C_{n}(1..{r}) must have {want} triangles, got {tri} — "
            "edge build or enumeration is broken; numbers not trustworthy")
        print(json.dumps({"n_nodes": n, "n_edges": edges.count(),
                          "triangles": tri, "best_s": round(best, 3)}))


if __name__ == "__main__":
    main()
