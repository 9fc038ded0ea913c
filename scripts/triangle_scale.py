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


def main() -> None:
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
