"""Count-min sketch as a mergeable DataFrame artifact (SURVEY.md §2.11 /
§2.4 approx-sketch family, alongside the HLL sketch table of
q_hll_sketch_merge).

A CMS answers "approximately how often does item x occur?" in
depth × width integer cells — fixed KBs regardless of input size — with
the one-sided guarantee est ≥ true, and est ≤ true + εN (ε = e/width)
with probability 1 − e^(−depth) per probe. Unlike Spark's built-in
`count_min_sketch` aggregate (an opaque binary with no SQL estimator),
this one materializes the sketch as a (d, w, cnt) TABLE:

- built in one pass: per row, explode `depth` seeded (row, bucket)
  coordinates (xxhash64(item, seed_d) mod width) and hash-aggregate —
  map-side partial combine does most of the summing, the shuffle carries
  at most depth·width rows;
- mergeable by construction: sketches of two corpus shards combine with
  a plain groupBy(d, w).sum(cnt) — the pre-aggregated-sketch-table
  pattern that lets a 100 TB frequency dashboard update incrementally
  without rescanning history;
- estimable in SQL: probe items equi-join the table on (d, w), min over
  depth rows. Absent cells coalesce to 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _coords(item: F.Column, width: int, depth: int) -> F.Column:
    """array<struct<d, w>> of the item's sketch coordinates, one per
    seeded hash row. xxhash64's seed argument gives depth independent
    hash functions; pmod keeps buckets non-negative."""
    return F.array(*[
        F.struct(F.lit(d).alias("d"),
                 F.pmod(F.xxhash64(item, F.lit(d)), F.lit(width)).alias("w"))
        for d in range(depth)
    ])


def cms_build(df: DataFrame, item_col: str,
              width: int = 2048, depth: int = 4) -> DataFrame:
    """One-pass CMS build → (d, w, cnt) rows (≤ depth·width of them)."""
    return (
        df.select(F.explode(_coords(F.col(item_col), width, depth))
                  .alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union shard sketches and re-sum cells — exact merge (CMS cells are
    plain counters), KB-sized inputs regardless of original data size."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str,
                 width: int = 2048, depth: int = 4) -> DataFrame:
    """Point-query every item: explode its depth coordinates, left-join
    the sketch on (d, w) — the sketch side is tiny, so this broadcasts —
    and take the min cell as the estimate. Returns (item_col, est)."""
    probes = (
        items.select(item_col).distinct()
        .select(item_col,
                F.explode(_coords(F.col(item_col), width, depth)).alias("c"))
        .select(item_col, F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "w"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
