"""Skew mitigation utilities (SURVEY.md §4.3: the fixture key domains are
tiny — 14 locations, 5 event types — so aggregations and joins keyed on
them are skew-prone at scale).

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py), which splits oversized shuffle partitions at
runtime. These helpers cover the cases AQE can't fix:

- `salted_join`: a shuffled join where ONE side has heavy keys — salt the
  heavy side's key into `salt_factor` subkeys and explode the other side to
  all subkeys, turning one hot partition into `salt_factor` even ones.
- `two_phase_agg`: aggregation on a hot key — pre-aggregate on
  (key, salt) then merge, so no single reducer sees the whole hot key.
  (Spark's partial aggregation usually does this for algebraic aggs; the
  helper exists for aggregates that don't combine partially, e.g.
  collect_set-style, or when partial agg is defeated by high upstream
  cardinality.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the skewed side salted.

    skewed gets a random-but-deterministic salt in [0, salt_factor);
    `other` is replicated salt_factor× (explode of a literal range) so every
    (key, salt) bucket finds its match. Correct for inner/left joins keyed
    on `key`; the replication cost is salt_factor×|other| — use when
    `other` is the smaller side but too big to broadcast.
    """
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt_factor)).cast("int"))
    salted_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])))
    out = salted_l.join(salted_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def two_phase_agg(df: DataFrame, key: str, agg_col: str,
                  salt_factor: int = 16, scale: int = 2) -> DataFrame:
    """SUM/COUNT on a hot key via explicit salting: phase 1 aggregates on
    (key, salt) — spreading one hot key over salt_factor reducers — phase 2
    merges the partials. Output: (key, sum_val: double, n).

    Sums in exact integer units (10^scale) so the two-phase reduction is
    exactly equal to a single-phase sum regardless of salt assignment
    (double sums would drift in the last bits with the grouping)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt_factor)).cast("int"))
    factor = 10 ** scale
    units = F.round(F.col(agg_col) * factor).cast("long")
    partial = (salted.groupBy(key, "__salt")
               .agg(F.sum(units).alias("__s"), F.count(F.lit(1)).alias("__n")))
    return (partial.groupBy(key)
            .agg((F.sum("__s").cast("double") / float(factor)).alias("sum_val"),
                 F.sum("__n").alias("n")))
