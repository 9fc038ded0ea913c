"""Distributed global ranking: contiguous 0-based global rank over a total
order WITHOUT a single-partition window.

`Window.orderBy(...)` (no partitionBy) funnels every row through one task —
the classic scale-killer this repo's heavy-hitters fix removed. For ranks
over the full table the scalable construction is:

1. `repartitionByRange` on the order key — partitions tile the total order
   (partition i's keys all precede partition i+1's).
2. per-partition counts → cumulative offsets (one tiny driver-side list,
   O(#partitions), same class as a broadcast dim).
3. rank = per-partition `row_number` (window partitioned by partition id —
   fully parallel) + the partition's offset.

Two jobs over the data instead of one single-threaded sort: at 100 TB the
count pass is a metadata-cheap scan and the rank pass is embarrassingly
parallel. Determinism requires the order to be total — pass a tie-breaking
key column list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.litexpr import int_map_sql


def global_rank(df: DataFrame, order: list[Column],
                n_partitions: int | None = None,
                out_col: str = "global_rank") -> DataFrame:
    """Attach a contiguous 0-based global rank under `order` (must be a
    total order — include a unique tie-break column). Explicit
    `n_partitions` pins the range partitioning (exempt from AQE
    coalescing); defaults to the session's shuffle parallelism."""
    from pyspark.sql import Window

    n = n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    # localCheckpoint (eager) pins the range partitioning: RangePartitioner
    # SAMPLES its boundaries, so the count job and the rank job would
    # otherwise see different partitionings of a recomputed frame (ranks
    # then gap or collide — observed, not hypothetical). Unlike cache(),
    # a checkpoint severs lineage: if the materialized blocks are lost the
    # job FAILS instead of silently recomputing with fresh boundaries
    # (ADVICE r2 — cache eviction yielded gapped/duplicated ranks), and the
    # blocks are released when the frame is garbage-collected rather than
    # accumulating across calls. At production scale a staged table write
    # gives the same pinning with executor-loss resilience.
    ranged = (df.repartitionByRange(int(n), *order)
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))

    # offsets: one row per partition — driver-side scalars, O(#partitions)
    counts = {r["__pid"]: r["n"] for r in
              ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.element_at(
        F.expr(int_map_sql(offsets)), F.col("__pid"))

    w = Window.partitionBy("__pid").orderBy(*order)
    return (ranged
            .withColumn(out_col,
                        (F.row_number().over(w) - 1 + offset_expr)
                        .cast("bigint"))
            .drop("__pid"))


def global_cumsum(df: DataFrame, order: list[Column], value: str,
                  n_partitions: int | None = None,
                  out_col: str = "global_cumsum") -> DataFrame:
    """Attach an inclusive global prefix sum of integer column `value`
    under `order` (must be a total order) WITHOUT a single-partition
    window — the same range-partition + per-partition-offset
    construction as global_rank, with per-partition SUMS instead of
    counts as the offsets. Exact for integer values (BIGINT adds in
    each partition-local window + one exact offset add); the offset
    list is O(#partitions) driver-side scalars.

    The scalable twin of ``SUM(x) OVER (ORDER BY ...)`` — which Spark
    executes on ONE task (WindowExec warns "Moving all data to a single
    partition"). Used by q_abc_classification's Lorenz-curve classes.
    """
    from pyspark.sql import Window

    n = n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    ranged = (df.repartitionByRange(int(n), *order)
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))

    sums = {r["__pid"]: r["s"] for r in
            ranged.groupBy("__pid")
            .agg(F.sum(value).cast("long").alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    offset_expr = F.element_at(
        F.expr(int_map_sql(offsets)), F.col("__pid"))

    w = (Window.partitionBy("__pid").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ranged
            .withColumn(out_col,
                        (F.sum(value).over(w) + offset_expr)
                        .cast("bigint"))
            .drop("__pid"))
