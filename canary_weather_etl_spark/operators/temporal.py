"""Temporal joins the reference lacks but a time-series engine needs
(SURVEY.md §2.3 notes the reference delegates all physical join choice;
as-of/range are the operators Spark itself has no built-in for — composed
here from existing DataFrame ops, per the custom-operator ladder).

As-of join, Spark-shaped: instead of a per-row subquery ("latest left row
at or before each right row"), union both sides with a tag, sort within the
key partition by time, and carry the last-seen left value forward with
`last(..., ignorenulls=True)` over an unbounded-preceding window. One
shuffle (by key), no N×M blow-up, no skew beyond the key's own — the same
plan shape at 100 TB as at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              value_cols: list[str] | None = None,
              suffix: str = "_asof",
              max_stale: str | None = None) -> DataFrame:
    """For each row of `right`, attach the most recent `left` row with
    left.on <= right.on, matched per `by` key. Right rows with no prior
    left row keep nulls (ASOF LEFT JOIN semantics, as in DuckDB).

    value_cols: left columns to carry (default: all but on/by). Right's own
    payload columns ride through the union untouched — single pass, one
    shuffle, no re-join.

    max_stale: optional SQL interval string (e.g. ``'30 minutes'``). When
    set, a carried match older than ``right.on - max_stale`` is NULLed out
    — point-in-time-correct feature-store semantics (a feature value past
    its freshness horizon must read as absent, not silently stale). Rows
    are kept (LEFT semantics); only the carried columns go NULL. Same
    single-shuffle plan: the bound is a row-wise post-filter on the
    window output, not a second join.
    """
    value_cols = value_cols or [c for c in left.columns if c not in (on, by)]
    right_payload = [c for c in right.columns if c not in (on, by)]

    l = left.select(
        F.col(by), F.col(on),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_payload],
        F.lit(0).alias("__side"),
    )
    r = right.select(
        F.col(by), F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in value_cols],
        *[F.col(c) for c in right_payload],
        F.lit(1).alias("__side"),
    )
    merged = l.unionByName(r)

    # left rows sort before right rows at equal timestamps so an exact-tie
    # left row is visible to the right row (<= semantics)
    w = (Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.select(
        by, on, "__side", *right_payload,
        *[F.last(c, ignorenulls=True).over(w).alias(f"{c}{suffix}")
          for c in value_cols],
        F.last(F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True)
         .over(w).alias(f"{on}{suffix}"),
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if max_stale is not None:
        fresh = (F.col(f"{on}{suffix}")
                 >= F.col(on) - F.expr(f"INTERVAL {max_stale}"))
        out = out.select(
            by, on, *right_payload,
            *[F.when(fresh, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
              for c in value_cols],
            F.when(fresh, F.col(f"{on}{suffix}")).alias(f"{on}{suffix}"),
        )
    return out


def merge_intervals(df: DataFrame, by: str, start: str, end: str,
                    tiebreak: str | None = None) -> DataFrame:
    """Consolidate overlapping/touching half-open intervals [start, end)
    per `by` key into maximal disjoint islands (range consolidation — the
    interval-extent generalization of gaps-and-islands, which Spark has no
    built-in for; session_window only handles point events + a gap).

    Plan shape: one shuffle (partitionBy key), two ordered window passes
    over that same partitioning (running max-end, then running island
    counter — no re-shuffle between them), then a partial+final group-by
    on (key, island). Per-key state is O(1) per row in the window; islands
    never cross keys, so 100 TB scales with key cardinality, and a skewed
    key costs one sorted partition, not a cross-join.

    Returns one row per island: by, island_start, island_end, n_intervals.
    """
    tb = [F.col(tiebreak).asc()] if tiebreak else []
    w = Window.partitionBy(by).orderBy(
        F.col(start).asc(), F.col(end).asc(), *tb)
    # an interval starts a new island iff it begins strictly after every
    # earlier interval has ended; max-end over the preceding frame is NULL
    # on the first row of a key → also a new island
    prev_max_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start) > prev_max_end), 1).otherwise(0)
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn("__island", island)
        .groupBy(by, "__island")
        .agg(F.min(start).alias("island_start"),
             F.max(end).alias("island_end"),
             F.count(F.lit(1)).alias("n_intervals"))
        .drop("__island")
    )


def sessionize(df: DataFrame, by: str, ts: str, gap_sec: int,
               tiebreak: str | None = None) -> DataFrame:
    """Assign STABLE session ids per `by` key: a new session starts when
    the gap since the previous event exceeds `gap_sec`. Returns the input
    rows plus a `session_id` column (1-based per key) — the joinable form
    of sessionization that `session_window` (aggregate-only) cannot give.

    Plan: one shuffle on the key, two ordered window passes over that same
    partitioning (lag → running sum of new-session flags); per-key state
    is O(1) per row. A skewed key costs one sorted partition."""
    tb = [F.col(tiebreak).asc()] if tiebreak else []
    w = Window.partitionBy(by).orderBy(F.col(ts).asc(), *tb)
    prev = F.lag(ts).over(w)
    # microsecond gap, not unix_timestamp: unix_timestamp truncates to
    # whole seconds, so a true gap of 1800.4s would compare as 1800 and
    # NOT break the session while an exact-interval reference (the DuckDB
    # oracle's `ts - prev > INTERVAL`) would — boundary-row divergence on
    # any fixture with sub-second timestamps (all of them)
    gap_us = F.unix_micros(F.col(ts)) - F.unix_micros(prev)
    new_sess = F.when(
        prev.isNull() | (gap_us > gap_sec * 1_000_000), 1).otherwise(0)
    session_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn("session_id", session_id)
