"""As-of join + skew-mitigation queries.

The as-of join is the flagship 'operator Spark lacks' composition (one
union + one window, single shuffle); DuckDB has a native ASOF JOIN, which
makes it fully oracle-checkable. The skew queries prove the salted
rewrites are *semantically invisible*: their oracles are the plain
unsalted SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join, two_phase_agg
from ..operators.temporal import asof_join
from .registry import load, register


@register(
    "q_asof_join",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           p.ts,
           p.value,
           c.value AS click_value_asof,
           c.ts AS ts_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join (operators/temporal.asof_join): for every purchase, the "
        "latest prior click by the same user. Spark composition = tagged "
        "union + last(ignorenulls) over an unbounded-preceding window — one "
        "shuffle, no N×M. Oracle: DuckDB's native ASOF LEFT JOIN.",
    tags=("temporal", "join"), bench=True,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("value").alias("click_value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id", "value"))
    out = asof_join(clicks, purchases, on="ts", by="user_id",
                    value_cols=["click_value"])
    return out.select("event_id", "user_id", "ts", "value",
                      "click_value_asof", "ts_asof")


@register(
    "q_salted_join",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT event_type,
               CASE WHEN event_type IN ('purchase', 'signup') THEN 10.0
                    ELSE 1.0 END AS weight
        FROM events
    )
    SELECT e.event_id, e.event_type, d.weight,
           e.value * d.weight AS weighted
    FROM events e JOIN dim d ON e.event_type = d.event_type
    """,
    doc="Salted join (operators/skew.salted_join): events are heavily "
        "skewed on event_type (5 values); the skewed side is salted into 8 "
        "subkeys and the dim replicated 8x, splitting each hot partition. "
        "The oracle is the PLAIN join — salting must be semantically "
        "invisible.",
    tags=("skew", "join"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dim = (ev.select("event_type").distinct()
           .withColumn("weight",
                       F.when(F.col("event_type").isin("purchase", "signup"),
                              F.lit(10.0)).otherwise(F.lit(1.0))))
    joined = salted_join(ev, dim, key="event_type", salt_factor=8)
    return joined.select(
        "event_id", "event_type", "weight",
        (F.col("value") * F.col("weight")).alias("weighted"),
    )


@register(
    "q_two_phase_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_val,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Two-phase salted aggregation (operators/skew.two_phase_agg): "
        "partial agg on (key, salt) then merge — the manual skew-spread for "
        "hot keys. Decimal-exact partials make the result bit-identical to "
        "the single-phase oracle.",
    tags=("skew", "agg"),
)
def q_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return two_phase_agg(ev, key="event_type", agg_col="value",
                         salt_factor=16)


@register(
    "q_merge_intervals",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e, event_id
        FROM events
    ), flagged AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), numbered AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e, event_id
                   ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT user_id, MIN(s) AS island_start, MAX(e) AS island_end,
           COUNT(*) AS n_intervals
    FROM numbered
    GROUP BY user_id, island
    """,
    doc="Range consolidation (operators/temporal.merge_intervals): each "
        "event projects a half-open activity interval [ts, ts+5min); "
        "overlapping/touching intervals per user merge into maximal "
        "islands. The interval-EXTENT generalization of gaps-and-islands — "
        "session_window only sees point events + a gap, and cannot merge "
        "pre-existing ranges (validity windows, maintenance periods, CDC "
        "effective ranges). One shuffle, two ordered window passes on the "
        "same partitioning, then a partial+final agg.",
    tags=("temporal", "window"),
)
def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id", "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    from ..operators.temporal import merge_intervals
    return merge_intervals(iv, by="user_id", start="s", end="e",
                           tiebreak="event_id")


@register(
    "q_asof_join_staleness",
    oracle="""
    WITH matched AS (
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.value AS click_value_asof, c.ts AS ts_asof
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN ts_asof >= ts - INTERVAL 30 MINUTE
                THEN click_value_asof END AS click_value_asof,
           CASE WHEN ts_asof >= ts - INTERVAL 30 MINUTE
                THEN ts_asof END AS ts_asof
    FROM matched
    """,
    doc="Staleness-bounded as-of join (operators/temporal.asof_join with "
        "max_stale): point-in-time-correct feature retrieval — the latest "
        "prior click per purchase, but only if it is at most 30 minutes "
        "old; a match past its freshness horizon reads as NULL instead of "
        "silently stale (the feature-store correctness rule). Same "
        "single-shuffle union+window plan as q_asof_join; the bound is a "
        "row-wise post-condition, not a second join. Oracle: DuckDB "
        "native ASOF with the same CASE freshness mask.",
    tags=("temporal", "join"),
)
def q_asof_join_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("value").alias("click_value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id", "value"))
    out = asof_join(clicks, purchases, on="ts", by="user_id",
                    value_cols=["click_value"], max_stale="30 minutes")
    return out.select("event_id", "user_id", "ts", "value",
                      "click_value_asof", "ts_asof")
