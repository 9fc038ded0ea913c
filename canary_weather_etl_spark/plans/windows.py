"""Window functions, grouping sets, and temporal windows
(SURVEY.md §2.5, §2.4 grouping-sets row, §2.9).

The reference imports ``pyspark.sql.window.Window`` and never uses it
(README.md:606) — this module ships the implied surface: rank/row_number per
group (the correct answer to the reference Q2's 'best month per location',
which it approximates with LIMIT 10 at README.md:794), rolling means over
daily series, lag/lead day-over-day deltas, plus rollup/cube for the
climatology use-case and tumbling/sliding event-time windows runnable
identically in batch and Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact_avg, exact_sum
from .registry import load, register


@register(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
               CAST(RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="row_number/rank per group — 'best N per key', the window the "
        "reference's Q2 LIMIT-10 approximates (SURVEY.md §2.5). One shuffle "
        "on the partition key, sort within partitions.",
    tags=("window",), bench=True,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_rolling",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS roll_avg7,
           CAST(COUNT(*) OVER w AS BIGINT) AS roll_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="7-row rolling mean per user over the event-time series — the "
        "rolling-analytics surface implied by README.md:606. Decimal-exact "
        "windowed sum → deterministic across engines.",
    tags=("window",),
)
def q_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-6, Window.currentRow))
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id", "user_id",
            (F.sum(F.round(F.col("value") * 100).cast("long")).over(w)
             .cast("double") / 100.0
             / F.count(F.lit(1)).over(w)).alias("roll_avg7"),
            F.count(F.lit(1)).over(w).alias("roll_n"),
        )
    )


@register(
    "q_window_lag_delta",
    oracle="""
    SELECT event_id, user_id, value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS delta_prev,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
    FROM events
    """,
    doc="lag/lead day-over-day deltas (SURVEY.md §2.5). Subtraction of two "
        "stored doubles is deterministic — no rounding needed.",
    tags=("window",),
)
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id", "user_id", "value",
            (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
            F.lead("event_type").over(w).alias("next_type"),
        )
    )


# --- Grouping sets (SURVEY.md §2.4 'cube/rollup' engine surface) -----------

@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="rollup: hierarchical subtotals + grand total. sum_qty is a sum of "
        "small integral-valued doubles → exact in IEEE754, no rounding.",
    tags=("agg", "groupingsets"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
               / COUNT(o_totalprice) AS avg_total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="cube: all grouping-set combinations (climatology-style 'by island, "
        "by month, by both, overall' in one pass).",
    tags=("agg", "groupingsets"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             exact_avg("o_totalprice").alias("avg_total"))
    )


# --- Event-time windows (SURVEY.md §2.9) -----------------------------------
# Same F.window expressions run unchanged under readStream; the streaming
# module wires them with watermarks. Batch-mode here so DuckDB can oracle.

@register(
    "q_events_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time window per type — the streaming-capable "
        "replacement for the reference's monthly micro-batch bucketing "
        "(README.md:812-818).",
    tags=("temporal",), bench=True,
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             exact_sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


@register(
    "q_events_sliding",
    oracle="""
    WITH buckets AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes')
               AS win_start, value FROM events
    )
    SELECT win_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
               AS avg_value
    FROM buckets
    GROUP BY win_start
    """,
    doc="Sliding window (1 h length, 30 min slide): each event lands in two "
        "overlapping windows. Oracle = union of the two aligned bucketings.",
    tags=("temporal",),
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             exact_avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("win_start"), "n", "avg_value")
    )


@register(
    "q_events_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    doc="Session window (30-min gap) per user via F.session_window — "
        "Spark-native sessionization; oracle is the classic gaps-and-islands "
        "rewrite. Streaming-capable with a watermark.",
    tags=("temporal",),
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             exact_sum("value").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n", "sum_value")
    )


@register(
    "q_interval_join_batch",
    oracle="""
    SELECT l.user_id AS user_id,
           l.event_id AS left_event_id, l.ts AS left_ts,
           r.event_id AS right_event_id, r.ts AS right_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL 30 MINUTE
     AND r.ts <= l.ts
    WHERE l.event_type = 'purchase' AND r.event_type = 'click'
    """,
    doc="The stream-stream interval join (streaming/jobs.py "
        "stream_stream_join) exercised THROUGH THE STREAMING OPERATOR in "
        "batch mode — withWatermark is a no-op on batch frames, so the "
        "registered plan is literally the streaming code path: purchases "
        "joined to same-user clicks within the preceding 30 minutes (the "
        "attribution shape). In streaming the time bound lets Spark evict "
        "buffered state past the watermark; here it lets the oracle check "
        "the join semantics exactly.",
    tags=("temporal", "streaming", "join"),
)
def q_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_stream_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    return stream_stream_join(purchases, clicks, key="user_id",
                              max_delay="30 minutes")


@register(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    doc="Explicit GROUPING SETS (the general form of cube/rollup, "
        "SURVEY.md §2.4): chosen subtotal combinations in one pass via "
        "Catalyst's Expand. Spark side runs the same SQL text through the "
        "SQL facade.",
    tags=("agg", "groupingsets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """)


@register(
    "q_window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS priciest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution window family: ntile quartiles, percent_rank, "
        "cume_dist, first/last value per status ordered by price. "
        "percent_rank/cume_dist are exact rationals of row counts — "
        "rounded only to normalize the k/(n-1) division's last bit.",
    tags=("window",),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_orderstatus",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.first("o_orderkey").over(w).alias("cheapest_key"),
            F.last("o_orderkey").over(w_full).alias("priciest_key"),
        )
    )


@register(
    "q_correlated_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated scalar subquery ('orders at >2x their customer's "
        "average') — Catalyst's RewriteCorrelatedScalarSubquery turns the "
        "per-row subquery into one aggregate + join; run through the SQL "
        "facade to exercise that rewrite. AVG comparisons only (no output "
        "floats), so engine-specific AVG noise can't flip the predicate "
        "except at exact 2x boundaries, which the fixture doesn't contain.",
    tags=("sql", "join"),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql("""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders_cs o
        WHERE o.o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders_cs o2
            WHERE o2.o_custkey = o.o_custkey
        )
    """)
