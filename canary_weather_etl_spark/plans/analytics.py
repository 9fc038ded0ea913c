"""Advanced analytics queries: range join, hypertable-style multi-
granularity rollups, percentiles (exact + sketch), statistical moments.

Range join strategy (the task's 'operator Spark lacks' ladder, rung (a) —
composition of existing ops): a naive |ts_a − ts_b| ≤ δ join is a cross
product with a filter. The scale shape buckets both sides into δ-wide time
buckets, equi-joins each left bucket to its right bucket and the two
adjacent ones, then applies the exact predicate — candidate set shrinks
from N×M to only temporally-close pairs, and the join is a plain shuffled
equi-join (AQE-skew-splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round_det
from .registry import load, register


@register(
    "q_range_join",
    oracle="""
    SELECT e.event_id AS err_id,
           p.event_id AS buy_id,
           e.user_id,
           CAST(date_diff('millisecond', p.ts, e.ts) AS BIGINT) AS lag_ms
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts BETWEEN e.ts - INTERVAL '10 minutes' AND e.ts
    """,
    doc="Range join: purchases within the 10 minutes preceding each error "
        "by the same user. Spark composition: bucket both sides into "
        "10-minute epochs, equi-join on (user, bucket) ∪ (user, bucket−1), "
        "then exact BETWEEN filter — no cross product, plain shuffled "
        "equi-join.",
    tags=("temporal", "join"), bench=True,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    delta_ms = 10 * 60 * 1000
    err = (ev.filter(F.col("event_type") == "error")
           .select(F.col("event_id").alias("err_id"), "user_id",
                   F.col("ts").alias("e_ts")))
    buy = (ev.filter(F.col("event_type") == "purchase")
           .select(F.col("event_id").alias("buy_id"),
                   F.col("user_id").alias("b_user"),
                   F.col("ts").alias("p_ts")))

    def bucket(c):
        return F.floor(F.unix_millis(c) / delta_ms).cast("bigint")

    # each error probes its own bucket and the previous one — any purchase
    # within [e_ts - δ, e_ts] lives in one of the two
    err_b = err.withColumn(
        "bkt", F.explode(F.array(bucket(F.col("e_ts")),
                                 bucket(F.col("e_ts")) - 1)))
    buy_b = buy.withColumn("bkt_r", bucket(F.col("p_ts")))
    return (
        err_b.join(buy_b,
                   (F.col("user_id") == F.col("b_user"))
                   & (F.col("bkt") == F.col("bkt_r")))
        .filter((F.col("p_ts") <= F.col("e_ts"))
                & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES")))
        .select("err_id", "buy_id", "user_id",
                (F.unix_millis("e_ts") - F.unix_millis("p_ts")).alias("lag_ms"))
        .distinct()
    )


@register(
    "q_time_rollup",
    oracle="""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
               'hour' AS granularity,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 3
    ), daily AS (
        SELECT time_bucket(INTERVAL '1 day', ts) AS bucket_start,
               'day' AS granularity,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 3
    )
    SELECT * FROM hourly UNION ALL SELECT * FROM daily
    """,
    doc="Hypertable-style multi-granularity rollup: hourly and daily "
        "continuous-aggregate views in one result (the daily tier is "
        "re-aggregated from the hourly partials — at 100 TB the coarse "
        "tiers cost one extra tiny shuffle, not a second scan).",
    tags=("temporal", "agg"),
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long")).alias("_sum_cents"))
        .select(F.col("w.start").alias("bucket_start"), "event_type",
                "n", "_sum_cents")
    )
    # daily tier: merge the hourly partials (no second scan of events)
    daily = (
        hourly.groupBy(F.window("bucket_start", "1 day").alias("w"),
                       "event_type")
        .agg(F.sum("n").alias("n"), F.sum("_sum_cents").alias("_sum_cents"))
        .select(F.col("w.start").alias("bucket_start"), "event_type",
                "n", "_sum_cents")
    )
    out_h = hourly.select("bucket_start", F.lit("hour").alias("granularity"),
                          "event_type", "n",
                          (F.col("_sum_cents").cast("double") / 100.0).alias("sum_value"))
    out_d = daily.select("bucket_start", F.lit("day").alias("granularity"),
                         "event_type", "n",
                         (F.col("_sum_cents").cast("double") / 100.0).alias("sum_value"))
    return out_h.unionByName(out_d)


@register(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           FLOOR(quantile_cont(o_totalprice, 0.5) * 1e4 + 0.5) / 1e4 AS p50,
           FLOOR(quantile_cont(o_totalprice, 0.9) * 1e4 + 0.5) / 1e4 AS p90,
           MIN(o_totalprice) AS mn,
           MAX(o_totalprice) AS mx
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (median, p90) per group — Spark "
        "`percentile` ≡ DuckDB `quantile_cont`. round_det at 4: the linear "
        "interpolation carries real cross-engine noise, and floor-form "
        "rounding removes the tie-rule mismatch; min/max are exact.",
    tags=("agg", "stats"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            round_det(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            round_det(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
    )


@register(
    "q_approx_percentile",
    oracle=None,  # sketch-based by construction
    doc="approx_percentile (KLL-ish sketch) — the 100 TB percentile path; "
        "exactness traded for a single pass + fixed memory. Accuracy vs "
        "exact asserted in tests/test_scale_ops.py. The sketch's "
        "array<double> result is projected to scalar columns: the driver's "
        "canonicalizer pandas-sorts result cells and cannot hash list cells "
        "(the q_agg_collect failure class from round 2).",
    tags=("agg", "stats", "approx"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)")
             .alias("approx_p"))
        .select(
            "o_orderstatus",
            F.col("approx_p")[0].alias("p50_approx"),
            F.col("approx_p")[1].alias("p90_approx"),
        )
    )


@register(
    "q_stats_moments",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))
                    * CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS s2,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))
                    * CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
               / COUNT(*))
             / (COUNT(*) - 1) AS variance
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical moments from exact decimal power sums: variance = "
        "(Σx² − (Σx)²/n)/(n−1) computed from bit-identical doubles — the "
        "decimal-exact pattern extended to second moments (native "
        "stddev/var are Welford-order-dependent across engines).",
    tags=("agg", "stats"),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = F.col("l_quantity").cast("decimal(28,2)")
    s1 = F.sum(dec).cast("double")
    s2 = F.sum(dec * dec).cast("double")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            s1.alias("s1"),
            s2.alias("s2"),
            ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("variance"),
        )
    )


@register(
    "q_data_quality_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_orderkey) AS null_orderkeys,
           COUNT(*) - COUNT(l_shipdate) AS null_shipdates,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           MIN(l_discount) AS min_disc,
           MAX(l_discount) AS max_disc,
           COUNT(DISTINCT l_returnflag) AS n_flags,
           COUNT(DISTINCT l_linestatus) AS n_statuses,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_discounts
    FROM lineitem
    """,
    doc="Single-pass data-quality profile (the deequ-style pre-load gate a "
        "100 TB pipeline runs before committing a batch): null counts, "
        "value ranges, domain cardinalities, constraint violations — one "
        "scan, one row out, all in the same aggregate.",
    tags=("quality", "agg"),
)
def q_data_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    c = F.count(F.lit(1))
    return li.agg(
        c.alias("n_rows"),
        (c - F.count("l_orderkey")).alias("null_orderkeys"),
        (c - F.count("l_shipdate")).alias("null_shipdates"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
        F.countDistinct("l_returnflag").alias("n_flags"),
        F.countDistinct("l_linestatus").alias("n_statuses"),
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)
              .otherwise(0)).alias("bad_discounts"),
    )


@register(
    "q_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
    doc="Pivot: events long->wide, one count column per event_type with an "
        "explicit value list (open-ended pivot needs a distinct pass — "
        "never at 100 TB). Oracle is the CASE-aggregation rewrite Catalyst "
        "itself performs.",
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        # pivot leaves null where a (user, type) pair never occurred
        .select("user_id",
                *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t)
                  for t in types])
    )


_STRAT_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1,
                    "src4": 0.0}
_STRAT_DEFAULT = 0.5
_STRAT_SALT = "strat:"


def _strat_threshold(frac: float) -> str:
    """Hex threshold for content-hash Bernoulli: keep a row iff
    md5(salt || id) < threshold. md5 hex strings compare as the 128-bit
    numbers they spell, so the literal floor(frac * 2^128) in 32 hex
    digits selects exactly a `frac` slice of the uniform hash space.
    frac >= 1 returns 'g' (> any hex char: keep everything); frac <= 0
    returns '0'*32 (nothing hashes strictly below the zero string)."""
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return "0" * 32
    return format(int(frac * (1 << 128)), "032x")


def _strat_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN '{_strat_threshold(f)}'"
        for s, f in sorted(_STRAT_FRACTIONS.items()))
    return (f"CASE source {whens} "
            f"ELSE '{_strat_threshold(_STRAT_DEFAULT)}' END")


@register(
    "q_stratified_sample",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE md5('{_STRAT_SALT}' || CAST(doc_id AS VARCHAR)) < {_strat_case_sql()}
    """,
    doc="Stratified sampling over documents.source — the data-mixing "
        "primitive for LLM corpus curation. r10: seeded-RNG sampleBy "
        "replaced by CONTENT-HASH Bernoulli (keep iff md5(salt || doc_id) "
        "< per-stratum hex threshold = floor(frac * 2^128)): per-row, no "
        "shuffle, and — unlike RNG sampling — deterministic across "
        "engines, re-runs, repartitioning and cluster sizes, which is the "
        "reproducibility property a training-data pipeline actually needs "
        "(the same doc set admits on every rebuild; changing the salt IS "
        "the reseed). Upgrades the entry from rows-only to a full SQL "
        "oracle. Also drops the old distinct().collect() stratum probe: "
        "unseen strata fall through to the CASE default threshold.",
    tags=("llm", "sampling"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    thr = F.lit(_strat_threshold(_STRAT_DEFAULT))
    for s, f in sorted(_STRAT_FRACTIONS.items()):
        thr = F.when(F.col("source") == s,
                     F.lit(_strat_threshold(f))).otherwise(thr)
    keep = F.md5(F.concat(F.lit(_STRAT_SALT),
                          F.col("doc_id").cast("string"))) < thr
    return d.filter(keep).select("doc_id", "source")


@register(
    "q_gap_fill_calendar",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
                   AS sum_value
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), scaffold AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
               AS DATE) AS day
        FROM bounds
    )
    SELECT s.user_id, s.day,
           COALESCE(d.n, 0) AS n,
           COALESCE(d.sum_value, 0.0) AS sum_value,
           (d.n IS NULL) AS gap
    FROM scaffold s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
    doc="Calendar gap-filling: per-key daily scaffold (sequence of dates "
        "between each user's min and max activity) left-joined to the "
        "observed daily aggregate, absent days zero-filled and flagged — "
        "the missing-day repair every daily-weather series needs "
        "(the reference's data has no such repair; Athena users see holes).",
    tags=("temporal", "reshape"),
)
def q_gap_fill_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.round(F.col("value") * 100).cast("long"))
              .cast("double") / 100).alias("sum_value"))
    )
    scaffold = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id",
                F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return (
        scaffold.join(daily, on=["user_id", "day"], how="left")
        .select("user_id", "day",
                F.coalesce("n", F.lit(0)).alias("n"),
                F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
                F.col("n").isNull().alias("gap"))
    )


@register(
    "q_events_funnel",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(t_view) AS BIGINT) AS n_view,
           CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
               AS n_view_then_click,
           CAST(COUNT(CASE WHEN t_buy > t_click AND t_click > t_view
                           THEN 1 END) AS BIGINT)
               AS n_full_funnel
    FROM u
    """,
    doc="Funnel conversion (view → click → purchase, strictly ordered "
        "first-occurrence times per user): one hash aggregate computes all "
        "three stage timestamps simultaneously (conditional MIN — no "
        "per-stage scan, no self-join), then a single-row rollup. At "
        "100 TB: the per-user agg is the only shuffle; stage predicates "
        "ride in the same aggregate.",
    tags=("analytics", "events"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
             .alias("t_view"),
             F.min(F.when(F.col("event_type") == "click", F.col("ts")))
             .alias("t_click"),
             F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
             .alias("t_buy"))
    )
    return u.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1))
        .alias("n_view_then_click"),
        F.count(F.when((F.col("t_buy") > F.col("t_click"))
                       & (F.col("t_click") > F.col("t_view")), 1))
        .alias("n_full_funnel"),
    )


@register(
    "q_events_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_day, day_offset
    """,
    doc="Cohort retention: users grouped by first-seen day; distinct "
        "active users per (cohort, day-offset). Two hash aggregates and "
        "one equi-join on user_id — the firsts side is one row per user "
        "(broadcastable at dimension scale, shuffled at corpus scale); "
        "no window, no per-day scan.",
    tags=("analytics", "events"),
)
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.to_date("ts")).alias("cohort_day")))
    activity = (
        ev.join(firsts, on="user_id")
        .select("user_id", "cohort_day",
                F.datediff(F.to_date("ts"), F.col("cohort_day"))
                .alias("day_offset"))
        .distinct()
    )
    return (activity.groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).alias("n_active_users")))


def _duck_spread(v: str) -> str:
    """DuckDB twin of operators/layout.spread_bits16 (same magic masks)."""
    e = f"({v} & 65535)"
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                        (2, 0x33333333), (1, 0x55555555)):
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


@register(
    "q_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(l_partkey % 65536 AS BIGINT) AS xq,
           CAST(l_suppkey % 65536 AS BIGINT) AS yq,
           CAST({_duck_spread('(l_partkey % 65536)')}
                | ({_duck_spread('(l_suppkey % 65536)')} << 1)
                AS BIGINT) AS zkey
    FROM lineitem
    """,
    doc="Z-order (Morton) layout key over (partkey, suppkey) — "
        "operators/layout.zorder_key2: 4 shift+mask spreading steps per "
        "dimension, pure codegen'd bit math. Sorting a 100 TB table by "
        "this key before write makes parquet min/max stats tight in BOTH "
        "columns, so predicates on either dimension skip row groups "
        "(the Delta OPTIMIZE ZORDER / Iceberg sort-order trick as a "
        "plain expression; writer in operators/layout.write_zordered).",
    tags=("layout", "scale"),
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_key2
    li = load(spark, sf_dir, "lineitem")
    xq = (F.col("l_partkey") % 65536).alias("xq")
    yq = (F.col("l_suppkey") % 65536).alias("yq")
    return li.select(
        "l_orderkey", "l_linenumber", xq, yq,
        zorder_key2(F.col("l_partkey"), F.col("l_suppkey")).alias("zkey"),
    )


@register(
    "q_global_rank",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) - 1 AS global_rank
    FROM orders
    """,
    doc="Contiguous global rank over a total order WITHOUT a "
        "single-partition window (operators/ranking.global_rank): "
        "repartitionByRange tiles the order across partitions, per-"
        "partition row_number runs fully parallel, and O(#partitions) "
        "offsets lift local ranks to global. The scalable form of "
        "ROW_NUMBER() OVER (ORDER BY ...) — same result, no one-task "
        "sort bottleneck.",
    tags=("analytics", "rank", "scale"),
)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_rank(o, [F.desc("o_totalprice"), F.asc("o_orderkey")],
                         n_partitions=16)
    return ranked.select("o_orderkey", "o_totalprice", "global_rank")


@register(
    "q_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN prev_ts IS NULL
                      OR ts - prev_ts > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ), numbered AS (
        SELECT user_id, ts, event_type,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
               AS duration_sec,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Sessionization with STABLE session ids — the gaps-and-islands "
        "assignment (30-minute inactivity gap) that event analytics joins "
        "back to, distinct from session_window (which aggregates but "
        "exposes no joinable id) and merge_intervals (which consolidates "
        "pre-existing ranges). Plan: one shuffle on user_id, two ordered "
        "window passes over the SAME partitioning (lag → running sum, no "
        "re-shuffle), then partial+final agg on (user, session). Per-key "
        "state is O(1); a skewed user costs one sorted partition. "
        "Deterministic tiebreak (ts, event_id) keeps both engines' "
        "running sums identical.",
    tags=("analytics", "temporal", "window"), bench=True,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import sessionize

    ev = load(spark, sf_dir, "events")
    return (
        sessionize(ev, by="user_id", ts="ts", gap_sec=1800,
                   tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             (F.unix_timestamp(F.max("ts"))
              - F.unix_timestamp(F.min("ts"))).alias("duration_sec"),
             F.count_distinct("event_type").alias("n_types"))
    )


@register(
    "q_partition_stats",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           COUNT(*) AS n_rows,
           MIN(value) AS min_val,
           MAX(value) AS max_val,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
    doc="Partition-statistics manifest — the zone map a data-skipping "
        "reader consults: per (day, event_type) partition cell, row count "
        "plus min/max of the predicate columns and user cardinality. At "
        "100 TB this table IS the scan planner's input (the z-order writer "
        "in operators/layout makes the min/max ranges tight); computing it "
        "is one partial+final agg, output rows = #partition cells, not "
        "#rows. The manifest-driven pruning loop: write sorted → collect "
        "stats → skip files whose [min,max] misses the predicate.",
    tags=("analytics", "layout", "scale"),
)
def q_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.min("value").alias("min_val"),
             F.max("value").alias("max_val"),
             F.min("event_id").alias("min_id"),
             F.max("event_id").alias("max_id"),
             F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "q_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(o_totalprice / 25000), 23) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
    doc="Fixed-width histogram (24 x 25k buckets over order totals, "
        "last bucket open-ended) — the single-pass distribution profile "
        "behind skew detection and bucket-boundary planning. Identical "
        "floor arithmetic on both engines (DuckDB lacks width_bucket; "
        "floating bucket edges would also make boundary rows "
        "engine-dependent). Map-side partial agg reduces each partition "
        "to <=24 rows before the exchange.",
    tags=("analytics", "stats"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000),
                     F.lit(23)).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("o_totalprice").alias("lo"),
             F.max("o_totalprice").alias("hi"))
    )
