"""Semantic property tests for the round-4 operators, beyond the oracle
hash (which pins values but not the invariants a consumer relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from canary_weather_etl_spark.plans import REGISTRY
from canary_weather_etl_spark.plans.registry import load

SF = "/root/testdata/sf0.01"


def test_sessionize_partitions_events(spark):
    """Sessions tile the event stream: every event lands in exactly one
    session, durations are non-negative, and the 30-min gap rule holds
    when recomputed independently for the busiest user."""
    out = REGISTRY["q_sessionize"].fn(spark, SF).cache()
    ev = load(spark, SF, "events")
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
    assert out.filter(F.col("duration_sec") < 0).count() == 0

    busiest = (ev.groupBy("user_id").count()
               .orderBy(F.desc("count")).first()["user_id"])
    ts = [r["ts"] for r in
          ev.filter(F.col("user_id") == busiest)
            .orderBy("ts", "event_id").collect()]
    n_sessions = 1 + sum(
        1 for a, b in zip(ts, ts[1:]) if (b - a).total_seconds() > 1800)
    got = out.filter(F.col("user_id") == busiest).count()
    assert got == n_sessions
    out.unpersist()


def test_weighted_sample_stratum_size_and_bias(spark):
    """Exactly min(10, |stratum|) rows per source, ranks contiguous, and
    the length-weighting shows: mean sampled doc length exceeds the
    stratum mean (the point of weighting by length)."""
    out = REGISTRY["q_weighted_sample"].fn(spark, SF).cache()
    d = load(spark, SF, "documents")
    per_src = {r["source"]: r["n"] for r in
               d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in per_src.items():
        assert got[src] == min(10, n)
    ranks = out.groupBy("source").agg(F.min("rk").alias("lo"),
                                      F.max("rk").alias("hi")).collect()
    for r in ranks:
        assert r["lo"] == 1 and r["hi"] == got[r["source"]]

    corpus_avg = d.agg(F.avg(F.length("text"))).first()[0]
    sample_avg = out.agg(F.avg("w")).first()[0]
    assert sample_avg > corpus_avg
    out.unpersist()


def test_histogram_totals_and_bounds(spark):
    out = REGISTRY["q_histogram"].fn(spark, SF).collect()
    o = load(spark, SF, "orders")
    assert sum(r["n"] for r in out) == o.count()
    for r in out:
        b = r["bucket"]
        assert r["lo"] >= b * 25000
        assert r["lo"] <= r["hi"]
        if b < 23:
            assert r["hi"] < (b + 1) * 25000


def test_partition_stats_manifest_consistency(spark):
    out = REGISTRY["q_partition_stats"].fn(spark, SF).cache()
    ev = load(spark, SF, "events")
    assert out.agg(F.sum("n_rows")).first()[0] == ev.count()
    bad = out.filter((F.col("min_val") > F.col("max_val"))
                     | (F.col("min_id") > F.col("max_id"))
                     | (F.col("n_users") > F.col("n_rows"))
                     | (F.col("n_users") < 1)).count()
    assert bad == 0
    out.unpersist()


def test_embedding_clusters_cover_and_keeper(spark):
    """Every vec_id < 300 appears exactly once; the keeper is the minimum
    id of its component; cluster_size counts the component's members."""
    rows = REGISTRY["q_dedup_embedding_clusters"].fn(spark, SF).collect()
    assert sorted(r["vec_id"] for r in rows) == list(range(300))
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        assert comp == min(m["vec_id"] for m in members)
        for m in members:
            assert m["cluster_size"] == len(members)
            assert m["is_keeper"] == (m["vec_id"] == comp)


def test_sessionize_subsecond_gap_boundary(spark):
    """The gap rule is exact-interval, not whole-second: 1800.4s breaks a
    1800s session, 1800.0s exactly does not (strict >). unix_timestamp
    truncation would get the first case wrong on microsecond data."""
    import datetime as dt

    from canary_weather_etl_spark.operators.temporal import sessionize

    def run(ts2_us):
        rows = [(1, dt.datetime(2024, 1, 1, 10, 0, 0, 100000), 1),
                (1, dt.datetime(2024, 1, 1, 10, 30, 0, ts2_us), 2)]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long")
        out = sessionize(df, by="user_id", ts="ts", gap_sec=1800,
                         tiebreak="event_id")
        return [r["session_id"] for r in out.orderBy("event_id").collect()]

    assert run(500000) == [1, 2]   # gap 1800.4s > 1800s → new session
    assert run(100000) == [1, 1]   # gap exactly 1800s → same session


def test_asof_staleness_boundary(spark):
    """max_stale is inclusive at the horizon: a match exactly max_stale old
    is kept; one microsecond older reads NULL (row itself stays — LEFT
    semantics)."""
    import datetime as dt

    from canary_weather_etl_spark.operators.temporal import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0, 10.0), (2, t0 - dt.timedelta(microseconds=1), 20.0)],
        "k long, t timestamp, lv double")
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=30), 1),
         (2, t0 + dt.timedelta(minutes=30), 2)],
        "k long, t timestamp, rid long")
    out = {r["rid"]: (r["lv_asof"], r["t_asof"]) for r in
           asof_join(left, right, on="t", by="k", value_cols=["lv"],
                     max_stale="30 minutes").collect()}
    assert out[1] == (10.0, t0)          # exactly 30 min old: fresh
    assert out[2] == (None, None)        # 30 min + 1 microsecond: stale
    assert len(out) == 2                 # both right rows survive
