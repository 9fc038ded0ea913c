"""Property-style tests (SURVEY.md §5): the composed operators (as-of join,
range join, upsert combinator) checked against naive quadratic references
on hypothesis-generated inputs. Few examples, deadline off — each example
runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from canary_weather_etl_spark.operators.temporal import asof_join

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

ts_strategy = st.integers(min_value=0, max_value=200)
key_strategy = st.integers(min_value=0, max_value=3)


@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy,
                            st.integers(0, 1000)), max_size=15),
    right=st.lists(st.tuples(key_strategy, ts_strategy,
                             st.integers(0, 1000)), min_size=1, max_size=15),
)
@settings(**SETTINGS)
def test_asof_join_matches_naive(spark, left, right):
    # dedupe (key, ts) on the left: at equal timestamps the carried value
    # is whichever sorts last — naive reference picks max value for
    # determinism, so make (key, ts) unique instead
    left = list({(k, t): (k, t, v) for k, t, v in left}.values())
    l = spark.createDataFrame(left or [(99, -1, 0)], ["k", "t", "lv"])
    r = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _v) in enumerate(right)], ["k", "t", "rid"])

    got = {(row["rid"]): (row["lv_asof"], row["t_asof"])
           for row in asof_join(l, r, on="t", by="k",
                                value_cols=["lv"]).collect()}

    for i, (k, t, _v) in enumerate(right):
        cands = [(lt, lv) for (lk, lt, lv) in left if lk == k and lt <= t]
        exp = max(cands, key=lambda x: x[0]) if cands else (None, None)
        assert got[i] == (exp[1], exp[0]), (
            f"rid={i} key={k} t={t}: got {got[i]}, want {(exp[1], exp[0])}")


@given(
    existing=st.lists(st.tuples(key_strategy, st.integers(0, 5),
                                st.integers(0, 100)), max_size=20),
    batch=st.lists(st.tuples(key_strategy, st.integers(0, 5),
                             st.integers(0, 100)), max_size=20),
)
@settings(**SETTINGS)
def test_upsert_combinator_key_unique_and_new_wins(spark, existing, batch):
    """survivors = existing ⟕anti batch; out = survivors ∪ batch.
    Invariants (README.md:1517-1529 semantics): keys unique if inputs were,
    every batch row present verbatim, untouched existing rows survive."""
    existing = list({(k, d): (k, d, v) for k, d, v in existing}.values())
    batch = list({(k, d): (k, d, v + 1000) for k, d, v in batch}.values())
    e = spark.createDataFrame(existing or [(9, 9, 0)], ["loc", "day", "val"])
    b = spark.createDataFrame(batch or [(8, 8, 0)], ["loc", "day", "val"])

    out = (e.join(b.select("loc", "day"), on=["loc", "day"], how="left_anti")
           .unionByName(b))
    rows = {(r["loc"], r["day"]): r["val"] for r in out.collect()}

    assert len(rows) == out.count()  # key uniqueness
    for k, d, v in (batch or [(8, 8, 0)]):
        assert rows[(k, d)] == v  # new wins
    bkeys = {(k, d) for k, d, _ in (batch or [(8, 8, 0)])}
    for k, d, v in (existing or [(9, 9, 0)]):
        if (k, d) not in bkeys:
            assert rows[(k, d)] == v  # untouched rows survive


@given(
    errors=st.lists(st.tuples(key_strategy, st.integers(0, 100)),
                    min_size=1, max_size=12),
    buys=st.lists(st.tuples(key_strategy, st.integers(0, 100)),
                  min_size=1, max_size=12),
)
@settings(**SETTINGS)
def test_bucketed_range_join_matches_naive(spark, errors, buys):
    """Bucketed two-probe range join ≡ naive cross-filter for
    p ∈ [e−δ, e] with δ=10."""
    delta = 10
    e = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(errors)], ["k", "et", "eid"])
    b = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(buys)], ["k", "bt", "bid"])

    eb = e.withColumn("bkt", F.explode(F.array(
        F.floor(F.col("et") / delta), F.floor(F.col("et") / delta) - 1)))
    bb = b.withColumn("bkt_r", F.floor(F.col("bt") / delta))
    got = {(r["eid"], r["bid"]) for r in (
        eb.join(bb, (eb["k"] == bb["k"]) & (F.col("bkt") == F.col("bkt_r")))
        .filter((F.col("bt") <= F.col("et"))
                & (F.col("bt") >= F.col("et") - delta))
        .select("eid", "bid").distinct()
    ).collect()}

    want = {(i, j)
            for i, (ek, et) in enumerate(errors)
            for j, (bk, bt) in enumerate(buys)
            if ek == bk and et - delta <= bt <= et}
    assert got == want


def test_agg_collect_arrays_matches_serialized(spark):
    """The raw array surface (agg_collect_arrays) and the driver-facing
    string form (q_agg_collect) must agree: joining the sorted arrays with
    ' ' reproduces the registered query's cells exactly."""
    from canary_weather_etl_spark.plans.relational import (
        agg_collect_arrays, q_agg_collect)

    sf = "/root/testdata/sf0.001"
    raw = {r["n_nationkey"]: r for r in agg_collect_arrays(spark, sf).collect()}
    ser = {r["n_nationkey"]: r for r in q_agg_collect(spark, sf).collect()}
    assert raw.keys() == ser.keys() and len(raw) > 0
    for k in raw:
        assert " ".join(raw[k]["segments"]) == ser[k]["segments"]
        assert " ".join(str(x) for x in raw[k]["custkeys"]) == ser[k]["custkeys"]


@given(
    iv=st.lists(st.tuples(key_strategy, st.integers(0, 50),
                          st.integers(0, 30)),
                min_size=1, max_size=20),
)
@settings(**SETTINGS)
def test_merge_intervals_matches_naive_sweep(spark, iv):
    from collections import defaultdict

    from canary_weather_etl_spark.operators.temporal import merge_intervals

    rows = [(k, s, s + d, i) for i, (k, s, d) in enumerate(iv)]
    df = spark.createDataFrame(rows, ["k", "s", "e", "id"])
    got = sorted((r["k"], r["island_start"], r["island_end"],
                  r["n_intervals"])
                 for r in merge_intervals(df, by="k", start="s", end="e",
                                          tiebreak="id").collect())

    per = defaultdict(list)
    for k, s, e, i in rows:
        per[k].append((s, e, i))
    expect = []
    for k, items in per.items():
        islands: list[list] = []
        for s, e, _i in sorted(items):
            # touching merges (new island only when s > running max end)
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        expect.extend((k, s, e, n) for s, e, n in islands)
    assert got == sorted(expect)


@given(
    evs=st.lists(st.tuples(key_strategy, st.integers(0, 10_000)),
                 min_size=1, max_size=25),
)
@settings(**SETTINGS)
def test_sessionize_matches_naive_gap_scan(spark, evs):
    from collections import defaultdict

    from canary_weather_etl_spark.operators.temporal import sessionize

    rows = [(k, t, i) for i, (k, t) in enumerate(evs)]
    df = (spark.createDataFrame(rows, ["k", "t_int", "id"])
          .withColumn("t", F.timestamp_seconds("t_int")))
    out = sessionize(df, by="k", ts="t", gap_sec=600, tiebreak="id")
    got = {r["id"]: r["session_id"] for r in out.collect()}

    per = defaultdict(list)
    for k, t, i in rows:
        per[k].append((t, i))
    for k, items in per.items():
        sess, prev = 0, None
        for t, i in sorted(items):
            if prev is None or t - prev > 600:
                sess += 1
            prev = t
            assert got[i] == sess, (
                f"id={i} key={k} t={t}: got {got[i]}, want {sess}")


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=20))
@settings(**SETTINGS)
def test_ewma_fold_matches_pandas_ewm(spark, values):
    """The q_ewma_time_decay fold (alpha=0.25, unadjusted) vs
    pandas.Series.ewm — an independent reference implementation of the
    same recurrence e := a*x + (1-a)*e. Sequences <= 20 long sit entirely
    inside the query's 20-row clip, so the semantics coincide exactly."""
    import pandas as pd
    import pytest

    df = spark.createDataFrame(
        [(0, i, float(v)) for i, v in enumerate(values)],
        ["u", "i", "v"])
    arr = df.groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("i", "v"))).alias("s"))
    got = arr.select(
        F.aggregate(
            F.slice(F.col("s.v"), 2, 19), F.element_at(F.col("s.v"), 1),
            lambda acc, x: F.lit(0.25) * x + F.lit(0.75) * acc)
        .alias("e")).collect()[0]["e"]
    want = pd.Series(values).ewm(alpha=0.25, adjust=False).mean().iloc[-1]
    assert got == pytest.approx(want, rel=1e-12, abs=1e-9)
