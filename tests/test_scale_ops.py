"""Scale-machinery tests: bucketed co-located joins (no exchange in plan),
salted-join plan shape, stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canary_weather_etl_spark.plans.registry import load
from canary_weather_etl_spark.streaming.jobs import drain
from canary_weather_etl_spark.sources.bucketing import bucketed_join, write_bucketed
from canary_weather_etl_spark.streaming.stateful import running_user_totals


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse.dir is a static conf — bucketed tables land in the default
    # spark-warehouse/ (gitignored), dropped in the finally below
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice") \
        .withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "li_b", "l_orderkey", buckets=8)
    write_bucketed(o, "o_b", "l_orderkey", buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it's correct
        n = joined.count()
        expected = (load(spark, sf_dir, "lineitem")
                    .join(load(spark, sf_dir, "orders"),
                          F.col("l_orderkey") == F.col("o_orderkey")).count())
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_stateful_running_totals_accumulate_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the second batch's output
    must include the first batch's totals — state survived."""
    ev = load(spark, "/root/testdata/sf0.001", "events") \
        .select("user_id", "ts", "value")
    d = str(tmp_path / "drops")
    one_user = ev.filter(F.col("user_id") == ev.first()["user_id"]).cache()
    half1 = one_user.limit(10)
    half2 = one_user.exceptAll(half1).limit(10)
    half1.coalesce(1).write.mode("overwrite").parquet(d)
    half2.coalesce(1).write.mode("append").parquet(d)

    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (running_user_totals(stream)
         .writeStream.format("memory").queryName("totals")
         .outputMode("update").trigger(availableNow=True).start())
    drain(q)

    rows = spark.sql("SELECT * FROM totals").collect()
    # one emission per batch that saw the user; final cumulative = 20 events
    assert len(rows) == 2
    final = max(rows, key=lambda r: r["n_events"])
    assert final["n_events"] == 20
    # expected values come from the parquet the stream actually consumed —
    # a second limit(10) over one_user is not guaranteed to pick the same
    # rows as the half1 written above
    exact = spark.read.parquet(d).agg(
        F.sum("value"), F.max("value")).collect()[0]
    assert final["total_value"] == pytest.approx(exact[0])
    assert final["max_value"] == exact[1]


def test_approx_percentile_accuracy(spark, sf_dir):
    """The sketch percentile must land within 2% relative error of exact."""
    from canary_weather_etl_spark.plans import REGISTRY
    approx = {r["o_orderstatus"]: (r["p50_approx"], r["p90_approx"])
              for r in REGISTRY["q_approx_percentile"].fn(spark, sf_dir).collect()}
    exact = {r["o_orderstatus"]: (r["p50"], r["p90"])
             for r in REGISTRY["q_percentiles"].fn(spark, sf_dir).collect()}
    for status, (p50, p90) in exact.items():
        a50, a90 = approx[status]
        assert abs(a50 - p50) / p50 < 0.02
        assert abs(a90 - p90) / p90 < 0.02


def test_stratified_sample_proportions(spark, sf_dir):
    from canary_weather_etl_spark.plans import REGISTRY
    from canary_weather_etl_spark.plans.registry import load as _load
    out = REGISTRY["q_stratified_sample"].fn(spark, sf_dir)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              _load(spark, sf_dir, "documents").groupBy("source")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("src4", 0) == 0          # zero-fraction stratum excluded
    assert got["src0"] == totals["src0"]    # full stratum kept verbatim
    # Bernoulli sampling: observed fraction within generous bounds
    frac1 = got["src1"] / totals["src1"]
    assert 0.3 < frac1 < 0.7
    # determinism: same seed → same sample
    again = REGISTRY["q_stratified_sample"].fn(spark, sf_dir)
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())


def test_zorder_write_tiles_the_curve(spark, tmp_path):
    """write_zordered: content-invisible, and the range partitioning tiles
    the Z-curve — per-file zkey ranges are disjoint, which is what makes
    min/max stats prunable in both dimensions."""
    from pyspark.sql import functions as F

    from canary_weather_etl_spark.operators.layout import (
        write_zordered, zorder_key2)

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"))
    out = str(tmp_path / "z")
    write_zordered(df.repartition(8), out, "x", "y", n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == 4096
    assert ({tuple(r) for r in back.collect()}
            == {tuple(r) for r in df.collect()})

    # per-file key ranges must not overlap (repartitionByRange contract)
    ranges = (back.withColumn("f", F.col("_metadata.file_path"))
              .withColumn("z", zorder_key2(F.col("x"), F.col("y")))
              .groupBy("f").agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
              .collect())
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    assert len(spans) > 1
    for (l0, h0), (l1, h1) in zip(spans, spans[1:]):
        assert h0 <= l1, spans


def test_hll_sketch_merge_error_bound(spark, sf_dir):
    """Merged HLL estimate must sit within 5% of the exact distinct count,
    and the ALL row must come from the union of per-group sketches (>= any
    single group's estimate)."""
    from pyspark.sql import functions as F

    from canary_weather_etl_spark.plans.registry import REGISTRY, load

    rows = {r["o_orderpriority"]: r["approx_customers"] for r in
            REGISTRY["q_hll_sketch_merge"].fn(spark, sf_dir).collect()}
    exact = (load(spark, sf_dir, "orders")
             .agg(F.countDistinct("o_custkey")).collect()[0][0])
    assert abs(rows["ALL"] - exact) / exact < 0.05, (rows["ALL"], exact)
    assert rows["ALL"] >= max(v for k, v in rows.items() if k != "ALL")


def test_transform_with_state_matches_applyinpandas(spark, tmp_path):
    """Spark 4 transformWithStateInPandas twin of the stateful operator:
    same two-micro-batch drive, same cumulative semantics, RocksDB state
    store (required by the new API). Skipped where protobuf is absent —
    the TWS state-server protocol imports google.protobuf at query start
    (this container ships pyspark without it; applyInPandasWithState above
    remains the fully-exercised stateful path)."""
    import importlib.util
    if importlib.util.find_spec("google") is None or \
            importlib.util.find_spec("google.protobuf") is None:
        pytest.skip("google.protobuf not installed: transformWithState's "
                    "state server cannot start in this environment")
    from canary_weather_etl_spark.streaming.stateful import (
        running_user_totals_tws)

    ev = load(spark, "/root/testdata/sf0.001", "events") \
        .select("user_id", "ts", "value")
    d = str(tmp_path / "drops")
    one_user = ev.filter(F.col("user_id") == ev.first()["user_id"]).cache()
    half1 = one_user.limit(10)
    half2 = one_user.exceptAll(half1).limit(10)
    half1.coalesce(1).write.mode("overwrite").parquet(d)
    half2.coalesce(1).write.mode("append").parquet(d)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        schema = spark.read.parquet(d).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(d))
        q = (running_user_totals_tws(stream)
             .writeStream.format("memory").queryName("totals_tws")
             .outputMode("update").trigger(availableNow=True).start())
        drain(q)
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    rows = spark.sql("SELECT * FROM totals_tws").collect()
    assert len(rows) == 2
    final = max(rows, key=lambda r: r["n_events"])
    assert final["n_events"] == 20
    # expected values come from the parquet the stream actually consumed —
    # a second limit(10) over one_user is not guaranteed to pick the same
    # rows as the half1 written above
    exact = spark.read.parquet(d).agg(
        F.sum("value"), F.max("value")).collect()[0]
    assert final["total_value"] == pytest.approx(exact[0])
    assert final["max_value"] == exact[1]
