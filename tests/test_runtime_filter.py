"""Spark's injected runtime bloom filters (SPARK-32268) — the built-in
complement to the explicit bitmap semi-join (operators/bitmapjoin.py): for
a selective fact⨝fact shuffle join, Catalyst plants a
bloom_filter_might_contain pre-filter on the large side, cutting shuffled
rows before the exchange.

Why the conf dance: the feature is ON by default
(spark.sql.optimizer.runtime.bloomFilter.enabled=true) but gated by size
thresholds shaped for production — the application side's scan must exceed
10 GB (applicationSideScanSizeThreshold) before injection is considered.
No sandbox-scale fixture crosses that, so AT DEFAULTS THE FILTER NEVER
FIRES HERE; these tests lower the thresholds to prove the engine
configuration and plan shape are right, and pin result parity so the
injected filter is semantically invisible. At 100 TB the defaults
themselves trigger: a lineitem-scale probe side crosses 10 GB in the first
partition batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canary_weather_etl_spark.plans.registry import load


@pytest.fixture()
def bloom_conf(spark):
    """Shrink the production-scale injection thresholds to fixture scale
    and force a shuffle join (broadcast joins don't take a bloom filter —
    the broadcast side IS already an exact filter)."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _selective_fact_join(spark, sf_dir):
    """The selective fact⨝fact shape: a hard predicate keeps ~2% of orders;
    every lineitem row still scans unless a runtime filter prunes first."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000))
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                 .alias("price_cents")))


def test_runtime_bloom_filter_injected_and_invisible(spark, sf_dir, bloom_conf):
    df = _selective_fact_join(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # Spark 4 prints the injected pair as might_contain(scalar-subquery …)
    # over a bloom_filter_agg of the creation side's join keys
    assert "might_contain" in optimized, (
        f"no runtime bloom filter injected:\n{optimized}")
    # the filter must land on the APPLICATION (lineitem) side as a
    # pre-shuffle predicate, fed by an aggregate over the creation side
    assert "bloom_filter_agg" in optimized, optimized
    with_filter = {tuple(r) for r in df.collect()}

    # parity: the injected filter is a pure pruning optimization
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        baseline_df = _selective_fact_join(spark, sf_dir)
        baseline_plan = baseline_df._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert "might_contain" not in baseline_plan
        baseline = {tuple(r) for r in baseline_df.collect()}
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_filter == baseline
    assert with_filter, "selective join produced no rows — fixture drifted"


def test_runtime_bloom_filter_gated_off_at_default_thresholds(spark, sf_dir):
    """At production defaults (10 GB application-side scan threshold) the
    sandbox-scale join must NOT take a bloom filter — documents why no
    registry query's recorded plan carries one."""
    df = _selective_fact_join(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in optimized
