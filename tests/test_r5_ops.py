"""Round-5 operator tests: AQE skew-join split evidence, fixed-point
PageRank hand-graph exactness, and triangle counting vs a naive in-memory
count.

The AQE test is the skew complement of tests/test_runtime_filter.py: both
features are on by default but threshold-gated for production sizes, so the
test shrinks the thresholds to fixture scale, proves the optimization
fires, and pins result parity (the optimization must be semantically
invisible).
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from canary_weather_etl_spark.operators.graph import pagerank_fixed
from canary_weather_etl_spark.plans import REGISTRY
from canary_weather_etl_spark.plans.registry import load


# --- AQE skew-join -----------------------------------------------------------

@pytest.fixture()
def skew_conf(spark):
    """Shrink AQE's skew detection thresholds (256 MB partition floor in
    production — right for real clusters, unreachable at fixture scale)
    and force a shuffle join so the skewed partition actually exists."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
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


def _skewed_join(spark, sf_dir):
    """Half of lineitem hash-collides onto join key 0 — one shuffle
    partition carries ~50% of the bytes, the textbook hot-key shape.

    Three structural conditions, each discovered by this test failing
    without it — they are exactly what an engineer hits on a real cluster:
    - `repartition(32)` first: AQE splits a skewed REDUCE partition into
      ranges of MAP outputs; a single-file scan has one mapper, so there
      is nothing to split (single-mapper inputs can't be skew-healed).
    - the dim side is a plain scan+filter+union, NOT `distinct()`:
      OptimizeSkewedJoin pattern-matches SMJ children as
      Sort→ShuffleQueryStage; an aggregate sitting between join and
      shuffle (what distinct() plans to) makes the whole join ineligible.
    - the post-join aggregate is GLOBAL (partial+final, no required
      distribution): splitting replicates build rows across splits, so
      the join output is no longer hash-partitioned by key — with a keyed
      groupBy downstream AQE declines the split rather than insert an
      extra exchange (opt-in via adaptive.forceOptimizeSkewedJoin)."""
    li = (load(spark, sf_dir, "lineitem").repartition(32)
          .withColumn("k", F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
                      .otherwise(F.col("l_orderkey"))))
    dim = (load(spark, sf_dir, "orders")
           .select(F.col("o_orderkey").alias("k"))
           .filter(F.col("k") % 2 == 1)
           .union(spark.range(1).select(F.lit(0).cast("long").alias("k")))
           .withColumn("payload", F.col("k") * 2))
    return (li.join(dim, "k")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr("bit_xor(xxhash64(l_orderkey, l_linenumber, payload))")
                 .alias("h")))  # xor: order-free and cannot overflow ANSI


def test_aqe_splits_skewed_join_and_result_parity(spark, sf_dir, skew_conf):
    df = _skewed_join(spark, sf_dir)
    skewed = {tuple(r) for r in df.collect()}
    # AQE finalizes the physical plan only after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, (
        f"AQE did not mark the hot-key join as skewed:\n{plan[:4000]}")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        baseline_df = _skewed_join(spark, sf_dir)
        baseline = {tuple(r) for r in baseline_df.collect()}
        base_plan = baseline_df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in base_plan
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert skewed == baseline
    assert skewed, "join produced no rows — fixture drifted"


# --- fixed-point PageRank ----------------------------------------------------

def _py_pagerank_units(edges, nodes, iterations=5, scale=1_000_000):
    """Reference simulation with Python ints — the same integer recurrence
    pagerank_fixed commits to, so equality is exact, not approximate."""
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    units = {n: scale for n in nodes}
    base = (scale * 3) // 20
    for _ in range(iterations):
        mass = {n: 0 for n in nodes}
        for s, d in edges:
            mass[d] += units[s] // out_deg[s]
        units = {n: base + (17 * mass[n]) // 20 for n in nodes}
    return units


def test_pagerank_star_graph_exact(spark):
    # star: 1,2,3 -> 0; 0 -> 1  (0 accumulates, 1 gets the return flow)
    edges = [(1, 0), (2, 0), (3, 0), (0, 1)]
    nodes = [0, 1, 2, 3]
    e = spark.createDataFrame(edges, ["src", "dst"])
    n = spark.createDataFrame([(x,) for x in nodes], ["id"])
    got = {r["node"]: r["units"]
           for r in pagerank_fixed(e, n, iterations=5).collect()}
    want = _py_pagerank_units(edges, nodes)
    assert got == want
    # sanity on the shape: hub > spoke-with-inflow > dangling spokes
    assert got[0] > got[1] > got[2] == got[3]


def test_pagerank_determinism_across_partitioning(spark):
    edges = [(i, (i * 7 + 1) % 23) for i in range(23)] + \
            [(i, (i * 5 + 2) % 23) for i in range(23)]
    nodes = [(x,) for x in range(23)]
    e1 = spark.createDataFrame(edges, ["src", "dst"]).repartition(1)
    e16 = spark.createDataFrame(edges, ["src", "dst"]).repartition(16)
    n = spark.createDataFrame(nodes, ["id"])
    r1 = {r["node"]: r["units"]
          for r in pagerank_fixed(e1, n, iterations=4).collect()}
    r16 = {r["node"]: r["units"]
           for r in pagerank_fixed(e16, n, iterations=4).collect()}
    assert r1 == r16  # integer fixed-point: bit-equal under any partitioning


# --- triangle counting -------------------------------------------------------

def test_triangle_count_matches_naive(spark):
    """Registry query vs a from-scratch Python triangle count at sf0.001
    (sets + combinations) — independent of the SQL oracle twin."""
    sf = "/root/testdata/sf0.001"
    ev = load(spark, sf, "events")
    act = (ev.select("user_id", "event_type",
                     F.date_trunc("hour", "ts").alias("hb"))
           .distinct().collect())
    by_hour = {}
    for r in act:
        by_hour.setdefault((r["hb"], r["event_type"]), set()).add(r["user_id"])
    shared = {}
    for users in by_hour.values():
        if len(users) > 40:  # hot-cell cap, mirrored from the operator
            continue
        for u, v in combinations(sorted(users), 2):
            shared[(u, v)] = shared.get((u, v), 0) + 1
    edges = {p for p, c in shared.items() if c >= 3}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri_count = {}
    for u, v in edges:
        for w in adj.get(v, set()):
            if w in adj.get(u, set()):
                for m in (u, v, w):
                    tri_count[m] = tri_count.get(m, 0) + 1
    want = sorted(tri_count.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [(r["user_id"], r["n_triangles"])
           for r in REGISTRY["q_triangle_count"].fn(spark, sf).collect()]
    assert got == [(u, c) for u, c in want]
    assert got, "no triangles at sf0.001 — threshold drifted for fixture"


# --- exchange reuse ----------------------------------------------------------

def test_exchange_reuse_for_shared_aggregate(spark, sf_dir):
    """Two consumers of the same per-key aggregate (the rows + the global
    max over them) must share ONE shuffle: Catalyst's exchange reuse
    (spark.sql.exchange.reuse, on by default) dedupes identical Exchange
    subtrees, so the fact table is scanned and shuffled once, not twice.
    At 100 TB this is the difference between one and two full-table
    shuffles for every 'value vs group-total' comparison query."""
    def q():
        li = load(spark, sf_dir, "lineitem")
        per_key = li.groupBy("l_orderkey").agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .alias("cents"))
        top = per_key.agg(F.max("cents").alias("max_cents"))
        return (per_key.join(F.broadcast(top))
                .filter(F.col("cents") * 10 >= F.col("max_cents"))
                .agg(F.count(F.lit(1)).alias("n_near_top"),
                     F.expr("bit_xor(xxhash64(l_orderkey, cents))")
                     .alias("h")))

    df = q()
    rows = {tuple(r) for r in df.collect()}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan, (
        f"per-key aggregate shuffled twice:\n{plan[:3000]}")

    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        baseline = {tuple(r) for r in q().collect()}
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
    assert rows == baseline and rows


# --- catalog statistics / CBO ------------------------------------------------

def test_analyze_table_stats_feed_the_optimizer(spark, sf_dir, tmp_path):
    """ANALYZE TABLE plumbing for cost-based optimization: table and
    column stats land in the catalog and the optimizer's Statistics node
    picks up the exact rowCount (the input CBO join-reordering and
    broadcast decisions consume at cluster scale, where file size alone
    misjudges highly-compressed or wide tables)."""
    d = str(tmp_path / "cust_tbl")
    load(spark, sf_dir, "customer").write.mode("overwrite").parquet(d)
    spark.sql("DROP TABLE IF EXISTS cust_stats_t")
    spark.sql(f"CREATE TABLE cust_stats_t USING parquet LOCATION '{d}'")
    try:
        n = spark.table("cust_stats_t").count()
        spark.sql("ANALYZE TABLE cust_stats_t COMPUTE STATISTICS "
                  "FOR COLUMNS c_nationkey, c_acctbal")

        desc = {r["col_name"]: r["data_type"] for r in spark.sql(
            "DESCRIBE TABLE EXTENDED cust_stats_t").collect()}
        assert "Statistics" in desc and f"{n} rows" in desc["Statistics"], (
            f"catalog row count missing: {desc.get('Statistics')}")
        col = {r["info_name"]: r["info_value"] for r in spark.sql(
            "DESCRIBE TABLE EXTENDED cust_stats_t c_nationkey").collect()}
        assert int(col["distinct_count"]) > 0  # NDV collected (HLL-based)

        prev = spark.conf.get("spark.sql.cbo.enabled", None)
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            q = spark.table("cust_stats_t").filter("c_acctbal > 0")
            stats = q._jdf.queryExecution().optimizedPlan().stats()
            # relation-level rowCount must be the analyzed exact count
            rel = spark.table("cust_stats_t")
            rel_stats = rel._jdf.queryExecution().optimizedPlan().stats()
            assert int(rel_stats.rowCount().get()) == n, (
                f"optimizer sees rowCount={rel_stats.rowCount()}, want {n}")
            # the filtered estimate must be present and <= the relation's
            assert int(stats.sizeInBytes()) <= int(rel_stats.sizeInBytes())
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.cbo.enabled")
            else:
                spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS cust_stats_t")


# --- single-pass observed metrics --------------------------------------------

def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    """Observation API: data-quality counters ride the job that produces
    the result — no second scan. At 100 TB a separate metrics pass doubles
    the read bill; .observe() attaches the aggregates to the same plan."""
    from pyspark.sql import Observation

    obs = Observation("ingest_metrics")
    ev = load(spark, sf_dir, "events")
    out = (ev.observe(
               obs,
               F.count(F.lit(1)).alias("rows_in"),
               F.sum(F.col("value").isNull().cast("long")).alias("null_vals"),
               F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))
           .filter(F.col("event_type") == "purchase")
           .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
    n_out = out.count()
    m = obs.get
    # metrics describe the PRE-filter stream the observe node saw
    assert m["rows_in"] == ev.count()
    assert m["null_vals"] == 0
    assert m["min_ts"] <= m["max_ts"]
    assert n_out > 0


# --- AQE rebalance for output layout -----------------------------------------

def test_rebalance_hint_evens_output_files(spark, sf_dir, tmp_path):
    """The small/skewed-file problem at the write boundary: a skewed
    repartition writes one fat file + dross, while the REBALANCE hint
    (AQE, Spark 3.4+) re-splits shuffle output to the advisory size —
    the declarative replacement for hand-tuned coalesce(n) compaction jobs."""
    import glob
    import os

    li = load(spark, sf_dir, "lineitem").withColumn(
        "g", F.when(F.col("l_orderkey") % 4 != 0, F.lit(0))
        .otherwise(F.col("l_orderkey") % 32))
    skew_dir = str(tmp_path / "skewed")
    # explicit partition count: with AQE coalescing, a bare
    # repartition("g") at fixture scale folds to ONE partition/file
    li.repartition(32, "g").write.mode("overwrite").parquet(skew_dir)
    sizes = sorted(os.path.getsize(f)
                   for f in glob.glob(f"{skew_dir}/*.parquet"))
    assert sizes[-1] > 3 * sizes[0], "fixture not skewed; test is vacuous"

    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    try:
        reb_dir = str(tmp_path / "rebalanced")
        # multi-mapper input first: like the skew-join split, AQE
        # re-splits a hot reduce partition by MAP-output ranges — a
        # single-file scan has one mapper and nothing to split. The
        # repartition must sit BELOW the column projection, not directly
        # under the hint: CollapseRepartition elides an adjacent child
        # repartition, silently restoring the single-mapper shape
        li_m = (load(spark, sf_dir, "lineitem").repartition(32)
                .withColumn("g", F.when(F.col("l_orderkey") % 4 != 0,
                                        F.lit(0))
                            .otherwise(F.col("l_orderkey") % 32)))
        (li_m.hint("rebalance", "g")
         .write.mode("overwrite").parquet(reb_dir))
        rsizes = sorted(os.path.getsize(f)
                        for f in glob.glob(f"{reb_dir}/*.parquet"))
    finally:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
    assert len(rsizes) >= 2
    # even layout: largest file within 3x of the median (vs >3x min above)
    med = rsizes[len(rsizes) // 2]
    assert rsizes[-1] <= 3 * med, f"rebalanced files still skewed: {rsizes}"
    # parity: same rows land either way
    a = spark.read.parquet(skew_dir).count()
    b = spark.read.parquet(reb_dir).count()
    assert a == b
