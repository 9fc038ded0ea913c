"""Bucketed-table co-located join: the pre-shuffle layout technique for
repeated large-large joins (SURVEY-level scale machinery). Writing both
sides bucketed+sorted BY the join key means every subsequent join on that
key is exchange-free AND sort-free — at 100 TB this converts the recurring
fact-fact shuffle (the dominant cost of a star-schema refresh) into a
one-time write-layout decision, exactly like Hive/Iceberg bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from canary_weather_etl_spark.plans.registry import load


def test_bucketed_join_no_exchange_no_sort(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # repartition BY THE BUCKET KEY to the bucket count first: each write
    # task then owns exactly one bucket and emits ONE sorted file for it.
    # With multiple files per bucket the reader cannot trust sortBy
    # metadata and re-sorts — the shuffle disappears but not the sort.
    (orders.repartition(8, F.col("o_orderkey"))
     .write.format("parquet")
     .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.repartition(8, F.col("l_orderkey"))
     .write.format("parquet")
     .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path: a broadcast would also avoid the
        # shuffle but would not demonstrate the bucketing contract
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # since SPARK-28595 the scan only reports sortBy ordering under
        # this conf (the planner would otherwise have to verify
        # one-file-per-bucket); we wrote exactly one file per bucket above
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = (bl.join(bo, bl.l_orderkey == bo.o_orderkey)
                  .groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n")))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan[plan.find("SortMergeJoin"):]
        # bucketed scan satisfies the join's distribution AND ordering:
        # no Exchange and no per-side Sort between the join and the scans
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert join_part.count("Sort ") == 0

        # same result as the plain (shuffling) join over the raw parquet
        expect = {r["o_orderstatus"]: r["n"] for r in
                  lineitem.join(orders,
                                lineitem.l_orderkey == orders.o_orderkey)
                  .groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
