"""Joins & set operations (SURVEY.md §2.3, §2.7).

The reference's join vocabulary: multi-key inner join of the two source
frames (README.md:737, 1443), crossJoin metadata attach (README.md:689-691),
and the NOT-EXISTS upsert dedupe (README.md:1517-1526) which Catalyst
rewrites to LeftAnti. We expose the full equi/cross/semi/anti/outer surface
plus union/except/intersect. Physical strategy is Catalyst's: dimension
tables (region/nation/supplier) are far under the broadcast threshold, so
these plans come out as BroadcastHashJoin with no shuffle of the fact side;
fact-to-fact joins (lineitem⨝orders) sort-merge with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exact_avg, exact_sum
from .registry import load, register


@register(
    "q_join_inner_fact",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
               / 1000 AS revenue_k,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY revenue_k DESC
    """,
    doc="Inner equi-join chain fact→fact→dim (the reference's 4-key merge "
        "join, README.md:737, generalized). lineitem⨝orders shuffles on the "
        "orderkey; customer broadcasts. Revenue uses exact decimal products "
        "and sums (order-independent), cast to double at the end.",
    tags=("join", "agg"), bench=True,
)
def q_join_inner_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            # exact integer units: cents x (100 - discount_cents) — same
            # nearest-double result as the decimal oracle, ~2x faster
            # (int64 sums stay in codegen registers)
            (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")
                   * (100 - F.round(F.col("l_discount") * 100).cast("long")))
             .cast("double") / 1.0e4 / 1000).alias("revenue_k"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue_k"))
    )


@register(
    "q_join_broadcast_dims",
    oracle="""
    SELECT r_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
               / COUNT(c_acctbal) AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    doc="Star-schema dim chain: both dims broadcast (25 and 5 rows) → zero "
        "shuffles before the final 5-group aggregate. The plan every "
        "100 TB star join should produce.",
    tags=("join",), bench=True,
)
def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             exact_avg("c_acctbal").alias("avg_bal"))
        .orderBy("r_name")
    )


@register(
    "q_join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 300000)
    """,
    doc="Left-anti join — the upsert dedupe (README.md:1517-1526 writes it "
        "as correlated NOT EXISTS; Catalyst's RewritePredicateSubquery "
        "produces this same LeftAnti). Filtered build side so the result is "
        "non-empty at every sf (a 0-row differential proves nothing).",
    tags=("join",),
)
def q_join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "q_join_left_semi",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                  AND l_quantity >= 49)
    """,
    doc="Left-semi join: existence probe without multiplying rows "
        "(SURVEY.md §2.3 engine surface).",
    tags=("join",),
)
def q_join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_brand")
    )


@register(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 0.0)
               AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    doc="Left-outer join preserving unmatched customers (n_orders=0). "
        "total_spent rounded — double-sum reduction order differs between "
        "engines even within one group.",
    tags=("join",),
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(exact_sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@register(
    "q_join_full_outer",
    oracle="""
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
    FROM (SELECT c_custkey, c_nationkey FROM customer) c
    FULL OUTER JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
      ON c.c_nationkey = s.s_nationkey
    GROUP BY 1
    """,
    doc="Full-outer join: nations having only customers, only suppliers, "
        "or both each keep a row (the coverage-reconciliation shape — "
        "which side of a feed is missing entities). At scale: one "
        "sort-merge shuffle on the key; neither side broadcastable for a "
        "full-outer, so AQE handles skew.",
    tags=("join",),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
                "c_custkey", "s_suppkey")
        .groupBy("nationkey")
        .agg(F.countDistinct("c_custkey").alias("n_customers"),
             F.countDistinct("s_suppkey").alias("n_suppliers"))
    )


@register(
    "q_cross_join",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
    doc="Explicit cross join (README.md:689-691 uses crossJoin to attach "
        "1-row metadata; our ingestion replaces that with arrays_zip, but "
        "the operator stays in the engine surface). 5x25 rows.",
    tags=("join",),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


# --- Set operations (SURVEY.md §2.7) ---------------------------------------

@register(
    "q_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'high_value' AS reason FROM orders
    WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'urgent' AS reason FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
    """,
    doc="unionByName (README.md:1529's existing∪new upsert union; by-name "
        "per SURVEY.md §2.7 — positional union is the bug the reference's "
        "column-order repair code at README.md:1453-1476 works around).",
    tags=("setop",),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    hi = (o.filter(F.col("o_totalprice") > 400000)
          .select("o_orderkey", "o_totalprice", F.lit("high_value").alias("reason")))
    urgent = (o.filter((F.col("o_orderpriority") == "1-URGENT")
                       & (F.col("o_totalprice") > 350000))
              .select("o_orderkey", F.lit("urgent").alias("reason"), "o_totalprice")
              )  # deliberately different column order — unionByName fixes it
    return hi.unionByName(urgent)


@register(
    "q_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="exceptAll — multiset difference (SURVEY.md §2.7 engine surface; "
        "the reference reaches the same semantics via NOT EXISTS).",
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)


@register(
    "q_intersect_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="intersect (distinct semantics, like SQL INTERSECT): customers with "
        "both open and finished orders.",
    tags=("setop",),
)
def q_intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "q_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="intersectAll — multiset intersection (keeps duplicate "
        "multiplicity), completing the set-op family alongside "
        "union/exceptAll/intersect.",
    tags=("setop",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b)


@register(
    "q_entity_blocking",
    oracle="""
    WITH blocked AS (
        SELECT c_custkey, c_name, c_custkey % 64 AS blk FROM customer
    )
    SELECT l.c_custkey AS a, r.c_custkey AS b,
           CAST(levenshtein(l.c_name, r.c_name) AS INT) AS dist
    FROM blocked l JOIN blocked r
      ON l.blk = r.blk AND l.c_custkey < r.c_custkey
    WHERE levenshtein(l.c_name, r.c_name) <= 2
    """,
    doc="Entity-resolution blocking: candidate pairs restricted to a block "
        "key (custkey % 64) before the expensive edit-distance compare — "
        "the O(n²)→O(Σ block²) rewrite every fuzzy-match pipeline needs at "
        "scale. Pairs within distance ≤2 (names differing in ≤2 digits).",
    tags=("llm", "dedup", "join"),
)
def q_entity_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load(spark, sf_dir, "customer")
         .select("c_custkey", "c_name",
                 (F.col("c_custkey") % 64).alias("blk")))
    l, r = c.alias("l"), c.alias("r")
    return (
        l.join(r, (F.col("l.blk") == F.col("r.blk"))
               & (F.col("l.c_custkey") < F.col("r.c_custkey")))
        .select(F.col("l.c_custkey").alias("a"),
                F.col("r.c_custkey").alias("b"),
                F.levenshtein(F.col("l.c_name"), F.col("r.c_name")).alias("dist"))
        .filter(F.col("dist") <= 2)
    )


@register(
    "q_star_join_revenue",
    oracle="""
    SELECT n_name,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4)
                         AS BIGINT)) AS DOUBLE) / 1e4 AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON l_suppkey   = s_suppkey
                 AND s_nationkey = c_nationkey
    WHERE r_name IN ('EUROPE', 'ASIA')
    GROUP BY n_name, o_year
    """,
    doc="TPC-H Q5-shaped six-table star join: local-supplier revenue by "
        "nation and order year for two regions. The deep-join planning "
        "showcase: three dimension tables (region, nation, supplier) are "
        "explicitly broadcast — zero shuffles for their joins — while the "
        "two fact joins (orders⋈customer, lineitem⋈orders) shuffle on "
        "their keys once each; the residual s_nationkey = c_nationkey "
        "predicate rides on the broadcast supplier join rather than "
        "forcing a join reorder. Revenue = Σ price·(1−discount) is "
        "4-decimal fixed-point → exact_sum(scale=4) keeps the aggregate "
        "order-independent and bitwise equal to the oracle. At 100 TB "
        "the same plan holds: dims stay broadcast-size, fact shuffles are "
        "key-partitioned, and AQE handles the region-filter selectivity "
        "it can only see at runtime.",
    tags=("join", "agg"), bench=True,
)
def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(
        F.col("r_name").isin("EUROPE", "ASIA"))
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supplier),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                       scale=4).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q_bitmap_semi_join",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(ROUND(l_quantity * 1e2) AS BIGINT)) AS DOUBLE)
               / 1e2 AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
    doc="Exact bitmap semi-join (operators/bitmapjoin.py): the urgent "
        "orderkey set ships as per-bucket 4 KB bitmaps "
        "(bitmap_construct_agg, ~1 bit/key — 64-128x smaller than a "
        "broadcast hash relation for dense keys) and lineitem probes via "
        "bucket equi-join + one LSB bit test, all JVM built-ins. Exact "
        "— no Bloom false positives, no verify pass — so the whole "
        "result hash-checks against a plain IN semi-join. The physical "
        "shape for 'touched keys vs 100 TB fact' filters where even the "
        "key set itself is broadcast-heavy as a hash table.",
    tags=("join",),
)
def q_bitmap_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bitmapjoin import bitmap_semi_join
    lineitem = load(spark, sf_dir, "lineitem")
    urgent = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (
        bitmap_semi_join(lineitem, urgent, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"),
             exact_sum("l_quantity", scale=2).alias("sum_qty"))
    )
