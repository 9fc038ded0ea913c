"""Classic TPC-H queries — the COMPLETE pack, all 22 — over the fixture
schema (Q2/Q11/Q16/Q20 synthesize the absent partsupp table as a
deterministic CTE; see pack 4) — the industry-standard analytics shapes, run as close to the
published SQL as the fixture columns allow (no l_shipmode/l_shipinstruct/
o_shippriority/c_phone columns; those projections are dropped, predicates
and join graphs are verbatim).

Why these: they exercise the canonical plan shapes — full-scan
aggregate (Q1), selective filter-aggregate (Q6), mid-size 3-table join
with top-k (Q3), 6-table snowflake with a cycle-closing n_nationkey
equality (Q5), selective 4-table join with top-k (Q10), and a
two-branch conditional aggregate ratio (Q14); pack 2 adds the
double-role dimension (Q7), the outer-join-with-ON-filter distribution
(Q13), the reused CTE + MAX scalar subquery (Q15), the correlated
scalar subquery (Q17), and the HAVING'd IN-subquery re-join (Q18).
Catalyst handles join ordering/broadcast selection; the point of the
pack is that a user's existing TPC-H-shaped workload runs verbatim and
hash-exact. Pack 3 covers the EXISTS/anti-join and disjunctive-
predicate classics (Q4, Q9, Q19, Q21, Q22); pack 4 completes the set
(Q2, Q11, Q12, Q16, Q20) by synthesizing partsupp as a deterministic
CTE — absent columns (l_shipmode, commit/receipt dates, comments,
phones) get the nearest fixture-expressible substitute, documented
per query.

Determinism discipline: all revenue math is the repo's exact-cents
pattern (row-wise FLOOR(x*100+0.5) products are IEEE-deterministic;
integer sums are order-free); quantities are integral doubles cast to
BIGINT before summing; top-k queries add an explicit tie-break key to
the official ORDER BY (the spec leaves ties undefined — hashes cannot).
Dates are shifted from the spec's 1992-1998 window into the fixture's
1995-2001 span at matching selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import load, register

_CENTS = "CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)"


def _sql_pair(name: str, spark_tables: tuple[str, ...], sql: str):
    """Register a TPC-H query whose Spark side runs the SAME SQL text
    over temp views — parser/optimizer parity is the point; the oracle
    runs it over DuckDB's views. Table names are suffixed on the Spark
    side to avoid clobbering other modules' views.

    CONSTRAINT: the rename is a plain ``\\b``-bounded regex over the whole
    SQL text, so it would also rewrite a bare lowercase table name inside
    a string literal or comment (e.g. ``WHERE note = 'see orders'``).
    ENFORCED at registration time below: a table name found inside a
    single-quoted literal or a ``--`` comment raises immediately (import
    error, not a silent wrong rewrite). When a future query genuinely
    needs such a literal, switch this helper to registering views under
    the bare names in an isolated temp schema instead."""

    import re

    # genuine literal/comment spans only — a naive '...name...' regex
    # false-positives by spanning the gap BETWEEN two literals
    protected = [m.group(0) for m in re.finditer(r"'[^']*'|--[^\n]*", sql)]
    spark_sql = sql
    for t in spark_tables:
        if any(re.search(rf"\b{t}\b", span) for span in protected):
            raise ValueError(
                f"_sql_pair({name!r}): table name {t!r} appears inside a "
                "string literal or comment — the whole-text rename would "
                "corrupt it; isolate views instead")
        # \b-bounded: must not rewrite identifiers that merely CONTAIN a
        # table name ("supplier_no" ⊃ "supplier" — observed, Q15)
        spark_sql = re.sub(rf"\b{t}\b", f"{t}_tpch", spark_sql)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in spark_tables:
            load(spark, sf_dir, t).createOrReplaceTempView(f"{t}_tpch")
        return spark.sql(spark_sql)

    fn.__name__ = name
    return fn, sql


_Q1_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_base_cents,
           CAST(SUM({_CENTS}) AS BIGINT) AS sum_disc_cents,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                               * (1.0 + l_tax) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_charge_cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)
               AS avg_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 / COUNT(*) AS avg_price,
           CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
"""

_Q3_SQL = f"""
    SELECT l.l_orderkey,
           CAST(SUM({_CENTS.replace('l_extendedprice', 'l.l_extendedprice')
                     .replace('l_discount', 'l.l_discount')}) AS BIGINT)
               AS revenue_cents,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue_cents DESC, l.l_orderkey
    LIMIT 10
"""

_Q5_SQL = f"""
    SELECT n.n_name,
           CAST(SUM({_CENTS.replace('l_extendedprice', 'l.l_extendedprice')
                     .replace('l_discount', 'l.l_discount')}) AS BIGINT)
               AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
"""

_Q6_SQL = """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

_Q10_SQL = f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_CENTS.replace('l_extendedprice', 'l.l_extendedprice')
                     .replace('l_discount', 'l.l_discount')}) AS BIGINT)
               AS revenue_cents,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_cents DESC, c.c_custkey
    LIMIT 20
"""

_Q14_SQL = """
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(FLOOR(l.l_extendedprice
                                         * (1.0 - l.l_discount) * 100
                                         + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                               * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents,
           FLOOR(100.0
                 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(FLOOR(l.l_extendedprice
                                                 * (1.0 - l.l_discount)
                                                 * 100 + 0.5) AS BIGINT)
                                 ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST(FLOOR(l.l_extendedprice
                                       * (1.0 - l.l_discount) * 100
                                       + 0.5) AS BIGINT)) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""

_PACK = (
    ("q_tpch_q1", ("lineitem",), _Q1_SQL,
     "TPC-H Q1 pricing summary: the canonical full-scan aggregate "
     "(4 sums, 3 averages, count over two grouping flags). Exact-cents "
     "sums; averages are exact-int-over-count double divisions."),
    ("q_tpch_q3", ("customer", "orders", "lineitem"), _Q3_SQL,
     "TPC-H Q3 shipping priority: BUILDING-segment orders placed before "
     "and shipped after the cutoff; 3-table join, top-10 by revenue "
     "(explicit l_orderkey tie-break added — the spec leaves ties "
     "undefined, hashes cannot)."),
    ("q_tpch_q5", ("customer", "orders", "lineitem", "supplier",
                   "nation", "region"), _Q5_SQL,
     "TPC-H Q5 local supplier volume: the 6-table snowflake whose "
     "c_nationkey = s_nationkey equality closes a cycle in the join "
     "graph — the classic join-order stress; Catalyst broadcasts the "
     "dimension chain."),
    ("q_tpch_q6", ("lineitem",), _Q6_SQL,
     "TPC-H Q6 forecasting revenue change: the selective filter-"
     "aggregate whose predicates (date range, discount band, quantity "
     "cap) all push to the parquet scan."),
    ("q_tpch_q10", ("customer", "orders", "lineitem", "nation"), _Q10_SQL,
     "TPC-H Q10 returned item reporting: quarter of orders x returned "
     "lineitems, revenue by customer, top-20 (explicit c_custkey "
     "tie-break)."),
    ("q_tpch_q14", ("lineitem", "part"), _Q14_SQL,
     "TPC-H Q14 promotion effect: conditional-aggregate ratio over a "
     "one-month shipdate slice joined to part; the percentage is one "
     "double division of two exact integer sums, rounded 6dp."),
)

# Bench headliners: the full-scan aggregate, the 6-table snowflake, and
# the IN-subquery re-join — the three classic plan shapes worth tracking
# per-round in BENCH_r{N}.json.
_BENCH = {"q_tpch_q1", "q_tpch_q5", "q_tpch_q18"}

for _name, _tables, _sql, _doc in _PACK:
    _fn, _oracle = _sql_pair(_name, _tables, _sql)
    register(_name, oracle=_oracle,
             doc=_doc + " Spark runs the IDENTICAL SQL text over temp "
                        "views (parser parity); the oracle runs it on "
                        "DuckDB.",
             tags=("tpch", "sql"), bench=_name in _BENCH)(_fn)


# --- pack 2: Q7, Q13, Q15, Q17, Q18 -------------------------------------------------

_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume_cents) AS BIGINT) AS revenue_cents
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               YEAR(l.l_shipdate) AS l_year,
               CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100
                          + 0.5) AS BIGINT) AS volume_cents
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""

_Q13_SQL = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
"""

_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                   * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
"""

_Q17_SQL = """
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS small_cents,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           FLOOR(CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 100 / 7.0 * 1e6
                 + 0.5) / 1e6 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = (SELECT MIN(p_brand) FROM part)
      AND l.l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE)
                        / COUNT(*))
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
"""

_Q18_SQL = """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 20
"""

_PACK2 = (
    ("q_tpch_q7", ("supplier", "lineitem", "orders", "customer",
                   "nation"), _Q7_SQL,
     "TPC-H Q7 volume shipping: bilateral trade between two nations by "
     "ship year — the double-role nation dimension (n1 supplier-side, "
     "n2 customer-side) with a symmetric OR predicate."),
    ("q_tpch_q13", ("customer", "orders"), _Q13_SQL,
     "TPC-H Q13 customer distribution: LEFT OUTER JOIN with the filter "
     "ON THE JOIN (not WHERE — customers with zero qualifying orders "
     "must survive as c_count=0), then the distribution of counts. The "
     "o_orderpriority filter stands in for the spec's o_comment NOT "
     "LIKE (no comment column in the fixtures)."),
    ("q_tpch_q15", ("supplier", "lineitem"), _Q15_SQL,
     "TPC-H Q15 top supplier: quarterly revenue CTE consumed twice "
     "(join probe + MAX scalar subquery) — the view-reuse shape; exact "
     "integer cents make the MAX-equality tie-safe."),
    ("q_tpch_q17", ("lineitem", "part"), _Q17_SQL,
     "TPC-H Q17 small-quantity-order revenue: the correlated scalar "
     "subquery (per-part 20%-of-average quantity threshold) Catalyst "
     "rewrites to an aggregate + self-join; the brand parameter is "
     "derived (MIN brand) instead of a spec constant. avg_yearly is "
     "one double division of an exact cents sum, 6dp."),
    ("q_tpch_q18", ("customer", "orders", "lineitem"), _Q18_SQL,
     "TPC-H Q18 large-volume customers: HAVING-filtered IN subquery "
     "over the same fact table, re-joined for reporting, top-20 with "
     "explicit (o_orderdate, o_orderkey) tie-breaks after the spec's "
     "o_totalprice ordering."),
)

for _name, _tables, _sql, _doc in _PACK2:
    _fn, _oracle = _sql_pair(_name, _tables, _sql)
    register(_name, oracle=_oracle,
             doc=_doc + " Spark runs the IDENTICAL SQL text over temp "
                        "views; the oracle runs it on DuckDB.",
             tags=("tpch", "sql"), bench=_name in _BENCH)(_fn)


_Q8_SQL = """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3'
                         THEN volume_cents ELSE 0 END) AS BIGINT)
               AS nation_cents,
           CAST(SUM(volume_cents) AS BIGINT) AS total_cents,
           FLOOR(CAST(SUM(CASE WHEN nation = 'NATION_3'
                               THEN volume_cents ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume_cents) AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS mkt_share
    FROM (
        SELECT YEAR(o.o_orderdate) AS o_year,
               CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100
                          + 0.5) AS BIGINT) AS volume_cents,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
          AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
"""

_fn8, _oracle8 = _sql_pair(
    "q_tpch_q8",
    ("part", "lineitem", "supplier", "orders", "customer", "nation",
     "region"), _Q8_SQL)
register(
    "q_tpch_q8", oracle=_oracle8,
    doc="TPC-H Q8 national market share: the 8-way join (nation twice — "
        "customer-side restricts the market region, supplier-side labels "
        "the competitor) feeding a conditional-aggregate share ratio per "
        "order year; the largest join graph in the pack. Share is one "
        "double division of exact integer cents, 6dp. Spark runs the "
        "IDENTICAL SQL text over temp views; the oracle runs it on "
        "DuckDB.",
    tags=("tpch", "sql"))(_fn8)


# --- pack 3: Q4, Q9, Q19, Q21, Q22 ---------------------------------------
# The fixture lacks l_commitdate/l_receiptdate (Q4, Q21's lateness test),
# partsupp (Q9's supply cost), p_container + l_shipmode/l_shipinstruct
# (Q19's extra conjuncts), and c_phone (Q22's country code). Each query
# below keeps the published join graph, subquery structure, and aggregate
# shape, substituting the nearest fixture-expressible predicate and
# documenting the substitution. Everything else is verbatim.

_Q4_SQL = """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT * FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
    GROUP BY o.o_orderpriority
"""

_Q9_SQL = """
    SELECT supp_nation, o_year,
           CAST(SUM(amount_cents) AS BIGINT) AS profit_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM (
        SELECT n.n_name AS supp_nation,
               YEAR(o.o_orderdate) AS o_year,
               CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100
                          + 0.5) AS BIGINT) AS amount_cents
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY supp_nation, o_year
"""

_Q19_SQL = """
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                               * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""

_Q21_SQL = """
    WITH flagged AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN flagged l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (
          SELECT * FROM flagged l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT * FROM flagged l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.late = 1)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
"""

_Q22_SQL = """
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(acctbal_cents) AS BIGINT) AS totacctbal_cents
    FROM (
        SELECT CAST(c.c_nationkey AS INT) AS cntrycode,
               CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)
                   AS acctbal_cents
        FROM customer c
        WHERE c.c_nationkey IN (2, 3, 7, 11, 15, 19, 23)
          AND CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) > (
              SELECT CAST(SUM(CAST(FLOOR(c2.c_acctbal * 100 + 0.5)
                                   AS BIGINT)) AS DOUBLE) / COUNT(*)
              FROM customer c2
              WHERE c2.c_acctbal > 0.0
                AND c2.c_nationkey IN (2, 3, 7, 11, 15, 19, 23))
          AND NOT EXISTS (
              SELECT * FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    ) custsale
    GROUP BY cntrycode
"""

_PACK3 = (
    ("q_tpch_q4", ("orders", "lineitem"), _Q4_SQL,
     "TPC-H Q4 order priority checking: the quarter-sliced EXISTS "
     "semi-join counting orders by priority. The spec's lateness test "
     "(l_commitdate < l_receiptdate — columns absent) is substituted "
     "with ship-lag > 60 days, which keeps the correlated-EXISTS-into-"
     "semi-join plan shape; the correlation binds BOTH the join key and "
     "the outer o_orderdate in the comparison."),
    ("q_tpch_q9", ("part", "lineitem", "supplier", "orders", "nation"),
     _Q9_SQL,
     "TPC-H Q9 product type profit: the 5-way join grouped by supplier "
     "nation x order year with a LIKE filter on part name. The spec's "
     "profit subtracts ps_supplycost*l_quantity (partsupp absent); the "
     "adaptation keeps the join graph and grouping and reports exact "
     "revenue cents."),
    ("q_tpch_q19", ("lineitem", "part"), _Q19_SQL,
     "TPC-H Q19 discounted revenue: the three-branch OR-of-ANDs join "
     "predicate over brand x size-band x quantity-band — the classic "
     "CNF-conversion stress where the common p_partkey equality must "
     "still drive a hash join and the disjunction becomes a post-join "
     "filter. Spec conjuncts on absent columns (p_container, "
     "l_shipmode, l_shipinstruct) are dropped; size bands stand in for "
     "container classes."),
    ("q_tpch_q21", ("supplier", "lineitem", "orders"), _Q21_SQL,
     "TPC-H Q21 suppliers who kept orders waiting: EXISTS (another "
     "supplier on the order) + NOT EXISTS (another LATE supplier) over "
     "the same flagged fact — the double-anti-self-join shape. Lateness "
     "is ship-lag > 60 days via a shared CTE (commit/receipt dates "
     "absent), which also keeps each subquery single-level correlated. "
     "Top-20 with explicit s_name tie-break."),
    ("q_tpch_q22", ("customer", "orders"), _Q22_SQL,
     "TPC-H Q22 global sales opportunity: positive-balance average as "
     "an uncorrelated scalar subquery, balance-above-average customers "
     "with a NOT EXISTS anti-join on orders, grouped by country code. "
     "c_nationkey stands in for the spec's phone-prefix country code "
     "(no c_phone column), and the anti-join tests dormancy (no order "
     "since 1999) because every fixture customer has SOME order; the "
     "average threshold is computed in exact integer cents over a "
     "double division so both engines compare identical values."),
)

for _name, _tables, _sql, _doc in _PACK3:
    _fn, _oracle = _sql_pair(_name, _tables, _sql)
    register(_name, oracle=_oracle,
             doc=_doc + " Spark runs the IDENTICAL SQL text over temp "
                        "views; the oracle runs it on DuckDB.",
             tags=("tpch", "sql"), bench=_name in _BENCH)(_fn)


# --- pack 4: Q2, Q11, Q12, Q16, Q20 — completing the pack (22 of 22) ---------
# The five remaining queries need the partsupp table, which the fixtures
# lack. Rather than drop them, partsupp is SYNTHESIZED deterministically
# inside each query as a CTE from part x (4 supplier slots): supplier
# assignment, availqty, and supplycost (exact integer cents) are all
# integer arithmetic on p_partkey — both engines build the IDENTICAL
# table from the identical SQL text, so the oracle checks the published
# query logic over it (the same discipline as plans/cleaning.py's
# synthesized dirty columns). Q12 needs only an adaptation: l_returnflag
# stands in for the absent l_shipmode, ship-lag > 60 days for the absent
# commit/receipt lateness.

_PARTSUPP_CTE = """
    partsupp AS (
        SELECT p.p_partkey AS ps_partkey,
               (p.p_partkey + i.i * 7)
                   % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
               1 + (p.p_partkey * 13 + i.i * 17) % 9999 AS ps_availqty,
               100 + (p.p_partkey * 31 + i.i * 101) % 99900
                   AS ps_supplycost_cents
        FROM part p
        CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
    )
"""

_Q2_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           CAST(ps.ps_supplycost_cents AS BIGINT) AS cost_cents
    FROM part p
    JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
      AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost_cents = (
          SELECT MIN(ps2.ps_supplycost_cents)
          FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
"""

_Q11_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT ps.ps_partkey,
           CAST(SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
               AS value_cents
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY ps.ps_partkey
    HAVING SUM(ps.ps_supplycost_cents * ps.ps_availqty) * 250 > (
        SELECT SUM(ps2.ps_supplycost_cents * ps2.ps_availqty)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        WHERE n2.n_name = 'NATION_3')
"""

_Q12_SQL = """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT',
                                                        '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
"""

_Q16_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 7, 14, 23, 36, 45, 49)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
"""

_Q20_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT s.s_name, s.s_suppkey, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps.ps_availqty * 2 > (
              SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l.l_shipdate < TIMESTAMP '1997-01-01'))
    ORDER BY s.s_name, s.s_suppkey
"""

_PACK4 = (
    ("q_tpch_q2", ("part", "supplier", "nation", "region"), _Q2_SQL,
     "TPC-H Q2 minimum cost supplier: the correlated MIN scalar "
     "subquery that re-walks the whole partsupp->supplier->nation->"
     "region chain per part — the classic decorrelation stress "
     "(Catalyst rewrites it to an aggregate + self-join on the CTE). "
     "partsupp is the synthesized CTE; p_brand projects for the absent "
     "p_mfgr; size/type filters pick the fixture's STANDARD small "
     "parts; spec ORDER BY with p_partkey as the added tie-break."),
    ("q_tpch_q11", ("part", "supplier", "nation"), _Q11_SQL,
     "TPC-H Q11 important stock: per-part inventory value within one "
     "nation, HAVING-filtered against a scalar fraction of the SAME "
     "aggregate over the SAME scope — the aggregate-reuse shape. "
     "Exact integer cents x availqty products; the spec's "
     "0.0001/SF fraction becomes 1/250 at fixture scale so the HAVING "
     "actually cuts."),
    ("q_tpch_q12", ("orders", "lineitem"), _Q12_SQL,
     "TPC-H Q12 shipping modes and priority: the two-branch "
     "conditional count over a year of late lineitems, grouped by "
     "mode. l_returnflag stands in for the absent l_shipmode and "
     "ship-lag > 60 days for the absent commit/receipt lateness; the "
     "join graph, urgency CASE branches, and aggregate shape are "
     "verbatim."),
    ("q_tpch_q16", ("part", "supplier"), _Q16_SQL,
     "TPC-H Q16 parts/supplier relationship: COUNT(DISTINCT suppkey) "
     "per (brand, type, size) cell with a NOT IN supplier blacklist "
     "(negative account balance stands in for the spec's complaint-"
     "comment scan — no comment column). The anti-subquery + "
     "distinct-aggregate combination."),
    ("q_tpch_q20", ("supplier", "nation", "part", "lineitem"), _Q20_SQL,
     "TPC-H Q20 potential part promotion: nested IN subqueries ending "
     "in a correlated half-of-shipped-quantity threshold per "
     "(part, supplier) — suppliers overstocked on promotable parts. "
     "Pairs with no shipments compare against NULL and drop on both "
     "engines; the spec's nation restriction is lifted (reported "
     "instead) so the fixture-scale result stays non-trivial."),
)

for _name, _tables, _sql, _doc in _PACK4:
    _fn, _oracle = _sql_pair(_name, _tables, _sql)
    register(_name, oracle=_oracle,
             doc=_doc + " Spark runs the IDENTICAL SQL text over temp "
                        "views; the oracle runs it on DuckDB.",
             tags=("tpch", "sql"))(_fn)
