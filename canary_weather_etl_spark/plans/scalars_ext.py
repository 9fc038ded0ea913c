"""Extended scalar-function coverage (SURVEY.md §2.8 families, widened):
the string/date vocabulary a weather-analytics user reaches for beyond the
exact functions the reference used."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, register


@register(
    "q_scalar_string_ext",
    oracle="""
    SELECT c_custkey,
           substring(c_name, 10, 5) AS name_mid,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
           reverse(c_mktsegment) AS seg_rev,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           trim(concat('  ', c_mktsegment, ' ')) AS seg_trim
    FROM customer
    WHERE c_custkey % 7 = 0
    """,
    doc="Extended string family: substring, replace, instr, lpad, reverse, "
        "translate, trim — all JVM built-ins with exact DuckDB twins.",
    tags=("scalar",),
)
def q_scalar_string_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 0)
    return c.select(
        "c_custkey",
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
    )


@register(
    "q_scalar_date_ext",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS ship_by,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
                AS INT) AS days_to_1999,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
    doc="Extended date family: date_add, datediff, last_day, date_trunc, "
        "weekofyear, dayofweek. DuckDB numbers weekdays 0=Sunday while "
        "Spark uses 1=Sunday — the oracle shifts by one.",
    tags=("scalar",),
)
def q_scalar_date_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    return o.select(
        "o_orderkey",
        F.date_add(F.to_date("o_orderdate"), 30).alias("ship_by"),
        F.datediff(F.lit("1999-01-01").cast("date"),
                   F.to_date("o_orderdate")).alias("days_to_1999"),
        F.last_day("o_orderdate").alias("month_end"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofweek("o_orderdate").alias("dow"),
    )


@register(
    "q_hash_functions",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           length(md5(text)) AS md5_len
    FROM documents
    WHERE doc_id % 5 = 0
    """,
    doc="Cryptographic hash family over string content: md5 / sha256 — the "
        "portable content-keying functions (xxhash64 is engine-internal; "
        "these two agree across every engine and are the cross-system "
        "dedup-key choice).",
    tags=("scalar", "hash"),
)
def q_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.length(F.md5("text")).alias("md5_len"),
    )


@register(
    "q_bool_aggs",
    oracle="""
    SELECT event_type,
           bool_or(value > 400) AS any_large,
           bool_and(value > 5) AS all_above5,
           CAST(count_if(value > 100) AS BIGINT) AS n_over100,
           CAST(count_if(props LIKE '%"k": 9%') AS BIGINT) AS n_k_9x
    FROM events
    GROUP BY event_type
    """,
    doc="Boolean aggregate family: bool_or / bool_and (any/every) and "
        "conditional counting — the assertion-style aggregates a data "
        "quality gate composes.",
    tags=("agg", "bool"),
)
def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.bool_or(F.col("value") > 400).alias("any_large"),
            F.bool_and(F.col("value") > 5).alias("all_above5"),
            F.count_if(F.col("value") > 100).alias("n_over100"),
            F.count_if(F.col("props").like('%"k": 9%')).alias("n_k_9x"),
        )
    )
