"""File-format sink/scan round trips, driver-visible (SURVEY.md §2.1).

The reference's storage surface is JSON-in / Parquet-out (README.md:621,
750-752). A general engine also needs delimited-text and JSON-lines
sinks+scans — the formats training corpora actually arrive in. The pytest
layer (tests/test_formats.py) covers CSV/JSONL/ORC byte-fidelity; these
queries add the hard external check: write a fixture table out through the
Spark sink, read it back through the Spark scan WITH AN EXPLICIT SCHEMA
(no inference pass — SURVEY.md §4.2), aggregate, and hash-compare against
DuckDB computing the same aggregate from the original parquet. Any
row/value corruption in either direction breaks the hash.

At 100 TB: both sinks shard one file per task (the directory IS the
dataset); the scans glob those shards back. Schema inference would be a
second full pass over the data — the explicit StructType is the point.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import exact_sum
from .registry import load, register

_SUPPLIER_SCHEMA = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])


@register(
    "q_csv_roundtrip",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(ROUND(s_acctbal * 1e2) AS BIGINT)) AS DOUBLE)
               / 1e2 AS total_bal,
           CAST(SUM(length(s_name)) AS BIGINT) AS name_chars
    FROM supplier
    GROUP BY s_nationkey
    """,
    doc="CSV sink + scan fidelity, externally checked: supplier is written "
        "through df.write.csv (header, explicit quoting) into a "
        "per-invocation scratch dir, read back with an explicit StructType "
        "(no inference pass — schema inference is a second full scan at "
        "100 TB, SURVEY.md §4.2), and aggregated. The oracle computes the "
        "same aggregate from the ORIGINAL parquet, so any value lost or "
        "mangled in text serialization (double round-trip, quoting, "
        "nulls) breaks the hash. Doubles survive because Spark writes "
        "shortest-roundtrip representations.",
    tags=("source", "sink"),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="canary_csv_roundtrip_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = os.path.join(base, "supplier_csv")
    (load(spark, sf_dir, "supplier")
     .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
     .write.mode("overwrite").option("header", "true").csv(path))
    back = (spark.read.schema(_SUPPLIER_SCHEMA)
            .option("header", "true").csv(path))
    return (
        back.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"),
             exact_sum("s_acctbal", scale=2).alias("total_bal"),
             F.sum(F.length("s_name")).alias("name_chars"))
    )


@register(
    "q_jsonl_roundtrip",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source, lang
    """,
    doc="JSON-lines sink + scan fidelity: documents written through "
        "df.write.json (one JSON object per line — the corpus interchange "
        "format, unlike the reference's whole-file multiLine documents, "
        "README.md:621) and read back with an explicit schema. Line-mode "
        "JSON is the 100 TB shape: splittable, so one 1 GB shard fans out "
        "across tasks, where multiLine forces one task per file. Oracle "
        "aggregates the original parquet — any text mangled by JSON "
        "escaping round-trip breaks the hash.",
    tags=("source", "sink"),
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="canary_jsonl_roundtrip_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = os.path.join(base, "documents_jsonl")
    (load(spark, sf_dir, "documents")
     .select("doc_id", "text", "lang", "source")
     .write.mode("overwrite").json(path))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ])
    back = spark.read.schema(schema).json(path)  # line-mode: splittable
    return (
        back.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.length("text")).alias("total_chars"))
    )


@register(
    "q_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE)
               / 1e2 AS total_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="ORC sink + scan fidelity: orders written through df.write.orc "
        "(the columnar alternative when the lakehouse standard is "
        "ORC/Hive rather than parquet — same predicate-pushdown and "
        "column-pruning contract) and read back. ORC is binary+typed, so "
        "unlike the text round trips nothing is at risk in serialization "
        "format-wise; what the hash checks is the write→read path itself "
        "(schema preservation, null handling, split planning). Oracle "
        "aggregates the ORIGINAL parquet.",
    tags=("source", "sink"),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="canary_orc_roundtrip_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = os.path.join(base, "orders_orc")
    (load(spark, sf_dir, "orders")
     .select("o_orderkey", "o_orderstatus", "o_totalprice")
     .write.mode("overwrite").orc(path))
    back = spark.read.orc(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             exact_sum("o_totalprice", scale=2).alias("total_price"),
             F.min("o_orderkey").alias("min_key"),
             F.max("o_orderkey").alias("max_key"))
    )


@register(
    "q_xml_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_rt,
           o_totalprice AS total_rt,
           o_orderpriority AS priority_rt
    FROM orders
    """,
    doc="XML round trip via Spark 4's built-in XML functions: each order "
        "serialized with to_xml(struct(...)) and parsed back with "
        "from_xml under an explicit schema — the fourth serialization "
        "surface next to CSV/JSONL/ORC. Doubles survive exactly "
        "(Double.toString shortest-repr → parseDouble is lossless), so "
        "the oracle is simply the source columns: any divergence is a "
        "round-trip defect. Both directions are row-wise JVM expressions "
        "— no shuffle, no UDF.",
    tags=("formats",),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    xml = F.to_xml(F.struct(
        F.col("o_orderkey"), F.col("o_orderstatus"),
        F.col("o_totalprice"), F.col("o_orderpriority")))
    parsed = F.from_xml(
        xml,
        "o_orderkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderpriority STRING")
    return o.select(parsed.alias("v")).select(
        F.col("v.o_orderkey").alias("o_orderkey"),
        F.col("v.o_orderstatus").alias("status_rt"),
        F.col("v.o_totalprice").alias("total_rt"),
        F.col("v.o_orderpriority").alias("priority_rt"))


@register(
    "q_jsonl_quarantine",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_bad,
           CAST(SUM(n_chars) AS BIGINT) AS chars_good,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum_good
    FROM documents
    """,
    doc="Malformed-record quarantine (sources/schema_guard."
        "read_jsonl_quarantine): documents written as JSONL, then THREE "
        "poison lines appended — raw garbage, truncated JSON, and a "
        "type-conflicting field — and read back in PERMISSIVE mode with "
        "columnNameOfCorruptRecord. Every clean row must survive into "
        "`good` (the oracle aggregates the original parquet) and every "
        "poison line must land in quarantine with its raw text (n_bad "
        "pinned to the 3 planted lines): nothing silently dropped "
        "(DROPMALFORMED) and no poison-pill job abort (FAILFAST) — the "
        "dead-letter discipline a 100 TB ingest needs; the quarantined "
        "raw text is the re-ingestion path.",
    tags=("source", "quality"),
)
def q_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.schema_guard import read_jsonl_quarantine

    base = tempfile.mkdtemp(prefix="canary_jsonl_quarantine_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = os.path.join(base, "documents_jsonl")
    (load(spark, sf_dir, "documents")
     .select("doc_id", "text", "n_chars")
     .write.mode("overwrite").json(path))
    with open(os.path.join(path, "part-poison.json"), "w",
              encoding="utf-8") as f:
        f.write("not json at all }{\n")
        f.write('{"doc_id": 999999, "text": "truncated",\n')
        f.write('{"doc_id": "type-conflict", "text": "x", "n_chars": 1}\n')
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    good, bad = read_jsonl_quarantine(spark, path, schema)
    n_bad = bad.agg(F.count(F.lit(1)).alias("n_bad"))
    return (
        good.agg(F.count(F.lit(1)).alias("n_good"),
                 F.sum("n_chars").alias("chars_good"),
                 F.sum("doc_id").alias("id_sum_good"))
        .crossJoin(F.broadcast(n_bad))
        .select("n_good", "n_bad", "chars_good", "id_sum_good")
    )
