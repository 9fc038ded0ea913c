"""Array / JSON / SQL-façade queries (SURVEY.md §2.8 array+JSON families,
§3.2 SQL entry point).

The array family is the heart of the reference's ingestion rewrite: the
struct-of-arrays flatten is `arrays_zip`+`explode` (SURVEY.md §4.2 calls it
'the single most important rewrite'). The weather tests exercise it on raw
JSON; these queries expose the same operators over the fixture tables so
the DuckDB oracle can hash-check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, register


@register(
    "q_array_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(i - 1 AS INT) AS pos,
           embedding[i] AS val
    FROM (SELECT vec_id, embedding,
                 unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings
          WHERE vec_id < 20)
    """,
    doc="posexplode of an array column (README.md:648's explode, with "
        "position): array<float> → (pos, val) rows. Values pass through "
        "untouched — float-exact across engines.",
    tags=("array",),
)
def q_array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


@register(
    "q_arrays_zip_explode",
    oracle="""
    SELECT vec_id,
           CAST(i - 1 AS INT) AS pos,
           embedding[i] AS lo,
           embedding[i + 32] AS hi,
           CAST(embedding[i] AS DOUBLE) * CAST(embedding[i + 32] AS DOUBLE)
               AS prod
    FROM (SELECT vec_id, embedding,
                 unnest(generate_series(1, 32)) AS i
          FROM embeddings
          WHERE vec_id < 20)
    """,
    doc="arrays_zip + explode — THE struct-of-arrays flatten (replaces the "
        "reference's driver-side parallel-array zip, README.md:694-725): "
        "two parallel 32-slices of the embedding zipped positionally, "
        "exploded to one row per index, with a derived product column.",
    tags=("array",),
)
def q_arrays_zip_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    zipped = e.select(
        "vec_id",
        F.posexplode(
            F.arrays_zip(
                F.slice("embedding", 1, 32).alias("lo"),
                F.slice("embedding", 33, 32).alias("hi"),
            )
        ).alias("pos", "z"),
    )
    return zipped.select(
        "vec_id", "pos",
        F.col("z.lo").alias("lo"),
        F.col("z.hi").alias("hi"),
        (F.col("z.lo").cast("double") * F.col("z.hi").cast("double")).alias("prod"),
    )


@register(
    "q_array_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           list_max(embedding) AS mx,
           list_min(embedding) AS mn,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings
    """,
    doc="Array scalar family: size (README.md:696's length checks), "
        "array_max/array_min, filter — per-row array reductions, all "
        "codegen'd.",
    tags=("array",),
)
def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max("embedding").alias("mx"),
        F.array_min("embedding").alias("mn"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "q_from_json",
    oracle="""
    SELECT event_id,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT) AS k,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT) % 10
               AS k_mod
    FROM events
    WHERE CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT) >= 50
    """,
    doc="from_json with an explicit schema over events.props (SURVEY.md "
        "§2.8 JSON family; get_json_object covered by q_json_extract) — "
        "typed struct access, filter pushed onto the parsed field.",
    tags=("json",),
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        F.from_json("props", "k BIGINT").alias("p"),
    )
    return (
        parsed.select("event_id", F.col("p.k").alias("k"))
        .filter(F.col("k") >= 50)
        .withColumn("k_mod", F.col("k") % 10)
    )


_REF_Q1_SQL = """
    SELECT l_returnflag AS location,
           ROUND(AVG(l_extendedprice) / 3600, 2) AS avg_sunshine_hours
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY avg_sunshine_hours DESC
"""


@register(
    "q_sql_facade",
    oracle="""
    SELECT l_returnflag AS location,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
                 / COUNT(l_extendedprice) / 3600, 2) AS avg_sunshine_hours
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY avg_sunshine_hours DESC
    """,
    doc="SQL façade (SURVEY.md §3.2): temp view + spark.sql running the "
        "reference's Q1 shape verbatim (README.md:778-783, transposed "
        "column names). Proves the Athena entry point maps 1:1 onto "
        "Spark SQL. The Spark side uses the decimal-exact AVG inside the "
        "SQL text itself.",
    tags=("sql",),
)
def q_sql_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT l_returnflag AS location,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
                     / COUNT(l_extendedprice) / 3600, 2) AS avg_sunshine_hours
        FROM lineitem_v
        GROUP BY l_returnflag
        ORDER BY avg_sunshine_hours DESC
    """)


@register(
    "q_unpivot_metrics",
    oracle="""
    WITH m AS (
        SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'discount', l_discount FROM lineitem
    )
    SELECT metric,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS DOUBLE) / 100
               / COUNT(val) AS avg_val,
           MIN(val) AS mn,
           MAX(val) AS mx
    FROM m GROUP BY metric
    """,
    doc="Unpivot/melt (wide→long): the climatology shape — N metric "
        "columns stacked into (metric, value) rows, then profiled per "
        "metric in one aggregate. Spark `unpivot` (a.k.a. melt); oracle is "
        "the UNION ALL rewrite.",
    tags=("reshape", "agg"),
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn("metric",
                 F.regexp_replace("metric", "^l_", ""))
    return (
        long.groupBy("metric")
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.round(F.col("val") * 100).cast("long")).cast("double")
              / 100 / F.count("val")).alias("avg_val"),
             F.min("val").alias("mn"),
             F.max("val").alias("mx"))
    )


@register(
    "q_na_handling",
    oracle="""
    WITH holes AS (
        SELECT event_id,
               NULLIF(event_type, 'error') AS et,
               CASE WHEN value < 20 THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT event_id,
           COALESCE(et, 'redacted') AS et_filled,
           COALESCE(v, -1.0) AS v_filled
    FROM holes
    WHERE NOT (et IS NULL AND v IS NULL)
    """,
    doc="Null-handling family: nulls injected (nullif / conditional), then "
        "na.fill per-column defaults and na.drop(how='all' over the "
        "nullable cols) — the standard raw-feed repair step. Oracle is the "
        "COALESCE/WHERE rewrite.",
    tags=("scalar", "nulls"),
)
def q_na_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    holes = ev.select(
        "event_id",
        F.nullif("event_type", F.lit("error")).alias("et"),
        F.when(F.col("value") < 20, None).otherwise(F.col("value")).alias("v"),
    )
    return (
        holes.na.drop(how="all", subset=["et", "v"])
        .na.fill({"et": "redacted", "v": -1.0})
        .withColumnsRenamed({"et": "et_filled", "v": "v_filled"})
    )


@register(
    "q_bitwise_ops",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           CAST(xor(event_id, 21845) AS BIGINT) AS xored,
           event_id << 3 AS shifted_l,
           event_id >> 2 AS shifted_r,
           CAST(bit_count(event_id) AS INT) AS popcount
    FROM events
    WHERE event_id % 13 = 0
    """,
    doc="Bitwise family: and/or/xor/shifts/popcount — the machinery "
        "SimHash and bit-packed signatures are built from "
        "(operators/dedup.simhash, hamming_distance).",
    tags=("scalar", "bitwise"),
)
def q_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft("event_id", 3).alias("shifted_l"),
        F.shiftright("event_id", 2).alias("shifted_r"),
        F.bit_count("event_id").alias("popcount"),
    )


@register(
    "q_array_setops",
    oracle="""
    SELECT vec_id,
           list_sort(list_intersect(lo_pos, hi_pos)) AS common_pos,
           CAST(len(list_intersect(lo_pos, hi_pos)) AS INT) AS n_common,
           list_has_all(lo_pos, list_intersect(lo_pos, hi_pos)) AS sanity
    FROM (
        SELECT vec_id,
               list_filter(generate_series(1, 32),
                           i -> embedding[i] > 0) AS lo_pos,
               list_filter(generate_series(1, 32),
                           i -> embedding[i + 32] > 0) AS hi_pos
        FROM embeddings WHERE vec_id < 50
    )
    """,
    doc="Array set operations: per-vector positive-position sets from two "
        "halves of the embedding, intersected and containment-checked "
        "(array_intersect / forall — the verification machinery of the "
        "near-dup ops as a first-class query). Both engines sort the "
        "intersection (element order is implementation-defined).",
    tags=("array", "setop"),
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    idx = F.sequence(F.lit(1), F.lit(32))
    lo_pos = F.filter(idx, lambda i: F.element_at("embedding", i) > 0)
    hi_pos = F.filter(idx, lambda i: F.element_at("embedding", i + 32) > 0)
    common = F.array_sort(F.array_intersect(lo_pos, hi_pos))
    return e.select(
        "vec_id",
        common.alias("common_pos"),
        F.size(F.array_intersect(lo_pos, hi_pos)).alias("n_common"),
        F.forall(F.array_intersect(lo_pos, hi_pos),
                 lambda x: F.array_contains(lo_pos, x)).alias("sanity"),
    )


@register(
    "q_map_type_ops",
    oracle="""
    SELECT event_id,
           'k' AS first_key,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT)
               AS first_val,
           CAST(1 AS INT) AS n_entries,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT) >= 50
               AS has_large
    FROM events
    WHERE event_id % 17 = 0
    """,
    doc="MapType surface (SURVEY.md §1.2 — the props extension): "
        "from_json into map<string,bigint>, then map_keys / element_at / "
        "size / exists over the map. The oracle reaches the same values "
        "via regexp (DuckDB's map type isn't needed to verify the "
        "semantics, only the outputs).",
    tags=("map", "json"),
)
def q_map_type_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(F.map_values(m), 1).alias("first_val"),
        F.size(m).alias("n_entries"),
        F.exists(F.map_values(m), lambda v: v >= 50).alias("has_large"),
    )
