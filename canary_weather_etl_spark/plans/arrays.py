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
    "q_array_composite",
    oracle="""
    WITH pv AS (
        SELECT vec_id, embedding,
               CAST(len(embedding) AS INT) AS dim,
               list_max(embedding) AS mx,
               list_min(embedding) AS mn,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
               list_sort(list_intersect(
                   list_filter(generate_series(1, 32),
                               i -> embedding[i] > 0),
                   list_filter(generate_series(1, 32),
                               i -> embedding[i + 32] > 0))) AS common_l,
               list_filter(generate_series(1, 32),
                           i -> embedding[i] > 0) AS lo_pos
        FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id, dim, mx, mn, n_pos,
           array_to_string(common_l, ' ') AS common_pos,
           CAST(len(common_l) AS INT) AS n_common,
           list_has_all(lo_pos, common_l) AS sanity,
           CAST(i - 1 AS INT) AS pos,
           embedding[i] AS val
    FROM (SELECT *, unnest(generate_series(1, len(embedding))) AS i FROM pv)
    """,
    doc="Array-family composite (folds the former q_array_posexplode / "
        "q_array_stats / q_array_setops — one driver row now pins every "
        "function). Per family: posexplode → (pos, val) rows "
        "(README.md:648's explode, with position; values float-exact); "
        "array scalars size/array_max/array_min/filter (README.md:696's "
        "length checks); set ops array_intersect/array_sort/forall/"
        "array_contains — the verification machinery of the near-dup "
        "operators as a first-class query. The intersection is sorted in "
        "native int order then stringified (the driver's canonicalizer "
        "cannot hash list-typed cells). Scope vec_id<50 — the union of the "
        "folded queries' widest subset (the old setops range), not the "
        "posexplode-only <20.",
    tags=("array", "setop"),
)
def q_array_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    idx = F.sequence(F.lit(1), F.lit(32))
    lo_pos = F.filter(idx, lambda i: F.element_at("embedding", i) > 0)
    hi_pos = F.filter(idx, lambda i: F.element_at("embedding", i + 32) > 0)
    common = F.array_sort(F.array_intersect(lo_pos, hi_pos))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max("embedding").alias("mx"),
        F.array_min("embedding").alias("mn"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.array_join(F.transform(common, lambda x: x.cast("string")),
                     " ").alias("common_pos"),
        F.size(common).alias("n_common"),
        F.forall(common, lambda x: F.array_contains(lo_pos, x)).alias("sanity"),
        F.posexplode("embedding").alias("pos", "val"),
    )


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
    "q_events_scalar_composite",
    oracle="""
    WITH holes AS (
        SELECT event_id,
               event_id & 255 AS low_byte,
               event_id | 4096 AS with_flag,
               CAST(xor(event_id, 21845) AS BIGINT) AS xored,
               event_id << 3 AS shifted_l,
               event_id >> 2 AS shifted_r,
               CAST(bit_count(event_id) AS INT) AS popcount,
               CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT)
                   AS k,
               NULLIF(event_type, 'error') AS et,
               CASE WHEN value < 20 THEN NULL ELSE value END AS v
        FROM events
        WHERE event_id % 13 = 0
    )
    SELECT event_id, low_byte, with_flag, xored, shifted_l, shifted_r,
           popcount,
           k, k % 10 AS k_mod, k >= 50 AS has_k50,
           'k' AS first_key, k AS first_val,
           CAST(1 AS INT) AS n_entries, k >= 50 AS has_large,
           COALESCE(et, 'redacted') AS et_filled,
           COALESCE(v, -1.0) AS v_filled
    FROM holes
    WHERE NOT (et IS NULL AND v IS NULL)
    """,
    doc="Events scalar composite (folds the former q_bitwise_ops / "
        "q_from_json / q_map_type_ops / q_na_handling — one driver row now "
        "pins every function). Per family: bitwise and/or/xor/shifts/"
        "popcount (the machinery SimHash and bit-packed signatures build "
        "on); from_json with an explicit struct schema + typed field access "
        "(get_json_object covered by q_json_extract); from_json into "
        "map<string,bigint> with map_keys/map_values/element_at/size/"
        "exists; null-handling nullif + conditional null injection repaired "
        "by na.drop(how='all')/na.fill — the standard raw-feed repair step. "
        "The oracle reaches the map/json values via regexp (fixture props "
        "is always a single-key object, verified) and the COALESCE/WHERE "
        "rewrite of the na family.",
    tags=("scalar", "bitwise", "json", "map", "nulls"),
)
def q_events_scalar_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    m = F.from_json("props", "map<string,bigint>")
    k = F.from_json("props", "k BIGINT").getField("k")
    holes = ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft("event_id", 3).alias("shifted_l"),
        F.shiftright("event_id", 2).alias("shifted_r"),
        F.bit_count("event_id").alias("popcount"),
        k.alias("k"),
        (k % 10).alias("k_mod"),
        (k >= 50).alias("has_k50"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(F.map_values(m), 1).alias("first_val"),
        F.size(m).alias("n_entries"),
        F.exists(F.map_values(m), lambda v: v >= 50).alias("has_large"),
        F.nullif("event_type", F.lit("error")).alias("et"),
        F.when(F.col("value") < 20, None).otherwise(F.col("value")).alias("v"),
    )
    return (
        holes.na.drop(how="all", subset=["et", "v"])
        .na.fill({"et": "redacted", "v": -1.0})
        .withColumnsRenamed({"et": "et_filled", "v": "v_filled"})
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
    "q_unpivot_bool_profile",
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
           MAX(val) AS mx,
           bool_or(val > 400) AS any_large,
           bool_and(val >= 0) AS all_nonneg,
           CAST(count_if(val > 100) AS BIGINT) AS n_over100
    FROM m GROUP BY metric
    """,
    doc="Unpivot + boolean-aggregate composite (folds the former "
        "q_unpivot_metrics / q_bool_aggs). Unpivot/melt (wide→long): the "
        "climatology shape — N metric columns stacked into (metric, value) "
        "rows, then profiled per metric in one aggregate including the "
        "assertion-style boolean family bool_or / bool_and (any/every) and "
        "conditional counting count_if — what a data-quality gate composes. "
        "Oracle is the UNION ALL rewrite.",
    tags=("reshape", "agg", "bool"),
)
def q_unpivot_bool_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
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
             F.max("val").alias("mx"),
             F.bool_or(F.col("val") > 400).alias("any_large"),
             F.bool_and(F.col("val") >= 0).alias("all_nonneg"),
             F.count_if(F.col("val") > 100).alias("n_over100"))
    )


@register(
    "q_variant_json",
    oracle="""
    SELECT event_id,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT)
               AS k,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*([0-9]+)', 1) AS BIGINT) * 2
               AS k_doubled,
           CAST(NULL AS VARCHAR) AS missing_field
    FROM events
    WHERE event_id % 19 = 0
    """,
    doc="VARIANT semi-structured type (Spark 4): parse_json once into the "
        "binary variant encoding, then typed variant_get path extraction — "
        "the modern replacement for per-access get_json_object re-parsing "
        "(each get_json_object call re-parses the string; variant parses "
        "once and extracts many times from the encoded form — the shredded "
        "column direction Parquet variant shredding standardizes). "
        "try_variant_get on an absent path yields NULL instead of "
        "erroring. Oracle reaches the same values via regexp.",
    tags=("json", "variant"),
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 19 == 0)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k"),
        (k * 2).alias("k_doubled"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_field"),
    )
