"""Source/sink format coverage beyond the reference's JSON+parquet: CSV,
JSON-lines, and ORC round-trips with explicit schemas (SURVEY.md §1.3: no
inference at scale — every read pins its StructType)."""

from __future__ import annotations

from pyspark.sql import functions as F

from canary_weather_etl_spark.plans.registry import load


def _events_sample(spark):
    return (load(spark, "/root/testdata/sf0.001", "events")
            .limit(500)
            .select("event_id", "ts", "user_id", "event_type", "value"))


def _assert_same(a, b, key="event_id"):
    assert a.count() == b.count()
    assert sorted(a.columns) == sorted(b.columns)
    diff = a.select(*sorted(a.columns)).exceptAll(b.select(*sorted(b.columns)))
    assert diff.count() == 0


def test_csv_round_trip(spark, tmp_path):
    src = _events_sample(spark)
    path = str(tmp_path / "csv")
    # ts is TIMESTAMP_LTZ after registry.load() (it rebuilds/casts events.ts
    # to TimestampType in both fixture branches), so the text writers format
    # it with timestampFormat — and the default LTZ pattern truncates to
    # milliseconds, so microsecond fixtures need the explicit 6-digit
    # pattern on BOTH sides
    (src.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path))
    back = (spark.read.schema(src.schema)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .csv(path))
    _assert_same(src, back)


def test_jsonlines_round_trip(spark, tmp_path):
    src = _events_sample(spark)
    path = str(tmp_path / "jsonl")
    (src.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path))
    # NOTE: default (non-multiLine) = one JSON object per line — the
    # streaming-friendly layout, unlike the reference's whole-file docs
    back = (spark.read.schema(src.schema)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .json(path))
    _assert_same(src, back)


def test_orc_round_trip(spark, tmp_path):
    src = _events_sample(spark)
    path = str(tmp_path / "orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    _assert_same(src, back)


def test_partitioned_csv_with_lineage(spark, tmp_path):
    """CSV sink keeps the Hive-partition contract too: partition columns in
    the directory layout, recovered on read."""
    src = (_events_sample(spark)
           .withColumn("day", F.to_date("ts")))
    path = str(tmp_path / "part_csv")
    (src.write.mode("overwrite").partitionBy("event_type")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path))
    back = (spark.read
            .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                    "value DOUBLE, day DATE, event_type STRING")
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .option("basePath", path)
            .csv(f"{path}/event_type=*"))
    assert back.count() == src.count()
    assert set(r["event_type"] for r in back.select("event_type").distinct().collect()) \
        == set(r["event_type"] for r in src.select("event_type").distinct().collect())
    pruned = back.filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_csv_permissive_corrupt_record_quarantine(spark, tmp_path):
    """CSV PERMISSIVE mode with columnNameOfCorruptRecord: malformed
    rows (wrong arity, bad types) land in the corrupt column with the
    raw line preserved; clean rows parse fully — the CSV twin of the
    JSONL quarantine path."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    p = tmp_path / "dirty.csv"
    p.write_text("\n".join([
        "1,alice,100",
        "2,bob,notanumber",     # bad type -> quarantined
        "3,carol,300",
        "4,dave",               # missing column -> quarantined
        "5,erin,500",
    ]) + "\n")
    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", LongType()),
        StructField("_corrupt", StringType()),
    ])
    df = (spark.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(str(p))).cache()
    bad = df.filter(F.col("_corrupt").isNotNull())
    good = df.filter(F.col("_corrupt").isNull())
    assert good.count() == 3
    assert sorted(r["amount"] for r in good.collect()) == [100, 300, 500]
    bad_rows = {r["_corrupt"] for r in bad.collect()}
    assert bad_rows == {"2,bob,notanumber", "4,dave"}
    # quarantined rows keep parseable prefix columns where possible
    assert {r["id"] for r in bad.collect()} <= {2, 4, None}
