"""The Spark 4 Python DataSource: the reference's driver-side location loop
as a distributed scan (one input partition per location), run hermetically
over file:// golden fixtures."""

from __future__ import annotations

import json

import pytest

from canary_weather_etl_spark.plans.registry import load
from canary_weather_etl_spark.streaming.jobs import drain
from canary_weather_etl_spark.sources.weather_datasource import (
    HAS_DATASOURCE_API, WeatherApiDataSource)


def _doc(dates, tmax, tmin, prec):
    return {"daily": {"time": dates, "temperature_2m_max": tmax,
                      "temperature_2m_min": tmin,
                      "precipitation_sum": prec}}


@pytest.fixture()
def urls(tmp_path):
    a = tmp_path / "corfu.json"
    a.write_text(json.dumps(_doc(
        ["2024-01-01", "2024-01-02"], [14.2, 15.1], [8.0, 9.5], [0.0, 3.2])))
    b = tmp_path / "crete.json"
    b.write_text(json.dumps(_doc(
        ["2024-01-01"], [17.0], [11.0], [1.5])))
    return {"corfu": f"file://{a}", "crete": f"file://{b}"}


@pytest.mark.skipif(not HAS_DATASOURCE_API,
                    reason="pyspark<4: no Python DataSource API")
def test_datasource_distributed_fetch(spark, urls):
    spark.dataSource.register(WeatherApiDataSource)
    df = (spark.read.format("weather_api")
          .option("urls", json.dumps(urls)).load())
    # one partition per location — the fetch is the scan's parallel unit
    assert df.rdd.getNumPartitions() == 2
    rows = {(r["location"], str(r["day"])): r for r in df.collect()}
    assert len(rows) == 3
    assert rows[("corfu", "2024-01-02")]["tmax"] == 15.1
    assert rows[("corfu", "2024-01-02")]["precip"] == 3.2
    assert rows[("crete", "2024-01-01")]["tmin"] == 11.0
    # declared schema is pinned (no inference)
    assert [f.name for f in df.schema.fields] == [
        "location", "day", "tmax", "tmin", "precip"]


@pytest.mark.skipif(not HAS_DATASOURCE_API,
                    reason="pyspark<4: no Python DataSource API")
def test_datasource_ragged_arrays_fail_loudly(spark, tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(_doc(["2024-01-01", "2024-01-02"],
                                   [14.2], [8.0, 9.5], [0.0, 0.1])))
    spark.dataSource.register(WeatherApiDataSource)
    df = (spark.read.format("weather_api")
          .option("urls", json.dumps({"bad": f"file://{bad}"})).load())
    with pytest.raises(Exception, match="ragged daily array"):
        df.collect()


@pytest.mark.skipif(not HAS_DATASOURCE_API,
                    reason="pyspark<4: no Python DataSource API")
def test_datasource_absent_array_fails_loudly(spark, tmp_path):
    # an entirely-missing daily array (e.g. an upstream field rename) is
    # the same hard error as a ragged one — NOT a silent all-NULL column;
    # only per-day nulls inside a correct-length array pass through
    doc = _doc(["2024-01-01", "2024-01-02"], [14.2, 15.1], [8.0, 9.5],
               [0.0, 0.1])
    del doc["daily"]["precipitation_sum"]
    bad = tmp_path / "absent.json"
    bad.write_text(json.dumps(doc))
    spark.dataSource.register(WeatherApiDataSource)
    df = (spark.read.format("weather_api")
          .option("urls", json.dumps({"absent": f"file://{bad}"})).load())
    with pytest.raises(Exception, match="ragged daily array"):
        df.collect()


# --- manifest-committed JSONL sink (Python DataSource WRITER) ----------------

def test_manifest_sink_roundtrip_and_orphan_isolation(spark, tmp_path):
    from canary_weather_etl_spark.sources.manifest_sink import (
        ManifestJsonlSink, read_manifest_jsonl)
    spark.dataSource.register(ManifestJsonlSink)

    src = (load(spark, "/root/testdata/sf0.001", "events")
           .selectExpr("event_id", "user_id", "event_type",
                       "CAST(value AS STRING) AS value_s")
           .repartition(4))
    d = str(tmp_path / "msink")
    src.write.format("manifest_jsonl").mode("overwrite").save(d)

    import json as _json
    import os
    with open(os.path.join(d, "_MANIFEST.json")) as f:
        man = _json.load(f)
    assert man["total_rows"] == src.count()
    assert all(e["rows"] > 0 and e["bytes"] > 0 for e in man["files"])

    got = read_manifest_jsonl(
        spark, d, "event_id BIGINT, user_id BIGINT, "
        "event_type STRING, value_s STRING")
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in src.collect()}

    # an orphan part file (torn write from a failed/concurrent job) must
    # be invisible to manifest readers
    with open(os.path.join(d, "part-orphan.jsonl"), "w") as f:
        f.write('{"event_id": -1, "user_id": -1, '
                '"event_type": "junk", "value_s": "x"}\n')
    again = read_manifest_jsonl(
        spark, d, "event_id BIGINT, user_id BIGINT, "
        "event_type STRING, value_s STRING")
    assert again.filter("event_id = -1").count() == 0
    assert again.count() == src.count()


def test_manifest_sink_append_unions_file_lists(spark, tmp_path):
    from canary_weather_etl_spark.sources.manifest_sink import (
        ManifestJsonlSink, read_manifest_jsonl)
    spark.dataSource.register(ManifestJsonlSink)

    base = (load(spark, "/root/testdata/sf0.001", "events")
            .selectExpr("event_id", "user_id").repartition(2))
    first = base.filter("event_id % 2 = 0")
    second = base.filter("event_id % 2 = 1")
    d = str(tmp_path / "msink_app")
    first.write.format("manifest_jsonl").mode("overwrite").save(d)
    second.write.format("manifest_jsonl").mode("append").save(d)

    got = read_manifest_jsonl(spark, d, "event_id BIGINT, user_id BIGINT")
    assert got.count() == base.count()
    assert got.select("event_id").distinct().count() == \
        base.select("event_id").distinct().count()


def test_manifest_stream_sink_exactly_once(spark, tmp_path):
    """writeStream through the Python DataSourceStreamWriter: every
    micro-batch's files land under one manifest, totals equal the batch
    ground truth, and a REPLAYED commit of the same batchId supersedes
    its previous entry instead of double-counting (the sink-side half of
    exactly-once)."""
    from canary_weather_etl_spark.sources.manifest_sink import (
        ManifestJsonlSink, ManifestJsonlStreamWriter, _FileCommit,
        read_manifest_jsonl)
    spark.dataSource.register(ManifestJsonlSink)

    src_dir = str(tmp_path / "src")
    base = (load(spark, "/root/testdata/sf0.001", "events")
            .selectExpr("event_id", "user_id"))
    base.write.mode("overwrite").parquet(src_dir)

    sink = str(tmp_path / "stream_sink")
    q = (spark.readStream.schema("event_id BIGINT, user_id BIGINT")
         .parquet(src_dir)
         .writeStream.format("manifest_jsonl")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    drain(q)

    got = read_manifest_jsonl(spark, sink, "event_id BIGINT, user_id BIGINT")
    assert got.count() == base.count()
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in base.collect()}

    # replayed-batch idempotence, driver-side unit call: re-commit batch 0
    # with a fresh file — the superseded entry must be dropped, not added
    import json as _json
    import os
    w = ManifestJsonlStreamWriter({"path": sink}, overwrite=False)
    with open(os.path.join(sink, "_MANIFEST.json")) as f:
        before = _json.load(f)
    replay_name = "part-replayed.jsonl"
    with open(os.path.join(sink, replay_name), "w") as f:
        f.write('{"event_id": 1, "user_id": 1}\n')
    w.commit([_FileCommit(replay_name, 1, 10)], batchId=0)
    with open(os.path.join(sink, "_MANIFEST.json")) as f:
        after = _json.load(f)
    assert after["batches"]["0"] == [
        {"file": replay_name, "rows": 1, "bytes": 10}]
    other = {k: v for k, v in before["batches"].items() if k != "0"}
    assert {k: v for k, v in after["batches"].items() if k != "0"} == other


def test_manifest_vacuum_removes_only_orphans(spark, tmp_path):
    from canary_weather_etl_spark.sources.manifest_sink import (
        ManifestJsonlSink, read_manifest_jsonl, vacuum_manifest_dir)
    spark.dataSource.register(ManifestJsonlSink)

    src = (load(spark, "/root/testdata/sf0.001", "events")
           .selectExpr("event_id", "user_id").repartition(3))
    d = str(tmp_path / "vac")
    src.write.format("manifest_jsonl").mode("overwrite").save(d)

    import os
    orphan = os.path.join(d, "part-deadbeef.jsonl")
    with open(orphan, "w") as f:
        f.write('{"event_id": -9, "user_id": -9}\n')

    deleted = vacuum_manifest_dir(d)
    assert deleted == ["part-deadbeef.jsonl"]
    assert not os.path.exists(orphan)
    got = read_manifest_jsonl(spark, d, "event_id BIGINT, user_id BIGINT")
    assert got.count() == src.count()  # live files untouched


def test_manifest_sink_review_fixes(spark, tmp_path):
    """The four behaviors the round-5 review flagged, pinned:
    (a) overwrite reclaims superseded part files, (b) batch and stream
    commits share one manifest schema (neither drops the other's files),
    (c) a committed EMPTY dataset reads back as an empty frame,
    (d) a concurrent commit fails loudly instead of losing files, and
    (e) stream overwrite=True truncates prior state (complete mode)."""
    import json as _json
    import os

    from canary_weather_etl_spark.sources.manifest_sink import (
        ConcurrentWriteError, ManifestJsonlSink, ManifestJsonlStreamWriter,
        _FileCommit, _manifest_lock, read_manifest_jsonl)
    spark.dataSource.register(ManifestJsonlSink)

    base = (load(spark, "/root/testdata/sf0.001", "events")
            .selectExpr("event_id", "user_id").repartition(2))
    d = str(tmp_path / "fix")
    sch = "event_id BIGINT, user_id BIGINT"

    # (a) overwrite deletes the previous generation's files
    base.write.format("manifest_jsonl").mode("overwrite").save(d)
    gen1 = {f for f in os.listdir(d) if f.startswith("part-")}
    base.write.format("manifest_jsonl").mode("overwrite").save(d)
    left_on_disk = {f for f in os.listdir(d) if f.startswith("part-")}
    assert not (gen1 & left_on_disk), "superseded files leaked"
    assert read_manifest_jsonl(spark, d, sch).count() == base.count()

    # (b) one schema across writers: a stream commit must not drop
    # batch-committed files
    w = ManifestJsonlStreamWriter({"path": d}, overwrite=False)
    extra = "part-streambatch.jsonl"
    with open(os.path.join(d, extra), "w") as f:
        f.write('{"event_id": 900000, "user_id": 1}\n')
    w.commit([_FileCommit(extra, 1, 30)], batchId=0)
    got = read_manifest_jsonl(spark, d, sch)
    assert got.count() == base.count() + 1
    assert got.filter("event_id = 900000").count() == 1

    # (e) stream overwrite (complete mode): each commit truncates
    wo = ManifestJsonlStreamWriter({"path": d}, overwrite=True)
    snap = "part-complete-snap.jsonl"
    with open(os.path.join(d, snap), "w") as f:
        f.write('{"event_id": 900001, "user_id": 2}\n')
    wo.commit([_FileCommit(snap, 1, 30)], batchId=1)
    got2 = read_manifest_jsonl(spark, d, sch)
    assert got2.count() == 1  # only the latest full snapshot is live
    assert not (set(os.listdir(d)) & gen1)

    # (c) committed empty dataset reads as an empty frame
    e = str(tmp_path / "empty")
    base.filter("event_id < 0").write.format("manifest_jsonl") \
        .mode("overwrite").save(e)
    with open(os.path.join(e, "_MANIFEST.json")) as f:
        assert _json.load(f)["total_rows"] == 0
    assert read_manifest_jsonl(spark, e, sch).count() == 0

    # (d) second committer fails loudly while the lock is held
    with _manifest_lock(d):
        try:
            wo.commit([_FileCommit("part-x.jsonl", 1, 1)], batchId=2)
            raise AssertionError("concurrent commit did not raise")
        except ConcurrentWriteError:
            pass


def test_bpe_encode_len_reports_zero_for_empty_docs(spark):
    from canary_weather_etl_spark.operators.bpe import bpe_encode_len
    docs = spark.createDataFrame(
        [(1, "low low"), (2, ""), (3, "   ")], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_bpe"]
           for r in bpe_encode_len(docs, [("l", "o"), ("lo", "w")]).collect()}
    assert got == {1: 4, 2: 0, 3: 0}
