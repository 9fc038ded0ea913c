"""The Spark 4 Python DataSource: the reference's driver-side location loop
as a distributed scan (one input partition per location), run hermetically
over file:// golden fixtures."""

from __future__ import annotations

import json

import pytest

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
