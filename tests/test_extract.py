"""Extraction-layer tests: retry/backoff policy, response reshaping, raw key
scheme, and the extract→ingest round trip (fake fetchers — no network)."""

from __future__ import annotations

import json

import pytest

from canary_weather_etl_spark.sources import extract as E
from canary_weather_etl_spark.sources import weather as W

LOCS = {"Tenerife/Vilaflor": {"latitude": 28.15, "longitude": -16.63},
        "La_Palma/Santa_Cruz": {"latitude": 28.68, "longitude": -17.76}}
DAILY = list(W.OPEN_METEO_DAILY_VARS)
VC_ELEMENTS = ["datetime", *W.VISUAL_CROSSING_DAY_FIELDS]
DATES = [f"2024-01-{i:02d}" for i in range(1, 6)]


def om_response():
    daily = {"time": DATES}
    for i, (name, typ) in enumerate(W.OPEN_METEO_DAILY_VARS.items()):
        if typ.__name__ == "StringType":
            daily[name] = [f"{d}T07:00" for d in DATES]
        elif typ.__name__ == "LongType":
            daily[name] = [j for j in range(len(DATES))]
        else:
            daily[name] = [float(i + j) for j in range(len(DATES))]
    return {"elevation": 1400.0, "timezone": "Atlantic/Canary", "daily": daily}


def vc_response(lat, lon):
    days = []
    for j, d in enumerate(DATES):
        day = {"datetime": d}
        for i, (name, typ) in enumerate(W.VISUAL_CROSSING_DAY_FIELDS.items()):
            day[name] = f"x{j}" if typ.__name__ == "StringType" else float(i * 10 + j)
        days.append(day)
    return {"queryCost": 1.0, "latitude": lat, "longitude": lon,
            "resolvedAddress": f"{lat},{lon}", "address": "raw",
            "timezone": "Atlantic/Canary", "tzoffset": 0.0, "days": days}


def test_fetch_retry_backoff():
    calls, sleeps = [], []
    import urllib.error

    def flaky(url):
        calls.append(url)
        if len(calls) < 3:
            raise urllib.error.URLError("boom")
        return {"ok": True}

    # patch urlopen via the fetcher-level seam: emulate by wrapping
    def fetcher(url, _sleep=sleeps.append):
        last = None
        for attempt in range(5):
            try:
                return flaky(url)
            except urllib.error.URLError as exc:
                last = exc
                if attempt < 4:
                    _sleep(0.2 * 2 ** attempt)
        raise RuntimeError("fetch failed") from last

    assert fetcher("u") == {"ok": True}
    assert len(calls) == 3
    assert sleeps == [0.2, 0.4]  # exponential: 0.2 * 2^attempt


def test_fetch_json_gives_up(monkeypatch):
    import urllib.request

    def always_fail(url):
        raise ValueError("bad json")

    monkeypatch.setattr(urllib.request, "urlopen", lambda u: (_ for _ in ()).throw(
        __import__("urllib.error", fromlist=["URLError"]).URLError("down")))
    sleeps = []
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        E.fetch_json("http://x", retries=3, _sleep=sleeps.append)
    assert sleeps == [0.2, 0.4]


def test_fetch_error_redacts_api_key(monkeypatch):
    """ADVICE r1: a failed keyed fetch must not leak the secret into the
    RuntimeError message or the persisted per-location status dict."""
    import urllib.error
    import urllib.request
    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda u: (_ for _ in ()).throw(urllib.error.URLError("down")))
    with pytest.raises(RuntimeError) as ei:
        E.fetch_json("https://api/x?elements=temp&key=SECRET123&fmt=json",
                     retries=1, _sleep=lambda s: None)
    assert "SECRET123" not in str(ei.value)
    assert "key=<redacted>" in str(ei.value)

    monkeypatch.setenv("VISUAL_CROSSING_KEY", "SECRET123")
    def boom(url):
        raise RuntimeError(f"fetch failed: {url}")
    st = E.extract_visual_crossing(
        {"tenerife/santa_cruz": {"latitude": 1.0, "longitude": 2.0}},
        "/tmp/unused", ["temp"], "2024-01-01", "2024-01-02", fetcher=boom)
    (msg,) = st.values()
    assert "SECRET123" not in msg and msg.startswith("error:")


def test_get_secret_formats(monkeypatch):
    monkeypatch.setenv("K1", "plainkey")
    assert E.get_secret("K1") == "plainkey"
    monkeypatch.setenv("K2", json.dumps({"api_key": "jsonkey"}))
    assert E.get_secret("K2") == "jsonkey"
    with pytest.raises(KeyError):
        E.get_secret("K_MISSING")


def test_extract_to_ingest_round_trip(spark, tmp_path, monkeypatch):
    """Full loop: fake APIs → raw layer → flatten → join → clean rows."""
    raw = str(tmp_path / "raw")
    st = E.extract_open_meteo(LOCS, raw, DAILY, "2024-01-01", "2024-01-05",
                              fetcher=lambda url: om_response())
    assert all(v == "ok" for v in st.values())

    monkeypatch.setenv("VISUAL_CROSSING_KEY", "test-key")
    seen_urls = []

    def vc_fetch(url):
        seen_urls.append(url)
        lat = float(url.split("/timeline/")[1].split(",")[0])
        return vc_response(lat, -16.0)

    st = E.extract_visual_crossing(LOCS, raw, VC_ELEMENTS,
                                   "2024-01-01", "2024-01-05",
                                   fetcher=vc_fetch)
    assert all(v == "ok" for v in st.values())
    assert all("key=test-key" in u and "elements=datetime," in u
               for u in seen_urls)

    om = W.read_open_meteo(spark, f"{raw}/*/*/2*.json")
    vc = W.read_visual_crossing(spark, f"{raw}/*/*/vc*.json")
    clean = W.build_clean(om, vc)
    rows = clean.collect()
    assert len(rows) == 2 * 5
    by = {(r["location"], str(r["date"])): r for r in rows}
    r = by[("Tenerife/Vilaflor", "2024-01-03")]
    assert r["temperature_2m_max"] == pytest.approx(1 + 2)  # var i=1, day j=2
    assert r["uvindex"] == pytest.approx(4 * 10 + 2)
    assert r["island"] == "Tenerife" and r["year"] == 2024


def test_incremental_window():
    s, e = E.incremental_window("2024-03-15", 31)
    assert (s, e) == ("2024-02-13", "2024-03-15")


def test_save_raw_rejects_empty():
    with pytest.raises(ValueError):
        E.save_raw({}, "/tmp/x", "", "loc", "f")
