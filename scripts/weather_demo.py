#!/usr/bin/env python
"""End-to-end demo of the weather engine: every stage of the reference
pipeline (README.md architecture diagram), Spark-first, in one run.

    extract (fake APIs) → raw JSON layer → distributed flatten → join →
    Hive-partitioned clean layer → the 3 Athena queries verbatim →
    31-day incremental upsert → compaction → final state report

Run: python scripts/weather_demo.py   (local[8], ~1 min, writes under /tmp)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canary_weather_etl_spark.plans import weather_sql as Q
from canary_weather_etl_spark.session import get_spark
from canary_weather_etl_spark.sources import extract as E
from canary_weather_etl_spark.sources import weather as W

LOCATIONS = {
    "Tenerife/Vilaflor": {"latitude": 28.15, "longitude": -16.63},
    "Tenerife/Santa_Cruz_de_Tenerife": {"latitude": 28.46, "longitude": -16.25},
    "Gran_Canaria/Las_Palmas_de_Gran_Canaria": {"latitude": 28.12, "longitude": -15.43},
    "La_Palma/Santa_Cruz_de_La_Palma": {"latitude": 28.68, "longitude": -17.76},
}
DAILY = list(W.OPEN_METEO_DAILY_VARS)
VC_ELEMENTS = ["datetime", *W.VISUAL_CROSSING_DAY_FIELDS]


def fake_open_meteo(url: str) -> dict:
    """Deterministic stand-in for the Open-Meteo archive API."""
    import hashlib
    lat = float(url.split("latitude=")[1].split("&")[0])
    start = url.split("start_date=")[1].split("&")[0]
    end = url.split("end_date=")[1].split("&")[0]
    from datetime import date, timedelta
    d0, d1 = date.fromisoformat(start), date.fromisoformat(end)
    dates = [(d0 + timedelta(days=i)).isoformat()
             for i in range((d1 - d0).days + 1)]
    seed = int(hashlib.sha256(f"{lat}".encode()).hexdigest()[:6], 16)
    daily = {"time": dates}
    for i, (name, typ) in enumerate(W.OPEN_METEO_DAILY_VARS.items()):
        if typ.__name__ == "StringType":
            daily[name] = [f"{d}T07:00" for d in dates]
        elif typ.__name__ == "LongType":
            daily[name] = [(seed + j) % 100 for j in range(len(dates))]
        else:
            daily[name] = [round((seed % 50) + i + j * 0.1, 2)
                           for j in range(len(dates))]
    return {"elevation": float(seed % 2000), "timezone": "Atlantic/Canary",
            "daily": daily}


def fake_visual_crossing(url: str) -> dict:
    import hashlib
    loc_part = url.split("/timeline/")[1].split("?")[0]
    lat = float(loc_part.split(",")[0])
    start, end = loc_part.split("/")[1], loc_part.split("/")[2]
    from datetime import date, timedelta
    d0, d1 = date.fromisoformat(start), date.fromisoformat(end)
    seed = int(hashlib.sha256(f"{lat}".encode()).hexdigest()[:6], 16)
    days = []
    for j in range((d1 - d0).days + 1):
        day = {"datetime": (d0 + timedelta(days=j)).isoformat()}
        for i, (name, typ) in enumerate(W.VISUAL_CROSSING_DAY_FIELDS.items()):
            day[name] = (f"cond{j % 4}" if typ.__name__ == "StringType"
                         else round((seed % 10) + i + j * 0.05, 2))
        days.append(day)
    return {"queryCost": 1.0, "latitude": lat, "longitude": -16.0,
            "resolvedAddress": loc_part, "address": "set-by-extractor",
            "timezone": "Atlantic/Canary", "tzoffset": 0.0, "days": days}


def main() -> None:
    root = tempfile.mkdtemp(prefix="weather_demo_")
    raw, clean = f"{root}/raw", f"{root}/clean"
    os.environ.setdefault("VISUAL_CROSSING_KEY", "demo-key")
    spark = get_spark("weather-demo", master="local[8]")
    # glob reads trigger a benign FileStreamSink metadata-probe WARN+trace
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. bulk extract (fake APIs, reference key scheme)")
    st1 = E.extract_open_meteo(LOCATIONS, raw, DAILY,
                               "2024-01-01", "2024-02-15",
                               fetcher=fake_open_meteo)
    st2 = E.extract_visual_crossing(LOCATIONS, raw, VC_ELEMENTS,
                                    "2024-01-01", "2024-02-15",
                                    fetcher=fake_visual_crossing)
    print(f"   open-meteo: {st1}")
    print(f"   visual-crossing: {st2}")

    print("== 2. distributed flatten + join + partitioned write")
    om = W.read_open_meteo(spark, f"{raw}/*/*/2*.json")
    vc = W.read_visual_crossing(spark, f"{raw}/*/*/vc*.json")
    cleandf = W.build_clean(om, vc)
    W.write_clean(cleandf, clean)
    n = spark.read.parquet(clean).count()
    parts = []
    for isl in sorted(os.listdir(clean)):
        if isl.startswith("island="):
            parts.append(isl)
    print(f"   clean rows: {n}; top-level partitions: {parts}")

    print("== 3. the reference's Athena queries, verbatim")
    Q.register_clean_view(spark, clean)
    for name, fn in [("Q1 sunniest location", Q.q1_sunniest_location),
                     ("Q2 sunniest (location, month)", Q.q2_sunniest_month_location),
                     ("Q2' best location per month", Q.q2_corrected_best_location_per_month)]:
        rows = fn(spark).limit(3).collect()
        print(f"   {name}: {[tuple(r) for r in rows]}")
    rows = Q.q3_best_uv_month(spark).collect()
    print(f"   Q3 UV by month @Las_Palmas: {[tuple(r) for r in rows]}")

    print("== 4. monthly incremental update (31-day overlap, new wins)")
    s, e = E.incremental_window("2024-02-20", 31)
    upd = f"{root}/updates"
    E.extract_open_meteo(LOCATIONS, upd, DAILY, s, e, fetcher=fake_open_meteo)
    E.extract_visual_crossing(LOCATIONS, upd, VC_ELEMENTS, s, e,
                              fetcher=fake_visual_crossing)
    batch = W.build_clean(W.read_open_meteo(spark, f"{upd}/*/*/2*.json"),
                          W.read_visual_crossing(spark, f"{upd}/*/*/vc*.json"))
    W.upsert_clean(spark, clean, batch)
    final = spark.read.parquet(clean)
    print(f"   rows after upsert: {final.count()} "
          f"(keys unique: {final.select('location','date').distinct().count()})")

    print("== 5. compaction")
    W.compact_partitions(spark, clean)
    print(f"   final rows: {spark.read.parquet(clean).count()}")

    shutil.rmtree(root, ignore_errors=True)
    print("DEMO COMPLETE")


if __name__ == "__main__":
    main()
