"""Deterministic golden fixtures for the weather ingestion path.

The two raw JSON document shapes (README.md:545-589) synthesized as pure
functions of (location tuple, date list, bias) — no randomness, no clock —
so the committed fixture files under tests/fixtures/weather_raw/ are
reproducible byte-for-byte (scripts/gen_weather_fixtures.py) and the DuckDB
``read_json`` oracle twins (plans/weather_ingest.py) see exactly what the
Spark readers see.

Shared by tests/test_weather_pipeline.py (tmp_path variants) and the
driver-visible ingestion queries (committed variants).
"""

from __future__ import annotations

import json
import os

from .weather import OPEN_METEO_DAILY_VARS, VISUAL_CROSSING_DAY_FIELDS

# (island, location, lat, lon, elevation) — three stations, mirroring the
# reference's island/location key scheme (README.md:232).
LOCATIONS: list[tuple[str, str, float, float, float]] = [
    ("Tenerife", "Vilaflor", 28.15, -16.63, 1400.0),
    ("Gran_Canaria", "Las_Palmas", 28.12, -15.43, 8.0),
    ("La_Palma", "Santa_Cruz", 28.68, -17.76, 35.0),
]

# Committed golden batches: batch_a is the initial load, batch_b the
# incremental re-delivery overlapping dates 08-10 with shifted values
# (bias) — the new-wins upsert must keep batch_b's versions.
BATCH_A_DATES = [f"2024-01-{d:02d}" for d in range(1, 11)]
BATCH_B_DATES = [f"2024-01-{d:02d}" for d in range(8, 13)]
BATCH_B_BIAS = 100.0


def dates(start_day: int, n: int) -> list[str]:
    return [f"2024-01-{d:02d}" for d in range(start_day, start_day + n)]


def om_doc(island: str, loc: str, lat: float, lon: float, elev: float,
           date_list: list[str], bias: float = 0.0) -> dict:
    """Struct-of-arrays Open-Meteo document: value of double var #i on day
    #j is bias + i + j*0.25; long vars (j*7+i)%100; strings carry the date."""
    n = len(date_list)
    daily: dict = {"date": date_list}
    for i, (name, typ) in enumerate(OPEN_METEO_DAILY_VARS.items()):
        if typ.__name__ == "StringType":
            daily[name] = [f"{d}T07:0{i % 10}" for d in date_list]
        elif typ.__name__ == "LongType":
            daily[name] = [(j * 7 + i) % 100 for j in range(n)]
        else:
            daily[name] = [round(bias + i + j * 0.25, 2) for j in range(n)]
    return {"location": f"{island}/{loc}", "latitude": lat, "longitude": lon,
            "elevation": elev, "timezone": "Atlantic/Canary", "daily": daily}


def vc_doc(island: str, loc: str, lat: float, lon: float,
           date_list: list[str], bias: float = 0.0) -> dict:
    """Array-of-structs Visual Crossing document: double field #i on day #j
    is bias + 10*i + j*0.5; strings are f"{name}_{j}"."""
    days = []
    for j, d in enumerate(date_list):
        day: dict = {"datetime": d}
        for i, (name, typ) in enumerate(VISUAL_CROSSING_DAY_FIELDS.items()):
            if typ.__name__ == "StringType":
                day[name] = f"{name}_{j}"
            else:
                day[name] = round(bias + 10 * i + j * 0.5, 2)
        days.append(day)
    return {"queryCost": 1.0, "latitude": lat, "longitude": lon,
            "resolvedAddress": f"{lat},{lon}", "address": f"{island}/{loc}",
            "timezone": "Atlantic/Canary", "tzoffset": 0.0, "days": days}


def write_raw(root: str, date_list: list[str], bias: float = 0.0,
              suffix: str = "a",
              locations: list[tuple[str, str, float, float, float]] | None = None,
              ) -> None:
    """Materialize one batch under the reference's raw key scheme
    <root>/<island>/<location>/{om,vc}_<suffix>.json. sort_keys=True so the
    committed fixtures are byte-stable across runs."""
    for island, loc, lat, lon, elev in (locations or LOCATIONS):
        d = os.path.join(root, island, loc)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"om_{suffix}.json"), "w") as f:
            json.dump(om_doc(island, loc, lat, lon, elev, date_list, bias),
                      f, sort_keys=True)
        with open(os.path.join(d, f"vc_{suffix}.json"), "w") as f:
            json.dump(vc_doc(island, loc, lat, lon, date_list, bias),
                      f, sort_keys=True)


def write_golden(fixture_root: str) -> None:
    """The committed layout: batch_a (initial load, days 01-10) and batch_b
    (incremental, days 08-12, value bias +100) in separate roots."""
    write_raw(os.path.join(fixture_root, "batch_a"), BATCH_A_DATES,
              bias=0.0, suffix="a")
    write_raw(os.path.join(fixture_root, "batch_b"), BATCH_B_DATES,
              bias=BATCH_B_BIAS, suffix="b")
