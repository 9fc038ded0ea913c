"""Materialize the committed golden weather-raw fixtures
(tests/fixtures/weather_raw/): deterministic, byte-stable — rerunning this
script must produce no git diff."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from canary_weather_etl_spark.sources.weather_fixtures import write_golden  # noqa: E402

if __name__ == "__main__":
    root = os.path.join(REPO, "tests", "fixtures", "weather_raw")
    write_golden(root)
    n = sum(len(fs) for _, _, fs in os.walk(root))
    print(f"wrote {n} fixture files under {root}")
