"""HTTP weather API as a DISTRIBUTED scan — a Spark 4 Python DataSource.

The reference fetches every location sequentially on the driver
(README.md:667-732: a Python for-loop over locations inside one Lambda).
`sources/extract.py` reproduces that shape for parity; THIS module is the
Spark-native form: `spark.dataSource.register(WeatherApiDataSource)` turns
the fetch itself into a scan with **one input partition per location**, so
1000 locations fan out across executors, retries/backoff run inside tasks
(per-partition, independently retried by Spark on failure), and the result
lands directly in DataFrame-land with a pinned schema — no driver loop, no
collect, no intermediate files unless you want them.

Networking uses the same `extract.fetch_json` (urllib + exponential
backoff). Tests point the per-location URLs at `file://` golden fixtures —
urllib serves those identically, so the whole distributed path runs
hermetically (the container has no network).

Usage:
    spark.dataSource.register(WeatherApiDataSource)
    df = (spark.read.format("weather_api")
          .option("urls", json.dumps({"corfu": "https://...", ...}))
          .load())
"""

from __future__ import annotations

import json
from datetime import date as _date

from ._datasource_compat import (HAS_DATASOURCE_API,  # noqa: F401
                                 DataSource, DataSourceReader,
                                 InputPartition)


# flattened daily rows: one row per (location, day); parallel arrays from
# the raw response are zipped positionally, exactly like the arrays_zip
# flatten in sources/weather.py
_SCHEMA = ("location string, day date, tmax double, tmin double, "
           "precip double")


class _WeatherPartition(InputPartition):
    def __init__(self, location: str, url: str):
        self.location = location
        self.url = url


class WeatherApiReader(DataSourceReader):
    def __init__(self, options: dict):
        urls = options.get("urls")
        if not urls:
            raise ValueError("weather_api requires an 'urls' option: "
                             "JSON object {location: url}")
        self.urls: dict[str, str] = json.loads(urls)
        self.retries = int(options.get("retries", 5))

    def partitions(self):
        # one partition per location — the unit of fetch parallelism AND of
        # Spark's task retry (a failed location refetches alone)
        return [_WeatherPartition(loc, url)
                for loc, url in sorted(self.urls.items())]

    def read(self, partition: _WeatherPartition):
        from . import extract

        doc = extract.fetch_json(partition.url, retries=self.retries)
        daily = doc.get("daily", {})
        # live Open-Meteo responses key the date array "time"; the saved
        # raw documents (to_open_meteo_doc) rename it "date" — accept both
        days = daily.get("time") or daily.get("date") or []
        tmax = daily.get("temperature_2m_max", [])
        tmin = daily.get("temperature_2m_min", [])
        prec = daily.get("precipitation_sum", [])
        n = len(days)
        # the reference's parallel-array guard (README.md:699-704): ragged
        # arrays are a hard error, not silent truncation — and an absent or
        # empty array (e.g. an upstream field rename) is the same error,
        # not a silent all-NULL column; per-day nulls INSIDE a
        # correct-length array are the only sanctioned missing-data shape
        for name, arr in (("temperature_2m_max", tmax),
                          ("temperature_2m_min", tmin),
                          ("precipitation_sum", prec)):
            if len(arr) != n:
                raise ValueError(
                    f"ragged daily array {name!r} for {partition.location}: "
                    f"{len(arr)} values vs {n} dates")
        def _f(arr, i):
            # live Open-Meteo responses carry per-day nulls (missing /
            # future dates) inside otherwise-populated arrays — those must
            # flow through as NULL cells, not crash float()
            return float(arr[i]) if arr[i] is not None else None

        for i in range(n):
            yield (partition.location,
                   _date.fromisoformat(days[i]),
                   _f(tmax, i), _f(tmin, i), _f(prec, i))


class WeatherApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> WeatherApiReader:
        return WeatherApiReader(self.options)


def ensure_package_on_executors(spark) -> str:
    """Ship this package to executor Python workers (the runtime form of
    spark-submit --py-files). A Python DataSource class pickles BY
    REFERENCE — executors must import
    canary_weather_etl_spark.sources.weather_datasource themselves, which
    only works when the package is on the WORKER's sys.path, not just the
    driver's (sys.path.insert on the driver is invisible to workers; tests
    pass from the repo root only because cwd leaks onto worker paths).
    The zip is keyed by a digest of the package's .py contents — NOT by
    pid (pid reuse across container lifetimes would silently ship a stale
    zip) — so a changed checkout rebuilds and an unchanged one reuses."""
    import hashlib
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    files = []
    for dirpath, _, names in os.walk(pkg_dir):
        for f in names:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                files.append((os.path.relpath(full, root), full))
    files.sort()
    h = hashlib.sha256()
    for rel, full in files:
        h.update(rel.encode())
        with open(full, "rb") as fh:
            h.update(fh.read())
    dst = os.path.join(tempfile.gettempdir(),
                       f"canary_pkg_u{os.getuid()}_{h.hexdigest()[:16]}.zip")
    if not os.path.exists(dst):
        tmp = f"{dst}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for rel, full in files:
                z.write(full, rel)
        os.replace(tmp, dst)
    spark.sparkContext.addPyFile(dst)
    return dst
