"""Extraction layer: the reference's Lambda ingestion (B1/B2/B4/B5),
re-expressed as driver-side Python (SURVEY.md §2.1 'HTTP API source' —
ingestion sits outside the SQL engine proper; at scale you shard the
location list over a `foreachPartition` fetcher or an external
orchestrator, the document shapes stay identical).

Mirrors, without copying, the reference behavior:
- retry with exponential backoff (README.md:196-210: 5 attempts,
  0.2 s × 2^attempt)
- Open-Meteo response → struct-of-arrays raw doc (README.md:212-229)
- Visual Crossing response → array-of-structs raw doc kept verbatim,
  element-restricted (README.md:391, 431-472)
- raw key scheme <prefix>/<island>/<location>/<name>.json (README.md:232)
- secrets from environment instead of a secrets service (README.md:288-365)
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from pathlib import Path

Fetcher = Callable[[str], dict]


def get_secret(name: str, default: str | None = None) -> str:
    """API-key lookup from the environment — the engine-side stand-in for
    the reference's Secrets Manager round-trip (README.md:288-365). Accepts
    either the bare value or a JSON object holding it (the reference
    tolerates multiple secret formats)."""
    raw = os.environ.get(name, default)
    if raw is None:
        raise KeyError(f"secret {name!r} not set")
    try:
        obj = json.loads(raw)
        if isinstance(obj, dict):
            for v in obj.values():
                if isinstance(v, str) and v:
                    return v
    except (json.JSONDecodeError, TypeError):
        pass
    return raw


def redact_url(url: str) -> str:
    """Strip credential query params before a URL reaches any error message,
    log line, or status artifact — the `key=` param carries the Visual
    Crossing API secret and must never be persisted in exception text."""
    return re.sub(r"(key|apikey|token|secret)=[^&]+", r"\1=<redacted>", url,
                  flags=re.IGNORECASE)


def fetch_json(url: str, retries: int = 5, base_delay: float = 0.2,
               _sleep=time.sleep) -> dict:
    """GET a JSON document with exponential backoff — the reference's retry
    policy (5 attempts, 0.2 s × 2^attempt, README.md:196-210). Failure
    messages carry the redacted URL only (secrets never leak into logs)."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except (urllib.error.URLError, ValueError) as exc:
            last = exc
            if attempt < retries - 1:
                _sleep(base_delay * (2 ** attempt))
    raise RuntimeError(
        f"fetch failed after {retries} attempts: {redact_url(url)}") from last


def to_open_meteo_doc(location_key: str, meta: dict, api_response: dict,
                      daily_params: list[str]) -> dict:
    """Reshape an Open-Meteo archive response into the struct-of-arrays raw
    document (README.md:212-229): scalar metadata + `daily` parallel
    arrays (missing variables default to empty arrays, as the reference's
    .get(key, []) does)."""
    daily = api_response.get("daily", {})
    return {
        "location": location_key,
        "latitude": meta.get("latitude"),
        "longitude": meta.get("longitude"),
        "elevation": api_response.get("elevation"),
        "timezone": api_response.get("timezone"),
        "daily": {
            "date": daily.get("time", []),
            **{p: daily.get(p, []) for p in daily_params},
        },
    }


def save_raw(doc: dict, out_root: str, island: str, location: str,
             filename: str) -> str:
    """Write one raw JSON document under the reference's key scheme
    <root>/<island>/<location>/<filename>.json (README.md:232-240); the
    directory layout IS the lineage that `lineage_from_path` recovers."""
    if not filename or not island or not location:
        raise ValueError("island/location/filename must be non-empty")
    d = Path(out_root) / island / location
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{filename}.json"
    path.write_text(json.dumps(doc))
    return str(path)


def extract_open_meteo(locations: dict[str, dict], out_root: str,
                       daily_params: list[str],
                       start_date: str, end_date: str,
                       base_url: str = "https://archive-api.open-meteo.com/v1/archive",
                       fetcher: Fetcher | None = None) -> dict[str, str]:
    """Bulk extract (B1, README.md:137-247): one API call per location,
    reshaped and written to the raw layer. Returns per-location status —
    errors are recorded and skipped, not fatal (README.md:514-524)."""
    fetcher = fetcher or fetch_json
    status: dict[str, str] = {}
    for key, meta in locations.items():
        island, location = key.split("/", 1)
        url = (f"{base_url}?latitude={meta['latitude']}"
               f"&longitude={meta['longitude']}"
               f"&start_date={start_date}&end_date={end_date}"
               f"&daily={','.join(daily_params)}&timezone=auto")
        try:
            doc = to_open_meteo_doc(key, meta, fetcher(url), daily_params)
            save_raw(doc, out_root, island, location,
                     f"{start_date}_{end_date}")
            status[key] = "ok"
        except Exception as exc:  # per-location isolation, like the reference
            status[key] = f"error: {exc}"
    return status


def extract_visual_crossing(locations: dict[str, dict], out_root: str,
                            elements: list[str],
                            start_date: str, end_date: str,
                            api_key_env: str = "VISUAL_CROSSING_KEY",
                            base_url: str = ("https://weather.visualcrossing.com/"
                                             "VisualCrossingWebServices/rest/services/timeline"),
                            fetcher: Fetcher | None = None) -> dict[str, str]:
    """Bulk extract (B2, README.md:252-531): keyed API, element-restricted
    (the reference's column-pruning-at-source, README.md:391), response
    stored verbatim as the array-of-structs document."""
    fetcher = fetcher or fetch_json
    key_val = get_secret(api_key_env)
    status: dict[str, str] = {}
    for key, meta in locations.items():
        island, location = key.split("/", 1)
        url = (f"{base_url}/{meta['latitude']},{meta['longitude']}"
               f"/{start_date}/{end_date}?unitGroup=metric"
               f"&elements={','.join(elements)}&key={key_val}&contentType=json")
        try:
            doc = dict(fetcher(url))
            doc["address"] = key  # stable join key, like the reference's config name
            save_raw(doc, out_root, island, location,
                     f"vc_{start_date}_{end_date}")
            status[key] = "ok"
        except Exception as exc:
            # belt-and-braces: whatever the fetcher raised, no secret
            # reaches the persisted status artifact
            status[key] = f"error: {redact_url(str(exc))}"
    return status


def incremental_window(today: str | None = None,
                       lookback_days: int = 31) -> tuple[str, str]:
    """The monthly-update extraction window (B4/B5, README.md:866-868):
    [today − lookback, today]. The overlap with already-loaded data is
    resolved by the upsert's new-wins semantics."""
    from datetime import date, timedelta
    end = date.fromisoformat(today) if today else date.today()
    start = end - timedelta(days=lookback_days)
    return start.isoformat(), end.isoformat()
