"""Property-style tests for the round-6 operators: each registry query is
run end-to-end on hypothesis-generated fixture tables (written as the
parquet layout the query loads) and checked against an independent naive
Python reference. Few examples, deadline off — every example runs real
Spark jobs (same regime as test_properties.py)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from canary_weather_etl_spark.plans import REGISTRY

SETTINGS = dict(max_examples=6, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _md5_int(s: str, digits: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:digits], 16)


# --- skyline -----------------------------------------------------------------

@given(pts=st.lists(
    st.tuples(st.sampled_from(["A", "B"]),
              st.integers(1, 6),            # p_size
              st.integers(1, 9)),           # price (small ints -> many ties)
    min_size=1, max_size=25))
@settings(**SETTINGS)
def test_skyline_matches_naive_dominance(spark, tmp_path_factory, pts):
    tmp = str(tmp_path_factory.mktemp("sky"))
    rows = [(i, f"part{i}", b, "T", s, float(p))
            for i, (b, s, p) in enumerate(pts)]
    spark.createDataFrame(
        rows, "p_partkey bigint, p_name string, p_brand string, "
              "p_type string, p_size int, p_retailprice double"
    ).write.mode("overwrite").parquet(f"{tmp}/part.parquet")

    got = {(r["p_brand"], r["p_size"], r["price"], r["n_parts"])
           for r in REGISTRY["q_skyline_pareto"].fn(spark, tmp).collect()}

    from collections import Counter
    cnt = Counter((b, s, float(p)) for b, s, p in pts)
    exp = set()
    for (b, s, p), n in cnt.items():
        dominated = any(
            b2 == b and s2 >= s and p2 <= p and (s2 > s or p2 < p)
            for (b2, s2, p2) in cnt)
        if not dominated:
            exp.add((b, s, p, n))
    assert got == exp


# --- CDC chunking ------------------------------------------------------------

@given(texts=st.lists(
    st.text(alphabet="abcdef \n", min_size=0, max_size=120),
    min_size=1, max_size=8))
@settings(**SETTINGS)
def test_cdc_chunking_matches_naive_rolling_scan(spark, tmp_path_factory,
                                                 texts):
    tmp = str(tmp_path_factory.mktemp("cdc"))
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {r["doc_id"]: (r["n_chunks"], r["bound_checksum"], r["first_bound"])
           for r in REGISTRY["q_cdc_chunking"].fn(spark, tmp).collect()}

    for i, t in enumerate(texts):
        tl = t.lower()
        bounds = [p + 1 for p in range(max(len(tl) - 16 + 1, 0))
                  if _md5_int(tl[p:p + 16], 8) % 64 == 0]
        exp = (len(bounds) + 1, sum(bounds),
               bounds[0] if bounds else None)
        assert got[i] == exp, f"doc {i}: got {got[i]}, want {exp}"


# --- grid KNN ----------------------------------------------------------------

@given(keys=st.sets(st.integers(0, 4000), min_size=2, max_size=40))
@settings(**SETTINGS)
def test_grid_knn_matches_naive_neighborhood_scan(spark, tmp_path_factory,
                                                  keys):
    tmp = str(tmp_path_factory.mktemp("knn"))
    rows = [(k, f"c{k}", 0, 0.0, "SEG") for k in sorted(keys)]
    spark.createDataFrame(
        rows, "c_custkey bigint, c_name string, c_nationkey bigint, "
              "c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")

    got = {r["pkey"]: (r["x"], r["y"], r["nearest_key"], r["dist2"])
           for r in REGISTRY["q_grid_knn"].fn(spark, tmp).collect()}

    coords = {k: (_md5_int(f"{k}:x", 8) % 1000, _md5_int(f"{k}:y", 8) % 1000)
              for k in keys}
    queries = [k for k in keys if k % 97 == 0]
    assert set(got) == set(queries)
    for k in queries:
        x, y = coords[k]
        cx, cy = x // 50, y // 50
        cands = [
            (((x - nx) ** 2 + (y - ny) ** 2), nk)
            for nk, (nx, ny) in coords.items()
            if nk != k and abs(nx // 50 - cx) <= 1 and abs(ny // 50 - cy) <= 1
        ]
        exp = (x, y) + ((min(cands)[1], min(cands)[0]) if cands
                        else (None, None))
        assert got[k] == exp, f"key {k}: got {got[k]}, want {exp}"


# --- sessionized funnel ------------------------------------------------------

@given(evs=st.lists(
    st.tuples(st.integers(0, 2),                     # user
              st.integers(0, 7200),                  # seconds offset
              st.sampled_from(["view", "click", "purchase", "error"])),
    min_size=1, max_size=30))
@settings(**SETTINGS)
def test_session_funnel_matches_naive_scan(spark, tmp_path_factory, evs):
    from datetime import datetime, timedelta

    tmp = str(tmp_path_factory.mktemp("sfun"))
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(seconds=s), u, et, 1.0, "{}")
            for i, (u, s, et) in enumerate(evs)]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    row = REGISTRY["q_session_funnel"].fn(spark, tmp).collect()[0]

    # naive: per user, sort by (ts, event_id), split at >30 min gaps,
    # then per session the conditional-min funnel
    per_user: dict[int, list[tuple[int, int, str]]] = {}
    for i, (u, s, et) in enumerate(evs):
        per_user.setdefault(u, []).append((s, i, et))
    sessions = []
    for u, items in per_user.items():
        items.sort()
        cur: list[tuple[int, str]] = []
        prev = None
        for s, _i, et in items:
            if prev is not None and s - prev > 1800:
                sessions.append(cur)
                cur = []
            cur.append((s, et))
            prev = s
        sessions.append(cur)
    n_view = n_vc = n_full = 0
    for sess in sessions:
        t = {}
        for s, et in sess:
            if et in ("view", "click", "purchase") and et not in t:
                t[et] = s
        # min per type (items sorted by ts)
        if "view" in t:
            n_view += 1
            if "click" in t and t["click"] > t["view"]:
                n_vc += 1
                if "purchase" in t and t["purchase"] > t["click"]:
                    n_full += 1
    assert (row["n_sessions"], row["n_view"], row["n_view_then_click"],
            row["n_full_funnel"]) == (len(sessions), n_view, n_vc, n_full)
