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


# --- k-core peel -------------------------------------------------------------

@given(cell_sets=st.lists(
    # user i is active in cells[i] ⊆ {0..4}: an edge needs >= 3 shared
    # cells, so subsets of a 5-cell universe give degrees anywhere from 0
    # to n-1 — with ~20 users the k=15 threshold is genuinely reachable
    # and peel cascades occur (unlike sparse random events, where a
    # 15-core is impossible and the test would only pin the empty regime)
    st.sets(st.integers(0, 4), max_size=5),
    min_size=16, max_size=24))
@settings(**SETTINGS)
def test_kcore_peel_matches_naive_peel(spark, tmp_path_factory, cell_sets):
    from datetime import datetime, timedelta

    tmp = str(tmp_path_factory.mktemp("kcore"))
    base = datetime(2024, 1, 1)
    rows = [(u * 10 + h, base + timedelta(hours=h), u, "view", 1.0, "{}")
            for u, cs in enumerate(cell_sets) for h in sorted(cs)]
    if not rows:
        rows = [(0, base, 0, "view", 1.0, "{}")]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    got = {r["round"]: r["n_alive"]
           for r in REGISTRY["q_kcore_peel"].fn(spark, tmp).collect()}

    # naive: co-activity edges (>= 3 shared cells; the 40-active cell cap
    # never binds at <= 24 users), then 4 peel rounds at k = 15
    n = len(cell_sets)
    adj: dict[int, set[int]] = {u: set() for u in range(n)}
    for a in range(n):
        for b in range(a + 1, n):
            if len(cell_sets[a] & cell_sets[b]) >= 3:
                adj[a].add(b)
                adj[b].add(a)
    alive = {u for u in range(n) if adj[u]}
    for rnd in range(1, 5):
        alive = {u for u in alive if len(adj[u] & alive) >= 15}
        assert got[rnd] == len(alive), (rnd, got, alive)


# --- nearest view ------------------------------------------------------------

@given(evs=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3600),
              st.sampled_from(["view", "purchase"])),
    min_size=1, max_size=25))
@settings(**SETTINGS)
def test_nearest_view_matches_naive_scan(spark, tmp_path_factory, evs):
    from datetime import datetime, timedelta

    tmp = str(tmp_path_factory.mktemp("nview"))
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(seconds=s), u, et, 1.0, "{}")
            for i, (u, s, et) in enumerate(evs)]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    got = {r["event_id"]: r["gap_us"]
           for r in REGISTRY["q_nearest_view"].fn(spark, tmp).collect()}

    for i, (u, s, et) in enumerate(evs):
        if et != "purchase":
            continue
        views = [vs for (vu, vs, vet) in evs if vu == u and vet == "view"]
        exp = min((abs(vs - s) for vs in views), default=None)
        exp_us = exp * 1_000_000 if exp is not None else None
        assert got[i] == exp_us, f"purchase {i}: got {got[i]}, want {exp_us}"


# --- watermark late audit ----------------------------------------------------

@given(evs=st.lists(
    st.tuples(st.integers(0, 20000)),    # event-time seconds; arrival = index
    min_size=1, max_size=30))
@settings(**SETTINGS)
def test_watermark_late_audit_matches_naive_replay(spark, tmp_path_factory,
                                                   evs):
    from datetime import datetime, timedelta

    tmp = str(tmp_path_factory.mktemp("wlate"))
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(seconds=s), 1, "view", 1.0, "{}")
            for i, (s,) in enumerate(evs)]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    row = {r["event_type"]: r for r in
           REGISTRY["q_watermark_late_audit"].fn(spark, tmp).collect()}["view"]

    hw, n_late, max_lag = None, 0, 0
    for (s,) in evs:
        hw = s if hw is None else max(hw, s)
        lag = hw - s
        max_lag = max(max_lag, lag)
        if lag > 7200:
            n_late += 1
    assert (row["n_events"], row["n_late"], row["max_lag_us"]) == (
        len(evs), n_late, max_lag * 1_000_000)


# --- shingle containment -----------------------------------------------------

@given(texts=st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=2, max_size=10))
@settings(**SETTINGS)
def test_shingle_containment_matches_naive_sets(spark, tmp_path_factory,
                                                texts):
    tmp = str(tmp_path_factory.mktemp("cont"))
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {(r["a"], r["b"]): r["shared"]
           for r in REGISTRY["q_shingle_containment"].fn(spark, tmp)
           .collect()}

    # naive: Spark-split semantics — split('\s+') on the trimmed lowered
    # text keeps NO empty tokens for all-space inputs after trim... but a
    # fully-empty/whitespace text yields [''] (one empty token), giving
    # the shingle list [] either way since bigrams need 2 tokens.
    import re as _re

    def shingles(t):
        toks = _re.split(r"\s+", t.lower().strip(" "), flags=_re.ASCII)
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    # max-df cap (<= 100 docs) never binds at this size
    exp = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a]) >= 0.6:
                exp[(a, b)] = inter
    assert got == exp


# --- boolean retrieval -------------------------------------------------------

@given(texts=st.lists(
    st.lists(st.sampled_from(["merge", "sort", "filter", "x", "y"]),
             max_size=15).map(" ".join),
    min_size=1, max_size=10))
@settings(**SETTINGS)
def test_boolean_retrieval_matches_naive_counts(spark, tmp_path_factory,
                                                texts):
    tmp = str(tmp_path_factory.mktemp("bool"))
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {r["doc_id"]: (r["tf_merge"], r["tf_sort"], r["tf_filter"],
                         r["total_tf"])
           for r in REGISTRY["q_boolean_retrieval"].fn(spark, tmp).collect()}

    exp = {}
    for i, t in enumerate(texts):
        toks = t.split()
        tf = {w: toks.count(w) for w in ("merge", "sort", "filter")}
        if all(tf[w] >= 3 for w in tf):
            exp[i] = (tf["merge"], tf["sort"], tf["filter"],
                      sum(tf.values()))
    assert got == exp


# --- temperature mix ---------------------------------------------------------

@given(srcs=st.lists(st.sampled_from(["a", "b", "c", "d"]),
                     min_size=1, max_size=40))
@settings(**SETTINGS)
def test_temperature_mix_matches_naive_weights(spark, tmp_path_factory,
                                               srcs):
    import math

    tmp = str(tmp_path_factory.mktemp("tmix"))
    rows = [(i, "t", "en", s, 1) for i, s in enumerate(srcs)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {r["source"]: (r["n_docs"], r["share"], r["temp_weight"])
           for r in REGISTRY["q_temperature_mix"].fn(spark, tmp).collect()}

    counts = {s: srcs.count(s) for s in set(srcs)}
    total = len(srcs)
    # ordered fold: sorted sqrt values, left-to-right with 0.0 seed —
    # exactly the engine's summation order
    den = 0.0
    for v in sorted(math.sqrt(float(n)) for n in counts.values()):
        den = den + v

    def rd6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    exp = {s: (n, rd6(float(n) / total), rd6(math.sqrt(float(n)) / den))
           for s, n in counts.items()}
    assert got == exp


# --- partition fingerprint / incremental recompute ---------------------------

@given(orders=st.lists(
    st.tuples(st.integers(0, 3000),                     # o_orderkey
              st.integers(0, 2),                        # month index
              st.sampled_from(["1-URGENT", "3-MEDIUM"])),
    min_size=1, max_size=30, unique_by=lambda t: t[0]))
@settings(**SETTINGS)
def test_incremental_recompute_flags_exactly_dirty_months(
        spark, tmp_path_factory, orders):
    from datetime import datetime

    tmp = str(tmp_path_factory.mktemp("fpdiff"))
    rows = [(k, 1, "O", 1.0, datetime(2024, m + 1, 3), p)
            for k, m, p in orders]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")

    got = {str(r["month"]): r["needs_recompute"] for r in
           REGISTRY["q_incremental_recompute"].fn(spark, tmp).collect()}

    # a month is dirty iff it contains a key % 1000 == 7 row (digest
    # change is injective here: the priority string actually changes)
    exp = {}
    for k, m, p in orders:
        month = f"2024-{m + 1:02d}-01"
        exp[month] = exp.get(month, False) or (k % 1000 == 7)
    assert got == exp


# --- CDC chunk dedup ---------------------------------------------------------

@given(texts=st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=100),
    min_size=1, max_size=8),
    dup=st.integers(0, 7))
@settings(**SETTINGS)
def test_cdc_chunk_dedup_matches_naive_chunker(spark, tmp_path_factory,
                                               texts, dup):
    # plant a duplicate: one text appears twice so cross-doc shared
    # chunks actually occur
    texts = list(texts) + [texts[dup % len(texts)]]
    tmp = str(tmp_path_factory.mktemp("cdcd"))
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {r["chunk_key"]: (r["n_occ"], r["n_docs"], r["chunk_len"])
           for r in REGISTRY["q_cdc_chunk_dedup"].fn(spark, tmp).collect()}

    occ: dict[str, list[tuple[int, str]]] = {}
    for i, t in enumerate(texts):
        tl = t.lower()
        bounds = [p + 1 for p in range(max(len(tl) - 16 + 1, 0))
                  if _md5_int(tl[p:p + 16], 8) % 64 == 0]
        starts = [1] + bounds
        ends = bounds + [len(tl) + 1]
        for s, e in zip(starts, ends):
            chunk = tl[s - 1:e - 1]
            if len(chunk) >= 16:
                key = hashlib.md5(chunk.encode()).hexdigest()[:16]
                occ.setdefault(key, []).append((i, chunk))
    exp = {k: (len(v), len({d for d, _ in v}), len(v[0][1]))
           for k, v in occ.items() if len(v) > 1}
    # query returns top-20; at this size the full dup set fits
    assert got == exp


# --- MAD anomaly -------------------------------------------------------------

@given(vals=st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.integers(-50, 50)),          # integer-valued doubles: the
    min_size=1, max_size=30))                 # naive median is then exact
@settings(**SETTINGS)
def test_anomaly_mad_matches_naive_robust_stats(spark, tmp_path_factory,
                                                vals):
    from datetime import datetime

    tmp = str(tmp_path_factory.mktemp("mad"))
    rows = [(i, datetime(2024, 1, 1), 1, et, float(v), "{}")
            for i, (et, v) in enumerate(vals)]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    got = {r["event_type"]: (r["n_rows"], r["med"], r["mad"],
                             r["n_anomalies"])
           for r in REGISTRY["q_anomaly_mad"].fn(spark, tmp).collect()}

    def median(xs):
        ys = sorted(xs)
        m = len(ys) // 2
        return float(ys[m]) if len(ys) % 2 else (ys[m - 1] + ys[m]) / 2.0

    exp = {}
    for et in {e for e, _ in vals}:
        xs = [float(v) for e, v in vals if e == et]
        med = median(xs)
        adevs = [abs(x - med) for x in xs]
        mad = median(adevs)
        n_anom = sum(1 for a in adevs if a > 3 * mad)
        import math
        rd6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        exp[et] = (len(xs), rd6(med), rd6(mad), n_anom)
    assert got == exp
