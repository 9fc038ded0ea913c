"""Round-14 operator tests: the drift-adjusted curation composition and
the banded admission screen's recall measured WHERE THE S-CURVE BITES
(threshold-adjacent pairs), per the r13 verdict's #5/#6."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from canary_weather_etl_spark.plans import REGISTRY
from canary_weather_etl_spark.plans.registry import load, load_par

SF_SMALL = "/root/testdata/sf0.001"


def _md5_parity(i: int) -> int:
    """The strata-drift monitor's md5 snapshot-half for a doc_id —
    replicated here so tests can PLACE docs in a chosen half."""
    return int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % 2


# ---------------------------------------------------------------------------
# Drift-adjusted curation composition
# ---------------------------------------------------------------------------

def test_curation_drift_pick_matches_quota(spark):
    """The composed entry's mix stage must pick EXACTLY
    min(docs_per_epoch, survivors) docs per source, and only survivor
    docs — recomputed here independently from the operator pieces."""
    from canary_weather_etl_spark.operators.pipeline import curation_survivors
    from canary_weather_etl_spark.plans.r13_queries import (
        mix_weights_drift_adjusted,
    )

    d = load_par(spark, SF_SMALL, "documents")
    surv = curation_survivors(d, portable_hash=True).localCheckpoint(True)
    n_surv = {r["source"]: r["n"] for r in
              surv.groupBy("source").agg(F.count("*").alias("n")).collect()}
    quota = {r["source"]: r["docs_per_epoch"] for r in
             mix_weights_drift_adjusted(surv).collect()}

    chunks = REGISTRY["q_corpus_curation_drift"].fn(spark, SF_SMALL)
    picked = (chunks.select("doc_id", "source").distinct()
              .groupBy("source").agg(F.count("*").alias("n")).collect())
    got = {r["source"]: r["n"] for r in picked}

    expected = {s: min(q, n_surv[s]) for s, q in quota.items()
                if q is not None and min(q, n_surv[s]) > 0}
    assert got == expected
    # survivors-only: every picked doc is a survivor
    surv_ids = {r["doc_id"] for r in surv.select("doc_id").collect()}
    pick_ids = {r["doc_id"] for r in
                chunks.select("doc_id").distinct().collect()}
    assert pick_ids <= surv_ids


def test_curation_drift_fully_drifted_source_dropped(spark):
    """A source whose docs all sit in ONE md5-parity snapshot half has
    tv = 1 by the monitor's totality CASE -> quota 0 -> zero chunks,
    while stable sources keep sampling mass. This is the composed
    pipeline's version of the standalone entry's vanished-source rule."""
    even_ids = [i for i in range(4000) if _md5_parity(i) == 0]
    odd_ids = [i for i in range(4000) if _md5_parity(i) == 1]

    def doc(i, src, salt):
        # 24 unique word-soup tokens: passes the quality gate
        # (>=20 tokens, low punct), unique text (no dedup casualties)
        toks = " ".join(f"{salt}w{i}x{j}" for j in range(24))
        return (i, toks, "und", src)

    rows = ([doc(i, "bad", "b") for i in even_ids[:20]]      # one half only
            + [doc(i, "good", "g") for i in even_ids[20:30]]
            + [doc(i, "good", "g") for i in odd_ids[:10]])   # both halves
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "lang string, source string")

    from canary_weather_etl_spark.plans.r14_queries import (
        curate_corpus_drift_mix,
    )
    out = curate_corpus_drift_mix(df, portable_hash=True).localCheckpoint(True)
    per_src = {r["source"]: r["n"] for r in
               out.select("doc_id", "source").distinct()
               .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "bad" not in per_src, per_src
    assert per_src.get("good", 0) > 0, per_src


def test_curation_drift_oracle_matches_duckdb(spark, duck):
    """Full-composition differential at sf0.01 — the same comparison the
    external driver runs (row count + sorted-row equality)."""
    spec = REGISTRY["q_corpus_curation_drift"]
    got = sorted(tuple(r) for r in spec.fn(spark, SF_SMALL).collect())
    con = __import__("duckdb").connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_SMALL}/{t}.parquet')")
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    con.close()
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Banded admission recall where the S-curve bites (r13 verdict #4)
# ---------------------------------------------------------------------------

def test_banded_admission_recall_threshold_adjacent(spark):
    """The existing recall pin is trivially 1.0 (fixture near-dups sit
    far above the 8-band/32-perm S-curve midpoint). Here every planted
    pair's Jaccard is threshold-ADJACENT (0.509-0.60 for threshold 0.5),
    where the banding hit rate 1-(1-j^4)^8 is only ~0.43-0.67 — so the
    probabilistic-recall trade the banded screen's docstring advertises
    is actually measured: recall must be NON-TRIVIAL (the screen finds a
    solid fraction) and STRICTLY below 1 (the S-curve really bites).
    The md5 hash family is deterministic, so the measured recall is a
    fixed number — pinned in SCALE.md (r14)."""
    import canary_weather_etl_spark.operators.dedup as D

    K = 40          # shingles per doc (41 unique tokens)
    N_PAIRS = 60
    corpus_rows, batch_rows = [], []
    for i in range(N_PAIRS):
        ctoks = [f"d{i}x{j}" for j in range(K + 1)]
        corpus_rows.append((10_000 + i, " ".join(ctoks)))
        m = 27 + (i % 4)            # shared shingles -> j = m/(80-m)
        btoks = ctoks[:m + 1] + [f"q{i}y{j}" for j in range(K - m)]
        batch_rows.append((i, " ".join(btoks)))
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    with tempfile.TemporaryDirectory() as td:
        cdir = os.path.join(td, "corpus")
        corpus.write.parquet(cdir)
        exact = {r["doc_id"] for r in D.admission_screen_batch(
            batch, cdir, state_dir=None, regime="rescan",
            threshold=0.5, n=2).collect() if r["verdict"] == "near_dup"}
        sdir = os.path.join(td, "state")
        D.admission_state_init_banded(corpus, sdir, n=2)
        banded = {r["doc_id"] for r in D.admission_screen_batch_banded(
            batch, sdir, threshold=0.5, n=2).collect()
            if r["verdict"] == "near_dup"}

    # every planted pair is >= threshold, so the exact screen sees all
    assert len(exact) == N_PAIRS
    assert banded <= exact              # misses only, never inventions
    recall = len(banded) / len(exact)
    # Theory: mean hit rate across the m in {27..30} mix ~ 0.54. The
    # measured value is deterministic (md5 family); the band below is
    # wide enough for construction tweaks but pins both claims: the
    # screen works at the threshold edge AND the LSH trade is real.
    assert 0.25 <= recall < 1.0, recall


# ---------------------------------------------------------------------------
# Streaming drift-adjusted mix twin
# ---------------------------------------------------------------------------

def test_stream_mix_weights_equals_batch(spark):
    """The stream-state path must land on the batch entry's EXACT rows:
    additive term counts + doc tallies merged across three mod-3
    micro-batches, fed through the shared mix_weights_from_counts tail."""
    batch = sorted(
        tuple(r) for r in
        REGISTRY["q_mix_weights_drift_adjusted"].fn(spark, SF_SMALL)
        .collect())
    stream = sorted(
        tuple(r) for r in
        REGISTRY["q_stream_mix_weights_drift"].fn(spark, SF_SMALL)
        .collect())
    assert stream == batch and len(stream) > 0


def test_mix_weights_from_counts_replay_idempotent(spark):
    """Re-accumulating a batch's state (the at-least-once replay case:
    same batch_id, overwrite mode) must not change the merged counts —
    asserted at the state layer the streaming entry actually writes."""
    import shutil
    import tempfile

    from canary_weather_etl_spark.plans.r12_queries import (
        _strata_term_counts,
    )
    from canary_weather_etl_spark.plans.r13_queries import (
        mix_weights_from_counts,
    )

    d = load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source")
    thirds = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    base = tempfile.mkdtemp(prefix="canary_mixdrift_replay_")
    try:
        for i, b in enumerate(thirds):
            sub = f"batch_{i:05d}"
            for _ in range(2 if i == 1 else 1):  # batch 1 replays
                (_strata_term_counts(b).write.mode("overwrite")
                 .parquet(f"{base}/terms/{sub}"))
                (b.groupBy("source")
                 .agg(F.count(F.lit(1)).alias("n_docs"))
                 .write.mode("overwrite").parquet(f"{base}/docs/{sub}"))
        terms = (spark.read.option("recursiveFileLookup", "true")
                 .parquet(f"{base}/terms")
                 .groupBy("kind", "stratum", "term")
                 .agg(F.sum("c0").alias("c0"), F.sum("c1").alias("c1")))
        ndocs = (spark.read.option("recursiveFileLookup", "true")
                 .parquet(f"{base}/docs")
                 .groupBy("source").agg(F.sum("n_docs").alias("n_docs")))
        got = sorted(tuple(r) for r in
                     mix_weights_from_counts(terms, ndocs).collect())
        want = sorted(
            tuple(r) for r in
            REGISTRY["q_mix_weights_drift_adjusted"].fn(spark, SF_SMALL)
            .collect())
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# Guarded broadcast in verify_pairs_jaccard
# ---------------------------------------------------------------------------

def test_verify_pairs_guarded_broadcast_shape(spark, monkeypatch):
    """The contract case (LSH-sparse candidates) must broadcast the
    candidate-doc lists — the hint off entirely plans SortMergeJoin
    semi-joins whose corpus-sized `sets` shuffle WRITE is paid even
    after AQE converts (measured: curation 1000x 214 -> 264 s). The
    degenerate case (candidates above the pair ceiling) must NOT force
    the broadcast."""
    from canary_weather_etl_spark.operators import dedup as D

    docs = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    sets = D.shingle_sets(docs, "doc_id", "text", 2).localCheckpoint(True)
    sigs = D.minhash_signatures_from_sets(sets, 32, portable_hash=True)
    cands = D.lsh_candidate_pairs(sigs, 8, 32, portable_hash=True)

    out = D.verify_pairs_jaccard(sets, cands, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, \
        "sparse candidates must broadcast both semi-join build sides"
    baseline = sorted(tuple(r) for r in out.collect())

    # degenerate guard: ceiling 0 -> every candidate set is "too big";
    # the forced broadcast must disappear and the result must not change
    monkeypatch.setattr(D, "_BROADCAST_CANDIDATE_PAIRS", 0)
    out2 = D.verify_pairs_jaccard(sets, cands, threshold=0.5)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan2, \
        "above the ceiling the semi-joins must fall back to shuffle"
    assert sorted(tuple(r) for r in out2.collect()) == baseline
