"""Round-13 registry queries.

Wires the per-stratum drift decomposition to its stated consumer (the
r12 verdict's "What's missing #3"): q_mix_weights_drift_adjusted joins
q_corpus_drift_tv_strata's per-SOURCE total-variation rows into the
q_domain_mix_weights temperature-mix derivation, so "re-derive mix
weights for exactly the drifting strata" is a driver-checkable oracled
entry rather than a docstring claim.

Reference provenance: the reference repo (ilias-lp/canary-weather-etl
README.md) ships none of this; it extends the engine's LLM-pipeline
curation family (SURVEY.md §2.11) with public methods only
(temperature-scaled domain mixing, total-variation distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round_det
from ..operators import dedup as D
from .llm import _minhash_ab_sql, _minhash_band_fold_sql
from .r10_queries import _grams_sql
from .r12_queries import (
    _DRIFT_TV_STRATA_SQL,
    _corpus_fingerprint,
    _strata_drift_from_counts,
    _strata_term_counts,
)
from .registry import load, load_par, register

# ---------------------------------------------------------------------------
# Drift-adjusted mix weights: the strata-TV table's consumer
# ---------------------------------------------------------------------------

_MIX_DRIFT_SQL = f"""
    WITH drift AS ({_DRIFT_TV_STRATA_SQL}),
    counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), scored AS (
        SELECT c.source, c.n_docs, d.tv_units,
               sqrt(CAST(c.n_docs AS DOUBLE)) *
               ((1000000000 - d.tv_units) / CAST(1000000000 AS DOUBLE))
                   AS score
        FROM counts c
        JOIN drift d ON d.kind = 'source' AND d.stratum = c.source
    ), tot AS (
        SELECT CAST(SUM(score) AS DOUBLE) AS z, SUM(n_docs) AS n
        FROM scored
    )
    SELECT source, n_docs, tv_units,
           FLOOR(score / z * 1e6 + 0.5) / 1e6 AS weight,
           CAST(FLOOR(score / z * n) AS BIGINT) AS docs_per_epoch
    FROM scored CROSS JOIN tot
"""


def mix_weights_drift_adjusted(d: DataFrame) -> DataFrame:
    """Temperature mix weights (alpha=0.5, the q_domain_mix_weights rule)
    with each source's score damped by its measured snapshot drift:
    score = sqrt(n_docs) * (1 - tv), tv in [0, 1] from the per-stratum
    TV monitor's 1e9 fixed-point units. A source whose term distribution
    moved between snapshot halves is down-weighted proportionally — a
    fully vanished/newborn source (tv = 1e9 by the monitor's totality
    CASE) contributes weight 0; a stable source keeps its full
    temperature weight. All float steps are engine-portable IEEE
    (sqrt, an exact integer subtraction under 2^53, one division), the
    same discipline as the base entry."""
    return mix_weights_from_counts(
        _strata_term_counts(d),
        d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs")))


def mix_weights_from_counts(term_counts: DataFrame,
                            doc_counts: DataFrame) -> DataFrame:
    """The drift-adjusted mix tail over PRE-AGGREGATED state: takes the
    monitor's (kind, stratum, term, c0, c1) count table and a
    (source, n_docs) table and produces the identical weight rows as
    `mix_weights_drift_adjusted`. Split out (r14) so the STREAMING twin
    can feed the accumulated per-batch additive state through the same
    arithmetic — both count families are sums of per-row contributions,
    so a merge of disjoint batches lands on the batch entry's exact
    inputs, and everything downstream is shared code, not a re-statement."""
    drift = (_strata_drift_from_counts(term_counts)
             .filter(F.col("kind") == "source")
             .select(F.col("stratum").alias("source"), "tv_units"))
    counts = doc_counts
    damp = ((F.lit(1_000_000_000).cast("double")
             - F.col("tv_units").cast("double")) / F.lit(1e9))
    scored = (counts.join(drift, "source")
              .withColumn("score",
                          F.sqrt(F.col("n_docs").cast("double")) * damp))
    tot = scored.agg(F.sum("score").alias("z"), F.sum("n_docs").alias("n"))
    # z = 0 iff EVERY source is fully drifted (damp is in [0,1], sqrt
    # >= 0): under ANSI, a bare score/z would crash with DIVIDE_BY_ZERO
    # while the DuckDB oracle yields NULL — route the degenerate case to
    # NULL explicitly so both engines agree (there is no meaningful mix
    # when every source's snapshot moved entirely).
    w = F.when(F.col("z") > 0, F.col("score") / F.col("z"))
    return (scored.crossJoin(F.broadcast(tot))
            .select("source", "n_docs", "tv_units",
                    round_det(w, 6).alias("weight"),
                    F.floor(w * F.col("n")).cast("bigint")
                    .alias("docs_per_epoch")))


@register(
    "q_mix_weights_drift_adjusted",
    oracle=_MIX_DRIFT_SQL,
    doc="DRIFT-ADJUSTED domain mix weights — the per-stratum TV "
        "decomposition's stated consumer, wired (r12 verdict #3): the "
        "q_domain_mix_weights temperature rule (score ∝ sqrt(n_docs), "
        "alpha=0.5) with each source's score multiplied by "
        "(1 - tv_source), where tv_source is q_corpus_drift_tv_strata's "
        "integer-exact per-source total variation between the two "
        "md5-parity snapshot halves. Corpus-level TV says THAT the "
        "distribution moved; this entry re-derives the mix so exactly "
        "the drifting sources lose sampling mass (a vanished/newborn "
        "source — tv = 1 by the monitor's totality CASE — is excluded "
        "outright), which is how a 100 TB curation pipeline responds to "
        "a source going stale or changing composition between crawls. "
        "Scale shape: the drift side is the monitor's two map-side-"
        "combinable conditional counts; the mix side is one agg to "
        "#sources rows; the normalizer rides as a broadcast one-row "
        "aggregate. Weight monotonicity under injected drift is "
        "pytest-pinned (tests/test_r13_ops.py).",
    tags=("llm", "curation", "sampling", "quality"),
)
def q_mix_weights_drift_adjusted(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    d = load_par(spark, sf_dir, "documents")
    return mix_weights_drift_adjusted(d)

# ---------------------------------------------------------------------------
# Banded admission screen: the 100 TB state layout, driver-visible
# ---------------------------------------------------------------------------

_BANDED_B = 200  # the fixed-batch entry's sf-independent batch span


def _banded_side_sql(grams: str, tag: str) -> str:
    """Portable MinHash signatures + polynomial band keys for one side —
    the _MINHASH_LSH_SQL construction, parameterized by the grams CTE."""
    folds = " ".join(f"WHEN {b} THEN {_minhash_band_fold_sql(b)}"
                     for b in range(8))
    return f"""
    hs_{tag} AS (
        SELECT doc_id AS doc,
               CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS h
        FROM {grams}),
    mins_{tag} AS (
        SELECT doc, ab.p, MIN((ab.a * h + ab.b) % 2147483647) AS mh
        FROM hs_{tag} CROSS JOIN ab GROUP BY doc, ab.p),
    sig_{tag} AS (
        SELECT doc, list(mh ORDER BY p) AS s FROM mins_{tag} GROUP BY doc),
    bands_{tag} AS (
        SELECT doc, tb.b, CASE tb.b {folds} END AS bv
        FROM sig_{tag}, UNNEST(range(0, 8)) AS tb(b))"""


_ADMISSION_BANDED_SQL = f"""
    WITH cs AS (SELECT doc_id, text FROM documents
                WHERE doc_id >= {_BANDED_B}),
    bt AS (SELECT doc_id, text FROM documents
           WHERE doc_id < {_BANDED_B}),
    {_grams_sql('cs', 'g_cs')},
    {_grams_sql('bt', 'g_bt')},
    {_minhash_ab_sql(32)},
    {_banded_side_sql('g_cs', 'c')},
    {_banded_side_sql('g_bt', 'b')},
    cands AS (
        SELECT DISTINCT bb.doc AS bdoc, bc.doc AS cdoc
        FROM bands_b bb JOIN bands_c bc
          ON bb.b = bc.b AND bb.bv = bc.bv),
    common AS (
        SELECT c2.bdoc, c2.cdoc, COUNT(*) AS cmn
        FROM cands c2
        JOIN g_bt ga ON ga.doc_id = c2.bdoc
        JOIN g_cs gb ON gb.doc_id = c2.cdoc AND gb.shingle = ga.shingle
        GROUP BY 1, 2),
    near AS (
        SELECT bdoc AS doc_id, COUNT(*) AS n_near
        FROM common m
        JOIN g_bt_sz sa ON sa.doc_id = m.bdoc
        JOIN g_cs_sz sb ON sb.doc_id = m.cdoc
        WHERE CAST(cmn AS DOUBLE) / (sa.sz + sb.sz - cmn) >= 0.5
        GROUP BY 1),
    md5c AS (SELECT DISTINCT md5(text) AS h FROM cs)
    SELECT d.doc_id,
           CASE WHEN md5(d.text) IN (SELECT h FROM md5c) THEN 'exact_dup'
                WHEN COALESCE(n.n_near, 0) > 0 THEN 'near_dup'
                ELSE 'admit' END AS verdict,
           CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near
    FROM bt d LEFT JOIN near n ON n.doc_id = d.doc_id
"""


@register(
    "q_stream_admission_banded",
    oracle=_ADMISSION_BANDED_SQL,
    doc="BANDED admission screen — the 100 TB state layout the "
        "shingle-postings screen's docstring has pointed at since r11, "
        "now a driver-checkable entry: the persisted state is the "
        "MinHash BAND-KEY table (8 rows per corpus doc instead of "
        "~|tokens| shingle-posting rows — a ~25-50x smaller linear "
        "term), plus doc-bucketed shingle SETS that candidate "
        "verification point-fetches (a sparse probe set, so doc-bucket "
        "pruning actually engages — unlike the raw postings table, "
        "whose ~40k uniform batch probe keys touch every bucket: the "
        "SCALE.md r13 floor analysis). Screen = exact content-md5 gate "
        "-> band-key equi-join for candidates -> exact Jaccard >= 0.5 "
        "verification of candidates only. DELIBERATELY "
        "probabilistic-recall vs the exact postings screen (a pair "
        "colliding in no band is missed — the standard LSH trade, "
        "S-curve midpoint ~0.5 at 32 perms / 8 bands), but every "
        "verdict is DETERMINISTIC given the portable hash family, so "
        "the oracle replays signatures, band folds, the candidate join "
        "and verification bit-for-bit; recall vs the exact screen is "
        "pytest-pinned (tests/test_r13_ops.py). Fixed sf-independent "
        "200-doc batch against the growing seed corpus, screen-only, "
        "seed state cached under the content fingerprint — the same "
        "measurement frame as q_stream_admission_fixed_batch so the "
        "two states' decade rows are directly comparable.",
    tags=("llm", "dedup", "streaming"),
)
def q_stream_admission_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    d = load(spark, sf_dir, "documents")
    corpus = (d.filter(F.col("doc_id") >= _BANDED_B)
              .select("doc_id", "text"))
    batch = (d.filter(F.col("doc_id") < _BANDED_B)
             .select("doc_id", "text"))

    fp = _corpus_fingerprint(corpus, sf_dir)
    # uid-scoped (the canary_ivf_u{uid} convention, ADVICE r2): a shared
    # /tmp root would PermissionError for the second user on a host
    cache = f"/tmp/canary_admission_banded_u{os.getuid()}/{fp}"
    state_dir = os.path.join(cache, "state")
    if not os.path.exists(os.path.join(cache, "_DONE")):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        D.admission_state_init_banded(corpus, state_dir, n=2)
        open(os.path.join(cache, "_DONE"), "w").close()

    return (D.admission_screen_batch_banded(batch, state_dir,
                                            threshold=0.5, n=2)
            .select("doc_id", "verdict", "n_near"))
