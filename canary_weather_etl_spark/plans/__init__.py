"""Query-plan registry package.

Importing this package populates ``REGISTRY`` with every implemented
operator's (spark_fn, oracle_sql) pair. Modules register via the
``@register`` decorator in ``registry``.
"""

from . import registry
from .registry import REGISTRY, QuerySpec, load, oracle_sql, queries, register

# Import for registration side effects — order groups the registry roughly
# by SURVEY.md §2 section.
from . import relational  # noqa: E402,F401  §2.1-2.2, 2.4, 2.6, 2.8
from . import joins       # noqa: E402,F401  §2.3, 2.7
from . import windows     # noqa: E402,F401  §2.5, 2.9, grouping sets
from . import llm         # noqa: E402,F401  §2.11 dedup/similarity/text/multimodal
from . import arrays      # noqa: E402,F401  §2.8 array/JSON families, SQL façade
from . import temporal_skew  # noqa: E402,F401  as-of join, skew mitigation
from . import analytics   # noqa: E402,F401  range join, rollups, percentiles, moments
from . import scalars_ext  # noqa: E402,F401  extended string/date scalar coverage
from . import weather_ingest  # noqa: E402,F401  §2.1/2.9 ingestion differential
from . import curation     # noqa: E402,F401  §2.11 split/mix/vocab/contamination
from . import formats      # noqa: E402,F401  §2.1 CSV/JSONL sink+scan round trips
from . import stream_proofs  # noqa: E402,F401  §2.9 checkpoint-restart exactly-once
from . import advanced_sql  # noqa: E402,F401  regr/LATERAL/recursive CTE/EWMA/PageRank
from . import r6_queries   # noqa: E402,F401  skyline/MAD/PMI/containment/k-core/nearest
from . import r7_queries   # noqa: E402,F401  kmeans/BFS/PPJoin/winsorize/SQL-UDF/zonemap
from . import tpch          # noqa: E402,F401  classic TPC-H pack (all 22)
from . import cleaning      # noqa: E402,F401  PII redaction / URL canonicalization
from . import r8_queries    # noqa: E402,F401  BPE encode-ids / stream upsert / r8 ops
from . import r9_queries    # noqa: E402,F401  semantic dedup / r9 ops
from . import r10_queries   # noqa: E402,F401  containment / quality logit
from . import r11_queries   # noqa: E402,F401  banded containment / postings screen
from . import r12_queries   # noqa: E402,F401  fixed-batch admission / ivfpq sweep / strata drift
from . import r13_queries   # noqa: E402,F401  drift-adjusted mix weights

# --- Driver-sample ordering -------------------------------------------------
# The external driver snapshots the FIRST 50 registry entries per round
# (CORRECTNESS_r{N}.json), so enumeration order decides which queries get a
# hard external correctness row. Round-13 rotation, per the r12 verdict's
# #1 directive: the r13-new entry at birth, then every remaining entry in
# EVIDENCE-AGE order — computed from the CORRECTNESS_r*.json files
# themselves (latest round each name appears in): the five r5-vintage
# entries that missed r12's 50-cut, the full r7-vintage block (TPC-H
# Q7..Q22 remainder + q_pii_redact/q_url_canonicalize/... — the oldest
# driver evidence in the registry), then the r8-vintage block. The first
# 50 cover new + r5 + r7 + 24 of the r8 block; the rest of the r8 block
# is queued as the r14 head, completing the full-registry re-sample cycle.
_DRIVER_PRIORITY = (
    # New in r13 — driver rows at birth (r12 verdict #3 + the banded
    # admission state layout).
    "q_mix_weights_drift_adjusted", "q_stream_admission_banded",
    # r5-vintage (missed r12's 50-cut).
    "q_pagerank_purchases", "q_percentile_within_group",
    "q_join_null_safe", "q_subquery_exists", "q_group_by_all",
    # r7-vintage block (r12 verdict #1: the oldest driver evidence).
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q13", "q_tpch_q15", "q_tpch_q17",
    "q_tpch_q18", "q_tpch_q4", "q_tpch_q9", "q_tpch_q19", "q_tpch_q21",
    "q_tpch_q22", "q_tpch_q2", "q_tpch_q12", "q_pii_redact",
    "q_url_canonicalize", "q_equidepth_histogram", "q_cohort_retention",
    "q_sql_scripting", "q_perceptron_batch", "q_boilerplate_strip",
    # r8-vintage block (last driver row r8); first 24 land in the r13
    # sample, the remainder is the r14 head. Reference flagships first.
    "q1_groupby_avg", "q2_groupby2_topk", "q3_filtered_groupby_avg",
    "q_ab_test_zscore", "q_abc_classification", "q_anomaly_mad_approx",
    "q_attribution_linear", "q_basket_pairs", "q_benford_digits",
    "q_cdc_chunk_dedup", "q_chisq_independence", "q_concurrency_peak",
    "q_corpus_novelty", "q_cusum_changepoint", "q_daily_autocorr",
    "q_data_expectations", "q_degree_histogram", "q_distinct_pairs",
    "q_embedding_dim_stats", "q_event_transitions", "q_filter_null_empty",
    "q_funnel_latency", "q_gini_concentration", "q_hits_bipartite",
    "q_incremental_recompute", "q_join_inner_fact", "q_jsonl_quarantine",
    "q_kendall_tau", "q_listagg_topn", "q_longest_streak",
    "q_mannwhitney_u", "q_partition_fingerprint", "q_projection_derived",
    "q_rfm_segmentation", "q_rolling_active_users", "q_scalar_string",
    "q_seasonal_baseline", "q_session_funnel", "q_skew_audit",
    "q_snapshot_diff", "q_source_overlap", "q_spearman_corr",
    "q_time_weighted_avg", "q_top_paths", "q_topk_global",
    "q_tpch_q11", "q_tpch_q16", "q_tpch_q20", "q_watermark_late_audit",
)


def _reorder_registry() -> None:
    missing = [n for n in _DRIVER_PRIORITY if n not in REGISTRY]
    if missing:  # typo guard — fail loudly at import, not silently at judge
        raise RuntimeError(f"_DRIVER_PRIORITY names not in REGISTRY: {missing}")
    seen: dict[str, None] = {}
    for n in _DRIVER_PRIORITY:
        seen.setdefault(n, None)
    rest = [n for n in REGISTRY if n not in seen]
    ordered = {n: REGISTRY[n] for n in [*seen, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec", "load", "oracle_sql", "queries", "register"]
