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
from . import r14_queries   # noqa: E402,F401  drift-adjusted curation composition

# --- Driver-sample ordering -------------------------------------------------
# The external driver snapshots the FIRST 50 registry entries per round
# (CORRECTNESS_r{N}.json), so enumeration order decides which queries get a
# hard external correctness row. Round-14 rotation, continuing the
# evidence-age cycle (r13 verdict #4): entries ordered by ASCENDING
# driver-evidence vintage, computed from the CORRECTNESS_r*.json files
# themselves (latest round each name appears in). After r13 the oldest
# blocks are the 26 r8-vintage entries (exactly _DRIVER_PRIORITY[50:]
# of the r13 list — the r8 remainder the r13 50-cut didn't reach; the
# r13 sample covered 23 of the 49-entry r8 block, per the r13 ADVICE
# correction) and the 49 r9-vintage entries. The first 50 of this list
# = any r14-new entries at birth + all 26 r8 + the first (50 - new - 26)
# of the r9 block; the r9 remainder queues as the r15 head.
_DRIVER_PRIORITY = (
    # New in r14 — driver rows at birth. (Names added here as the
    # entries land; the import-time guard below keeps this honest.)
    "q_corpus_curation_drift", "q_stream_mix_weights_drift",
    # r8-vintage remainder (last driver row r8; the r13 sample stopped
    # 23 entries into the r8 block, leaving exactly these 26).
    "q_hits_bipartite", "q_incremental_recompute", "q_join_inner_fact",
    "q_jsonl_quarantine", "q_kendall_tau", "q_listagg_topn",
    "q_longest_streak", "q_mannwhitney_u", "q_partition_fingerprint",
    "q_projection_derived", "q_rfm_segmentation", "q_rolling_active_users",
    "q_scalar_string", "q_seasonal_baseline", "q_session_funnel",
    "q_skew_audit", "q_snapshot_diff", "q_source_overlap",
    "q_spearman_corr", "q_time_weighted_avg", "q_top_paths",
    "q_topk_global", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20",
    "q_watermark_late_audit",
    # r9-vintage block (last driver row r9); the first 22 land in the
    # r14 sample (2 r14-new + 26 r8 + 22 r9 = 50), the remainder queues
    # as the r15 head.
    "q_corpus_shuffle_shards", "q_pack_sequences", "q_text_clean_redact",
    "q_heavy_hitters", "q_zscore_grouped_pandas", "q_pandas_scalar_score",
    "q_text_repetition", "q_text_dup_lines", "q_cosine_pairs_exact",
    "q_lm_quality_score", "q_arrays_zip_explode", "q_sql_facade",
    "q_asof_join", "q_salted_join", "q_two_phase_agg", "q_range_join",
    "q_time_rollup", "q_percentiles", "q_stats_moments",
    "q_epoch_repeat_mix", "q_manifest_sink_read", "q_skyline_pareto",
    "q_anomaly_mad", "q_pmi_bigrams", "q_shingle_containment",
    "q_kcore_peel", "q_nearest_view", "q_cdc_chunking",
    "q_boolean_retrieval", "q_temperature_mix", "q_grid_knn",
    "q_stream_upsert_readback", "q_setjoin_auto_regime", "q_pq_adc_topk",
    "q_dsir_importance", "q_capped_balance", "q_inventory_clamped",
    "q_bpe_decode_roundtrip", "q_parameterized_sql",
    "q_pq_semantic_buckets", "q_tokenizer_fertility",
    "q_ann_filtered_topk", "q_maxsim_late_interaction", "q_hybrid_rrf",
    "q_semantic_dedup", "q_observe_quality_gate",
    "q_eval_decontamination", "q_semdedup_threshold", "q_semdedup_auto_k",
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
