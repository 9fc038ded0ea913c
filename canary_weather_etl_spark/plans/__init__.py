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

# --- Driver-sample ordering -------------------------------------------------
# The external driver snapshots the FIRST 50 registry entries per round
# (CORRECTNESS_r{N}.json), so enumeration order decides which queries get a
# hard external correctness row. Round-12 rotation, per the r11 verdict's
# #1 directive: positions 1-8 are the eight entries whose SQL oracles
# POSTDATE their last driver row (minhash/simhash/LSH/IVF oracles landed
# r8-r10 but their last driver rows are r5 rows-only; the minhash family's
# physical plan additionally changed in r11 — explode + codegen'd 32-way
# MIN aggregates — after its last sample). Their green hash rows this
# round close the last stale-evidence gap in the chain. Then the r12-new
# entries at birth, then the rest of the r5-sampled block and the
# r7-sampled remainder in evidence-age order — CORRECTNESS_r11 went 50/50
# green, so after r12 every remaining entry's latest driver row is
# r7-or-newer and the full-registry cycle planned in r9 completes in r13.
_DRIVER_PRIORITY = (
    # Positions 1-8 (r11 verdict #1): oracled-after-last-driver-row set.
    "q_dedup_minhash_lsh", "q_corpus_curation", "q_dedup_simhash",
    "q_sim_ann_lsh", "q_sim_ann_ivf", "q_stratified_sample",
    "q_bpe_merges", "q_pack_sequences_greedy",
    # New in r12 — driver rows at birth (r11 verdict #5/#6/#8).
    "q_stream_admission_fixed_batch", "q_sim_ann_ivfpq_sweep",
    "q_corpus_drift_tv_strata", "q_stream_drift_tv_strata",
    # The rest of the r5-sampled block (last driver row r5) in registry
    # order; q_sim_ann_recall{,_clustered} are rows-only by design.
    "q_scalar_date", "q_conditional_case", "q_json_extract",
    "q_count_distinct", "q_approx_count_distinct", "q_agg_collect",
    "q_agg_min_max_by", "q_median_exact", "q_hll_sketch_merge",
    "q_entity_blocking", "q_star_join_revenue", "q_bitmap_semi_join",
    "q_interval_join_batch", "q_text_stats", "q_text_lang_id",
    "q_text_fingerprint", "q_dedup_exact", "q_dedup_unique_count",
    "q_ngram_jaccard_pairs", "q_dedup_clusters", "q_dedup_incremental",
    "q_dedup_substring_spans", "q_sim_topk_bruteforce",
    "q_embedding_norms", "q_embedding_quantize", "q_multimodal_meta",
    "q_sim_ann_recall", "q_sim_ann_recall_clustered",
    "q_tfidf_top_terms", "q_text_chunking", "q_weighted_sample",
    "q_xml_roundtrip", "q_regression_stats", "q_lateral_topk",
    "q_recursive_cte_depth", "q_ewma_time_decay",
    "q_window_range_interval", "q_triangle_count", "q_pagerank_purchases",
    "q_percentile_within_group", "q_join_null_safe", "q_subquery_exists",
    "q_group_by_all",
    # r7-sampled remainder (last driver row r7) — the r13 rotation head.
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q13", "q_tpch_q15", "q_tpch_q17",
    "q_tpch_q18", "q_tpch_q4", "q_tpch_q9", "q_tpch_q19", "q_tpch_q21",
    "q_tpch_q22", "q_pii_redact", "q_url_canonicalize",
    "q_equidepth_histogram", "q_cohort_retention", "q_sql_scripting",
    "q_perceptron_batch", "q_boilerplate_strip", "q_tpch_q2",
    "q_tpch_q12",
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
