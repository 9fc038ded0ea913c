"""Round-9 registry queries.

New surface this round (r8 verdict item #5 plus widened LLM-pipeline
coverage): the end-to-end SEMANTIC dedup operator (k-means clusters →
keep each cluster's medoid), composed from the two primitives that
already exist (operators/clustering.kmeans_fixed + the medoid pick) and
oracled by reusing q_kmeans_lloyd's unrolled-iteration SQL prefix with a
survivor-join tail. Every query is SQL-oracled unless noted.

Reference provenance: the reference repo (ilias-lp/canary-weather-etl
README.md) ships no clustering or dedup; this extends the engine's
LLM-data-pipeline family (SURVEY.md §2.11) with public methods only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import clustering as C
from .r7_queries import _kmeans_oracle
from .registry import load, load_par, register

# ---------------------------------------------------------------------------
# Semantic dedup: k-means clusters → keep each cluster's medoid
# ---------------------------------------------------------------------------

_SEMDEDUP_FINAL = """
    , counts AS (
        SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_collapsed,
               CAST(SUM(dist) AS BIGINT) AS inertia_units
        FROM afin GROUP BY cid)
    SELECT m.cid AS cluster_id, d.doc_id, d.source,
           c.n_collapsed, c.inertia_units
    FROM med m
    JOIN counts c ON c.cid = m.cid
    JOIN documents d ON d.doc_id = m.medoid_vec_id
"""


@register(
    "q_semantic_dedup",
    oracle=_kmeans_oracle(k=8, iterations=2, final_select=_SEMDEDUP_FINAL),
    doc="End-to-end SEMANTIC dedup (r8 verdict #5): Lloyd k-means (k=8, "
        "2 iterations, integer fixed-point) over the embeddings table, "
        "keep each cluster's medoid as the sole survivor, and emit the "
        "surviving DOCUMENTS (cluster_id, doc_id, source) with how many "
        "members each survivor stands for — paraphrase groups collapse "
        "even when no n-gram overlap exists for MinHash/SimHash. Oracle "
        "is q_kmeans_lloyd's unrolled-iteration SQL prefix with a "
        "survivor-join tail — bit-exact, not approximate. Scale shape "
        "(operators/clustering.semantic_dedup): zero-shuffle broadcast-"
        "centroid assignment, k·dims update shuffle per round, one "
        "map-side-combined medoid aggregate, one broadcast join of k "
        "survivor ids back to documents — the corpus is never shuffled.",
    tags=("llm", "dedup", "clustering", "iterative"), bench=True,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_par(spark, sf_dir, "embeddings")
    # plain load: documents is only the PROBE side of the k-row broadcast
    # join — load_par's round-robin repartition would be a pure-overhead
    # Exchange in the plan (verified via explain)
    docs = load(spark, sf_dir, "documents")
    # one quantize projection feeds init + 2 iterations + final assignment
    # (4 consumers) — localCheckpoint, blocks release on GC
    qdf = C.quantize_vectors(emb).localCheckpoint(eager=True)
    keep = C.semantic_dedup(qdf, k=8, iterations=2)
    # k survivor rows — broadcast side of the documents join
    return (F.broadcast(keep)
            .join(docs, keep.vec_id == docs.doc_id)
            .select("cluster_id", "doc_id", "source",
                    "n_collapsed", "inertia_units"))
