"""Round-9 operator tests: semantic dedup (k-means medoid survivors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from canary_weather_etl_spark.operators import clustering as C
from canary_weather_etl_spark.plans.registry import load_par


def test_semantic_dedup_survivor_invariants(spark):
    """The survivor set is exactly one medoid per non-empty cluster:
    each survivor belongs to its cluster, holds the cluster's minimal
    distance (ties to the smaller vec_id), and the collapse counts
    partition the corpus."""
    sf = "/root/testdata/sf0.001"
    qdf = C.quantize_vectors(load_par(spark, sf, "embeddings")) \
        .localCheckpoint(eager=True)
    k, iters = 8, 2
    asg, _ = C.kmeans_fixed(qdf, k=k, iterations=iters)
    members = {}
    for r in asg.select("cluster_id", "vec_id", "dist_units").collect():
        members.setdefault(r["cluster_id"], []).append(
            (r["dist_units"], r["vec_id"]))

    surv = {r["cluster_id"]: r for r in
            C.semantic_dedup(qdf, k=k, iterations=iters).collect()}

    assert set(surv) == set(members)  # one survivor per non-empty cluster
    n_total = 0
    for cid, r in surv.items():
        dist, vid = min(members[cid])  # (dist, vec_id) lexicographic
        assert r["vec_id"] == vid      # the medoid, ties to smaller id
        assert r["n_collapsed"] == len(members[cid])
        assert r["inertia_units"] == sum(d for d, _ in members[cid])
        n_total += r["n_collapsed"]
    assert n_total == qdf.count()      # collapse counts partition corpus


def test_semantic_dedup_idempotent_on_survivors(spark):
    """Dedup of the survivor set keeps every survivor (k survivors,
    k clusters seeded from the k smallest ids present — each point is
    its own medoid when k == N)."""
    sf = "/root/testdata/sf0.001"
    qdf = C.quantize_vectors(load_par(spark, sf, "embeddings")) \
        .localCheckpoint(eager=True)
    surv = C.semantic_dedup(qdf, k=4, iterations=2)
    ids = sorted(r["vec_id"] for r in surv.collect())
    kept = (qdf.join(F.broadcast(surv.select("vec_id")), "vec_id")
            .select("vec_id", "qvec"))
    # re-id survivors 0..k-1 so kmeans_fixed's vec_id<k init applies
    remap = {v: i for i, v in enumerate(ids)}
    mapping = F.create_map(*[F.lit(x) for v, i in remap.items()
                             for x in (v, i)])
    kept = kept.select(mapping[F.col("vec_id")].alias("vec_id"), "qvec") \
        .localCheckpoint(eager=True)
    again = C.semantic_dedup(kept, k=4, iterations=2)
    assert again.count() == 4
    assert sorted(r["n_collapsed"] for r in again.collect()) == [1, 1, 1, 1]
