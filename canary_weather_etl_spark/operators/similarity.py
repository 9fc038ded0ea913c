"""Similarity search over embedding columns (SURVEY.md §2.11).

Two paths, per the PAPERS.md distributed-top-k literature:
- **brute force** (baseline, exact): broadcast the query set, score every
  candidate with built-in array ops (zip_with + aggregate — JVM-side, no
  Python), rank per query with a window. Exact, one shuffle (the window's
  partitionBy query). Right answer at any scale where k·|queries| is small
  and a full scan is affordable.
- **LSH-bucketed** (scale path, approximate): random-hyperplane signatures
  (SimHash for vectors) bucket both sides; only same-bucket pairs are
  scored. Probing multiple signature permutations recovers recall. This is
  the 100 TB shape: the candidate join replaces the full cross product.

All float math is done in double; cosine of the same input arrays is a
fixed left-to-right fold (F.aggregate), deterministic per engine.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.litexpr import (
    argmin_struct_sql,
    case_long_array_sql,
    double_array_sql,
    long_array_sql,
)


def as_double(col: F.Column | str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Σ aᵢbᵢ as a strict left-to-right double fold."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: F.Column) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def topk_brute_force(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id",
                     round_to: int | None = 6,
                     match_col: str | None = None) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    `queries` is small (it broadcasts); candidates stream through the scan
    once. Ranking uses the *rounded* score with the candidate id as
    tie-break so the cut is deterministic (duplicate embeddings would
    otherwise make rank order engine-dependent).
    Output: (query_id, rank, vec_id, cos_sim).

    ``match_col`` (r8): attribute-FILTERED search — only candidates whose
    ``match_col`` equals the query's value; the equality rides the
    broadcast hash join's condition, so non-matching vectors are
    discarded before any distance arithmetic (PRE-filter, the correct
    semantics — post-filtering a top-k under-returns when the predicate
    is selective). Both frames must carry the column.
    """
    # precompute each side's norm ONCE (n + q folds) instead of inside
    # cosine per pair (3·n·q folds) — at a billion candidates this is the
    # difference between one scan's work and three
    cand = embeddings.select(F.col(id_col).alias("vec_id"),
                             as_double(vec_col).alias("v"),
                             *([F.col(match_col).alias("__m_c")]
                               if match_col else [])) \
                     .withColumn("v_norm", l2_norm(F.col("v")))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       as_double(vec_col).alias("qv"),
                       *([F.col(match_col).alias("__m_q")]
                         if match_col else [])) \
               .withColumn("q_norm", l2_norm(F.col("qv")))
    cond = F.col("vec_id") != F.col("query_id")
    if match_col:
        cond = cond & (F.col("__m_c") == F.col("__m_q"))
    scored = (
        cand.join(F.broadcast(q), cond)
        .select("query_id", "vec_id",
                (dot(F.col("qv"), F.col("v"))
                 / (F.col("q_norm") * F.col("v_norm"))).alias("cos"))
    )
    if round_to is not None:
        from ..functions import round_det
        scored = scored.withColumn("cos", round_det("cos", round_to))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.col("cos").alias("cos_sim"))
    )


def _plane_sql(j: int, dim: int, seed: int) -> str:
    """SQL text of hyperplane r_j: ±1 per coordinate from the parity of
    xxhash64(i, j, seed)."""
    return (f"transform(sequence(0, {dim - 1}), "
            f"i -> CASE WHEN xxhash64(i, {j}, {seed}) % 2 = 0 "
            f"THEN 1.0D ELSE -1.0D END)")


def hyperplane_signature(vec: F.Column | str, dim: int, bits: int = 16,
                         seed: int = 42) -> F.Column:
    """Random-hyperplane LSH signature: bit j = sign(⟨v, r_j⟩) where r_j is a
    deterministic pseudo-random ±1 hyperplane derived from xxhash64(j, i,
    seed). Cosine-similar vectors agree on most bits. Built-in-only: the
    hyperplanes are generated *inside the expression*, no driver-side
    randomness, no UDF, fully distributed.

    ``vec`` is either the vector column's SQL TEXT (spliced verbatim —
    the fast construction path: the whole bits-term tree parses from ONE
    string, functions.litexpr discipline, r14; the per-bit Python-lambda
    build paid ~15 py4j round-trips per bit per probe) or a Column
    (ADVICE r14: external-caller convenience — same analyzed expression,
    composed per bit, so names needing backtick quoting work via
    F.col; construction cost is the old per-bit lambda price)."""
    if isinstance(vec, str):
        def bit_sql(j: int) -> str:
            proj = (f"aggregate(zip_with({vec}, {_plane_sql(j, dim, seed)}, "
                    f"(x, r) -> x * r), 0.0D, (acc, v) -> acc + v)")
            return f"CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END"

        return F.expr(" + ".join(bit_sql(j) for j in range(bits)))

    total: F.Column | None = None
    for j in range(bits):
        proj = F.aggregate(
            F.zip_with(vec, F.expr(_plane_sql(j, dim, seed)),
                       lambda x, r: x * r),
            F.lit(0.0), lambda acc, v: acc + v)
        term = F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        total = term if total is None else total + term
    return total


def topk_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", dim: int = 64,
             bits: int = 4, probes: int = 8,
             round_to: int | None = 6,
             planes: list[list[list[float]]] | None = None) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket with
    the query under any of `probes` independent signature functions; exact
    cosine + rank only on candidates. The join is equi (bucket = signature
    value per probe), so at scale it's a plain shuffled hash join instead of
    a cross product.

    Tuning: P(query and true neighbor share a bucket under one probe) =
    p^bits with p = 1 − θ/π; overall recall ≈ 1 − (1 − p^bits)^probes.
    More bits → smaller buckets (cheaper rescoring) but lower recall; more
    probes recover it. Defaults (4, 8) target unclustered corpora where top
    neighbors sit near cos≈0.4 (p≈0.63 → ~70% recall) — the worst case;
    real embedding corpora cluster much tighter, so production settings
    raise `bits` to shrink candidate sets.

    ``planes`` (a [probe][bit][dim] ±1 tensor from `planted_hyperplanes`)
    swaps the xxhash64-derived hyperplanes for literals — bucket
    assignment becomes engine-portable so the whole ANN query is
    SQL-oracle-able; recall behavior is identical in distribution (both
    plane families are iid random signs)."""
    cand = embeddings.select(F.col(id_col).alias("vec_id"),
                             as_double(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       as_double(vec_col).alias("qv"))
    if planes is not None:
        probes = len(planes)

    def sig(vcol: str, p: int) -> F.Column:
        if planes is not None:
            return hyperplane_signature_planted(vcol, planes[p])
        return hyperplane_signature(vcol, dim, bits, seed=1000 + p)

    def with_buckets(df: DataFrame, vcol: str, out: str) -> DataFrame:
        return df.select(
            "*",
            F.posexplode(F.array(*[sig(vcol, p) for p in range(probes)]))
            .alias(f"{out}_probe", out),
        )

    cb = with_buckets(cand, "v", "bucket")
    qb = with_buckets(q, "qv", "bucket")
    scored = (
        cb.join(qb, on=["bucket_probe", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v", "qv").distinct()
        .select("query_id", "vec_id",
                cosine(F.col("qv"), F.col("v")).alias("cos"))
    )
    if round_to is not None:
        from ..functions import round_det
        scored = scored.withColumn("cos", round_det("cos", round_to))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.col("cos").alias("cos_sim"))
    )


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int = 64, bits: int = 10,
                          probes: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold) via
    LSH bucketing + exact verification — semantic dedup for an LLM corpus."""
    base = embeddings.select(F.col(id_col).alias("id"),
                             as_double(vec_col).alias("v"))
    bucketed = base.select(
        "*",
        F.posexplode(F.array(*[
            hyperplane_signature("v", dim, bits, seed=2000 + p)
            for p in range(probes)
        ])).alias("probe", "bucket"),
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    pairs = (
        l.join(r, (F.col("l.probe") == F.col("r.probe"))
               & (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
        .distinct()
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    return pairs


def planted_hyperplanes(probes: int, bits: int, dim: int,
                        tag: str = "hyperplane") -> list[list[list[float]]]:
    """Deterministic ±1 hyperplane tensor [probe][bit][dim], derived from
    sha256 parity of the coordinates — NOT Spark's xxhash64, so an oracle
    engine can replay the exact same planes as literals. Pure Python,
    computed once at plan-build time (probes·bits·dim small constants)."""
    import hashlib

    def sign(p: int, j: int, i: int) -> float:
        h = hashlib.sha256(f"{tag}:{p}:{j}:{i}".encode()).digest()
        return 1.0 if h[0] % 2 == 0 else -1.0

    return [[[sign(p, j, i) for i in range(dim)]
             for j in range(bits)] for p in range(probes)]


def hyperplane_signature_planted(vec: F.Column | str,
                                 plane_rows: list[list[float]]) -> F.Column:
    """Like `hyperplane_signature`, but the hyperplanes are explicit ±1
    literal arrays (from `planted_hyperplanes`) instead of xxhash64-derived —
    the signature becomes engine-portable: any SQL engine given the same
    literals computes the same buckets, so LSH candidate generation itself
    can be differentially tested (r9 verdict #4). ``vec`` is the vector
    column's SQL text (fast path: the whole bits·dim literal tree parses
    from ONE string — functions.litexpr, r14; the element-wise build paid
    two py4j round-trips per plane coordinate, probes·bits·dim of them
    per query construction) or a Column (ADVICE r14, same expression
    composed per plane — the literal arrays still parse from one string
    each, so the dominant construction cost stays fixed)."""
    if isinstance(vec, str):
        terms = ["0"]
        for j, row in enumerate(plane_rows):
            proj = (f"aggregate(zip_with({vec}, {double_array_sql(row)}, "
                    f"(x, r) -> x * r), 0.0D, (acc, v) -> acc + v)")
            terms.append(f"CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END")
        return F.expr(" + ".join(terms))

    total: F.Column = F.lit(0)
    for j, row in enumerate(plane_rows):
        proj = F.aggregate(
            F.zip_with(vec, F.expr(double_array_sql(row)),
                       lambda x, r: x * r),
            F.lit(0.0), lambda acc, v: acc + v)
        total = total + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return total


def cosine_near_dup_pairs_planted(embeddings: DataFrame,
                                  threshold: float = 0.95,
                                  id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  planes: list[list[list[float]]] | None = None,
                                  dim: int = 64, bits: int = 10,
                                  probes: int = 4,
                                  round_to: int = 6) -> DataFrame:
    """`cosine_near_dup_pairs` with PLANTED literal hyperplanes and a
    deterministically rounded score — the fully-oracle-able variant: bucket
    assignment, candidate set, and verified cosines are all replayable in
    plain SQL from the same literals. Same 100 TB shape (banded equi
    self-join on (probe, bucket), exact rescoring on candidates only)."""
    if planes is None:
        planes = planted_hyperplanes(probes, bits, dim)
    from ..functions import round_det

    base = embeddings.select(F.col(id_col).alias("id"),
                             as_double(vec_col).alias("v"))
    bucketed = base.select(
        "*",
        F.posexplode(F.array(*[
            hyperplane_signature_planted("v", plane_rows)
            for plane_rows in planes
        ])).alias("probe", "bucket"),
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    return (
        l.join(r, (F.col("l.probe") == F.col("r.probe"))
               & (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
        .distinct()
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("raw"))
        .filter(F.col("raw") >= threshold)
        .select("a", "b", round_det("raw", round_to).alias("cos_sim"))
    )


def train_ivf_quantizer(embeddings: DataFrame, n_lists: int = 8,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 42) -> DataFrame:
    """Train the IVF coarse quantizer: KMeans over the corpus, returning the
    (list_id, centroid array<double>) table. This is a TRAINING JOB — run it
    once (or on a refresh schedule), persist the result as a table, and feed
    it to `topk_ivf` via `centroids`; don't re-train per query."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             as_double(vec_col).alias("v"))
    train = base.select("vec_id", array_to_vector("v").alias("features"))
    model = KMeans(k=n_lists, seed=seed, maxIter=10).fit(train)
    centers = [(i, list(map(float, c)))
               for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(centers, "list_id int, centroid array<double>")


def persist_ivf_quantizer(embeddings: DataFrame, path: str, n_lists: int = 8,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 42) -> DataFrame:
    """Train-once/reuse-forever wrapper: read the quantizer table at `path`
    if it exists, else train and write it. KMeans with a fixed seed over the
    same corpus is deterministic, so the persisted table is reproducible.
    Returns the centroid DataFrame (always read back from the table, so
    query plans reference the parquet scan, not a fit job)."""
    import os

    from pyspark.errors import AnalysisException

    spark = embeddings.sparkSession
    # trust the table only if the write committed (_SUCCESS): a crashed
    # prior write leaves a partial directory that parquet would happily
    # read as a short centroid table (ADVICE r2)
    committed = (not path.startswith("/")  # non-local FS: trust the catalog
                 or os.path.isfile(os.path.join(path, "_SUCCESS")))
    if committed:
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            pass  # path missing → train below; other errors surface
    cdf = train_ivf_quantizer(embeddings, n_lists, id_col, vec_col, seed)
    cdf.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def train_ivf_quantizer_fixed(embeddings: DataFrame, n_lists: int = 8,
                              iterations: int = 2,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Deterministic IVF coarse quantizer: the repo's integer fixed-point
    Lloyd (clustering.kmeans_fixed) instead of MLlib KMeans — bit-
    reproducible across engines, partitionings and retries, so an IVF
    query over it is FULLY SQL-oracle-able (the r8 PQ-ADC discipline).
    Same train-once/persist contract as `train_ivf_quantizer`; returns
    (list_id int, centroid array<bigint>) in 1e6 fixed-point units."""
    from .clustering import kmeans_fixed, quantize_vectors

    spark = embeddings.sparkSession
    qdf = quantize_vectors(embeddings, id_col, vec_col)
    _asg, cent = kmeans_fixed(qdf, k=n_lists, iterations=iterations)
    rows = [(int(cid), [int(v) for v in vec])
            for cid, vec in sorted(cent.items())]
    return spark.createDataFrame(rows,
                                 "list_id int, centroid array<bigint>")


def persist_ivf_quantizer_fixed(embeddings: DataFrame, path: str,
                                n_lists: int = 8, iterations: int = 2,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding") -> DataFrame:
    """`persist_ivf_quantizer`'s train-once/_SUCCESS-gated contract for
    the deterministic fixed-point quantizer."""
    import os

    from pyspark.errors import AnalysisException

    spark = embeddings.sparkSession
    committed = (not path.startswith("/")
                 or os.path.isfile(os.path.join(path, "_SUCCESS")))
    if committed:
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            pass  # path missing → train below; other errors surface
    cdf = train_ivf_quantizer_fixed(embeddings, n_lists, iterations,
                                    id_col, vec_col)
    cdf.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def topk_ivf_fixed(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id", n_lists: int = 8,
                   n_probe: int = 4, iterations: int = 2,
                   round_to: int = 6,
                   centroids: DataFrame | None = None) -> DataFrame:
    """`topk_ivf` over the DETERMINISTIC fixed-point quantizer: corpus
    assignment and query probing are integer L2 folds against the
    (persisted) centroid-units table — broadcast crossJoin of n_lists
    rows + one window per side, ties to (dist, list_id) exactly like
    kmeans_fixed's argmin — then exact cosine rescoring on candidates
    with the deterministic rounding. Every stage replays in SQL: the
    oracle reuses q_kmeans_lloyd's unrolled-iteration prefix and probes
    the SAME final centroids."""
    from pyspark.sql import Window

    from .clustering import quantize_vectors

    cdf = centroids if centroids is not None else train_ivf_quantizer_fixed(
        embeddings, n_lists, iterations, id_col, vec_col)
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             as_double(vec_col).alias("v"))
    qbase = queries.select(F.col(query_id_col).alias("query_id"),
                           as_double(vec_col).alias("qv"))
    cq = quantize_vectors(embeddings, id_col, vec_col)
    qq = (quantize_vectors(queries, query_id_col, vec_col)
          .withColumnRenamed("vec_id", "query_id"))

    def nearest(df: DataFrame, idc: str, n: int) -> DataFrame:
        scored = (df.crossJoin(F.broadcast(cdf))
                  .withColumn("d2", F.aggregate(
                      F.zip_with("qvec", "centroid",
                                 lambda a, b: (a - b) * (a - b)),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)))
        w = Window.partitionBy(idc).orderBy(F.asc("d2"), F.asc("list_id"))
        return (scored.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= n).select(idc, "list_id"))

    assigned = nearest(cq, "vec_id", 1)
    probes = nearest(qq, "query_id", n_probe)
    scored = (
        assigned.join(probes, "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(base, "vec_id").join(qbase, "query_id")
        .select("query_id", "vec_id",
                cosine(F.col("qv"), F.col("v")).alias("cos"))
    )
    if round_to is not None:
        from ..functions import round_det
        scored = scored.withColumn("cos", round_det("cos", round_to))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.col("cos").alias("cos_sim"))
    )


def topk_ivf(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", n_lists: int = 8,
             n_probe: int = 3, seed: int = 42,
             round_to: int | None = 6,
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF-style approximate top-k: a KMeans coarse quantizer partitions the
    corpus into `n_lists` inverted lists; each query is scored only against
    the `n_probe` lists whose centroids are nearest to it.

    The complementary scale path to `topk_lsh`: IVF adapts to the data
    distribution (centroids follow clusters, so recall on clustered
    embedding corpora is high with small n_probe), at the cost of a
    training pass. Candidate volume ≈ n_probe/n_lists of the corpus.
    Everything after training is DataFrame-only: assignment via
    crossJoin-free broadcast of centroids, candidate probing via equi-join
    on list id.

    Pass `centroids` (from `train_ivf_quantizer` / `persist_ivf_quantizer`)
    to probe a pre-trained quantizer — the production shape: the query plan
    then contains no KMeans fit job, just a broadcast of the tiny centroid
    table. Without it, training runs inline (convenience for ad-hoc use).
    """
    spark = embeddings.sparkSession
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             as_double(vec_col).alias("v"))
    cdf = centroids if centroids is not None else train_ivf_quantizer(
        embeddings, n_lists, id_col, vec_col, seed)

    def nearest_lists(df: DataFrame, idc: str, vcol: str, n: int) -> DataFrame:
        """Attach the n nearest list ids (by L2 to centroid) to each row."""
        from pyspark.sql import Window
        scored = (df.crossJoin(F.broadcast(cdf))
                  .withColumn("d2", F.aggregate(
                      F.zip_with(F.col(vcol), F.col("centroid"),
                                 lambda a, b: (a - b) * (a - b)),
                      F.lit(0.0), lambda acc, x: acc + x)))
        w = Window.partitionBy(idc).orderBy(F.asc("d2"), F.asc("list_id"))
        return (scored.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= n).drop("d2", "rk", "centroid"))

    # corpus side: each vector lives in exactly its nearest list
    assigned = nearest_lists(base, "vec_id", "v", 1)
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       as_double(vec_col).alias("qv"))
    probes_df = nearest_lists(q, "query_id", "qv", n_probe)

    scored = (
        assigned.join(probes_df, on="list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                cosine(F.col("qv"), F.col("v")).alias("cos"))
        .distinct()
    )
    if round_to is not None:
        from ..functions import round_det
        scored = scored.withColumn("cos", round_det("cos", round_to))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.col("cos").alias("cos_sim"))
    )


# ------------------------- int8 quantization --------------------------------

def quantize_scale(vec: F.Column) -> F.Column:
    """Per-vector symmetric int8 scale: 127 / max|xᵢ| (1.0 for the
    all-zero vector). Row-wise IEEE arithmetic — bitwise deterministic."""
    amax = F.array_max(F.transform(vec, F.abs))
    return F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))


def quantize_int8(vec: F.Column, scale: F.Column) -> F.Column:
    """x → round-half-up(x·scale) as int, clamped by construction to
    [-127, 127] (symmetric quantization never saturates past 127 because
    scale is derived from max|x|). The rounding is written as
    floor(x·scale + 0.5) — a fixed IEEE expression with no engine
    tie-rule — so the SQL twin is literal-for-literal identical.

    Why this matters at 100 TB: an int8 vector is 4× smaller than
    float32 (16× smaller than the double it is scored in), which is the
    difference between an ANN corpus fitting executor memory or
    spilling. Scoring error is bounded by |x − q/scale| ≤ 1/(2·scale)
    per element; q_embedding_quantize pins the realized error as query
    output."""
    return F.transform(vec, lambda x: F.floor(x * scale + F.lit(0.5))
                       .cast("int"))


def dequantize(qvec: F.Column, scale: F.Column) -> F.Column:
    return F.transform(qvec, lambda q: q.cast("double") / scale)


# --------------------- random projection (JL transform) ----------------------

def jl_matrix(in_dim: int, out_dim: int, salt: str = "jl42"):
    """Deterministic Johnson–Lindenstrauss projection matrix as a plain
    Python list-of-lists: entry (i, j) = md5(f"{i}:{j}:{salt}") mapped to
    uniform(−0.5, 0.5). md5 is engine-portable, so a SQL twin can rebuild
    the IDENTICAL matrix from generate_series — no literal matrix shipped,
    no RNG state, reproducible across runs/engines (same growth-stable
    property as the md5 train/val split). Uniform ±0.5 entries are
    sub-gaussian, which is all JL needs."""
    import hashlib

    return [[int(hashlib.md5(f"{i}:{j}:{salt}".encode()).hexdigest()[:8],
                 16) / 2 ** 32 - 0.5
             for j in range(out_dim)]
            for i in range(in_dim)]


def random_projection(df: DataFrame, vec_col: str, in_dim: int,
                      out_dim: int, salt: str = "jl42",
                      out_col: str = "proj") -> DataFrame:
    """Project `vec_col` (array<numeric>, length in_dim) to out_dim
    dimensions with the deterministic JL matrix — the dimensionality
    reduction in front of ANN / clustering when 100 TB of float32×768
    won't fit the candidate stage.

    Arrow-vectorized pandas_udf doing one numpy matmul per batch: this is
    the documented exception to 'built-ins first' — a dense mat-mat
    product is exactly where BLAS beats 64 codegen'd aggregate folds per
    row. The matrix broadcasts implicitly via the UDF closure (a few KB);
    zero shuffle, row-wise, scales with scan width."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    m = np.asarray(jl_matrix(in_dim, out_dim, salt))

    @pandas_udf(ArrayType(DoubleType()))
    def _proj(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy())          # batch × in_dim
        p = x.astype(np.float64) @ m         # batch × out_dim
        return pd.Series(list(p))

    return df.withColumn(out_col, _proj(as_double(vec_col)))


def topk_projected(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                   in_dim: int = 64, out_dim: int = 16, pool: int = 30,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id") -> DataFrame:
    """Project-then-rerank ANN: score in JL-projected out_dim space to pick
    a `pool`-sized candidate set per query, then re-rank ONLY those
    candidates with exact full-width cosine and keep top-k.

    The point at 100 TB: the candidate pass touches out_dim/in_dim of the
    bytes (4x less here, ~50x for 768->16 production widths), and the
    exact pass costs pool·q dot products instead of n·q. Composes with the
    int8-quantized corpus (quantize_int8) for a further 4x — that
    composition is `topk_projected_int8` below, with its own measured
    recall row. Recall is pinned as data by q_sim_ann_recall's 'jl' and
    'jl_int8' rows (unclustered worst case) and by
    q_sim_ann_recall_clustered (the clustered regime the operator is
    recommended for).

    Output: (query_id, rank, vec_id, cos_sim) — same shape as the exact
    and LSH/IVF variants, exact scores on the survivors."""
    proj_c = random_projection(
        embeddings.select(id_col, vec_col), vec_col, in_dim, out_dim,
        out_col="__p")
    proj_q = random_projection(
        queries.select(query_id_col, vec_col), vec_col, in_dim, out_dim,
        out_col="__p")
    cand_ids = topk_brute_force(
        proj_c.select(id_col, F.col("__p").alias(vec_col)),
        proj_q.select(query_id_col, F.col("__p").alias(vec_col)),
        k=pool, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col).select("query_id", "vec_id")
    # exact re-rank on the pooled candidates only
    cand = (cand_ids.join(
        embeddings.select(F.col(id_col).alias("vec_id"),
                          as_double(vec_col).alias("v")), "vec_id")
        .withColumn("v_norm", l2_norm(F.col("v"))))
    q = (queries.select(F.col(query_id_col).alias("query_id"),
                        as_double(vec_col).alias("qv"))
         .withColumn("q_norm", l2_norm(F.col("qv"))))
    scored = (cand.join(F.broadcast(q), "query_id")
              .select("query_id", "vec_id",
                      (dot(F.col("qv"), F.col("v"))
                       / (F.col("q_norm") * F.col("v_norm"))).alias("cos")))
    from ..functions import round_det
    scored = scored.withColumn("cos", round_det("cos", 6))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id",
                    F.col("cos").alias("cos_sim")))


def topk_projected_int8(embeddings: DataFrame, queries: DataFrame,
                        k: int = 10, in_dim: int = 64, out_dim: int = 16,
                        pool: int = 30, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        query_id_col: str = "query_id") -> DataFrame:
    """The composed scale path the docstring above advertises, measured
    end-to-end: the CORPUS resides int8-quantized (4x smaller than
    float32, 16x than the scoring doubles — the residency win that keeps
    a 100 TB corpus on-executor), and BOTH stages of project-then-rerank
    run on the dequantized int8 vectors: JL candidate pass in out_dim
    space, exact full-width cosine re-rank on the pool survivors. Queries
    stay full-precision (there are few of them). Against the float
    brute-force ground truth this stacks both error sources —
    quantization noise and projection distortion — which is exactly why
    its recall is pinned separately (q_sim_ann_recall row 'jl_int8',
    q_sim_ann_recall_clustered row 'jl_int8').

    Output: (query_id, rank, vec_id, cos_sim) — same shape as every other
    top-k variant; cos_sim is computed on dequantized vectors."""
    v = as_double(vec_col)
    enc = (embeddings
           .withColumn("__scale", quantize_scale(v))
           .select(id_col, "__scale",
                   quantize_int8(v, F.col("__scale")).alias("__q8")))
    deq = enc.select(
        id_col,
        dequantize(F.col("__q8"), F.col("__scale")).alias(vec_col))
    return topk_projected(deq, queries, k=k, in_dim=in_dim,
                          out_dim=out_dim, pool=pool, id_col=id_col,
                          vec_col=vec_col, query_id_col=query_id_col)


def arrow_quantized_norms(df: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          scale: int = 1_000_000) -> DataFrame:
    """Per-vector integer sum-of-squares + floor(L2 norm) via
    ``mapInArrow`` — the zero-copy Arrow-native batch path (no pandas
    materialization at all, unlike mapInPandas: record batches go
    Tungsten → Arrow → numpy views and back).

    Fixed-point discipline (same contract as operators/clustering.py):
    coordinates quantize to ``scale`` units with FLOOR(x*scale + 0.5),
    the squared sum is exact int64, and norm_units = FLOOR(sqrt(ssq)) is
    one deterministic double op on an exact integer < 2^53 — so the
    output is bit-identical to a SQL oracle and invariant to batching.

    Scale shape: embarrassingly parallel, one narrow stage, no shuffle;
    vectorized numpy segment sums (reduceat-style via cumsum over the
    Arrow list offsets) — no per-row Python.
    """
    import numpy as np
    import pyarrow as pa

    id_field = df.schema[id_col].dataType.simpleString()
    assert id_field == "bigint", f"expected bigint id, got {id_field}"

    def batches(it):
        for batch in it:
            ids = batch.column(0)
            la = batch.column(1)
            if isinstance(la, pa.ChunkedArray):  # defensive; batches give Arrays
                la = la.combine_chunks()
            off = np.asarray(la.offsets)
            vals = np.asarray(la.values, dtype=np.float64)
            q = np.floor(vals * float(scale) + 0.5).astype(np.int64)
            csum = np.concatenate(([np.int64(0)], np.cumsum(q * q)))
            ssq = csum[off[1:]] - csum[off[:-1]]
            norm = np.floor(np.sqrt(ssq.astype(np.float64))).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(ssq, type=pa.int64()),
                 pa.array(norm, type=pa.int64())],
                names=["vec_id", "ssq_units", "norm_units"])

    return df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        batches, schema="vec_id bigint, ssq_units bigint, norm_units bigint")


# --- product quantization (PQ) ANN -------------------------------------------

def persist_pq_codebooks(qdf: DataFrame, path: str, m: int, k: int,
                         iterations: int = 2
                         ) -> dict[int, dict[int, list[int]]]:
    """`persist_ivf_quantizer_fixed`'s train-once contract applied to the
    PQ model: the codebooks are m·k·(dims/m) driver ints — a JSON file,
    not a table — written via tmp-then-rename (the _SUCCESS analogue, so
    a crashed writer never leaves a half file a reader would trust).
    Training is deterministic (fixed init, fixed fold order), so any
    concurrent same-corpus writer produces the identical file."""
    import json
    import os

    if os.path.isfile(path):
        with open(path) as f:
            raw = json.load(f)
        books = {int(s): {int(c): [int(x) for x in v]
                          for c, v in d.items()}
                 for s, d in raw.items()}
        # Cache validation (r14, ADVICE): a caller reusing a path across
        # parameter changes must not silently get a mismatched codebook.
        # Shape fully determines (m, k): m subspaces × k codewords.
        if len(books) != m or any(len(d) != k for d in books.values()):
            got = (len(books),
                   sorted({len(d) for d in books.values()}))
            raise ValueError(
                f"cached PQ codebook at {path} has shape "
                f"(m={got[0]}, k per subspace={got[1]}) but "
                f"(m={m}, k={k}) was requested — delete the stale file "
                f"or use a parameter-keyed path")
        return books
    books = pq_train_codebooks(qdf, m=m, k=k, iterations=iterations)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(books, f)
    os.replace(tmp, path)
    return books


def pq_train_codebooks(qdf: DataFrame, m: int = 2, k: int = 4,
                       iterations: int = 2) -> dict[int, dict[int, list[int]]]:
    """Train PQ codebooks: split each fixed-point vector (`qvec`, from
    clustering.quantize_vectors) into ``m`` contiguous subspaces and run
    broadcast-centroid Lloyd k-means per subspace with EXACTLY
    clustering.kmeans_fixed's math (same init = first k vec_ids, same
    zero-shuffle assignment fold with ties to the smaller code, same
    FLOOR(double-div) update, empty clusters keep their centroid).
    Returns {subspace: {code: centroid_subvector}} — m·k·(dims/m) driver
    ints, the model a 100 TB deployment persists once and broadcasts.

    FUSED across subspaces (r8): the m per-subspace trainings run as ONE
    Lloyd loop over an exploded (vec_id, s, sub) frame whose assignment
    expression switches centroid literals on the subspace column — so
    each round is ONE corpus pass and ONE (m·k·sublen)-key aggregate
    instead of m of each. Per-subspace training made m passes over the
    corpus per round (and m driver jobs); at production m (8-16
    subspaces) that's an 8-16x reduction in training scans. Output is
    bit-identical to the per-subspace loop (same folds, same update
    arithmetic, subspaces never interact), which the unrolled
    q_pq_adc_topk oracle and the planted-cluster pytest pin.

    Public method: Jégou et al., 'Product Quantization for Nearest
    Neighbor Search' (TPAMI 2011)."""
    head = qdf.select("qvec").head()
    if head is None:  # explicit, not an opaque NoneType TypeError
        raise ValueError("pq_train_codebooks: input frame is empty — "
                         "cannot derive dims or seed codebooks")
    dims = len(head["qvec"])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sublen = dims // m
    sub = qdf.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(s).cast("int").alias("s"),
                     F.slice("qvec", s * sublen + 1, sublen).alias("sub"))
            for s in range(m)])).alias("e")
    ).select("vec_id", F.col("e.s").alias("s"), F.col("e.sub").alias("sub"))

    # one init collect for ALL subspaces: first k points by id, sliced
    init_rows = sub.filter(F.col("vec_id") < k).collect()
    books: dict[int, dict[int, list[int]]] = {s: {} for s in range(m)}
    for r in init_rows:
        books[int(r["s"])][int(r["vec_id"])] = [int(v) for v in r["sub"]]
    for s in range(m):
        if len(books[s]) != k:
            raise ValueError(f"init expects vec_id 0..{k - 1} present, "
                             f"got {sorted(books[s])} in subspace {s}")

    for _ in range(iterations):
        cid = _sub_argmin_switched("sub", "s", books)
        # the assignment fold lives in its OWN Project: co-locating it
        # with the posexplode generator trips Catalyst's generator
        # rewrite, which strips the alias-derived struct field names
        # inside the fold (FIELD_NOT_FOUND col1/col2); two stacked
        # Projects collapse to one in the optimizer anyway
        asg = sub.select("s", cid.alias("cluster_id"), "sub")
        # ONE shuffle of m*k*sublen keys, partial-aggregated map-side;
        # ONE bounded collect per round (vs one per subspace per round)
        sums = (asg.select("s", "cluster_id",
                           F.posexplode("sub").alias("ord", "qv"))
                .groupBy("s", "cluster_id", "ord")
                .agg(F.sum("qv").alias("sv"),
                     F.count(F.lit(1)).alias("n"))
                # FLOOR(double-div of exact ints) — clustering.py's rule
                .withColumn("cv", F.floor(F.col("sv").cast("double")
                                          / F.col("n")).cast("long"))
                .select("s", "cluster_id", "ord", "cv")
                .collect())
        new_books = {s: {c: list(v) for c, v in books[s].items()}
                     for s in range(m)}
        got: dict[tuple[int, int], dict[int, int]] = {}
        for r in sums:
            got.setdefault((int(r["s"]), int(r["cluster_id"])), {})[
                int(r["ord"])] = int(r["cv"])
        for (s, cid_), by_ord in got.items():
            new_books[s][cid_] = [by_ord[i] for i in range(sublen)]
        books = new_books
    return books


def _sub_argmin_switched(vec_sql: str, key_sql: str,
                         books: dict[int, dict[int, list[int]]]) -> F.Column:
    """_sub_argmin with the centroid set selected by the subspace column:
    a when-chain over literal per-subspace folds — still pure codegen,
    each row evaluates only its branch. Takes SQL text for the subvector
    and subspace-key columns: the whole chain parses from ONE string
    (functions.litexpr, r14 — the element-wise py4j build dominated
    driver wall at m·k·sublen literals per training round)."""
    whens = " ".join(
        f"WHEN {key_sql} = {int(s)} THEN {_sub_argmin_sql(vec_sql, books[s])}"
        for s in sorted(books))
    return F.expr(f"CASE {whens} END")


def _sub_argmin_sql(vec_sql: str, cents: dict[int, list[int]]) -> str:
    """SQL text of the nearest-centroid code for one subvector against
    literal centroids: integer squared L2, ties to the smaller code.
    Pure codegen fold, identical analyzed expression to the former
    element-wise F.lit build (tests/test_litexpr.py)."""
    return f"({argmin_struct_sql(vec_sql, cents)}).cid"


def _sub_argmin(vec_sql: str, cents: dict[int, list[int]]) -> F.Column:
    """Column form of `_sub_argmin_sql` — one JVM parse."""
    return F.expr(_sub_argmin_sql(vec_sql, cents))


def pq_encode(qdf: DataFrame,
              books: dict[int, dict[int, list[int]]]) -> DataFrame:
    """(vec_id, code_0..code_{m-1}): each vector compressed to m small
    codes — one narrow projection, no shuffle, 64 dims → m bytes of
    residency per vector (the PQ memory win)."""
    m = len(books)
    dims = m * len(next(iter(books[0].values())))
    sublen = dims // m
    cols = [
        _sub_argmin(f"slice(qvec, {s * sublen + 1}, {sublen})", books[s])
        .alias(f"code_{s}")
        for s in range(m)
    ]
    return qdf.select("vec_id", *cols)


def pq_adc_topk(codes: DataFrame, query_qvec: list[int],
                books: dict[int, dict[int, list[int]]],
                k_top: int = 10) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays un-quantized; its
    distance to every codebook centroid is a driver-side m×k integer
    table, and each corpus vector's approximate distance is the sum of m
    literal-array lookups indexed by its codes — O(m) integer ops per
    row, no joins, then TakeOrderedAndProject for the top-k. Returns
    (rank, vec_id, adc_units), ties broken by vec_id."""
    m = len(books)
    sublen = len(query_qvec) // m
    terms = ["0L"]
    for s in range(m):
        qs = query_qvec[s * sublen:(s + 1) * sublen]
        dt = []
        for cid, c in sorted(books[s].items()):
            dt.append(sum((a - b) * (a - b) for a, b in zip(qs, c)))
        terms.append(f"element_at({long_array_sql(dt)}, code_{s} + 1)")
    adc = F.expr(" + ".join(terms))
    from pyspark.sql import Window
    scored = codes.select("vec_id", adc.alias("adc_units"))
    # sort+limit → TakeOrderedAndProject (per-partition heaps + k-row
    # driver merge, never a global sort); the row_number window then runs
    # over k rows only — NOT the single-task full-table window
    top = scored.orderBy("adc_units", "vec_id").limit(k_top)
    # rank AFTER the cut: the window frame is k rows by construction (the
    # WindowExec single-partition warning it emits is about exactly this —
    # and exactly this is safe at any corpus size)
    w = Window.orderBy("adc_units", "vec_id")
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "vec_id", "adc_units"))


def _residuals_from_quantized(qdf, cents: dict[int, list[int]]):
    """(vec_id, list_id, qvec=residual) from a pre-quantized frame:
    integer argmin against literal centroids, then zip_with subtraction
    against a when-chain of literal arrays — one codegen projection, no
    join, no shuffle. The shared body of the IVFADC family (residual PQ
    training, encode, frozen-model ingest)."""
    from .clustering import assign_clusters

    asg = assign_clusters(qdf, cents)
    case = case_long_array_sql("cluster_id", cents)
    return asg.select(
        "vec_id", F.col("cluster_id").alias("list_id"),
        F.expr(f"zip_with(qvec, {case}, (x, y) -> x - y)").alias("qvec"))


def _probe_lists(q0: list[int], cents: dict[int, list[int]],
                 n_probe: int) -> list[int]:
    """The query's ``n_probe`` nearest inverted lists by exact integer
    distance to the literal centroids — driver arithmetic over the
    bounded model (n_lists × dims ints), ties to the smaller list id."""
    return [cid for _, cid in sorted(
        (sum((a - b) * (a - b) for a, b in zip(q0, c)), cid)
        for cid, c in cents.items())[:n_probe]]


def _adc_expr(q0: list[int], cents: dict[int, list[int]],
              books: dict[int, dict[int, list[int]]],
              probed: list[int]) -> F.Column:
    """The asymmetric-distance column for one query over a
    (list_id, code_0..m-1) row: a when-chain on list_id selecting the
    per-(list, subspace) driver-literal distance table — the query
    residual differs per probed list, so each branch carries its own
    m × pq_k integer table. Shared by topk_ivfpq_fixed / topk_ivfpq_multi
    / ivfpq_adc_over_codes / ivfpq_sweep (one construction, four users)."""
    m = len(books)
    dims = len(next(iter(cents.values())))
    sublen = dims // m
    whens = []
    for lid in probed:
        r0 = [a - b for a, b in zip(q0, cents[lid])]
        terms = []
        for s in range(m):
            rs = r0[s * sublen:(s + 1) * sublen]
            tab = [sum((a - b) * (a - b) for a, b in zip(rs, c))
                   for _, c in sorted(books[s].items())]
            terms.append(
                f"element_at({long_array_sql(tab)}, code_{s} + 1)")
        whens.append(f"WHEN list_id = {int(lid)} "
                     f"THEN {' + '.join(terms)}")
    return F.expr("CASE " + " ".join(whens) + " END")


def topk_ivfpq_fixed(embeddings: DataFrame, query_vec_id: int = 0,
                     k_top: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding", n_lists: int = 8,
                     ivf_iterations: int = 2, n_probe: int = 2,
                     m: int = 2, pq_k: int = 4, pq_iterations: int = 2,
                     centroids: DataFrame | None = None) -> DataFrame:
    """Composed IVF + PQ-on-residuals ADC top-k — the IVFADC index of
    Jégou et al., 'Product Quantization for Nearest Neighbor Search'
    (TPAMI 2011, public method), which is THE canonical billion-vector
    layout (FAISS's IndexIVFPQ): the coarse quantizer routes each vector
    to one of ``n_lists`` inverted lists, PQ codebooks are trained on
    the RESIDUALS (vector minus its list centroid — residuals have far
    less variance than raw vectors, so the same code budget quantizes
    them much more tightly), and a query probes only its ``n_probe``
    nearest lists, scoring candidates by asymmetric distance against a
    PER-LIST driver-literal table (the query residual differs per list).

    Every stage is the repo's deterministic fixed-point discipline, so
    the WHOLE composition is SQL-oracle-able end to end:

    - coarse quantizer: ``train_ivf_quantizer_fixed`` (integer Lloyd,
      init = first ``n_lists`` ids, ties to the smaller list, FLOOR
      centroid update) — train-once/persist, never a fit job per query;
    - assignment + residuals: one narrow codegen projection (integer
      argmin against literal centroids, ``zip_with`` subtraction) — no
      shuffle, no UDF;
    - PQ codebooks: ``pq_train_codebooks`` over the residual frame (the
      fused one-pass-per-round trainer);
    - query: probe lists, query residuals and the n_probe × m × pq_k
      ADC tables are all driver-side integer literals (bounded:
      n_lists·dims + m·pq_k·n_probe ints), and each candidate row pays
      m literal-array lookups selected by a when-chain on its list —
      then TakeOrderedAndProject for the top-k.

    At 100 TB: the code table is (8·m) bytes/vector, lists are the
    partition key (a probe scans n_probe/n_lists of the codes), and
    training runs once on a sample. Returns (rank, vec_id, adc_units),
    ties broken by vec_id; the query vector itself is excluded.
    """
    from pyspark.sql import Window

    from .clustering import quantize_vectors

    # one materialization feeds assignment, PQ training, encode and the
    # query row (GC-released blocks)
    qdf = (quantize_vectors(embeddings, id_col, vec_col)
           .localCheckpoint(eager=True))
    cdf = centroids if centroids is not None else train_ivf_quantizer_fixed(
        embeddings, n_lists, ivf_iterations, id_col, vec_col)
    # bounded driver collect: n_lists × dims ints (the persisted model)
    cents = {int(r["list_id"]): [int(v) for v in r["centroid"]]
             for r in cdf.collect()}
    dims = len(next(iter(cents.values())))
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sublen = dims // m

    # residuals: integer subtraction against the assigned list's literal
    # centroid (when-chain over n_lists arrays — pure codegen, no join)
    rdf = _residuals_from_quantized(qdf, cents).localCheckpoint(eager=True)

    books = pq_train_codebooks(rdf.select("vec_id", "qvec"), m=m, k=pq_k,
                               iterations=pq_iterations)
    codes = rdf.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", "list_id",
        *[_sub_argmin(f"slice(qvec, {s * sublen + 1}, {sublen})", books[s])
          .alias(f"code_{s}") for s in range(m)])

    # query side: probe lists + per-(list, subspace) distance tables —
    # all bounded driver integers, zero extra jobs beyond one row fetch
    q0_rows = qdf.filter(F.col("vec_id") == query_vec_id).collect()
    if not q0_rows:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q0 = [int(v) for v in q0_rows[0]["qvec"]]
    probed = _probe_lists(q0, cents, n_probe)
    adc = _adc_expr(q0, cents, books, probed)

    scored = (codes.filter(F.col("list_id").isin(*[int(x) for x in probed]))
              .select("vec_id", adc.cast("long").alias("adc_units")))
    # sort+limit → TakeOrderedAndProject; rank AFTER the cut (k-row frame)
    top = scored.orderBy("adc_units", "vec_id").limit(k_top)
    w = Window.orderBy("adc_units", "vec_id")
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "vec_id", "adc_units"))


def topk_ivfpq_multi(embeddings: DataFrame, query_ids: list[int],
                     k_top: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding", n_lists: int = 8,
                     ivf_iterations: int = 2, n_probe: int = 2,
                     m: int = 2, pq_k: int = 4, pq_iterations: int = 2,
                     centroids: DataFrame | None = None) -> DataFrame:
    """`topk_ivfpq_fixed` for a query SET sharing one model build: the
    quantizer, residual codebooks and code table are built ONCE; each
    query contributes its own probed lists and per-(list, subspace)
    driver-literal ADC tables, and the per-query top-k cuts union into
    (query_id, rank, vec_id, adc_units). |query_ids| × n_probe × m × pq_k
    driver ints — still bounded; the code table is scanned once per
    query branch (at 100 TB the branches share the probe-pruned scan
    via the list partition key)."""
    from pyspark.sql import Window

    from .clustering import quantize_vectors

    qdf = (quantize_vectors(embeddings, id_col, vec_col)
           .localCheckpoint(eager=True))
    cdf = centroids if centroids is not None else train_ivf_quantizer_fixed(
        embeddings, n_lists, ivf_iterations, id_col, vec_col)
    cents = {int(r["list_id"]): [int(v) for v in r["centroid"]]
             for r in cdf.collect()}
    dims = len(next(iter(cents.values())))
    # mirror topk_ivfpq_fixed's validation (the single-query twin): fail
    # loudly here, not later inside pq_train_codebooks / a KeyError
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sublen = dims // m

    rdf = _residuals_from_quantized(qdf, cents).localCheckpoint(eager=True)
    books = pq_train_codebooks(rdf.select("vec_id", "qvec"), m=m, k=pq_k,
                               iterations=pq_iterations)
    codes = rdf.select(
        "vec_id", "list_id",
        *[_sub_argmin(f"slice(qvec, {s * sublen + 1}, {sublen})", books[s])
          .alias(f"code_{s}") for s in range(m)])

    qrows = {int(r["vec_id"]): [int(v) for v in r["qvec"]]
             for r in qdf.filter(
                 F.col("vec_id").isin(*[int(q) for q in query_ids]))
             .collect()}
    missing = [int(q) for q in query_ids if int(q) not in qrows]
    if missing:
        raise ValueError(f"query vec_id(s) {missing} not found")
    branches = []
    for qid in query_ids:
        q0 = qrows[int(qid)]
        probed = _probe_lists(q0, cents, n_probe)
        adc = _adc_expr(q0, cents, books, probed)
        scored = (codes
                  .filter(F.col("list_id").isin(*[int(x) for x in probed])
                          & (F.col("vec_id") != int(qid)))
                  .select(F.lit(int(qid)).alias("query_id"), "vec_id",
                          adc.cast("long").alias("adc_units")))
        branches.append(scored.orderBy("adc_units", "vec_id").limit(k_top))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    w = Window.partitionBy("query_id").orderBy("adc_units", "vec_id")
    return (out.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "vec_id", "adc_units"))


def ivfpq_encode_frozen(vectors: DataFrame,
                        cents: dict[int, list[int]],
                        books: dict[int, dict[int, list[int]]],
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(vec_id, list_id, code_0..m-1) for NEW vectors against a FROZEN
    IVFADC model (centroid dict + PQ codebooks as driver literals) — the
    incremental-index primitive: a micro-batch of arrivals encodes with
    literal arithmetic only (quantize → integer argmin assign → integer
    residual → per-subspace code), ONE narrow codegen projection per
    batch — no shuffle, no training job, no reference to the existing
    index. This is how a 100 TB vector index stays fresh: the model
    trains once on a seed sample, every later ingest appends codes."""
    from .clustering import quantize_vectors

    m = len(books)
    dims = len(next(iter(cents.values())))
    sublen = dims // m
    qdf = quantize_vectors(vectors, id_col, vec_col)
    # spread a narrow-split batch before the CPU-bound argmin/code folds
    # (a big drop file arrives as a handful of splits; the folds are
    # n_lists·dims + m·pq_k·sublen integer ops per row)
    par = qdf.rdd.getNumPartitions()
    want = qdf.sparkSession.sparkContext.defaultParallelism
    if par < want:
        qdf = qdf.repartition(want)
    r = _residuals_from_quantized(qdf, cents)
    return r.select(
        "vec_id", "list_id",
        *[_sub_argmin(f"slice(qvec, {s * sublen + 1}, {sublen})", books[s])
          .alias(f"code_{s}") for s in range(m)])


def ivfpq_adc_over_codes(codes: DataFrame, q0: list[int],
                         cents: dict[int, list[int]],
                         books: dict[int, dict[int, list[int]]],
                         k_top: int = 10, n_probe: int = 2,
                         exclude_vec_id: int | None = None) -> DataFrame:
    """ADC top-k over an EXISTING (vec_id, list_id, code_*) table — the
    query half of the frozen-model index: probe lists and per-(list,
    subspace) distance tables are driver ints derived from the literal
    model, the scan is pruned to the probed lists, the cut is
    TakeOrderedAndProject. Returns (rank, vec_id, adc_units)."""
    from pyspark.sql import Window

    probed = _probe_lists(q0, cents, n_probe)
    adc = _adc_expr(q0, cents, books, probed)
    scored = codes.filter(F.col("list_id").isin(*[int(x) for x in probed]))
    if exclude_vec_id is not None:
        scored = scored.filter(F.col("vec_id") != int(exclude_vec_id))
    scored = scored.select("vec_id", adc.cast("long").alias("adc_units"))
    top = scored.orderBy("adc_units", "vec_id").limit(k_top)
    w = Window.orderBy("adc_units", "vec_id")
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "vec_id", "adc_units"))


def ivfpq_sweep(embeddings: DataFrame, query_ids: list[int],
                grid: list[tuple[int, int, int]], k_top: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                n_lists: int = 8, ivf_iterations: int = 2,
                pq_iterations: int = 2,
                centroids: DataFrame | None = None,
                codebooks_dir: str | None = None) -> list[dict]:
    """IVFADC PARAMETER SWEEP — the recall/cost trade measured from one
    shared build: ``grid`` is a list of (m, pq_k, n_probe) points; the
    coarse quantizer, the quantized corpus and the residual table are
    built ONCE for the whole sweep, one PQ codebook + code table per
    distinct (m, pq_k), and each grid point reuses them for its probes.
    Returns one dict per point: {"m", "pq_k", "n_probe", "topk" (a
    (query_id, rank, vec_id, adc_units) DataFrame), "cand_rows" (the
    number of code rows the point's probes scan across the query set,
    self-rows excluded — list sizes come from ONE bounded n_lists-row
    aggregate, so the cost axis costs no extra corpus pass),
    "code_bytes" (m bytes/vector at pq_k <= 256 — the residency axis)}.
    This is how the 100 TB operating point gets CHOSEN FROM DATA rather
    than asserted: recall@k against the exact baseline (computed by the
    caller) vs scan fraction and code residency, Jégou et al. Fig. 5
    as a registry entry."""
    from pyspark.sql import Window

    from .clustering import quantize_vectors

    if not query_ids:
        # Fail loudly up front (r14, ADVICE): empty query_ids previously
        # left scored_all as None and crashed opaquely at the
        # window-rank step with AttributeError.
        raise ValueError("query_ids must be non-empty")
    qdf = (quantize_vectors(embeddings, id_col, vec_col)
           .localCheckpoint(eager=True))
    cdf = centroids if centroids is not None else train_ivf_quantizer_fixed(
        embeddings, n_lists, ivf_iterations, id_col, vec_col)
    cents = {int(r["list_id"]): [int(v) for v in r["centroid"]]
             for r in cdf.collect()}
    dims = len(next(iter(cents.values())))
    for m, pq_k, n_probe in grid:
        if dims % m:
            raise ValueError(f"dims {dims} not divisible by m={m}")
        if not 1 <= n_probe <= n_lists:
            raise ValueError(f"n_probe={n_probe} outside 1..{n_lists}")

    rdf = _residuals_from_quantized(qdf, cents).localCheckpoint(eager=True)
    # bounded: <= n_lists rows — the deterministic cost axis
    sizes = {int(r["list_id"]): int(r["n"]) for r in
             rdf.groupBy("list_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    own = {}   # query -> its assigned list (self-row exclusion)
    qrows = {int(r["vec_id"]): [int(v) for v in r["qvec"]]
             for r in qdf.filter(
                 F.col("vec_id").isin(*[int(q) for q in query_ids]))
             .collect()}
    missing = [int(q) for q in query_ids if int(q) not in qrows]
    if missing:
        raise ValueError(f"query vec_id(s) {missing} not found")
    for r in (rdf.filter(F.col("vec_id")
                         .isin(*[int(q) for q in query_ids]))
              .select("vec_id", "list_id").collect()):
        own[int(r["vec_id"])] = int(r["list_id"])

    out: list[dict] = []
    codes_by_mk: dict[tuple[int, int], tuple] = {}
    # materialize a code table eagerly only when >1 grid point reuses
    # it. NOTE the real trade for a single-use (m, pq_k): the point's
    # one window-rank job unions |query_ids| filtered branches over the
    # lazy codes frame, so the encode projection runs once PER BRANCH —
    # |query_ids| narrow codegen argmin passes vs one eager
    # checkpoint write + |query_ids| cheap scans. For this entry's
    # shape (5 queries, k <= 8 literals per subspace) the lazy side
    # measured faster; a caller sweeping many queries over a single-use
    # budget should checkpoint upstream instead.
    uses: dict[tuple[int, int], int] = {}
    for m, pq_k, _ in grid:
        uses[(m, pq_k)] = uses.get((m, pq_k), 0) + 1
    for m, pq_k, n_probe in grid:
        if (m, pq_k) not in codes_by_mk:
            sublen = dims // m
            if codebooks_dir is not None:
                # caller vouches the corpus behind this dir is immutable
                # (deterministic fixture rebuilds) — train-once cache
                import os

                books = persist_pq_codebooks(
                    rdf.select("vec_id", "qvec"),
                    os.path.join(codebooks_dir,
                                 f"books_m{m}_k{pq_k}"
                                 f"_i{pq_iterations}.json"),
                    m=m, k=pq_k, iterations=pq_iterations)
            else:
                books = pq_train_codebooks(rdf.select("vec_id", "qvec"),
                                           m=m, k=pq_k,
                                           iterations=pq_iterations)
            codes = rdf.select(
                "vec_id", "list_id",
                *[_sub_argmin(f"slice(qvec, {s * sublen + 1}, {sublen})",
                              books[s]).alias(f"code_{s}")
                  for s in range(m)])
            if uses[(m, pq_k)] > 1:
                codes = codes.localCheckpoint(eager=True)
            codes_by_mk[(m, pq_k)] = (books, codes)
        books, codes = codes_by_mk[(m, pq_k)]
        # ONE frame per grid point (r12 verdict #5): union every query's
        # scored candidates and cut top-k with a single window rank,
        # instead of a per-query orderBy/limit branch — the old shape ran
        # ~|grid| x |queries| small TakeOrdered jobs (a driver-scheduling
        # floor, not a data cost); this shape is one job per point over
        # the same cached code table. Result-identical: ranking ALL
        # candidates per query selects the same k_top rows the per-branch
        # top-k + re-rank did, with the same (adc_units, vec_id) ties.
        scored_all, cand_rows = None, 0
        for qid in query_ids:
            q0 = qrows[int(qid)]
            probed = _probe_lists(q0, cents, n_probe)
            cand_rows += (sum(sizes.get(lid, 0) for lid in probed)
                          - (1 if own[int(qid)] in probed else 0))
            scored = (codes
                      .filter(F.col("list_id")
                              .isin(*[int(x) for x in probed])
                              & (F.col("vec_id") != int(qid)))
                      .select(F.lit(int(qid)).alias("query_id"), "vec_id",
                              _adc_expr(q0, cents, books, probed)
                              .cast("long").alias("adc_units")))
            scored_all = (scored if scored_all is None
                          else scored_all.unionByName(scored))
        w = Window.partitionBy("query_id").orderBy("adc_units", "vec_id")
        out.append({
            "m": m, "pq_k": pq_k, "n_probe": n_probe,
            "topk": (scored_all.withColumn("rank", F.row_number().over(w))
                     .filter(F.col("rank") <= k_top)
                     .select("query_id", "rank", "vec_id", "adc_units")),
            "cand_rows": cand_rows, "code_bytes": m,
        })
    return out


def ivf_residuals(vectors: DataFrame, cents: dict[int, list[int]],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(vec_id, list_id, qvec): each vector's integer residual against
    its nearest literal centroid — the PQ training input of the IVFADC
    family. One narrow codegen projection (argmin + zip_with subtract),
    no shuffle."""
    from .clustering import quantize_vectors

    return _residuals_from_quantized(
        quantize_vectors(vectors, id_col, vec_col), cents)
