"""Corpus-curation operators beyond dedup: the decisions a training-data
pipeline makes BETWEEN cleaning and tokenization (BASELINE.json north_star;
SURVEY.md §2.11). All four are oracled — the split/mix/vocab/contamination
math is engine-portable by construction (md5 strings, integer-count
divisions, total-order cuts), so DuckDB can check every row.

Scale shapes:
- hash split: row-wise projection, zero shuffle, stable under corpus
  growth (a document's split never changes when new data arrives — the
  property that keeps eval sets clean across refreshes).
- mix weights: one partial+final agg to #domains rows + broadcast scalar.
- vocab coverage: token explode → one agg → top-k vocab broadcast back.
- contamination: gram equi-join, the standard decontamination shape; at
  100 TB put a bloom filter of eval grams on the train side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round_det
from ..operators import dedup as D
from .registry import load_par, register

# 256 md5-prefix buckets, cut at 205/230 → ~80/10/10. String comparison on
# two hex chars is identical in every engine — no numeric hash parity needed.
_TRAIN_LT, _VAL_LT = "cd", "e6"


@register(
    "q_split_train_val",
    oracle=f"""
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_LT}'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_LT}'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic train/val/test split (~80/10/10) by md5 of the "
        "stable id: row-wise, shuffle-free, and GROWTH-STABLE — a doc's "
        "split never changes as the corpus grows, unlike percentile- or "
        "random()-based splits, so eval membership survives refreshes. "
        "Thresholds are lexicographic cuts on the first two hex chars "
        "(256 buckets); md5 agrees across engines, so the oracle checks "
        "every assignment.",
    tags=("llm", "curation", "split"),
)
def q_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_par(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < _TRAIN_LT, "train")
         .when(bucket < _VAL_LT, "val")
         .otherwise("test").alias("split"),
    )


@register(
    "q_domain_mix_weights",
    oracle="""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(sqrt(CAST(n_docs AS DOUBLE))) AS DOUBLE) AS z,
               SUM(n_docs) AS n FROM counts
    )
    SELECT source, n_docs,
           FLOOR(sqrt(CAST(n_docs AS DOUBLE)) / z * 1e6 + 0.5) / 1e6
               AS weight,
           CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) / z * n) AS BIGINT)
               AS docs_per_epoch
    FROM counts CROSS JOIN tot
    """,
    doc="Temperature-scaled domain mixing (alpha=0.5): sampling weight per "
        "source ∝ sqrt(n_docs), normalized — the standard up-weighting of "
        "small high-quality domains when composing a training mix. One "
        "partial+final agg to #domains rows; the normalizer rides as a "
        "broadcast one-row aggregate (no single-partition window, no "
        "driver round-trip). sqrt is correctly-rounded IEEE, so the "
        "weights are engine-exact before the deterministic rounding.",
    tags=("llm", "curation", "sampling"),
)
def q_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_par(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"),
        F.sum("n_docs").alias("n"))
    w = F.sqrt(F.col("n_docs").cast("double")) / F.col("z")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs",
            round_det(w, 6).alias("weight"),
            F.floor(w * F.col("n")).cast("bigint").alias("docs_per_epoch"),
        )
    )


_VOCAB_K = 256

_VOCAB_SQL = rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents
    ), vocab AS (
        SELECT term FROM (
            SELECT term, COUNT(*) AS c FROM toks GROUP BY term
        ) ORDER BY c DESC, term LIMIT {_VOCAB_K}
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           FLOOR((1 - SUM(CASE WHEN v.term IS NULL THEN 0 ELSE 1 END)
                      / CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6
               AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.doc_id
"""


@register(
    "q_vocab_coverage",
    oracle=_VOCAB_SQL,
    doc=f"Frequency-vocabulary build + per-document OOV rate: top-"
        f"{_VOCAB_K} terms by corpus frequency (count desc, term asc — a "
        "total order, so the cut is deterministic in both engines) become "
        "the vocab; each document reports its out-of-vocabulary token "
        "fraction — the coverage gate run before committing to a "
        "tokenizer. Vocab selection is TakeOrderedAndProject (top-k, "
        "never a global sort) and the vocab joins back as a broadcast "
        "hash join; per-doc rates are one hash aggregate.",
    tags=("llm", "curation", "text"),
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import TOKEN_SPLIT_RE

    d = load_par(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), TOKEN_SPLIT_RE))
         .alias("term"))
    vocab = (toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.desc("c"), F.asc("term")).limit(_VOCAB_K)
             .select("term", F.lit(1).alias("iv")))
    return (
        toks.join(F.broadcast(vocab), on="term", how="left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum(F.coalesce("iv", F.lit(0))).alias("n_in"))
        .select(
            "doc_id", "n_tokens",
            round_det(F.lit(1.0) - F.col("n_in") / F.col("n_tokens")
                      .cast("double"), 6).alias("oov_rate"))
    )


_CONTAM_SQL = r"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(trim(text)),
                                   '\s+'), x -> x <> '') AS t
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                   AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 3)) AS i
              FROM toks)
    ), eval_grams AS (
        SELECT * FROM grams WHERE doc_id % 10 = 0
    ), train_grams AS (
        SELECT DISTINCT shingle FROM grams WHERE doc_id % 10 <> 0
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_grams FROM eval_grams GROUP BY doc_id
    ), shared AS (
        SELECT e.doc_id, COUNT(*) AS n_shared
        FROM eval_grams e JOIN train_grams t ON e.shingle = t.shingle
        GROUP BY e.doc_id
    )
    SELECT s.doc_id, s.n_grams,
           COALESCE(sh.n_shared, 0) AS n_shared,
           FLOOR(COALESCE(sh.n_shared, 0) / CAST(s.n_grams AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS contamination
    FROM sizes s LEFT JOIN shared sh ON s.doc_id = sh.doc_id
"""


@register(
    "q_contamination_ngrams",
    oracle=_CONTAM_SQL,
    doc="Benchmark-contamination check: word-4-gram overlap between a held "
        "split (doc_id % 10 = 0, standing in for an eval benchmark) and "
        "the training remainder — the decontamination primitive run before "
        "any training job. Per eval doc: distinct 4-grams, how many also "
        "appear anywhere in train, and the contamination ratio. The only "
        "shuffle is the gram equi-join (train grams deduped first, so the "
        "join can't multiply rows); at 100 TB a bloom filter of the eval "
        "grams pre-prunes the train side before the exchange.",
    tags=("llm", "curation", "dedup"),
)
def q_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_par(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 10 == 0)
    tr = d.filter(F.col("doc_id") % 10 != 0)
    ge = D.shingle_table(ev, "doc_id", "text", n=4)
    gt = D.shingle_table(tr, "doc_id", "text", n=4).select("shingle").distinct()
    sizes = ge.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (ge.join(gt, on="shingle")
              .groupBy("doc").agg(F.count(F.lit(1)).alias("n_shared")))
    return (
        sizes.join(shared, on="doc", how="left")
        .select(
            F.col("doc").alias("doc_id"), "n_grams",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            round_det(F.coalesce("n_shared", F.lit(0))
                      / F.col("n_grams").cast("double"), 6)
            .alias("contamination"))
    )


@register(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source,
               GREATEST(CAST(COALESCE(length(text), 0) AS DOUBLE), 1.0) AS w,
               (CAST(CAST(concat('0x',
                        substr(md5(CAST(doc_id AS VARCHAR) || ':wsamp42'),
                               1, 8)) AS UBIGINT) AS DOUBLE) + 0.5)
                   / 4294967296.0 AS u
        FROM documents
    ), scored AS (
        SELECT doc_id, source, w, -ln(u) / w AS k,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY -ln(u) / w ASC, doc_id)
                   AS rk
        FROM keyed
    )
    SELECT source, doc_id, w,
           FLOOR(k * 1e9 + 0.5) / 1e9 AS sample_key,
           CAST(rk AS INT) AS rk
    FROM scored WHERE rk <= 10
    """,
    doc="Weighted sampling without replacement (A-ES / Efraimidis-"
        "Spirakis): per stratum, the k=10 docs with the smallest "
        "exponential keys -ln(u)/w — equivalent to sequential weighted "
        "draws, here weight = doc length. u is derived from md5(doc_id + "
        "fixed salt), NOT rand(): the draw is reproducible, growth-stable "
        "per doc (same property as the md5 split), and cross-engine "
        "checkable. Plan: row-wise key computation (zero shuffle), then "
        "one per-stratum top-k window — at 100 TB swap the window for "
        "the two-phase per-partition-heap top-k (operators/ranking) per "
        "stratum. The standard quality-weighted corpus subsampling step.",
    tags=("llm", "curation", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_par(spark, sf_dir, "documents")
    # u is shifted by +0.5/2^32 into the open interval (0,1) so ln(u) is
    # total (a 00000000 md5 prefix would otherwise hit ln(0)); w is
    # floored at 1 so empty/NULL documents don't divide by zero under
    # ANSI mode — both guards are mirrored verbatim in the oracle.
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":wsamp42"))), 1, 8), 16, 10)
         .cast("double") + F.lit(0.5)) / F.lit(4294967296.0))
    w = F.greatest(F.coalesce(F.length("text"), F.lit(0)).cast("double"),
                   F.lit(1.0))
    keyed = d.select("doc_id", "source", w.alias("w"),
                     (-F.log(u) / w).alias("k"))
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.asc("k"), F.asc("doc_id")))
    return (
        keyed.withColumn("rk", rk)
        .filter(F.col("rk") <= 10)
        .select("source", "doc_id", "w",
                round_det("k", 9).alias("sample_key"), "rk")
    )


def _bpe_merges_oracle(n_merges: int = 8) -> str:
    """Unrolled SQL twin of bpe_train (r8 — was rows-only through r7).

    The insight that makes the greedy merge SQL-expressible: wrap every
    symbol as chr(2)||sym||chr(3); then one standard string `replace()`
    of chr(2)||l||chr(3)||chr(2)||r||chr(3) with chr(2)||l||r||chr(3) IS
    the JVM array fold in operators/bpe._merge_pair — both rewrite
    non-overlapping (l, r) adjacencies scanning left-to-right, a merged
    symbol can never re-match as `l` of the same round (l||r == l is
    impossible), and the distinct open/close markers make partial-symbol
    matches impossible. Pair counts come from re-tokenizing the encoding
    with regexp_extract_all + an index unnest; each round is MATERIALIZED
    (referenced twice: by its pair count and the next rewrite) so DuckDB
    doesn't exponentially inline the chain. Tokenizer-rule caveat shared
    with the Spark side (operators/bpe.word_freq_table): \\s+ is ASCII in
    both engines' regex dialects (Java default vs RE2)."""
    o, c = "chr(2)", "chr(3)"
    parts = [f"""
    WITH words AS MATERIALIZED (
        SELECT w AS word, COUNT(*) AS n
        FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)),
                                                  '\\s+')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    v0 AS MATERIALIZED (
        SELECT n, regexp_replace(word, '(.)', {o} || '\\1' || {c}, 'g')
                  || {o} || '</w>' || {c} AS enc
        FROM words
    )"""]
    for k in range(n_merges):
        parts.append(f""",
    syms{k} AS MATERIALIZED (
        SELECT n, regexp_extract_all(
                      enc, {o} || '([^' || {c} || ']+)' || {c}, 1) AS syms
        FROM v{k}
    ),
    pc{k} AS (
        SELECT syms[i] AS l, syms[i + 1] AS r, SUM(n) AS pair_n
        FROM (SELECT n, syms,
                     unnest(generate_series(1, len(syms) - 1)) AS i
              FROM syms{k})
        GROUP BY 1, 2
    ),
    win{k} AS MATERIALIZED (
        SELECT l, r, pair_n FROM pc{k}
        ORDER BY pair_n DESC, l, r LIMIT 1
    ),
    v{k + 1} AS MATERIALIZED (
        SELECT n, replace(enc, {o} || w.l || {c} || {o} || w.r || {c},
                          {o} || w.l || w.r || {c}) AS enc
        FROM v{k}, win{k} w
    )""")
    sels = [f"""
    SELECT CAST({k} AS INT) AS rank, l AS "left", r AS "right",
           l || r AS merged, CAST(pair_n AS BIGINT) AS pair_n
    FROM win{k}""" for k in range(n_merges)]
    return "".join(parts) + (" UNION ALL ".join(sels)) + " ORDER BY rank"


@register(
    "q_bpe_merges",
    oracle=_bpe_merges_oracle(),
    # hash-oracled since r8 (the chr(2)/chr(3) symbol-wrap encoding makes
    # the greedy fold a plain string replace); ALSO pinned by
    # tests/test_llm_operators.py's from-scratch Python BPE
    # (bit-identical merge sequence + encode lengths)
    doc="Distributed BPE merge training (operators/bpe.bpe_train): 8 "
        "merge rounds over the documents word-frequency table — the "
        "tokenizer-induction step of an LLM pipeline. Corpus-sized work "
        "happens once (word counts); every round after is vocab-sized: "
        "one pair-count aggregate + one JVM array-fold rewrite, driver "
        "traffic = a single winning pair per round. Deterministic "
        "tie-break (count desc, pair lexicographic) makes the merge "
        "sequence bit-reproducible across partitionings.",
    tags=("llm", "text", "iterative"),
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train

    docs = load_par(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=8, min_pair_count=2)


@register(
    "q_epoch_repeat_mix",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               CAST(substr(source, 4) AS INT) AS sn
        FROM documents
    ),
    plan AS (
        SELECT doc_id, source,
               CAST(1000 + sn * 125 AS BIGINT) AS epochs_x1000,
               1 + sn // 8
               + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                           < lpad(lower(to_hex((sn % 8) * 8192)), 4, '0')
                      THEN 1 ELSE 0 END AS n_copies
        FROM d
    )
    SELECT doc_id, source, epochs_x1000,
           CAST(n_copies AS INT) AS n_copies,
           CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_idx
    FROM plan
    """,
    doc="Fractional-epoch data mixing (the 'repeat source A for 2.5 "
        "epochs' step of pretraining-corpus assembly): every doc gets "
        "floor(epochs) copies, plus one more iff its md5 bucket falls "
        "under the fractional part — so exactly ~frac of each source "
        "repeats once more, chosen DETERMINISTICALLY and growth-stably "
        "(a doc's copy count depends only on (doc_id, source), so "
        "refreshing the corpus never flips previously-materialized "
        "copies, the same stability argument as q_split_train_val). "
        "Epoch targets are derived per source (1 + src_num/8 -> 1.0 to "
        "3.375 in exact 1/8 steps; the fractional threshold is the "
        "4-hex-char string of frac*65536, compared lexicographically "
        "against the md5 prefix — md5 agrees across engines, so the "
        "oracle checks every copy row). Scale shape: ZERO shuffles — "
        "row-wise derivation + a bounded explode (factor <= 4); at "
        "100 TB this is a narrow map stage that parallelizes with the "
        "scan, and the mix is re-derivable from the plan columns "
        "(epochs_x1000, n_copies) without storing the blow-up.",
    tags=("llm", "curation", "mixing"),
)
def q_epoch_repeat_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_par(spark, sf_dir, "documents")
    sn = F.substring("source", 4, 10).cast("int")
    frac_hex = F.lpad(F.lower(F.hex((sn % 8) * 8192)), 4, "0")
    n_copies = (
        F.lit(1) + F.floor(sn / 8).cast("int")
        + F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
                 < frac_hex, 1).otherwise(0)
    )
    return (
        d.select(
            "doc_id", "source",
            (F.lit(1000) + sn * 125).cast("bigint").alias("epochs_x1000"),
            n_copies.cast("int").alias("n_copies"),
        )
        .withColumn("copy_idx",
                    F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
        .withColumn("copy_idx", F.col("copy_idx").cast("int"))
    )
