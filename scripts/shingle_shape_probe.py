#!/usr/bin/env python
"""A/B probe: bigram-shingle construction shapes (SCALE.md r12).

The r11 minhash discovery: every Spark higher-order array function
(transform / zip_with / filter / aggregate) is CodegenFallback — its
lambda body evaluates INTERPRETED per element. `word_ngrams` builds
bigram shingles with `zip_with(slice, slice, concat_ws)`, so the shingle
stage pays the interpreter per (doc x token). Candidate codegen'd shape:
normalize whitespace once (`regexp_replace(text, '\\s+', ' ')`), then
one `regexp_extract_all` with a LOOKAHEAD capture — `(?=([^ ]+ [^ ]+))`
— which yields every OVERLAPPING bigram as group 1: one codegen'd regex
pass per row, no lambda anywhere.

The probe asserts BIT-EQUALITY of the two shapes over the real fixture
(including short-doc and empty-text edges), then times both at an
amplified decade with the one-row hash sink. Run before swapping
word_ngrams' n=2 shape.

Usage: python scripts/shingle_shape_probe.py [--mult 100] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.operators.dedup import word_ngrams  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402
from scripts.scale_probe import amplified_docs_path  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bigrams_zipwith(col) -> F.Column:
    """The r11-and-earlier HOF shape (interpreted lambda), kept here as
    the differential reference for the shipped regex shape. Since r13 the
    reference filters empty tokens (split emits '' for text bounded by
    tab/newline — trim strips spaces only), matching the canonical
    semantics shared by word_ngrams AND the DuckDB oracles' list_filter
    (r12 ADVICE: the unfiltered shapes disagreed on '\\tfoo bar')."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(F.trim(c)), r"\s+"),
                    lambda x: x != F.lit(""))
    m = F.size(toks) - 1
    grams = F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m),
                       lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(m >= 1, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def force(df) -> int:
    # bit_xor, not sum: ANSI mode + long sum of 64-bit hashes overflows
    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.select(F.xxhash64(*cols).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("s")).collect()[0]
    return int(row["n"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("canary-shingle-shape-probe")

    # --- bit-equality on the real fixture + adversarial edges ----------
    d = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
         .select("doc_id", "text"))
    edges = spark.createDataFrame(
        [(10**9 + 1, ""), (10**9 + 2, "one"), (10**9 + 3, "  two  words "),
         (10**9 + 4, "a  b\tc\nd"), (10**9 + 5, None),
         # leading/trailing NON-SPACE whitespace: trim() strips spaces
         # only, so the unfiltered split shapes emitted ['', 'foo', ...]
         # here — the r12 ADVICE divergence case
         (10**9 + 6, "\tfoo bar"), (10**9 + 7, "bar baz\n"),
         (10**9 + 8, "\t\n"), (10**9 + 9, "\nx\ty z\t")],
        "doc_id BIGINT, text STRING")
    probe = d.unionByName(edges)
    # UNSORTED equality: both shapes emit grams positionally and
    # array_distinct keeps first occurrences, so order must match too
    diff = (probe.select(
        "doc_id",
        bigrams_zipwith("text").alias("zw"),
        word_ngrams("text", 2).alias("rx"))
        .filter(~(F.col("zw").eqNullSafe(F.col("rx")))))
    bad = diff.collect()
    assert not bad, f"shape mismatch on {len(bad)} docs: {bad[:3]}"
    print(json.dumps({"bit_equal": True, "docs_checked": probe.count()}),
          flush=True)

    # --- timing at the amplified decade --------------------------------
    path = amplified_docs_path(spark, args.mult)
    docs = (spark.read.parquet(path)
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True))
    n = docs.count()
    for name, col in (("zip_with", bigrams_zipwith("text")),
                      ("regex", word_ngrams("text", 2))):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            force(docs.select("doc_id", col.alias("sh"))
                  .select("doc_id", F.size("sh").alias("sz")))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"shape": name, "mult": args.mult, "n_docs": n,
                          "wall_s": round(best, 2)}), flush=True)


if __name__ == "__main__":
    main()
