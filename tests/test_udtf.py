"""Python UDTF surface (Spark 4): one row in, many typed rows out, usable
from SQL via LATERAL — completing the UDF/UDTF inventory (SURVEY.md §2.10;
pandas_udf / applyInPandas / mapInPandas are covered by driver queries).

The UDTF here is a word-window chunker. NOTE: UDTFs are row-at-a-time
Python — the API-surface demo, not the hot path; the production chunker is
the declarative bucketed-cumsum operator (operators/packing.py) and stays
the registered/benched implementation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from canary_weather_etl_spark.plans.registry import load

try:
    from pyspark.sql.functions import udtf
    HAS_UDTF = True
except ImportError:  # pragma: no cover - pyspark < 3.5
    HAS_UDTF = False


@pytest.mark.skipif(not HAS_UDTF, reason="pyspark without UDTF support")
def test_udtf_chunker_lateral_join(spark):
    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkWords:
        def eval(self, text: str, max_tokens: int):
            toks = text.split()
            for i in range(0, len(toks), max_tokens):
                part = toks[i:i + max_tokens]
                yield i // max_tokens, " ".join(part), len(part)

    spark.udtf.register("chunk_words", ChunkWords)
    d = load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    d.createOrReplaceTempView("udtf_docs")
    out = spark.sql("""
        SELECT doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM udtf_docs, LATERAL chunk_words(text, 40) c
    """).cache()

    # token conservation: chunks tile each document exactly
    got = {r["doc_id"]: r["s"] for r in
           out.groupBy("doc_id").agg(F.sum("n_tokens").alias("s")).collect()}
    want = {r["doc_id"]: r["n"] for r in
            d.select("doc_id",
                     F.size(F.split(F.col("text"), r"\s+")).alias("n"))
            .collect()}
    assert got == want
    # every chunk except a doc's last is exactly max_tokens wide
    last = out.groupBy("doc_id").agg(F.max("chunk_idx").alias("mx")).collect()
    mx = {r["doc_id"]: r["mx"] for r in last}
    short = out.filter(F.col("n_tokens") != 40).collect()
    for r in short:
        assert r["chunk_idx"] == mx[r["doc_id"]]
    out.unpersist()
