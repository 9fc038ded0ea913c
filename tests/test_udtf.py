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


def test_polymorphic_udtf_analyze_schema_from_argument(spark):
    """Spark 4 polymorphic UDTF: `analyze()` derives the OUTPUT SCHEMA
    from a constant argument at plan time — split_fixed(text, n) emits n
    columns tok0..tok{n-1}. Two call sites with different n get
    different schemas from one registration; planner-side analysis, no
    runtime schema gymnastics."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument,
                    n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            toks = (text or "").split()
            yield tuple(toks[i] if i < len(toks) else None
                        for i in range(n))

    spark.udtf.register("split_fixed", SplitFixed)
    out3 = spark.sql("SELECT * FROM split_fixed('alpha beta gamma', 3)")
    assert out3.columns == ["tok0", "tok1", "tok2"]
    assert [tuple(r) for r in out3.collect()] == [
        ("alpha", "beta", "gamma")]
    out5 = spark.sql("SELECT * FROM split_fixed('a b c', 5)")
    assert out5.columns == ["tok0", "tok1", "tok2", "tok3", "tok4"]
    assert [tuple(r) for r in out5.collect()] == [
        ("a", "b", "c", None, None)]
