"""Sequence packing: assemble chunked documents into fixed-token-budget
training sequences (the step between chunking and batching in an LLM data
pipeline — unpacked short sequences waste context-window tokens).

Two variants, mirroring the repo's exact/approx pattern:

- `pack_boundary`: SQL-expressible bucketed cumulative-sum packing — one
  window over (bucket, order), pack id = floor(preceding-token-sum /
  budget). Fully declarative (oracle-checkable in DuckDB), one shuffle on
  the bucket key. A pack may overflow the budget by at most one chunk's
  tokens (an item crossing a boundary stays in the pack it started in);
  callers that need a HARD cap use the greedy variant.
- `pack_greedy`: exact first-fit within each bucket via Arrow-batched
  `applyInPandas` — sequential state per bucket, hard `sum <= budget`
  guarantee. Buckets are hash-partitioned, so parallelism = n_buckets and
  no bucket ever exceeds one task (size buckets so a bucket's chunks fit
  in executor memory; at 100 TB that's ~thousands of buckets).

Both are deterministic: packing order is (doc_id, chunk_idx) within a
bucket, bucket = pmod(xxhash64(doc_id), n_buckets) — co-locating a doc's
chunks so packs don't interleave documents more than necessary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, doc_col: str = "doc_id",
                n_buckets: int = 32,
                bucket_expr: F.Column | None = None) -> DataFrame:
    """Default bucket: pmod(xxhash64(doc)) — uniform regardless of id
    distribution. Pass `bucket_expr` (e.g. ``doc_id % n``) when the bucket
    must be reproducible outside Spark (the DuckDB oracle twin)."""
    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(doc_col)), F.lit(n_buckets))
    return df.withColumn("bucket", bucket_expr)


def pack_boundary(chunks: DataFrame, budget: int, doc_col: str = "doc_id",
                  idx_col: str = "chunk_idx", tok_col: str = "chunk_tokens",
                  n_buckets: int = 32,
                  bucket_expr: F.Column | None = None) -> DataFrame:
    """Boundary packing: pack_id = bucket * 2^32 + floor(tokens-before /
    budget) under a deterministic (doc, chunk) order per bucket. Soft cap
    (overflow ≤ one chunk); single window shuffle on bucket."""
    from pyspark.sql import Window

    b = with_bucket(chunks, doc_col, n_buckets, bucket_expr)
    w = (Window.partitionBy("bucket")
         .orderBy(F.asc(doc_col), F.asc(idx_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    return (
        b.withColumn("pack_id",
                     F.col("bucket") * F.lit(1 << 32)
                     + F.floor(before / F.lit(budget)))
        .drop("bucket")
    )


def pack_greedy(chunks: DataFrame, budget: int, doc_col: str = "doc_id",
                idx_col: str = "chunk_idx", tok_col: str = "chunk_tokens",
                n_buckets: int = 32,
                bucket_expr: F.Column | None = None) -> DataFrame:
    """Exact greedy first-fit per bucket (hard cap): a chunk that would
    push the open pack past `budget` closes it and starts the next. The
    sequential scan runs group-at-a-time in pandas (Arrow batches); chunks
    larger than the budget get a pack of their own."""
    from pyspark.sql.types import LongType, StructField, StructType

    bucketed = with_bucket(chunks, doc_col, n_buckets, bucket_expr)
    # build a NEW StructType — StructType.add mutates in place, corrupting
    # the input frame's cached schema
    out_schema = StructType(list(bucketed.schema.fields)
                            + [StructField("pack_id", LongType())])
    bucket_shift = 1 << 32

    def pack_group(pdf):
        pdf = pdf.sort_values([doc_col, idx_col]).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        pack, acc, ids = 0, 0, []
        for t in pdf[tok_col]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                pack, acc = pack + 1, 0
            ids.append(bucket * bucket_shift + pack)
            acc += t
        pdf = pdf.copy()
        pdf["pack_id"] = ids
        return pdf

    return (
        bucketed
        .groupBy("bucket")
        .applyInPandas(pack_group, schema=out_schema)
        .drop("bucket")
    )
