"""Exact bitmap semi-join: ship the build side of a selective semi-join as
dense bitmaps instead of a broadcast hash relation.

For integer join keys, `bitmap_construct_agg` (Spark 3.5+) packs each
32768-key bucket into a 4 KB bitmap — ~1 bit per present key versus the
~8-16 bytes per key of a broadcast hash table, a 64-128× smaller broadcast
for dense key ranges. The probe side computes (bucket, bit-position) per
row, equi-joins the broadcast bitmap table on bucket (a map-side hash
lookup, no shuffle), and tests one bit. Unlike a Bloom filter this is
EXACT — no false positives, no verification pass — which is why the whole
result can be oracled against a plain `IN` semi-join.

The same layout is what Spark's own runtime semi-join reduction would ship
as a Bloom filter; building it explicitly makes the size/exactness
trade-off part of the engine surface rather than an optimizer internal.

Layout facts (probed, Spark 4.1): bucket = bitmap_bucket_number(k) groups
32768 consecutive keys; pos = bitmap_bit_position(k) ∈ [0, 32767]; the
4096-byte bitmap stores pos at byte pos>>3, bit pos&7, LSB-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_bitmaps(keys: DataFrame, key_col: str) -> DataFrame:
    """Distinct integer keys → (bucket, bm) bitmap table, one 4 KB binary
    per 32768-key bucket. Aggregation is a plain hash-agg on bucket —
    partial bitmaps OR-combine map-side (bitmap_construct_agg is
    commutative), so the shuffle carries at most #buckets 4 KB rows."""
    return (
        keys.select(
            F.expr(f"bitmap_bucket_number({key_col})").alias("bucket"),
            F.expr(f"bitmap_bit_position({key_col})").alias("pos"))
        .groupBy("bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )


def _bit_is_set(bm: str, pos: str) -> F.Column:
    """LSB-first bit test inside a binary bitmap, all JVM built-ins:
    byte = substring(bm, pos>>3 + 1, 1); (byte >> (pos&7)) & 1."""
    return F.expr(
        f"(shiftright(cast(conv(hex(substring({bm}, "
        f"cast(shiftright({pos}, 3) as int) + 1, 1)), 16, 10) as int), "
        f"cast({pos} & 7 as int)) & 1) = 1")


def bitmap_semi_join(fact: DataFrame, keys: DataFrame,
                     fact_key: str, keys_key: str) -> DataFrame:
    """fact LEFT SEMI keys on integer equality, via broadcast bitmaps.

    Semantics identical to ``fact.join(keys, on, "left_semi")`` (exact,
    no false positives); the physical shape replaces the broadcast hash
    relation with per-bucket bitmaps — the right trade when the build
    side is large-but-dense (e.g. "orderkeys touched this month" against
    a 100 TB fact table)."""
    bms = key_bitmaps(keys.select(keys_key), keys_key)
    probed = (
        fact
        .withColumn("__bucket", F.expr(f"bitmap_bucket_number({fact_key})"))
        .withColumn("__pos", F.expr(f"bitmap_bit_position({fact_key})"))
        .join(F.broadcast(bms), F.col("__bucket") == F.col("bucket"))
        .filter(_bit_is_set("bm", "__pos"))
    )
    return probed.drop("__bucket", "__pos", "bucket", "bm")
