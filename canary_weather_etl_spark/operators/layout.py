"""Data-layout operators: Z-order (Morton) keys for multi-dimensional
data skipping.

Parquet row-group min/max statistics prune scans only along the sort
order; sorting by a Z-order key makes row groups tight in SEVERAL columns
at once, so predicates on any of the interleaved dimensions skip row
groups (the layout trick behind Delta OPTIMIZE ZORDER / Iceberg sort
orders, here as a plain column expression + sortWithinPartitions before
write).

Everything is built-in bit arithmetic (shiftleft / AND / OR) — JVM-side,
whole-stage-codegen'd, and reproducible in any engine for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-number bit spreading: 16 bits → even bit positions of 32
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: F.Column) -> F.Column:
    """Spread the low 16 bits of `col` to the even bit positions of a
    32-bit lane: b_i moves to position 2i. The standard O(log n)
    magic-mask construction — 4 shift+mask steps, no loops, no UDF."""
    v = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def zorder_key2(x: F.Column, y: F.Column) -> F.Column:
    """32-bit Morton key interleaving the low 16 bits of x (even
    positions) and y (odd positions). Inputs should be quantized to
    [0, 65535] first (rank, bucket id, or truncated value) — the caller
    owns the quantization, the key is pure bit math."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def write_zordered(df: DataFrame, out: str, x: str, y: str,
                   mode: str = "overwrite",
                   n_files: int | None = None) -> None:
    """Write parquet laid out along the 2-D Z-curve of (x, y): repartition
    by range on the key (so files tile the curve), sort within partitions
    (so row groups are tight), drop the key. Predicates on either column
    now skip files AND row groups via min/max stats.

    `n_files` pins the output file count (explicit counts are exempt from
    AQE partition coalescing); default sizes from shuffle.partitions."""
    keyed = df.withColumn("__z", zorder_key2(F.col(x), F.col(y)))
    if n_files:
        keyed = keyed.repartitionByRange(n_files, "__z")
    else:
        keyed = keyed.repartitionByRange("__z")
    (keyed.sortWithinPartitions("__z")
          .drop("__z")
          .write.mode(mode).parquet(out))
