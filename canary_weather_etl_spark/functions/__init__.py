"""Scalar/aggregate expression helpers shared by the query plans.

Float discipline (SURVEY.md §7.2 'DuckDB-oracle parity traps'): double
SUM/AVG is reduction-order-dependent, so two engines disagree in the last
bits — and ROUND on top of that flips coin-toss ties (a group mean landing
exactly on `x.xxx5` rounds differently depending on which side of the
boundary each engine's noise lands). The fixture money/measure columns are
exact 2-decimal values, so the bulletproof pattern is:

    cast to DECIMAL → aggregate exactly → cast the final scalar to DOUBLE

Decimal aggregation is exact (no order dependence); the final
decimal→double conversion and any subsequent IEEE arithmetic are
deterministic functions of the value, so Spark and DuckDB agree bitwise and
no rounding is needed at all. The same trick costs little at 100 TB scale:
decimal(18,2) sums stay inside Tungsten codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM of a fixed-point-valued double column, via
    integer arithmetic: scale to units (cents for scale=2), sum as BIGINT
    (exact, order-free), divide back in double.

    ~2x faster than the equivalent DECIMAL aggregation (long sums stay in
    whole-stage codegen registers) with the same bitwise determinism: the
    integer sum is identical in both engines and the final division is one
    IEEE op on identical inputs. ROUND before the cast kills the ~1e-9
    float error of `2-decimal-value * 100`; values never sit near .5 after
    scaling, so the rounding rule is irrelevant.

    Oracle twin: ``CAST(SUM(CAST(ROUND(x * 1eS) AS BIGINT)) AS DOUBLE) / 1eS``.
    Range: |Σ x·10^s| must fit in int64 — fine up to ~9e16 units.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = 10 ** scale
    cents = F.round(c * factor).cast("long")
    return F.sum(cents).cast("double") / float(factor)


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact integer sum → double ÷ factor ÷ count.

    Oracle twin:
    ``CAST(SUM(CAST(ROUND(x * 1eS) AS BIGINT)) AS DOUBLE) / 1eS / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale) / F.count(c)


def round_det(col: Column | str, n: int) -> Column:
    """Deterministic cross-engine rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Unlike ROUND — whose tie rule differs between engines (Spark HALF_UP on
    the exact decimal expansion, DuckDB multiply+rint) — this is a fixed
    IEEE expression: when the two engines' inputs differ by an ulp around a
    .5 boundary the outputs can still differ (inherent), but for IDENTICAL
    inputs the result is identical by construction, with no library
    tie-rule in play. Use on values that carry real cross-engine noise
    (percentile interpolation, libm logs, pandas stddev, float folds) where
    ROUND's rule mismatch would add a second failure mode.
    SQL twin: ``FLOOR(x * 1eN + 0.5) / 1eN``.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10 ** n)
    return F.floor(c * factor + 0.5) / factor
