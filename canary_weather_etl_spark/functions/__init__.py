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


def exact_sum(col: Column | str, scale: int = 2, precision: int = 28) -> Column:
    """Order-independent SUM of a fixed-point-valued double column.

    Returns DOUBLE (bitwise-deterministic). Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column | str, scale: int = 2, precision: int = 28) -> Column:
    """Order-independent AVG: exact decimal sum → double ÷ count.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    (Both engines perform the identical IEEE division on identical inputs.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale, precision) / F.count(c)
