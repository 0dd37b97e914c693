"""Exact-decimal money arithmetic for oracle-stable results.

Cross-engine hazard: ``ROUND(double, n)`` at .5 boundaries differs
between Spark (shortest-string BigDecimal HALF_UP) and other engines
(multiply-and-round on the binary double). Fixture money columns are
exact 2-decimal values, so casting them to DECIMAL(12,2) is lossless in
both engines; all products/sums then happen in exact decimal arithmetic,
ROUND is deterministic half-up, and the final cast back to double is
exact. This also removes float-summation-order nondeterminism from
aggregates — a distributed sum of decimals is order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"


def money(col) -> Column:
    """Lossless decimal view of an exact-2dp double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dround(expr: Column, scale: int = 2) -> Column:
    """ROUND in decimal space, surfaced as double (exact conversion)."""
    return F.round(expr, scale).cast("double")


def mround(col: Column, scale: int = 2) -> Column:
    """Multiply-round for non-negative doubles: floor(x*10^n + 0.5)/10^n.

    Rounding a double that sits exactly on a decimal .5 boundary differs
    between engines (Spark: shortest-string HALF_UP; DuckDB: multiply
    then round-half-away on the binary double). Expressing the round as
    identical float64 ops on both sides makes results bit-identical by
    construction. SQL twin: ``FLOOR(x * 100 + 0.5) / 100``."""
    m = 10**scale
    return F.floor(col * m + F.lit(0.5)) / m


def avg_exact(sum_dec: Column, count_col: Column, scale: int = 2) -> Column:
    """Average as exact-decimal-sum ÷ count evaluated in float64, rounded
    with :func:`mround` — bit-identical across engines (engine-native AVG
    over decimals has engine-specific intermediate types). SQL twin:
    ``FLOOR(CAST(SUM(...dec...) AS DOUBLE) / COUNT(...) * 100 + 0.5) / 100``."""
    return mround(sum_dec.cast("double") / count_col, scale)
