"""Z-order (Morton) clustering — multi-dimensional data layout for
file skipping.

A sort on one column gives parquet row-group min/max pruning on that
column only; queries filtering the OTHER dimension read everything.
Interleaving the bits of two key columns into one Morton code and
range-sorting on it keeps files narrow in BOTH dimensions at once
(each file covers a small z-curve segment ≈ a small rectangle in key
space), so two-dimensional predicates prune files/row-groups without
any index. This is the public Delta/Iceberg ``OPTIMIZE ZORDER BY``
technique re-expressed as plain DataFrame ops: compute z →
``repartitionByRange(z)`` → ``sortWithinPartitions(z)`` → write.

The bit interleave is pure integer arithmetic (shift/mask/or folded
over bit positions), identical in any engine — the catalog query's
DuckDB oracle recomputes it with ``list_reduce`` over ``range(0,16)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per dimension; z-value fits in 32 bits


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton code of two non-negative ints truncated to ``bits`` bits:
    bit i of x lands at position 2i, bit i of y at 2i+1. Overflowing
    keys must be range-bucketed to ``bits`` bits first (percent-rank
    bucketing at real scale; modulo in the fixtures' oracle twin).
    DuckDB twin (same fold, engine-side loop)::

        list_reduce(list_prepend(0::BIGINT, range(0, {bits})), (acc, i) ->
          acc | (((x >> i) & 1) << (2*i)) | (((y >> i) & 1) << (2*i + 1)))

    Spark-side the loop is unrolled in Python into one flat 2·bits-term
    bit expression: no higher-order function, so the whole interleave
    stays inside whole-stage codegen (HOF lambdas evaluate interpreted —
    see the q61/q70 measurements)."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def normalized16(col: Column, lo: int, hi: int) -> Column:
    """Scale a key with known [lo, hi] bounds onto the full 16-bit
    grid. REQUIRED before interleaving: Morton order weights bit i of
    both inputs equally, so if one key only occupies low bits (smaller
    range), the other key's high bits dominate every range split and
    the layout degrades to a 1-D sort (observed exactly that with raw
    user_id/event_id). ``floor(x·65535/range)`` is exact in f64 for
    keys < 2^47 and identical in any IEEE engine."""
    span = max(hi - lo, 1)
    return F.floor((col - F.lit(lo)).cast("double") * 65535 / span).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` z-ordered on (x_col, y_col): normalize both keys to
    the 16-bit grid (one tiny min/max agg job — the same pre-pass the
    public OPTIMIZE ZORDER implementations do), one range-shuffle on
    the Morton code, in-partition sort, one file per partition. Every
    output file then spans a narrow range of BOTH keys (asserted in
    tests/test_scale_paths.py), so min/max stats prune 2-D predicates."""
    bounds = df.agg(
        F.min(x_col).alias("xlo"),
        F.max(x_col).alias("xhi"),
        F.min(y_col).alias("ylo"),
        F.max(y_col).alias("yhi"),
    ).collect()[0]
    z = zvalue(
        normalized16(F.col(x_col), bounds.xlo, bounds.xhi),
        normalized16(F.col(y_col), bounds.ylo, bounds.yhi),
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zvalue_nd(cols: list[Column], bits: int | None = None) -> Column:
    """N-dimensional Morton code: bit i of column j lands at position
    i·N + j, so every dimension gets equal weight in the range order.
    Default bits = 32 // N keeps the code in a 32-bit budget (more
    dimensions → coarser per-dimension grid — the standard Z-order
    tradeoff; beyond ~4 columns the curve degrades toward noise and a
    hierarchical sort usually wins). All inputs must already be
    normalized onto [0, 2^bits) (see :func:`normalized16` /
    ``floor(x·(2^bits−1)/range)``). Same flat unrolled bit expression
    as :func:`zvalue` — stays inside whole-stage codegen."""
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue_nd needs at least 2 columns")
    bits = bits if bits is not None else max(1, 32 // n)
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z
