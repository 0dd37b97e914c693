"""Join operators beyond Spark's built-in strategies.

As-of join (Q15): "latest right-side event at time ≤ left time per key".
The naive plan — range join then per-left-row max — is O(|L|·|R|) within
each key and explodes on hot keys at 100 TB. The scalable pattern used
here is union+window:

1. union both sides with a side marker (right rows sort before left rows
   at equal timestamps → inclusive ``<=`` semantics),
2. one shuffle: partition by key, order by (time, marker),
3. running ``last(right_time, ignorenulls)`` carries the most recent
   right timestamp onto every left row.

Cost: a single sort-shuffle of |L|+|R| rows — the same shape as a
sort-merge join, with no multiplicative blowup; AQE skew-split applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    out_col: str = "asof_time",
) -> DataFrame:
    """For each left row, attach the max right-side time ≤ left time
    within the same key, as ``out_col`` (NULL when no such row)."""
    lcols = left.columns
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
        *[F.col(c) for c in lcols],
    )
    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(right_time).alias("__rt"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.withColumn(out_col, F.last("__rt", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .select(*lcols, out_col)
    )
    return out
