"""Per-group top-k (SURVEY §2.2 Q25).

``row_number`` window + ``rn <= k`` filter: Catalyst rewrites this to
WindowGroupLimit — each map task keeps only its local top-k per group
before the shuffle, so the full per-group sort never materializes. This
is the plan that survives a 100× scale-up (vs. collecting groups)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
