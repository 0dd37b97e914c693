"""Time-series resampling: fixed-interval rollup with gap-fill and
last-observation-carried-forward (the "hypertable rollup" class of
operator — SURVEY-adjacent custom op expressed entirely as a
composition of built-in DataFrame operations, no UDF).

Plan shape: one groupBy shuffle for the per-slot aggregate; the time
grid is generated per key with ``sequence`` (no driver-side loop, no
cross join against a calendar table); gap rows come from a left join
keyed (key, slot) — co-partitioned with the aggregate; LOCF is a
running ``last(ignorenulls)`` window, one sort within the existing
key partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_database_import_spark.functions.numeric import mround


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_sec: int = 900,
) -> DataFrame:
    """Per-key fixed-interval resample of an event stream:

    returns (key, slot, n_events, filled_sum) where ``slot`` is the
    interval start, ``n_events`` counts events in the slot (0 for
    gaps), and ``filled_sum`` carries the last non-empty slot's rounded
    sum forward across gaps (LOCF). The grid spans each key's own
    [min, max] slot range."""
    slot = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_sec) * interval_sec
    )
    agg = (
        df.select(F.col(key_col).alias("key"), slot.alias("slot"), F.col(value_col).alias("v"))
        .groupBy("key", "slot")
        .agg(F.count(F.lit(1)).alias("n"), mround(F.sum("v")).alias("vsum"))
    )
    bounds = agg.groupBy("key").agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {interval_sec} seconds"))
        ).alias("slot"),
    )
    joined = grid.join(agg, ["key", "slot"], "left")
    w = Window.partitionBy("key").orderBy("slot").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col("key").alias(key_col),
        "slot",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("vsum", ignorenulls=True).over(w).alias("filled_sum"),
    )
