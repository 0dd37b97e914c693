"""IN-list → semi-join rewrite guard (SURVEY §4.2).

The reference materializes its whole filter table client-side and ships
it as a Mongo ``$in`` array (``kafka-database-import.go:148-170``) —
fine for hundreds of ids, pathological for millions. Spark has the same
cliff: ``F.col(c).isin(values)`` builds one giant expression tree
(analysis cost grows per literal, and past a few thousand literals the
plan stops being pushdown-friendly), while a broadcast semi-join stays
O(1) in plan size and hash-probes at execution.

SURVEY §4.2 offers two fixes — a Catalyst rule or an API-level guard —
and prefers the guard (no JVM code). This is that guard.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many literals, isin() plans worse than a broadcast
# semi-join (expression-tree size, analysis time, lost pushdown).
ISIN_LITERAL_LIMIT = 1000


def filter_by_inlist(
    df: DataFrame,
    column: str,
    values: Sequence | DataFrame,
    limit: int = ISIN_LITERAL_LIMIT,
) -> DataFrame:
    """Keep rows whose ``column`` is in ``values`` — picking the right
    physical strategy:

    * ``values`` is a DataFrame (one column) → broadcast left-semi join,
      always. Never collect a filter table to the driver to rebuild an
      IN-list (the reference's mistake at scale).
    * small literal sequence → plain ``isin`` (pushdown-friendly:
      becomes ``In``/``InSet`` at the scan).
    * large literal sequence → parallelize to a single-column frame and
      broadcast-semi-join it.
    """
    if isinstance(values, DataFrame):
        if len(values.columns) != 1:
            raise ValueError("values DataFrame must have exactly one column")
        key = values.columns[0]
        return df.join(
            F.broadcast(values), df[column] == values[key], "left_semi"
        )
    vals = list(values)
    if len(vals) <= limit:
        return df.filter(F.col(column).isin(vals))
    spark = df.sparkSession
    lookup = spark.createDataFrame([(v,) for v in vals], ["__inlist_key"]).select(
        F.col("__inlist_key").cast(df.schema[column].dataType).alias("__inlist_key")
    )
    return df.join(
        F.broadcast(lookup), df[column] == F.col("__inlist_key"), "left_semi"
    )
