"""Window functions: ranking, analytic, frames (SURVEY §2.2 Q21–Q23).

The reference has no window functions; these are declared engine
surface. Window ordering always includes a unique tiebreak column so
results are deterministic under the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_database_import_spark.functions.numeric import avg_exact
from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table


@query(
    "q21_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    ORDER BY c_custkey NULLS LAST, c_nationkey NULLS LAST, rn NULLS LAST,
             rnk NULLS LAST, drnk NULLS LAST, quartile NULLS LAST
    """,
)
def q21_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: row_number / rank / dense_rank / ntile. One
    shuffle on the partition key; sort within partitions."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    out = cust.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return ordered(out)


@query(
    "q22_window_analytic",
    oracle="""
    SELECT event_id, user_id,
           ROUND(LAG(value) OVER w, 2) AS prev_value,
           ROUND(LEAD(value) OVER w, 2) AS next_value,
           FIRST_VALUE(event_id) OVER w AS first_event,
           epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) AS prev_ts_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
    ORDER BY event_id NULLS LAST, user_id NULLS LAST, prev_value NULLS LAST,
             next_value NULLS LAST, first_event NULLS LAST, prev_ts_us NULLS LAST
    """,
)
def q22_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: lag / lead / first_value over per-user event
    timelines (ts collisions broken by event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    out = ev.select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
        F.unix_micros(F.lag("ts").over(w)).alias("prev_ts_us"),
    )
    return ordered(out)


@query(
    "q23_window_frames",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(CAST(value AS DECIMAL(12,2)))
                 OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE
             AS running_sum,
           FLOOR(CAST(SUM(CAST(value AS DECIMAL(12,2)))
                 OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS sliding_avg
    FROM events
    ORDER BY event_id NULLS LAST, user_id NULLS LAST, running_sum NULLS LAST,
             sliding_avg NULLS LAST
    """,
)
def q23_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: running sum (unbounded preceding) and 3-row sliding
    average."""
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_slide = base.rowsBetween(-2, Window.currentRow)
    val_dec = F.col("value").cast("decimal(12,2)")
    out = ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(val_dec).over(w_run), 2).cast("double").alias("running_sum"),
        avg_exact(
            F.sum(val_dec).over(w_slide), F.count(F.lit(1)).over(w_slide)
        ).alias("sliding_avg"),
    )
    return ordered(out)
