"""Streaming semantics that only show up across micro-batches:
watermark late-data drop (Q33's contract) and multi-batch equivalence
(SURVEY §5.2 batch-equivalence strategy). The per-query results
themselves are differentially oracle-checked in test_correctness."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def _drain(sdf, mode):
    name = f"wm_test_{abs(hash(mode + sdf.schema.simpleString())) % 10**8}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kdis_wm_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name), q


def test_watermark_drops_late_rows(spark):
    """File 1 advances event time to 10:30; file 2 delivers a 09:00
    straggler — older than (max_event_time − 10 min watermark), so the
    09:00 window must never appear. maxFilesPerTrigger=1 forces the two
    files into separate micro-batches (watermark only advances between
    batches)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0)
    src = tempfile.mkdtemp(prefix="kdis_wm_src_")
    _write_batch(
        spark,
        os.path.join(src, "f1.parquet"),
        [(base + dt.timedelta(minutes=m), 1) for m in (0, 5, 20, 30)],
    )
    _write_batch(
        spark,
        os.path.join(src, "f2.parquet"),
        [(dt.datetime(2024, 1, 1, 9, 0), 99), (base + dt.timedelta(minutes=35), 1)],
    )

    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    table, q = _drain(sdf, "update")
    starts = {r["window"].start.strftime("%H:%M") for r in table.collect()}
    assert "09:00" not in starts, f"late row leaked into {starts}"
    assert "10:00" in starts and "10:30" in starts
    # the engine itself must report the drop
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped >= 1


def test_multi_batch_equals_single_batch(spark):
    """The same windowed aggregation over 1-batch and 2-batch delivery
    must converge to identical final counts (complete mode)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [(base + dt.timedelta(minutes=3 * i), i) for i in range(40)]
    one = tempfile.mkdtemp(prefix="kdis_eq1_")
    two = tempfile.mkdtemp(prefix="kdis_eq2_")
    _write_batch(spark, os.path.join(one, "all.parquet"), rows)
    _write_batch(spark, os.path.join(two, "a.parquet"), rows[:20])
    _write_batch(spark, os.path.join(two, "b.parquet"), rows[20:])

    def run(src, max_files):
        sdf = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", str(max_files))
            .parquet(src)
            .groupBy(F.window("ts", "10 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        table, _ = _drain(sdf, "complete")
        return sorted(
            (r["window"].start.isoformat(), r["n"]) for r in table.collect()
        )

    assert run(one, 10) == run(two, 1)
