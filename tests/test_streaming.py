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


def _write_batch(spark, path, rows, mtime=None):
    """Materialize rows as a single *leaf* parquet file at ``path`` —
    the file stream source lists leaf files under its input dir; nested
    ``dir/part-*.parquet`` layouts are not reliably discovered. The
    source picks files up oldest-mtime-first, so tests that depend on
    batch order pin ``mtime`` explicitly."""
    import glob
    import shutil

    scratch = tempfile.mkdtemp(prefix="kdis_wb_")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        scratch
    )
    part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(scratch, ignore_errors=True)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


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


def test_watermark_drops_late_rows_across_restart(spark):
    """Run 1 advances the watermark to 10:20 (max event 10:30 − 10 min)
    and commits it to the checkpoint. Run 2 — same checkpoint, i.e. a
    restart — delivers a 09:00 straggler, which the restored watermark
    must drop from the stateful dedup's input. (Within a single
    ``availableNow`` run Spark 4.1 applies the query-start watermark to
    every drained batch, so the drop is only observable across runs —
    which is also the realistic at-least-once-redelivery scenario.)"""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0)
    src = tempfile.mkdtemp(prefix="kdis_wm_src_")
    ckpt = tempfile.mkdtemp(prefix="kdis_wm_ckpt_")
    got: list[tuple[str, int]] = []

    def sink(batch_df, epoch_id):
        got.extend((r["ts"].strftime("%H:%M"), r["v"]) for r in batch_df.collect())

    def run():
        sdf = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .dropDuplicates(["v", "ts"])
        )
        q = (
            sdf.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    _write_batch(
        spark,
        os.path.join(src, "f1.parquet"),
        [(base + dt.timedelta(minutes=m), 1) for m in (0, 5, 20, 30)],
    )
    run()
    _write_batch(
        spark,
        os.path.join(src, "f2.parquet"),
        [(dt.datetime(2024, 1, 1, 9, 0), 99), (base + dt.timedelta(minutes=35), 1)],
    )
    q2 = run()

    times = {t for t, _ in got}
    assert "09:00" not in times, f"late row leaked into {sorted(got)}"
    assert {"10:00", "10:05", "10:20", "10:30", "10:35"} <= times
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped >= 1  # the engine itself reported the drop


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
