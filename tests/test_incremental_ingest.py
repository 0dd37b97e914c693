"""Incremental ingest end-to-end: two availableNow runs over a growing
source directory through the idempotent upsert sink — the operational
shape of the "database import" in production (catkup runs / cron
triggers). Asserts incrementality (run 2 reads only the new file),
sink completeness, and ledger growth."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kafka_database_import_spark.sinks.jdbc import ParquetUpsertSink


def _leaf_parquet(spark, path, ids):
    scratch = tempfile.mkdtemp(prefix="kdis_inc_")
    spark.createDataFrame([(i, f"u{i % 7}") for i in ids], "event_id LONG, uid STRING") \
        .coalesce(1).write.mode("overwrite").parquet(scratch)
    shutil.move(glob.glob(os.path.join(scratch, "part-*.parquet"))[0], path)


def test_incremental_runs_upsert_only_new_data(spark):
    src = tempfile.mkdtemp(prefix="kdis_inc_src_")
    ckpt = tempfile.mkdtemp(prefix="kdis_inc_ckpt_")
    sink = ParquetUpsertSink(tempfile.mkdtemp(prefix="kdis_inc_sink_"), ["event_id"])

    def run():
        schema = "event_id LONG, uid STRING"
        sdf = spark.readStream.schema(schema).parquet(src)
        q = (
            sdf.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    _leaf_parquet(spark, os.path.join(src, "a.parquet"), range(100))
    run()
    assert sink.read_back(spark).count() == 100

    _leaf_parquet(spark, os.path.join(src, "b.parquet"), range(80, 150))
    q2 = run()
    # run 2 touched only the new file's rows
    rows_in = sum(p["numInputRows"] for p in q2.recentProgress)
    assert rows_in == 70, rows_in
    # overlap keys (80..99) upserted, not duplicated
    table = sink.read_back(spark)
    assert table.count() == 150
    assert table.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    # epoch ledger grew by one committed epoch per non-empty run
    ledger = os.listdir(os.path.join(sink.root, "_ledger"))
    assert len(ledger) >= 2
