"""Small-file compaction (operators/maintenance.py): file count drops,
content is byte-for-byte preserved, and the swap is observed atomically
by a subsequent reader."""

from __future__ import annotations

import os
import tempfile

from kafka_database_import_spark.operators.maintenance import compact_parquet
from kafka_database_import_spark.sources.readers import load_table


def test_compaction_preserves_content(spark, sf_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="kdis_compact_"), "events")
    src = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    src.repartition(40).write.parquet(path)  # simulate a small-file mess
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    stats = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]

    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_compaction_noop_below_min_files(spark, sf_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="kdis_compact_"), "one")
    load_table(spark, sf_dir, "nation").coalesce(1).write.parquet(path)
    stats = compact_parquet(spark, path)
    assert stats["files_before"] == stats["files_after"] == 1


def test_write_partitioned_dynamic_overwrite_touches_only_written(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.operators.maintenance import write_partitioned

    path = str(tmp_path / "t")
    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    write_partitioned(base, path, partition_by=["p"])
    assert spark.read.parquet(path).count() == 100

    # Rewrite ONLY partition p=1 with half its rows; p=0/2/3 must survive.
    patch = base.filter((F.col("p") == 1) & (F.col("id") < 50))
    write_partitioned(patch, path, partition_by=["p"], dynamic_overwrite=True)
    got = spark.read.parquet(path)
    assert got.filter("p = 1").count() == patch.count()
    assert got.filter("p != 1").count() == 75

    # Static overwrite semantics (the default) replace the whole table.
    write_partitioned(patch, path, partition_by=["p"])
    assert spark.read.parquet(path).count() == patch.count()


def test_write_partitioned_respects_max_records_per_file(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from kafka_database_import_spark.operators.maintenance import write_partitioned

    path = str(tmp_path / "t")
    df = spark.range(1000).select(F.col("id"), F.lit("a").alias("p"))
    write_partitioned(df, path, partition_by=["p"], max_records_per_file=100)
    files = [
        f
        for f in os.listdir(os.path.join(path, "p=a"))
        if f.endswith(".parquet")
    ]
    assert len(files) >= 10
    assert spark.read.parquet(path).count() == 1000
