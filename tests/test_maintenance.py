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
