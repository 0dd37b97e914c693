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


def test_metadata_stats_pushes_aggregates_to_parquet_footers(spark, sf_dir):
    """metadata_stats answers COUNT/MIN/MAX from footer statistics
    (PushedAggregation visible in the V2 plan) and agrees exactly with
    the full-scan answer; the engine session's confs are restored."""
    import os

    from pyspark.sql import functions as F

    from kafka_database_import_spark.operators.maintenance import metadata_stats

    path = os.path.join(sf_dir, "orders.parquet")
    before = spark.conf.get("spark.sql.sources.useV1SourceList", None)

    row = metadata_stats(spark, path, ["o_orderkey", "o_custkey"])
    full = (
        spark.read.parquet(path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("mn1"),
            F.max("o_orderkey").alias("mx1"),
            F.min("o_custkey").alias("mn2"),
            F.max("o_custkey").alias("mx2"),
        )
        .collect()[0]
    )
    assert (row.n, row.min_o_orderkey, row.max_o_orderkey) == (full.n, full.mn1, full.mx1)
    assert (row.min_o_custkey, row.max_o_custkey) == (full.mn2, full.mx2)
    assert spark.conf.get("spark.sql.sources.useV1SourceList", None) == before

    # the plan really pushes: rebuild under the V2 confs and inspect
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        plan = (
            spark.read.parquet(path)
            .agg(F.count(F.lit(1)), F.min("o_orderkey"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedAggregation: [COUNT(*), MIN(o_orderkey)]" in plan
    finally:
        if before is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", before)
        spark.conf.unset("spark.sql.parquet.aggregatePushdown")


def test_metadata_stats_by_partition_pushes_group_by(spark, sf_dir, tmp_path):
    """Grouped footer stats: GROUP BY a partition column pushes both
    the aggregation and the group-by to the scan (scan schema becomes
    [part, count(*), min(...)]) and agrees with the full-scan answer."""
    import os

    from pyspark.sql import functions as F

    from kafka_database_import_spark.operators.maintenance import (
        metadata_stats_by_partition,
    )

    d = str(tmp_path / "by_part")
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        (F.col("o_custkey") % 4).alias("p"), "o_orderkey"
    )
    src.write.partitionBy("p").mode("overwrite").parquet(d)

    rows = {r.p: (r.n, r.min_o_orderkey, r.max_o_orderkey)
            for r in metadata_stats_by_partition(spark, d, "p", ["o_orderkey"])}
    full = {
        r.p: (r.n, r.mn, r.mx)
        for r in spark.read.parquet(d)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("mn"),
             F.max("o_orderkey").alias("mx"))
        .collect()
    }
    assert rows == full and len(rows) == 4

    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        plan = (
            spark.read.parquet(d)
            .groupBy("p")
            .agg(F.count(F.lit(1)), F.min("o_orderkey"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "count(*)" in plan and "min(o_orderkey)" in plan and "BatchScan" in plan
        assert "PushedGroupBy: [p]" in plan or "PushedGroupBy" in plan
    finally:
        spark.conf.unset("spark.sql.sources.useV1SourceList")
        spark.conf.unset("spark.sql.parquet.aggregatePushdown")


def test_optimize_zorder_validates_columns_and_empty_table(spark, tmp_path):
    """ADVICE r6 (low): optimize(zorder_by=...) must refuse non-numeric
    clustering columns with a clear error and no-op cleanly on an empty
    table instead of TypeError-ing on collected None bounds."""
    import pytest as _pt

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "k long, v string, m long")
    )
    with _pt.raises(ValueError, match="numeric"):
        tbl.optimize(spark, zorder_by=("k", "v"))
    with _pt.raises(ValueError, match="not in table schema"):
        tbl.optimize(spark, zorder_by=("k", "nope"))

    # empty table: clean no-op, version unchanged
    empty = SnapshotTable(str(tmp_path / "e"))
    empty.commit(
        spark.createDataFrame([], "k long, m long")
    )
    v_before = empty.latest_version()
    res = empty.optimize(spark, zorder_by=("k", "m"))
    assert res["version"] == v_before
    assert empty.latest_version() == v_before


def test_expire_snapshots_time_based_retention(spark, tmp_path):
    """expire_snapshots(older_than_ms): versions at/before the cutoff
    drop (head always survives), reclaimed files disappear, expired
    time travel fails with a loud retained-window error, and the
    min_retained_version pin holds a lagging consumer's lineage."""
    import pytest as _pt

    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        expire_snapshots,
    )

    def build(root):
        t = SnapshotTable(root)
        for i in range(4):
            t.commit(
                spark.createDataFrame([(i, f"v{i}")], "k long, v string")
            )
        return t

    t = build(str(tmp_path / "a"))
    ts = {v: t.manifest(v)["committed_at_ms"] for v in t.versions()}
    res = expire_snapshots(t, older_than_ms=ts[2])  # expire v1, v2
    assert res["retained_versions"] == [3, 4]
    assert res["dropped_versions"] == 2
    # head state unaffected; expired time travel is loud
    assert t.read(spark).count() == 4
    with _pt.raises(FileNotFoundError, match="retention"):
        t.read(spark, 1)
    # cutoff in the future: everything but the head expires, head stays
    t2 = build(str(tmp_path / "b"))
    res2 = expire_snapshots(t2, older_than_ms=2 ** 60)
    assert res2["retained_versions"] == [4]
    assert t2.read(spark).count() == 4
    # lagging-consumer pin wins over the time cutoff
    t3 = build(str(tmp_path / "c"))
    ts3 = {v: t3.manifest(v)["committed_at_ms"] for v in t3.versions()}
    res3 = expire_snapshots(t3, older_than_ms=ts3[3], min_retained_version=2)
    assert res3["retained_versions"] == [2, 3, 4]
