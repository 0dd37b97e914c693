"""Partition spec on the snapshot table format: hive-layout writes,
manifest-recorded per-file partition tuples, partition-pruned planning
(reads, DML candidate selection, CDC apply), and partition EVOLUTION
(new spec applies to new files only; mixed-spec versions read and
prune correctly).

Plan-shape contract: pruning is pure manifest arithmetic and is
asserted through ``inputFiles()`` — a partition-filtered read must
plan ONLY matching files. Correctness contract: pruned results are
identical to ``read().filter(...)`` by construction (unrecorded files
conservatively kept, exact predicate re-applied)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    SchemaEvolutionError,
    SnapshotTable,
    StatsSnapshotTable,
    changes,
)

REGIONS = ["EU", "US", "AP"]


def _mkdf(spark, n=30, offset=0):
    return spark.createDataFrame(
        [(offset + i, f"u{i % 5}", REGIONS[i % 3]) for i in range(n)],
        "k long, v string, region string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_partitioned_commit_layout_and_manifest(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    df = _mkdf(spark)
    t.commit(df)
    m = t.manifest()
    assert m["partition_spec"] == ["region"]
    # hive layout on disk, partition tuple recorded per file
    assert all("__p_region=" in f for f in m["files"])
    fp = m["file_partitions"]
    assert set(fp) == set(m["files"])
    assert {e["region"] for e in fp.values()} == set(REGIONS)
    # partition columns are KEPT in the data: plain read is unchanged
    assert _rows(t.read(spark)) == _rows(df)


def test_partition_pruned_read_scans_only_matching_files(spark, tmp_path):
    """THE plan-shape test: a partition-filtered read plans only the
    matching partition's files — asserted via inputFiles, not just row
    values."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    df = _mkdf(spark, 60)
    t.commit(df)
    r = t.read_partition(spark, {"region": "EU"})
    planned, total = t.last_partition_counts
    assert planned < total
    files = r.inputFiles()
    assert files and all("__p_region=EU" in p for p in files)
    assert _rows(r) == _rows(df.filter(F.col("region") == "EU"))
    # IN-list filter
    r2 = t.read_partition(spark, {"region": ["EU", "US"]})
    assert all("__p_region=AP" not in p for p in r2.inputFiles())
    assert _rows(r2) == _rows(df.filter(F.col("region").isin("EU", "US")))


def test_partition_null_values_round_trip(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    df = spark.createDataFrame(
        [(1, "a", "EU"), (2, "b", None), (3, "c", None)],
        "k long, v string, region string",
    )
    t.commit(df)
    fp = t.manifest()["file_partitions"]
    assert any(e["region"] is None for e in fp.values())
    r = t.read_partition(spark, {"region": None})
    assert _rows(r) == [(2, "b", None), (3, "c", None)]
    assert all("__HIVE_DEFAULT_PARTITION__" in p for p in r.inputFiles())


def test_int_partition_values_typed_in_manifest(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["bucket"])
    t.commit(
        spark.createDataFrame([(i, i % 4) for i in range(20)],
                              "k long, bucket int")
    )
    fp = t.manifest()["file_partitions"]
    assert all(isinstance(e["bucket"], int) for e in fp.values())
    r = t.read_partition(spark, {"bucket": 2})
    assert r.count() == 5
    assert all("__p_bucket=2" in p for p in r.inputFiles())


def test_float_partition_column_refused(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["x"])
    with pytest.raises(ValueError, match="lossy"):
        t.commit(spark.createDataFrame([(1, 1.5)], "k long, x double"))
    t2 = SnapshotTable(str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame([(1, 1.5)], "k long, x double"))
    with pytest.raises(ValueError, match="lossy"):
        t2.set_partition_spec(["x"])


def test_delete_where_partition_filter_prunes_candidates(spark, tmp_path):
    """The retention/GDPR shape: a delete scoped to one partition
    rewrites only that partition's affected file(s); every other
    partition's files are carried by reference — and the result is
    exactly the unpruned delete's."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    df = _mkdf(spark, 60)
    t.commit(df)
    n_files = len(t.manifest()["files"])
    res = t.delete_where(
        spark, "region = 'US' AND k < 10", partition_filter={"region": "US"}
    )
    assert res["deleted_rows"] == df.filter(
        (F.col("region") == "US") & (F.col("k") < 10)
    ).count()
    # only US files were even candidates; kept >= all non-US files
    assert res["rewritten_files"] <= n_files // 3 + 1
    assert _rows(t.read(spark)) == _rows(
        df.filter(~((F.col("region") == "US") & (F.col("k") < 10)))
    )


def test_update_and_overwrite_where_accept_partition_filter(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    df = _mkdf(spark, 30)
    t.commit(df)
    t.update_where(
        spark,
        "region = 'EU'",
        {"v": F.lit("eu!")},
        partition_filter={"region": "EU"},
    )
    got = t.read(spark)
    assert got.filter("region = 'EU' AND v != 'eu!'").count() == 0
    assert got.filter("region != 'EU' AND v = 'eu!'").count() == 0
    t.overwrite_where(
        spark,
        "region = 'AP'",
        spark.createDataFrame([(999, "ap", "AP")],
                              "k long, v string, region string"),
        partition_filter={"region": "AP"},
    )
    assert _rows(t.read(spark).filter("region = 'AP'")) == [(999, "ap", "AP")]


def test_partition_evolution_new_files_only(spark, tmp_path):
    """set_partition_spec is metadata-only: existing files keep their
    old-spec tuples (pruned conservatively), new files land under the
    new spec, mixed-spec reads and pruned reads stay exact."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    df1 = _mkdf(spark, 30)
    t.commit(df1)
    files_v1 = set(t.manifest()["files"])
    v = t.set_partition_spec(["v"])
    assert t.manifest(v)["mode"] == "set_partition_spec"
    assert t.manifest(v)["files"] == t.manifest(v - 1)["files"]  # no rewrite
    df2 = spark.createDataFrame(
        [(100 + i, f"u{i % 5}", "EU") for i in range(10)],
        "k long, v string, region string",
    )
    t.commit(df2)
    m = t.manifest()
    assert m["partition_spec"] == ["v"]
    new_files = [f for f in m["files"] if f not in files_v1]
    assert new_files and all("__p_v=" in f for f in new_files)
    # old files unchanged on disk and still in the manifest
    assert files_v1 <= set(m["files"])
    # pruning on the NEW spec: old files conservatively kept, new files
    # pruned by value; result exact either way
    r = t.read_partition(spark, {"v": "u0"})
    expect = _rows(df1.union(df2).filter(F.col("v") == "u0"))
    assert _rows(r) == expect
    assert all("__p_v=u0" in p or "__p_region=" in p for p in r.inputFiles())
    # pruning on the OLD spec column still prunes old files
    r2 = t.read_partition(spark, {"region": "AP"})
    assert all("__p_region=AP" in p or "__p_v=" in p for p in r2.inputFiles())
    assert _rows(r2) == _rows(df1.union(df2).filter(F.col("region") == "AP"))


def test_partition_spec_change_transparent_to_changes_stream(spark, tmp_path):
    """A spec change rewrites nothing and changes no rows — batch
    changes() lineage passes through it like a rewrite-only commit."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "a", "EU")],
                                   "k long, v string, region string"))
    t.set_partition_spec(["region"])                       # v2, metadata
    t.commit(spark.createDataFrame([(2, "b", "US")],
                                   "k long, v string, region string"))  # v3
    delta = changes(t, spark, from_version=1)
    assert _rows(delta) == [(2, "b", "US")]


def test_apply_changes_prunes_candidates_by_batch_partitions(spark, tmp_path):
    """CDC candidate selection: with the spec a subset of the merge
    key, the affected-file discovery scans only the partitions present
    in the batch (plus unrecorded files)."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    t.commit(
        spark.createDataFrame(
            [(i, REGIONS[i % 3], i) for i in range(30)],
            "k long, region string, seq long",
        )
    )
    batch = spark.createDataFrame(
        [(0, "EU", 100, "upsert"), (3, "EU", 100, "delete")],
        "k long, region string, seq long, _op string",
    )
    t.apply_changes(spark, batch, ["k", "region"], seq_col="seq")
    planned, total = t.last_apply_candidates
    assert planned < total
    got = _rows(t.read(spark))
    assert (0, "EU", 100) in got
    assert not any(r[0] == 3 and r[1] == "EU" for r in got)
    # keys outside the key-subset rule: partition col NOT in key → no
    # pruning (a key could live anywhere), still correct
    t2 = SnapshotTable(str(tmp_path / "t2"), partition_by=["region"])
    t2.commit(
        spark.createDataFrame(
            [(i, REGIONS[i % 3], i) for i in range(9)],
            "k long, region string, seq long",
        )
    )
    b2 = spark.createDataFrame(
        [(1, "US", 100, "upsert")], "k long, region string, seq long, _op string"
    )
    t2.apply_changes(spark, b2, ["k"], seq_col="seq")
    assert t2.last_apply_candidates[0] == t2.last_apply_candidates[1]
    assert (1, "US", 100) in _rows(t2.read(spark))


def test_rename_remaps_partition_state_and_drop_refuses(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    t.commit(_mkdf(spark, 12))
    t.rename_column("region", "zone")
    m = t.manifest()
    assert m["partition_spec"] == ["zone"]
    assert all("zone" in e for e in m["file_partitions"].values())
    r = t.read_partition(spark, {"zone": "EU"})
    assert r.count() > 0
    assert all("__p_region=EU" in p for p in r.inputFiles())  # old dirs OK
    with pytest.raises(SchemaEvolutionError, match="partition column"):
        t.drop_column("zone")


def test_stats_table_composes_with_partitioning(spark, tmp_path):
    t = StatsSnapshotTable(
        str(tmp_path / "t"), stats_cols=["k"], partition_by=["region"]
    )
    df = _mkdf(spark, 30)
    t.commit(df)
    m = t.manifest()
    assert m["partition_spec"] == ["region"]
    assert set(m["stats"]) == set(m["files"])
    assert set(m["file_partitions"]) == set(m["files"])
    # both pruning modes work on the same table
    r = t.read_partition(spark, {"region": "EU"})
    assert _rows(r) == _rows(df.filter(F.col("region") == "EU"))
    r2 = t.read_pruned(spark, "k", 0, 5)
    assert _rows(r2) == _rows(df.filter(F.col("k").between(0, 5)))


def test_partitioned_compaction_preserves_layout(spark, tmp_path):
    """optimize_small_files / optimize on a partitioned table write
    their rewrites under the spec — compaction output files carry
    partition tuples and stay prunable."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    for i in range(3):  # many small files
        t.commit(_mkdf(spark, 6, offset=i * 100))
    before = _rows(t.read(spark))
    t.optimize(spark, target_files=2)
    m = t.manifest()
    assert m["partition_spec"] == ["region"]
    assert all("__p_region=" in f for f in m["files"])
    assert set(m["file_partitions"]) == set(m["files"])
    assert _rows(t.read(spark)) == before
    r = t.read_partition(spark, {"region": "US"})
    assert all("__p_region=US" in p for p in r.inputFiles())
    assert _rows(r) == [x for x in before if x[2] == "US"]


def test_missing_partition_column_in_write_is_loud(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    t.commit(_mkdf(spark, 6))
    with pytest.raises(ValueError, match="missing"):
        t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))


def test_changes_stream_tails_partitioned_table(spark, tmp_path):
    """The streaming changes source over a PARTITIONED table: added
    files live in nested hive dirs; the per-file partition planning and
    the by-name projection must deliver them unchanged (partition
    columns ride IN the data files by design)."""
    import time

    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import register

    register(spark)
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, partition_by=["r"])
    t.commit(spark.createDataFrame(
        [(1, "EU"), (2, "US")], "k long, r string"))
    name = "kdis_part_stream"
    q = (
        spark.readStream.format("kdis_snapshot_changes")
        .option("path", root)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.table(name).count() >= 2:
                break
            time.sleep(0.3)
        t.commit(spark.createDataFrame([(3, "AP")], "k long, r string"))
        while time.monotonic() < deadline:
            if spark.table(name).count() >= 3:
                break
            time.sleep(0.3)
        got = sorted((r["k"], r["r"]) for r in spark.table(name).collect())
        assert got == [(1, "EU"), (2, "US"), (3, "AP")]
    finally:
        q.stop()


def test_apply_changes_keeps_old_spec_files_after_evolution(spark, tmp_path):
    """Regression (caught round 7): candidate pruning after partition
    EVOLUTION. A file written under spec [region] has no 'v' in its
    recorded tuple; once the spec evolves to [v] (⊆ merge key), the
    pruner must KEEP that file conservatively — `e.get(c)` semantics
    pruned it, so the upsert appended instead of superseding and the
    key duplicated."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["region"])
    t.commit(spark.createDataFrame(
        [(1, "a", "EU"), (2, "b", "US")], "k long, v string, region string"))
    t.set_partition_spec(["v"])
    ch = spark.createDataFrame(
        [(1, "a", "AP", "upsert")],
        "k long, v string, region string, _op string")
    r = t.apply_changes(spark, ch, key_cols=["k", "v"], mode="cow")
    assert r["rewritten_files"] == 1
    assert _rows(t.read(spark)) == [(1, "a", "AP"), (2, "b", "US")]


# ---------------------------------------------------------------------------
# Partition TRANSFORMS (hidden partitioning): callers filter on the
# source column; pruning maps literals through the transform.
# ---------------------------------------------------------------------------

import datetime as _dt


def _dates_df(spark, n=24):
    # two rows per month over a year, k increasing
    rows = [
        (i, _dt.date(2024, 1 + (i // 2) % 12, 1 + 13 * (i % 2)), f"s{i:03d}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "k long, d date, v string")


def test_month_transform_layout_equality_and_range_pruning(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["month(d)"])
    df = _dates_df(spark)
    t.commit(df)
    m = t.manifest()
    assert m["partition_spec"] == ["month(d)"]
    assert all("__p_d_month=" in f for f in m["files"])
    assert {e["d_month"] for e in m["file_partitions"].values()} == {
        f"2024-{mm:02d}" for mm in range(1, 13)
    }
    # HIDDEN partitioning: equality on the SOURCE column prunes to the
    # month's single file and returns exactly the matching rows
    got = t.read_partition(spark, {"d": _dt.date(2024, 3, 14)})
    assert t.last_partition_counts[0] == 1
    assert _rows(got) == _rows(df.filter(F.col("d") == "2024-03-14"))
    # Between on the source column prunes to the covered months
    from kafka_database_import_spark.sources.snapshot import Between

    got = t.read_partition(spark, {"d": Between("2024-02-01", "2024-04-30")})
    assert t.last_partition_counts[0] == 3
    assert _rows(got) == _rows(
        df.filter((F.col("d") >= "2024-02-01") & (F.col("d") <= "2024-04-30"))
    )


def test_bucket_transform_prunes_and_matches_jvm_hash(spark, tmp_path):
    """bucket(N, col): the driver-side zlib.crc32 mapping must land on
    the same bucket the JVM's F.crc32 wrote — asserted by pruning to
    ONE bucket file and still returning every matching row, for int
    AND string sources."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["bucket(4, k)"])
    df = _dates_df(spark)
    t.commit(df)
    m = t.manifest()
    assert all("__p_k_bucket4=" in f for f in m["files"])
    for k in (0, 7, 23):
        got = t.read_partition(spark, {"k": k})
        assert t.last_partition_counts[0] == 1
        assert _rows(got) == _rows(df.filter(F.col("k") == k))
    # range on a bucket source prunes nothing but stays correct
    from kafka_database_import_spark.sources.snapshot import Between

    got = t.read_partition(spark, {"k": Between(5, 9)})
    assert t.last_partition_counts[0] == t.last_partition_counts[1]
    assert _rows(got) == _rows(df.filter(F.col("k").between(5, 9)))

    ts = SnapshotTable(str(tmp_path / "ts"), partition_by=["bucket(3, v)"])
    ts.commit(df)
    got = ts.read_partition(spark, {"v": "s007"})
    assert ts.last_partition_counts[0] == 1
    assert _rows(got) == _rows(df.filter(F.col("v") == "s007"))


def test_truncate_transform_int_and_string(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["truncate(10, k)"])
    df = _dates_df(spark)
    t.commit(df)
    assert all("__p_k_truncate10=" in f for f in t.manifest()["files"])
    got = t.read_partition(spark, {"k": 17})
    assert t.last_partition_counts[0] == 1
    assert _rows(got) == _rows(df.filter(F.col("k") == 17))
    from kafka_database_import_spark.sources.snapshot import Between

    got = t.read_partition(spark, {"k": Between(8, 12)})  # spans 0 and 10
    assert t.last_partition_counts[0] == 2
    assert _rows(got) == _rows(df.filter(F.col("k").between(8, 12)))

    ts = SnapshotTable(str(tmp_path / "ts"), partition_by=["truncate(2, v)"])
    ts.commit(spark.createDataFrame(
        [(1, "alpha"), (2, "alto"), (3, "beta")], "k long, v string"))
    got = ts.read_partition(spark, {"v": "alto"})
    assert ts.last_partition_counts == (1, 2)
    assert _rows(got) == [(2, "alto")]


def test_year_transform_and_composite_spec(spark, tmp_path):
    rows = [(i, _dt.date(2020 + i % 3, 1 + i % 12, 5), REGIONS[i % 3])
            for i in range(18)]
    df = spark.createDataFrame(rows, "k long, d date, region string")
    t = SnapshotTable(
        str(tmp_path / "t"), partition_by=["year(d)", "region"]
    )
    t.commit(df)
    m = t.manifest()
    assert all("__p_d_year=" in f and "__p_region=" in f for f in m["files"])
    got = t.read_partition(spark, {"d": "2021-06-05", "region": "EU"})
    assert t.last_partition_counts[0] < t.last_partition_counts[1]
    assert _rows(got) == _rows(
        df.filter((F.year("d") == 2021) & (F.col("region") == "EU")
                  & (F.col("d") == "2021-06-05"))
    )


def test_transform_spec_validation(spark, tmp_path):
    df = _dates_df(spark, 4)
    for bad, msg in [
        (["month(k)"], "date/timestamp"),
        (["bucket(4, d)"], None),        # date IS allowed for bucket
        (["truncate(3, d)"], "int/string"),
        (["bucket(0, k)"], "N > 0"),
        (["month(2, d)"], "one column"),
        (["month(nope)"], None),         # KeyError
    ]:
        t = SnapshotTable(str(tmp_path / f"x{abs(hash(str(bad)))}"),
                          partition_by=bad)
        if bad == ["bucket(4, d)"]:
            t.commit(df)  # allowed
            continue
        with pytest.raises((ValueError, KeyError)) as ei:
            t.commit(df)
        if msg:
            assert msg in str(ei.value)
    # bucket() without a width is rejected at parse time
    t2 = SnapshotTable(str(tmp_path / "t2"), partition_by=["bucket(k)"])
    with pytest.raises(ValueError, match="width"):
        t2.commit(df)
    # a transform field name colliding with a real column is refused
    df2 = _dates_df(spark, 4).withColumn("d_month", F.lit("x"))
    t3 = SnapshotTable(str(tmp_path / "t3"), partition_by=["month(d)"])
    with pytest.raises(ValueError, match="collides"):
        t3.commit(df2)


def test_transform_evolution_rename_and_apply_changes(spark, tmp_path):
    """identity -> month evolution, rename of the transform's source,
    and CDC candidate pruning through a bucket spec."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["v"])
    df = _dates_df(spark, 8)
    t.commit(df)
    t.set_partition_spec(["month(d)"])
    t.commit(_dates_df(spark, 8).withColumn("k", F.col("k") + 100))
    # filter on d: new files prune by month, old identity-[v] files
    # are conservatively kept
    got = t.read_partition(spark, {"d": _dt.date(2024, 2, 1)})
    planned, total = t.last_partition_counts
    assert planned < total
    both = df.union(_dates_df(spark, 8).withColumn("k", F.col("k") + 100))
    assert _rows(got) == _rows(both.filter(F.col("d") == "2024-02-01"))
    # rename the transform source: spec entry and tuple keys remap
    t_ids = SnapshotTable(str(tmp_path / "tid"), partition_by=["month(d)"])
    t_ids.commit(df)  # fresh table -> field ids present
    t_ids.rename_column("d", "event_d")
    m = t_ids.manifest()
    assert m["partition_spec"] == ["month(event_d)"]
    assert all("event_d_month" in e for e in m["file_partitions"].values())
    got = t_ids.read_partition(spark, {"event_d": "2024-03-01"})
    assert t_ids.last_partition_counts[0] == 1
    # dropping the source of a transform is refused
    with pytest.raises(SchemaEvolutionError, match="partition column"):
        t_ids.drop_column("event_d")
    # CDC candidate pruning maps key values through bucket()
    tb = SnapshotTable(str(tmp_path / "tb"), partition_by=["bucket(4, k)"])
    tb.commit(_dates_df(spark, 16))
    ch = spark.createDataFrame(
        [(3, _dt.date(2030, 1, 1), "upd", "upsert")],
        "k long, d date, v string, _op string")
    tb.apply_changes(spark, ch, key_cols=["k"], mode="cow")
    planned, total = tb.last_apply_candidates
    assert planned < total
    got = _rows(tb.read(spark))
    assert (3, _dt.date(2030, 1, 1), "upd") in got
    assert len([r for r in got if r[0] == 3]) == 1


def test_zorder_optimize_on_transform_partitioned_table(spark, tmp_path):
    """optimize(zorder_by=...) on a TRANSFORM-partitioned table: the
    range-distribution must compute the transform expressions (it used
    to F.col() the raw spec strings, which only worked for identity),
    the rewrite keeps the hive layout, and rows survive exactly."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["month(d)"])
    df = _dates_df(spark, 48).withColumn("m", F.col("k") * 7 % 13)
    t.commit(df)
    df2 = df.withColumn("k", F.col("k") + 1000)
    t.commit(df2)
    res = t.optimize(spark, zorder_by=("k", "m"), target_files=4)
    assert res["files_after"] <= res["files_before"]
    m = t.manifest()
    assert all("__p_d_month=" in f for f in m["files"])
    both = df.union(df2)
    assert _rows(t.read(spark)) == _rows(both)
    # pruning still works over the rewritten layout
    t.read_partition(spark, {"d": _dt.date(2024, 5, 1)})
    assert t.last_partition_counts[0] < t.last_partition_counts[1]


def test_optimize_small_files_partition_scoped(spark, tmp_path):
    """Scoped compaction: only the filtered partition's small files
    are rewritten; every other partition's files are carried BY
    REFERENCE (same path strings in the new manifest)."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["month(d)"])
    t.commit(_dates_df(spark, 24))
    march = _dates_df(spark, 24).filter(F.col("d").between(
        "2024-03-01", "2024-03-31"))
    for i in range(3):  # three 2-row files in 2024-03 only
        t.commit(march.withColumn("k", F.col("k") + 100 * (i + 1)))
    m0 = t.manifest()
    non_march = sorted(
        f for f in m0["files"] if "__p_d_month=2024-03" not in f
    )
    from kafka_database_import_spark.sources.snapshot import Between

    res = t.optimize_small_files(
        spark, small_file_rows=10,
        partition_filter={"d": Between("2024-03-01", "2024-03-31")},
    )
    assert res["compacted_files"] >= 3
    m1 = t.manifest()
    assert sorted(
        f for f in m1["files"] if "__p_d_month=2024-03" not in f
    ) == non_march  # untouched partitions carried by reference
    want = _rows(_dates_df(spark, 24)) + sorted(
        tuple(r)
        for i in range(3)
        for r in march.withColumn("k", F.col("k") + 100 * (i + 1)).collect()
    )
    assert _rows(t.read(spark)) == sorted(want)


def test_optimize_partition_scoped_rewrite_only(spark, tmp_path):
    """optimize(partition_filter=...): a copy-on-write rewrite of only
    the matching partition, rewrite-only (transparent to change
    lineage), rows exactly preserved, pruning recorded."""
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["month(d)"])
    df = _dates_df(spark, 48)
    t.commit(df)
    df2 = _dates_df(spark, 48).withColumn("k", F.col("k") + 1000)
    t.commit(df2)
    non_target = sorted(
        f for f in t.manifest()["files"] if "__p_d_month=2024-05" not in f
    )
    res = t.optimize(
        spark, partition_filter={"d": _dt.date(2024, 5, 1)}, target_files=1
    )
    planned, total = t.last_partition_counts
    assert planned == res["rewritten_files"] == 2  # one file per commit
    assert planned < total
    m1 = t.manifest()
    assert sorted(
        f for f in m1["files"] if "__p_d_month=2024-05" not in f
    ) == non_target
    assert m1["rewrite_only"] is True
    both = df.union(df2)
    assert _rows(t.read(spark)) == _rows(both)
    # scoped zorder variant on an identity-partitioned table
    t2 = SnapshotTable(str(tmp_path / "t2"), partition_by=["region"])
    base = _dates_df(spark, 48).withColumn(
        "region", F.concat(F.lit("R"), (F.col("k") % 2).cast("string"))
    ).withColumn("m", F.col("k") * 7 % 13)
    t2.commit(base)
    t2.commit(base.withColumn("k", F.col("k") + 500))
    res2 = t2.optimize(
        spark, zorder_by=("k", "m"), target_files=2,
        partition_filter={"region": "R1"},
    )
    assert res2["rewritten_files"] == 2
    assert _rows(t2.read(spark)) == _rows(
        base.union(base.withColumn("k", F.col("k") + 500))
    )
