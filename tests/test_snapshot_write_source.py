"""Write side of the snapshot Python DataSource
(sources/snapshot_batch.py): ``df.write.format("kdis_snapshot")`` and
``df.writeStream.format("kdis_snapshot")`` publish REAL snapshot
versions — byte-compatible manifests (atomic link, field-id schema
JSON, footer stats), optional bloom sidecars — so everything written
here reads, DMLs, and time-travels through every existing
SnapshotTable path. Schema evolution is opt-in via
``option("mergeSchema", "true")`` (same rules as SnapshotTable.commit);
an active partition spec is honored with commit-identical manifest
tuples; type changes and streaming overwrite fail loudly at plan
time."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    SnapshotTable,
    _build_bloom_sidecar,
)
from kafka_database_import_spark.sources.snapshot_batch import (
    SnapshotBatchDataSource,
    register,
)


def _write(df, root, mode="append", **opts):
    register(df.sparkSession)
    w = df.write.format("kdis_snapshot").option("path", root)
    for k, v in opts.items():
        w = w.option(k, str(v))
    w.mode(mode).save()


def _ks(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "cast(id % 5 as string) AS s"
    )


def _arrow_batches(df):
    return iter(df.toArrow().to_batches())


def test_fresh_table_appends_read_via_snapshot_table(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(_ks(spark, 0, 50), root)
    _write(_ks(spark, 50, 80), root)
    tbl = SnapshotTable(root)
    assert tbl.latest_version() == 2
    back = tbl.read(spark)
    assert back.count() == 80
    assert sorted(r["k"] for r in back.collect()) == list(range(80))


def test_fresh_table_mints_field_ids_and_stats(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(_ks(spark, 0, 50), root)
    m = SnapshotTable(root).manifest()
    ids = {
        f["name"]: f["metadata"]["parquet.field.id"]
        for f in json.loads(m["schema"])["fields"]
    }
    assert ids == {"k": 1, "s": 2}
    # every file carries _nrows/_bytes and a numeric k range
    for f in m["files"]:
        st = m["stats"][f]
        assert st["_nrows"] > 0 and st["_bytes"] > 0
        assert st["k"][0] >= 0 and st["k"][1] <= 79


def test_dml_and_time_travel_on_ds_written_table(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(_ks(spark, 0, 50), root)
    tbl = SnapshotTable(root)
    tbl.delete_where(spark, F.col("k") < 10)
    assert tbl.read(spark).count() == 40
    assert tbl.read(spark, version=1).count() == 50  # time travel intact


def test_overwrite_replaces_and_append_to_existing_table(spark, tmp_path):
    root = str(tmp_path / "t")
    tbl = SnapshotTable(root)
    tbl.commit(_ks(spark, 0, 30))  # table born via SnapshotTable
    _write(_ks(spark, 30, 40), root)  # ds append interops
    assert tbl.read(spark).count() == 40
    _write(_ks(spark, 0, 5), root, mode="overwrite")
    assert tbl.read(spark).count() == 5
    assert tbl.manifest()["mode"] == "overwrite"


def test_schema_evolution_refused_without_merge_option(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(_ks(spark, 0, 10), root)
    bad = spark.range(5).selectExpr("id AS k", "id AS brand_new")
    with pytest.raises(Exception, match="schema"):
        _write(bad, root)
    retyped = spark.range(5).selectExpr("cast(id as int) AS k")
    with pytest.raises(Exception, match="schema"):
        _write(retyped, root)
    # overwrite requires the full column set
    with pytest.raises(Exception, match="schema"):
        _write(spark.range(5).selectExpr("id AS k"), root, mode="overwrite")
    assert SnapshotTable(root).latest_version() == 1  # nothing landed


def test_subset_append_reads_missing_column_as_null(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(_ks(spark, 0, 10), root)
    _write(spark.range(100, 105).selectExpr("id AS k"), root)
    got = SnapshotTable(root).read(spark).filter("k >= 100")
    assert got.count() == 5 and got.filter("s IS NULL").count() == 5


def test_merge_schema_adds_column_with_fresh_field_id(spark, tmp_path):
    """option("mergeSchema","true"): a new column appends under
    SnapshotTable.commit's exact evolution rules — fresh field id,
    stable ids for existing columns, old rows read NULL, and the
    resulting schema JSON is byte-identical to what commit() on a twin
    table produces (the two evolution paths can never drift)."""
    ds_root, st_root = str(tmp_path / "ds"), str(tmp_path / "st")
    first = _ks(spark, 0, 10)
    evolved = spark.range(10, 15).selectExpr(
        "id AS k", "cast(id % 5 as string) AS s", "id * 2 AS extra"
    )
    _write(first, ds_root)
    _write(evolved, ds_root, mergeSchema="true")
    twin = SnapshotTable(st_root)
    twin.commit(first)
    twin.commit(evolved)
    m_ds, m_st = SnapshotTable(ds_root).manifest(), twin.manifest()
    assert m_ds["schema"] == m_st["schema"]  # byte-compatible evolution
    ids = {
        f["name"]: f["metadata"]["parquet.field.id"]
        for f in json.loads(m_ds["schema"])["fields"]
    }
    assert ids == {"k": 1, "s": 2, "extra": 3}
    back = SnapshotTable(ds_root).read(spark)
    assert back.count() == 15
    assert back.filter("extra IS NULL").count() == 10  # old files: NULL
    assert back.filter("extra = 28").count() == 1
    # time travel still reads v1 under the ORIGINAL two-column schema
    assert SnapshotTable(ds_root).read(spark, version=1).columns == ["k", "s"]


def test_merge_schema_widens_and_refuses_type_change(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(spark.range(10).selectExpr("cast(id as int) AS k"), root)
    # safe widening int -> bigint keeps the field id
    _write(
        spark.range(10, 15).selectExpr("id AS k"), root, mergeSchema="true"
    )
    m = SnapshotTable(root).manifest()
    [field] = json.loads(m["schema"])["fields"]
    assert field["type"] == "long"
    assert field["metadata"]["parquet.field.id"] == 1
    assert SnapshotTable(root).read(spark).count() == 15
    # narrower incoming side still reads (bigint column accepts int files)
    _write(
        spark.range(15, 20).selectExpr("cast(id as int) AS k"),
        root,
        mergeSchema="true",
    )
    got = SnapshotTable(root).read(spark)
    assert sorted(r["k"] for r in got.collect()) == list(range(20))
    # a genuine type CHANGE refuses even with mergeSchema
    with pytest.raises(Exception, match="type CHANGE"):
        _write(
            spark.range(3).selectExpr("cast(id as string) AS k"),
            root,
            mergeSchema="true",
        )


def test_partitioned_append_matches_commit_written_twin(spark, tmp_path):
    """The declarative writer honors an identity partition spec: the
    manifest records the same typed partition tuples commit() records,
    the files land hive-style, and partition-pruned scans of the two
    tables plan identically."""
    ds_root, st_root = str(tmp_path / "ds"), str(tmp_path / "st")
    for root in (ds_root, st_root):
        SnapshotTable(root, partition_by=["s"]).commit(_ks(spark, 0, 10))
    _write(_ks(spark, 10, 40).repartition(2, F.col("s")), ds_root)
    SnapshotTable(st_root).commit(_ks(spark, 10, 40))
    ds_tbl, st_tbl = SnapshotTable(ds_root), SnapshotTable(st_root)
    assert sorted(
        (r["k"], r["s"]) for r in ds_tbl.read(spark).collect()
    ) == sorted((r["k"], r["s"]) for r in st_tbl.read(spark).collect())
    m = ds_tbl.manifest()
    assert m.get("partition_spec") == ["s"]  # spec carried through
    fp = m["file_partitions"]
    assert set(fp) == set(m["files"])  # every file has its tuple
    assert {tuple(sorted(d.items())) for d in fp.values()} == {
        (("s", str(v)),) for v in range(5)
    }
    # hive-style layout for the writer's files
    assert any("__p_s=" in f for f in m["files"])
    # partition-scoped DML prunes identically on both tables
    for tbl in (ds_tbl, st_tbl):
        res = tbl.delete_where(
            spark, "k >= 0", partition_filter={"s": "3"}
        )
        assert res["deleted_rows"] == 8
    assert sorted(
        (r["k"], r["s"]) for r in ds_tbl.read(spark).collect()
    ) == sorted((r["k"], r["s"]) for r in st_tbl.read(spark).collect())


def test_partitioned_append_prunes_via_batch_source(spark, tmp_path):
    root = str(tmp_path / "t")
    SnapshotTable(root, partition_by=["s"]).commit(_ks(spark, 0, 10))
    _write(_ks(spark, 10, 40), root)
    rpt = str(tmp_path / "plan.json")
    out = (
        spark.read.format("kdis_snapshot")
        .option("path", root)
        .option("planReportPath", rpt)
        .load()
        .filter(F.col("s") == "2")
    )
    assert sorted(r["k"] for r in out.collect()) == [
        k for k in range(40) if k % 5 == 2
    ]
    plan = json.load(open(rpt))
    assert plan["planned"] < plan["total"], plan


def test_partitioned_transform_append_parity(spark, tmp_path):
    """Transformed specs (month(d), bucket(4, k)): the writer's Python
    value mirror must agree with the table's write expressions — the
    twin tables' manifests record the same tuple-value sets, and a
    source-column filter prunes the ds-written files."""
    ds_root, st_root = str(tmp_path / "ds"), str(tmp_path / "st")
    df = spark.range(200).selectExpr(
        "id AS k",
        "date_add(date'2024-01-01', cast(id % 90 as int)) AS d",
    )
    for root in (ds_root, st_root):
        SnapshotTable(
            root, partition_by=["month(d)", "bucket(4, k)"]
        ).commit(df.filter("k < 100"))
    _write(df.filter("k >= 100"), ds_root)
    SnapshotTable(st_root).commit(df.filter("k >= 100"))
    ds_m = SnapshotTable(ds_root).manifest()
    st_m = SnapshotTable(st_root).manifest()
    tuples = lambda m: {
        tuple(sorted(d.items())) for d in m["file_partitions"].values()
    }
    assert tuples(ds_m) == tuples(st_m)
    assert set(ds_m["file_partitions"]) == set(ds_m["files"])
    # hidden-partitioning prune on the SOURCE column, ds-written table
    got = SnapshotTable(ds_root).read_partition(spark, {"d": "2024-02-10"})
    want = sorted(
        r["k"]
        for r in df.filter("d = date'2024-02-10'").collect()
    )
    assert sorted(r["k"] for r in got.collect()) == want


def test_fresh_table_born_partitioned_via_writer(spark, tmp_path):
    """option("partitionBy", ...) on a FRESH table mints the canonical
    spec in the first manifest — SnapshotTable then writes, prunes, and
    DMLs it exactly as one of its own partitioned tables."""
    root = str(tmp_path / "t")
    df = spark.range(60).selectExpr(
        "id AS k",
        "cast(id % 5 as string) AS s",
        "date_add(date'2024-01-01', cast(id % 75 as int)) AS d",
    )
    _write(df, root, partitionBy="s, month(d)")
    tbl = SnapshotTable(root)
    m = tbl.manifest()
    assert m["partition_spec"] == ["s", "month(d)"]  # canonical entries
    assert set(m["file_partitions"]) == set(m["files"])
    # a SnapshotTable commit continues the spec seamlessly
    tbl.commit(
        spark.range(60, 90).selectExpr(
            "id AS k",
            "cast(id % 5 as string) AS s",
            "date_add(date'2024-01-01', cast(id % 75 as int)) AS d",
        )
    )
    got = tbl.read_partition(spark, {"s": "2"})
    assert sorted(r["k"] for r in got.collect()) == [
        k for k in range(90) if k % 5 == 2
    ]
    planned, total = tbl.last_partition_counts
    assert planned < total
    # mismatched partitionBy on the existing table refuses loudly
    with pytest.raises(Exception, match="active spec"):
        _write(df, root, partitionBy="s")
    # invalid transform/type pairings refuse at plan time
    with pytest.raises(Exception, match="date/timestamp"):
        _write(df, str(tmp_path / "t2"), partitionBy="month(s)")
    with pytest.raises(Exception, match="needs a width"):
        _write(df, str(tmp_path / "t3"), partitionBy="bucket(k)")


def test_fresh_partitioned_streaming_sink(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    spark.range(40).selectExpr(
        "id AS k", "cast(id % 3 as string) AS s"
    ).write.parquet(os.path.join(src, "a"))
    q = (
        spark.readStream.schema("k bigint, s string")
        .parquet(src + "/*")
        .writeStream.format("kdis_snapshot")
        .option("path", root)
        .option("partitionBy", "s")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    tbl = SnapshotTable(root)
    assert tbl.manifest()["partition_spec"] == ["s"]
    assert tbl.read(spark).count() == 40
    got = tbl.read_partition(spark, {"s": "1"})
    assert got.count() == 13
    planned, total = tbl.last_partition_counts
    assert planned < total


def test_partitioned_write_with_bloom_sidecars(spark, tmp_path):
    """Bloom sidecars land next to hive-nested partitioned files and
    both probe paths prune through them: read_keys (programmatic) and
    the batch source's pushed equality (declarative)."""
    root = str(tmp_path / "t")
    SnapshotTable(root, partition_by=["s"]).commit(_ks(spark, 0, 10))
    _write(
        _ks(spark, 10, 60),
        root,
        bloomCols="k",
        bloomBits=8192,
        maxRecordsPerFile=10,
    )
    tbl = SnapshotTable(root, bloom_cols=["k"], bloom_bits=8192)
    m = tbl.manifest()
    # the declarative append's files (dir marker c{N}-ds*) are hive-
    # nested AND carry sidecars; the v1 commit predates bloom config
    nested = [f for f in m["files"] if "__p_s=" in f and "-ds" in f]
    assert nested and all(
        os.path.exists(os.path.join(root, f + ".bloom")) for f in nested
    )
    got = tbl.read_keys(spark, {"k": [23, 47]})
    assert sorted(r["k"] for r in got.collect()) == [23, 47]
    planned, total = tbl.last_keys_counts
    assert planned < total
    rpt = str(tmp_path / "plan.json")
    out = (
        spark.read.format("kdis_snapshot")
        .option("path", root)
        .option("planReportPath", rpt)
        .load()
        .filter(F.col("k") == 23)
    )
    assert [r["k"] for r in out.collect()] == [23]
    plan = json.load(open(rpt))
    assert plan["planned"] < plan["total"], plan


def test_partitioned_write_missing_spec_column_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    SnapshotTable(root, partition_by=["s"]).commit(_ks(spark, 0, 10))
    with pytest.raises(Exception, match="spec column"):
        _write(spark.range(5).selectExpr("id AS k"), root)


def test_bloom_sidecars_byte_compatible_and_pruning(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(
        _ks(spark, 0, 50).repartition(2),
        root,
        bloomCols="k,s",
        bloomBits=8192,
    )
    m = SnapshotTable(root).manifest()
    rel = m["files"][0]
    side = os.path.join(root, rel + ".bloom")
    assert os.path.exists(side)
    ds_payload = open(side).read()
    _build_bloom_sidecar(root, rel, ["k", "s"], 8192)
    assert open(side).read() == ds_payload, "diverges from snapshot builder"
    # the batch source prunes through the ds-written sidecars
    rpt = str(tmp_path / "plan.json")
    out = (
        spark.read.format("kdis_snapshot")
        .option("path", root)
        .option("planReportPath", rpt)
        .load()
        .filter(F.col("k") == 7)
    )
    assert out.count() == 1
    plan = json.load(open(rpt))
    assert plan["planned"] < plan["total"]


def test_bad_bloom_bits_refused(spark, tmp_path):
    with pytest.raises(Exception, match="bloomBits"):
        _write(_ks(spark, 0, 5), str(tmp_path / "t"), bloomCols="k",
               bloomBits=1001)


def test_max_records_per_file_rolls(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(
        spark.range(100).coalesce(1).selectExpr("id AS k"),
        root,
        maxRecordsPerFile=30,
    )
    m = SnapshotTable(root).manifest()
    assert len(m["files"]) == 4
    assert sum(m["stats"][f]["_nrows"] for f in m["files"]) == 100


def test_append_race_rebases_metadata_only(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(spark.range(100).selectExpr("id AS k"), root)
    ds = SnapshotBatchDataSource({"path": root})
    w = ds.writer(spark.range(1).selectExpr("id AS k").schema, False)
    msg = w.write(_arrow_batches(spark.range(200, 203).selectExpr("id AS k")))
    # a foreign commit wins the version race between write and commit
    SnapshotTable(root).commit(spark.range(300, 302).selectExpr("id AS k"))
    w.commit([msg])
    tbl = SnapshotTable(root)
    assert tbl.latest_version() == 3
    assert tbl.read(spark).count() == 105  # union of both appends


def test_overwrite_race_refused_and_files_discarded(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(spark.range(10).selectExpr("id AS k"), root)
    ds = SnapshotBatchDataSource({"path": root})
    w = ds.writer(spark.range(1).selectExpr("id AS k").schema, True)
    msg = w.write(_arrow_batches(spark.range(5).selectExpr("id AS k")))
    SnapshotTable(root).commit(spark.range(3).selectExpr("id AS k"))
    with pytest.raises(Exception, match="version race"):
        w.commit([msg])
    tbl = SnapshotTable(root)
    assert tbl.read(spark).count() == 13  # overwrite never half-landed
    # the orphaned attempt's files were discarded, not leaked
    live = {os.path.join(root, f) for f in tbl.manifest()["files"]}
    on_disk = {
        os.path.join(dp, n)
        for dp, _d, ns in os.walk(os.path.join(root, "data"))
        for n in ns
        if n.endswith(".parquet")
    }
    assert on_disk == live


def test_abort_unlinks_written_files(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(spark.range(10).selectExpr("id AS k"), root)
    ds = SnapshotBatchDataSource({"path": root})
    w = ds.writer(spark.range(1).selectExpr("id AS k").schema, False)
    msg = w.write(_arrow_batches(spark.range(5).selectExpr("id AS k")))
    assert any(
        n.endswith(".parquet")
        for _dp, _d, ns in os.walk(os.path.join(root, "data"))
        for n in ns
        if "ds" in _dp
    ) or msg.entries
    w.abort([msg])
    for rel, *_rest in msg.entries:
        assert not os.path.exists(os.path.join(root, rel))


def test_stream_sink_available_now_and_epoch_replay(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    spark.range(40).selectExpr("id AS k").write.parquet(os.path.join(src, "a"))
    q = (
        spark.readStream.schema("k bigint")
        .parquet(src + "/*")
        .writeStream.format("kdis_snapshot")
        .option("path", root)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    tbl = SnapshotTable(root)
    assert tbl.read(spark).count() == 40
    assert tbl.manifest().get("epoch_id") == 0
    # replaying the committed epoch is a no-op (exactly-once restart)
    sw = SnapshotBatchDataSource({"path": root}).streamWriter(
        spark.range(1).selectExpr("id AS k").schema, False
    )
    msg = sw.write(_arrow_batches(spark.range(5).selectExpr("id AS k")))
    sw.commit([msg], 0)
    assert tbl.latest_version() == 1
    assert SnapshotTable(root).read(spark).count() == 40
    for rel, *_rest in msg.entries:  # replayed files reclaimed
        assert not os.path.exists(os.path.join(root, rel))
    # the next epoch commits normally
    sw2 = SnapshotBatchDataSource({"path": root}).streamWriter(
        spark.range(1).selectExpr("id AS k").schema, False
    )
    msg2 = sw2.write(_arrow_batches(spark.range(5).selectExpr("id AS k")))
    sw2.commit([msg2], 1)
    assert SnapshotTable(root).read(spark).count() == 45
    assert SnapshotTable(root).manifest().get("epoch_id") == 1


def test_stream_replay_detected_below_foreign_append(spark, tmp_path):
    """ADVICE r9/r10: a foreign append landing between a stream crash
    and the restart replay buries the replayed epoch's version below
    the head — the sink must STILL skip the replay (epoch set scanned
    over ALL manifests, like SnapshotCommitSink.committed_epochs), or
    the micro-batch commits twice."""
    root = str(tmp_path / "t")
    schema = spark.range(1).selectExpr("id AS k").schema
    sw = SnapshotBatchDataSource({"path": root}).streamWriter(schema, False)
    msg = sw.write(_arrow_batches(spark.range(10).selectExpr("id AS k")))
    sw.commit([msg], 7)  # epoch 7 committed as v1
    # foreign append lands "after the crash": head no longer carries 7
    SnapshotTable(root).commit(spark.range(100, 105).selectExpr("id AS k"))
    assert SnapshotTable(root).manifest().get("epoch_id") is None
    # restart replays epoch 7 through a FRESH writer instance
    sw2 = SnapshotBatchDataSource({"path": root}).streamWriter(schema, False)
    msg2 = sw2.write(_arrow_batches(spark.range(10).selectExpr("id AS k")))
    sw2.commit([msg2], 7)
    tbl = SnapshotTable(root)
    assert tbl.latest_version() == 2  # no duplicate version published
    assert tbl.read(spark).count() == 15  # 10 + 5, NOT 25
    for rel, *_rest in msg2.entries:  # replayed files reclaimed
        assert not os.path.exists(os.path.join(root, rel))
    # a genuinely new epoch still commits
    sw3 = SnapshotBatchDataSource({"path": root}).streamWriter(schema, False)
    msg3 = sw3.write(_arrow_batches(spark.range(200, 202).selectExpr("id AS k")))
    sw3.commit([msg3], 8)
    assert SnapshotTable(root).read(spark).count() == 17


def test_stream_sink_refuses_overwrite_modes(spark, tmp_path):
    ds = SnapshotBatchDataSource({"path": str(tmp_path / "t")})
    with pytest.raises(Exception, match="append-only"):
        ds.streamWriter(spark.range(1).schema, True)


def test_empty_partitions_write_no_files(spark, tmp_path):
    root = str(tmp_path / "t")
    # 8 partitions, 3 rows: most tasks see no rows and must not emit
    # zero-row files
    _write(spark.range(3).repartition(8).selectExpr("id AS k"), root)
    m = SnapshotTable(root).manifest()
    assert 0 < len(m["files"]) <= 3
    assert all(m["stats"][f]["_nrows"] > 0 for f in m["files"])


def test_file_uri_paths_accepted(spark, tmp_path):
    """Catalog DDL and some hadoop-side resolutions hand the path
    option as a ``file:`` URI; the programmatic API hands a raw path.
    Both must address the same table (the _localize normalization)."""
    root = str(tmp_path / "t")
    _write(_ks(spark, 0, 10), root)
    via_uri = (
        spark.read.format("kdis_snapshot")
        .option("path", "file://" + root)
        .load()
    )
    assert via_uri.count() == 10
    # and the writer side
    _ks(spark, 10, 15).write.format("kdis_snapshot").option(
        "path", "file://" + root
    ).mode("append").save()
    assert SnapshotTable(root).read(spark).count() == 15


def test_writer_publishes_delta_manifests_on_table_cadence(spark, tmp_path):
    """Appends through the DataSource must store DELTA manifests (like
    SnapshotTable._publish) so commit cost stays O(commit), not
    O(table), at million-file scale — and the chain must read
    identically through both the table and the batch source."""
    root = str(tmp_path / "t")
    for i in range(4):
        _write(spark.range(i * 10, i * 10 + 10).selectExpr("id AS k"), root)
    raw = {
        v: json.load(open(os.path.join(root, "_manifests", f"v{v}.json")))
        for v in (1, 2, 3, 4)
    }
    assert "delta_of" not in raw[1]  # first commit is a full manifest
    assert raw[3]["delta_of"] == 2 and raw[4]["delta_of"] == 3
    assert SnapshotTable(root).read(spark).count() == 40
    got = (
        spark.read.format("kdis_snapshot").option("path", root).load().count()
    )
    assert got == 40


def test_writer_delta_byte_compatible_with_snapshot_encoder(spark, tmp_path):
    """The duplicated delta encoder must produce EXACTLY what
    snapshot._encode_manifest_delta produces for the same
    (full, parent) pair — drift here would corrupt chain reads."""
    from kafka_database_import_spark.sources import snapshot as S

    root = str(tmp_path / "t")
    for i in range(3):
        _write(
            spark.range(i * 10, i * 10 + 10).selectExpr("id AS k"),
            root,
            bloomCols="k",
            bloomBits=4096,
        )
    tbl = SnapshotTable(root)
    raw3 = json.load(open(os.path.join(root, "_manifests", "v3.json")))
    expect = S._encode_manifest_delta(tbl.manifest(3), tbl.manifest(2))
    assert raw3 == expect
