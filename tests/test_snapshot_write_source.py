"""Write side of the snapshot Python DataSource
(sources/snapshot_batch.py): ``df.write.format("kdis_snapshot")`` and
``df.writeStream.format("kdis_snapshot")`` publish REAL snapshot
versions — byte-compatible manifests (atomic link, field-id schema
JSON, footer stats), optional bloom sidecars — so everything written
here reads, DMLs, and time-travels through every existing
SnapshotTable path. The boundaries (schema evolution, partition
specs, streaming overwrite) must fail loudly at plan time."""

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


def test_schema_evolution_refused_at_plan_time(spark, tmp_path):
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


def test_partitioned_table_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    tbl = SnapshotTable(root, partition_by=["s"])
    tbl.commit(_ks(spark, 0, 10))
    with pytest.raises(Exception, match="partition spec"):
        _write(_ks(spark, 10, 20), root)


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
    for rel, _st in msg.entries:
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
    for rel, _st in msg.entries:  # replayed files reclaimed
        assert not os.path.exists(os.path.join(root, rel))
    # the next epoch commits normally
    sw2 = SnapshotBatchDataSource({"path": root}).streamWriter(
        spark.range(1).selectExpr("id AS k").schema, False
    )
    msg2 = sw2.write(_arrow_batches(spark.range(5).selectExpr("id AS k")))
    sw2.commit([msg2], 1)
    assert SnapshotTable(root).read(spark).count() == 45
    assert SnapshotTable(root).manifest().get("epoch_id") == 1


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
