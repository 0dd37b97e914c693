"""Delta-encoded manifests: metadata O(delta) per commit.

The equivalence contract is EXACT: for every version, ``manifest(v)``
reconstructed from the delta chain by a FRESH table handle (no cache,
no memory of the publish) must equal the full manifest the writer
published (round-tripped through JSON). Every test drives real table
operations — appends, DML, schema evolution, optimize, restore,
streaming CDC — and re-checks the whole version history from a fresh
handle after each step, so a delta that drops or corrupts any field
fails loudly at the step that wrote it.

Scale rationale (the reason this exists): a full manifest re-lists
every live file with stats + partition tuples — O(table) JSON per
commit. A CDC sink committing every 10 s against a 1M-file table would
write GBs of identical file lists per hour; the delta form bounds each
commit's metadata to its actual change, with a full checkpoint every
``_CHECKPOINT_EVERY`` versions bounding reconstruction walks.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    SnapshotTable,
    StatsSnapshotTable,
    changes,
    vacuum,
)

REGIONS = ["EU", "US", "AP"]


def _mkdf(spark, n=12, offset=0):
    return spark.createDataFrame(
        [(offset + i, f"u{i % 5}", REGIONS[i % 3]) for i in range(n)],
        "k long, v string, region string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _raw(tbl, v):
    with open(tbl._manifest_path(v)) as f:
        return json.load(f)


def _assert_history_reconstructs(tbl):
    """Every retained version's manifest, reconstructed by a FRESH
    handle from disk alone, equals what the writing handle sees."""
    fresh = SnapshotTable(tbl.root)
    for v in tbl.versions():
        assert fresh.manifest(v) == tbl.manifest(v), f"version {v}"
    # and the writer's own view equals the publish-time round trip
    # (its cache was seeded with exactly that)
    return fresh


def test_append_chain_is_delta_encoded_and_reconstructs(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    # base: 16 files, so each later 1-file append's delta is small
    # relative to the full form (the size gate keeps trivially small
    # manifests full — correct, but not what this test exercises)
    t.commit(_mkdf(spark, n=64).repartition(16))
    for i in range(1, 8):
        t.commit(_mkdf(spark, n=4, offset=100 * i).coalesce(1))
    # v1 is full (nothing to delta against); appends are delta-form
    assert "delta_of" not in _raw(t, 1)
    for v in range(2, 9):
        raw = _raw(t, v)
        assert raw["delta_of"] == v - 1
        assert raw.get("files_add") and "files" not in raw
        assert not raw.get("files_remove")
        # small fields ride verbatim for raw-JSON consumers
        assert raw["mode"] == "append" and "schema" in raw
        assert "committed_at_ms" in raw
    fresh = _assert_history_reconstructs(t)
    assert _rows(fresh.read(spark)) == _rows(t.read(spark))
    # metadata growth is O(delta): the last delta must not re-list the
    # table (23 files by now; the delta carries 1)
    full_size = len(json.dumps(t.manifest(8)))
    delta_size = os.path.getsize(t._manifest_path(8))
    assert delta_size < 0.6 * full_size


def test_checkpoint_cadence_bounds_chains(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.checkpoint_every = 4  # test-sized cadence (default 25)
    t.commit(_mkdf(spark, n=64).repartition(16))
    for i in range(1, 10):
        t.commit(_mkdf(spark, n=4, offset=100 * i).coalesce(1))
    forms = {v: ("delta_of" in _raw(t, v)) for v in t.versions()}
    assert forms[1] is False
    assert forms[4] is False and forms[8] is False  # checkpoints
    assert forms[3] and forms[5] and forms[9]
    _assert_history_reconstructs(t)


def test_dml_evolution_optimize_restore_all_reconstruct(spark, tmp_path):
    """The mixed-operation path: every manifest-mutating API publishes
    through the same choke point, so each one must survive the delta
    round trip — including the ones that rewrite per-file entries
    (rename) or resurrect old file sets (restore)."""
    t = StatsSnapshotTable(
        str(tmp_path / "t"), ["k"], partition_by=["region"]
    )
    t.commit(_mkdf(spark, n=18))
    t.commit(_mkdf(spark, n=18, offset=100))
    t.delete_where(spark, "k % 7 = 1")
    t.update_where(spark, "k % 5 = 2", {"v": F.lit("patched")})
    t.rename_column("v", "val")
    t.set_partition_spec(["bucket(2, k)"])
    t.commit(  # append-widening adds `flag` to the schema mid-history
        _mkdf(spark, n=6, offset=200).withColumnRenamed("v", "val")
        .withColumn("flag", F.lit(True))
    )
    t.optimize(spark)
    t.restore(4)
    fresh = _assert_history_reconstructs(t)
    assert _rows(fresh.read(spark)) == _rows(t.read(spark))
    # restore's inverse-delta lineage still walks
    hist = fresh.history()
    assert hist[-1]["restored_from"] == 4


def test_vacuum_materializes_oldest_retained_checkpoint(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_mkdf(spark, n=64).repartition(16))
    for i in range(1, 7):
        t.commit(_mkdf(spark, n=4, offset=100 * i).coalesce(1))
    assert "delta_of" in _raw(t, 5)
    res = vacuum(t, retain_last=3)  # keeps 5, 6, 7 — 5's parent dies
    assert res["dropped_versions"] == 4
    assert "delta_of" not in _raw(t, 5)  # materialized full
    fresh = SnapshotTable(t.root)
    for v in (5, 6, 7):
        assert fresh.manifest(v)["version"] == v
    assert _rows(fresh.read(spark)) == _rows(t.read(spark))
    # expired versions still fail loudly
    with pytest.raises(FileNotFoundError, match="retained versions"):
        fresh.manifest(2)


def test_incremental_changes_over_delta_manifests(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.checkpoint_every = 3
    seen = {}
    t.commit(_mkdf(spark, n=64).repartition(16))
    for i in range(1, 6):
        v = t.commit(_mkdf(spark, n=4, offset=100 * i).coalesce(1))
        seen[v] = _rows(_mkdf(spark, n=4, offset=100 * i))
    # batch incremental read across delta AND checkpoint boundaries
    got = _rows(changes(t, spark, from_version=2, to_version=5))
    want = sorted(r for v in (3, 4, 5) for r in seen[v])
    assert got == want


def test_changes_stream_reads_delta_manifests(spark, tmp_path):
    """The streaming source's file-diff walk consumes the delta form
    directly (files_add) and reconstructs across a full checkpoint in
    the middle of the lineage."""
    from kafka_database_import_spark.sources.snapshot_stream import register

    t = SnapshotTable(str(tmp_path / "t"))
    t.checkpoint_every = 3
    t.commit(_mkdf(spark, n=64).repartition(16))
    for i in range(1, 5):  # v3 is a full checkpoint between deltas
        t.commit(_mkdf(spark, n=4, offset=100 * i).coalesce(1))
    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("kdis_snapshot_changes")
        .option("path", t.root)
        .option("startVersion", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark.read.parquet(out))
    want = sorted(
        r
        for i in range(1, 5)
        for r in _rows(_mkdf(spark, n=4, offset=100 * i))
    )
    assert got == want


def test_cdc_merge_sink_epochs_survive_delta_form(spark, tmp_path):
    """SnapshotMergeSink's replay detection reads epoch_id from raw
    manifests — verbatim in the delta form."""
    from kafka_database_import_spark.sources.snapshot import SnapshotMergeSink

    t = SnapshotTable(str(tmp_path / "t"))
    sink = SnapshotMergeSink(t, key_cols=["k"], seq_col="seq")
    ch1 = spark.createDataFrame(
        [(1, "a", "EU", "upsert", 1)],
        "k long, v string, region string, _op string, seq long",
    )
    ch2 = spark.createDataFrame(
        [(1, "b", "EU", "upsert", 2), (2, "c", "US", "upsert", 1)],
        "k long, v string, region string, _op string, seq long",
    )
    sink(ch1, epoch_id=0)
    sink(ch2, epoch_id=1)
    fresh_sink = SnapshotMergeSink(
        SnapshotTable(t.root), key_cols=["k"], seq_col="seq"
    )
    assert fresh_sink.committed_epochs() == {0, 1}
    fresh_sink(ch1, epoch_id=0)  # replay: must be a no-op
    t2 = SnapshotTable(t.root)
    assert _rows(t2.read(spark).select("k", "v")) == [(1, "b"), (2, "c")]
