"""RESTORE / rollback-as-a-commit on the snapshot table format: a new
head whose state is exactly an earlier version's, as a pure metadata
commit. Covers content equality, history/audit, lineage reset,
inverse row-level delta, vacuum interplay, CDC-state rewind, and
partition-state carry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    SnapshotTable,
    changes,
    row_changes,
    vacuum,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _build(spark, root):
    t = SnapshotTable(root)
    t.commit(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.commit(spark.createDataFrame([(3, "c")], "k long, v string"))       # v2
    t.delete_where(spark, "k = 1")                                         # v3
    t.commit(spark.createDataFrame([(4, "d")], "k long, v string"))       # v4
    return t


def test_restore_is_metadata_only_and_exact(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"))
    v2_rows = _rows(t.read(spark, 2))
    files_before = set()
    for dirpath, _d, names in os.walk(os.path.join(t.root, "data")):
        files_before.update(os.path.join(dirpath, n) for n in names)
    v5 = t.restore(2)
    assert v5 == 5
    # no data file written or removed — pure manifest commit
    files_after = set()
    for dirpath, _d, names in os.walk(os.path.join(t.root, "data")):
        files_after.update(os.path.join(dirpath, n) for n in names)
    assert files_after == files_before
    m = t.manifest()
    assert m["mode"] == "restore" and m["restored_from"] == 2
    assert m["files"] == t.manifest(2)["files"]
    assert _rows(t.read(spark)) == v2_rows
    # rolled-back versions stay time-travelable until vacuum
    assert _rows(t.read(spark, 4)) == _rows(t.read(spark, 4))
    assert (4, "d") in _rows(t.read(spark, 4))
    # history audits the restore
    h = t.history()[-1]
    assert h["mode"] == "restore" and h["restored_from"] == 2
    # restoring to the current head is a no-op
    assert t.restore(5) == 5
    assert t.latest_version() == 5


def test_restore_then_continue_writing(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"))
    t.restore(2)
    t.commit(spark.createDataFrame([(9, "z")], "k long, v string"))
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c"), (9, "z")]


def test_row_changes_across_restore_is_inverse_delta(spark, tmp_path):
    """The delta of (v2 → head-after-restore-to-v2's-predecessor...)
    concretely: forward delta v2→v4 is {delete k=1, insert k=4};
    restoring to v2 at v5 makes the v4→v5 delta the exact inverse —
    {insert k=1, delete k=4} — straight from the file-set diff."""
    t = _build(spark, str(tmp_path / "t"))
    t.restore(2)  # v5
    fwd = {
        (r["k"], r["v"], r["_change_type"])
        for r in row_changes(t, spark, 2, 4).collect()
    }
    inv = {
        (r["k"], r["v"], r["_change_type"])
        for r in row_changes(t, spark, 4, 5).collect()
    }
    flip = {"insert": "delete", "delete": "insert"}
    assert inv == {(k, v, flip[c]) for (k, v, c) in fwd}
    # and v2 → v5 is a no-op delta
    assert row_changes(t, spark, 2, 5).count() == 0


def test_restore_resets_append_lineage(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.commit(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.restore(1)
    with pytest.raises(ValueError, match="append"):
        changes(t, spark, from_version=1).collect()


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"))
    vacuum(t, retain_last=1)
    with pytest.raises(FileNotFoundError):
        t.restore(2)
    # and a retained manifest whose files got reclaimed is also loud:
    # build a fresh table, restore works before vacuum
    t2 = _build(spark, str(tmp_path / "t2"))
    assert t2.restore(2) == 5


def test_vacuum_keeps_files_referenced_by_restore(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"))
    t.restore(2)  # v5 references v2's files
    vacuum(t, retain_last=1)  # keeps only v5's manifest
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]


def test_restore_rewinds_cdc_sequence_state(spark, tmp_path):
    """After restoring past an applied CDC batch, the batch's sequence
    guards (stored seq values AND delete tombstones) are rewound too,
    so re-applying the same changelog converges to the same state as
    applying it fresh — the bad-batch-rollback operator story."""
    SCHEMA = "k long, v string, seq long, _op string"
    t = SnapshotTable(str(tmp_path / "t"))
    t.apply_changes(
        spark,
        spark.createDataFrame(
            [(1, "a", 10, "upsert"), (2, "b", 10, "upsert")], SCHEMA
        ),
        ["k"], seq_col="seq",
    )  # v1
    good = _rows(t.read(spark))
    t.apply_changes(
        spark,
        spark.createDataFrame(
            [(1, "BAD", 20, "upsert"), (2, None, 20, "delete")], SCHEMA
        ),
        ["k"], seq_col="seq",
    )  # v2: the bad batch (left a tombstone for k=2)
    t.restore(1)  # v3: roll it back — tombstones rewound with it
    assert _rows(t.read(spark)) == good
    assert not t.manifest().get("tombstone_files")
    # the corrected batch applies on the rewound state, including a
    # re-insert of k=2 at seq 15 (would have been tombstone-blocked
    # had the restore not rewound the delete's tombstone)
    t.apply_changes(
        spark,
        spark.createDataFrame(
            [(1, "a2", 15, "upsert"), (2, "b2", 15, "upsert")], SCHEMA
        ),
        ["k"], seq_col="seq",
    )
    assert _rows(t.read(spark)) == [(1, "a2", 15), (2, "b2", 15)]


def test_restore_carries_partition_state(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["r"])
    t.commit(
        spark.createDataFrame(
            [(i, ["EU", "US"][i % 2]) for i in range(10)], "k long, r string"
        )
    )
    t.set_partition_spec(["k"])  # v2 (about-to-be-rolled-back evolution)
    t.restore(1)                 # v3
    m = t.manifest()
    assert m["partition_spec"] == ["r"]
    assert set(m["file_partitions"]) == set(m["files"])
    r = t.read_partition(spark, {"r": "EU"})
    assert all("__p_r=EU" in p for p in r.inputFiles())
    assert r.count() == 5
