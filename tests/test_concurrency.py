"""Concurrent writers on the snapshot table format: appends commute
(both writers succeed via metadata-only rebase), DMLs succeed iff
their touched file sets are disjoint, and genuinely conflicting
writes fail loudly — the Iceberg/Delta optimistic-concurrency
validation rules.

Deterministic interleavings are forced with a rival hook (the rival
commits between the victim's compute and its publish), plus one real
multi-threaded hammer test."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    ConcurrentCommitError,
    SnapshotTable,
    StatsSnapshotTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class RacyTable(SnapshotTable):
    """Fires ``rival`` (once) right before the first manifest publish —
    the canonical lost-race interleaving: the victim computed
    everything against the old head, the rival won the version."""

    def arm(self, rival):
        self._rival = rival
        self._fired = False

    def _publish(self, version, manifest):
        if getattr(self, "_rival", None) and not self._fired:
            self._fired = True
            self._rival()
        return super()._publish(version, manifest)


def test_concurrent_appends_both_succeed_deterministic(spark, tmp_path):
    root = str(tmp_path / "t")
    victim = RacyTable(root)
    victim.commit(spark.createDataFrame([(0, "seed")], "k long, v string"))

    rival_tbl = SnapshotTable(root)
    victim.arm(
        lambda: rival_tbl.commit(
            spark.createDataFrame([(1, "rival")], "k long, v string")
        )
    )
    v = victim.commit(spark.createDataFrame([(2, "victim")], "k long, v string"))
    assert v == 3  # rebased onto the rival's v2
    assert _rows(victim.read(spark)) == [(0, "seed"), (1, "rival"), (2, "victim")]
    m = victim.manifest()
    assert m["base"] == 2 and m["mode"] == "append"


def test_concurrent_append_rebase_carries_rival_schema(spark, tmp_path):
    """Rival append ADDS a column; the victim's rebase must merge onto
    the rival's evolved schema (victim rows null-fill), not clobber it."""
    root = str(tmp_path / "t")
    victim = RacyTable(root)
    victim.commit(spark.createDataFrame([(0, "seed")], "k long, v string"))
    rival_tbl = SnapshotTable(root)
    victim.arm(
        lambda: rival_tbl.commit(
            spark.createDataFrame([(1, "rival", 10)], "k long, v string, w long")
        )
    )
    victim.commit(spark.createDataFrame([(2, "victim")], "k long, v string"))
    got = _rows(victim.read(spark).select("k", "v", "w"))
    assert got == [(0, "seed", None), (1, "rival", 10), (2, "victim", None)]


def test_concurrent_disjoint_deletes_both_succeed(spark, tmp_path):
    """Two DMLs touching DISJOINT file sets (different partitions) both
    land; the final state shows both deletes."""
    root = str(tmp_path / "t")
    seedr = SnapshotTable(root, partition_by=["r"])
    df = spark.createDataFrame(
        [(i, ["EU", "US"][i % 2]) for i in range(20)], "k long, r string"
    )
    seedr.commit(df)
    victim = RacyTable(root)
    rival_tbl = SnapshotTable(root)
    victim.arm(
        lambda: rival_tbl.delete_where(
            spark, "r = 'US' AND k < 6", partition_filter={"r": "US"}
        )
    )
    res = victim.delete_where(
        spark, "r = 'EU' AND k < 6", partition_filter={"r": "EU"}
    )
    assert res["deleted_rows"] == 3
    assert _rows(victim.read(spark)) == _rows(df.filter(F.col("k") >= 6))


def test_concurrent_overlapping_deletes_conflict_loudly(spark, tmp_path):
    root = str(tmp_path / "t")
    seedr = SnapshotTable(root)
    seedr.commit(
        spark.createDataFrame(
            [(i, "x") for i in range(10)], "k long, v string"
        ).coalesce(1)  # ONE file → the two deletes must collide
    )
    victim = RacyTable(root)
    rival_tbl = SnapshotTable(root)
    victim.arm(lambda: rival_tbl.delete_where(spark, "k = 1"))
    with pytest.raises(ConcurrentCommitError, match="disjoint"):
        victim.delete_where(spark, "k = 2")  # same single file


def test_concurrent_append_during_cdc_apply_rebases(spark, tmp_path):
    root = str(tmp_path / "t")
    seedr = SnapshotTable(root, partition_by=["r"])
    seedr.commit(
        spark.createDataFrame(
            [(i, ["EU", "US"][i % 2], 1) for i in range(10)],
            "k long, r string, seq long",
        )
    )
    victim = RacyTable(root)
    rival_tbl = SnapshotTable(root)
    victim.arm(
        lambda: rival_tbl.commit(
            spark.createDataFrame([(100, "AP", 1)], "k long, r string, seq long")
        )
    )
    batch = spark.createDataFrame(
        [(0, "EU", 5, "upsert"), (2, "EU", 5, "delete")],
        "k long, r string, seq long, _op string",
    )
    victim.apply_changes(spark, batch, ["k", "r"], seq_col="seq")
    got = _rows(victim.read(spark))
    assert (100, "AP", 1) in got            # rival's append survived
    assert (0, "EU", 5) in got              # victim's upsert landed
    assert not any(r[0] == 2 for r in got)  # victim's delete landed


def test_overwrite_never_clobbers_concurrent_append(spark, tmp_path):
    """optimize/compact are overwrites computed from a snapshot; losing
    the race to an append must RAISE (silently re-publishing would
    delete the appended rows)."""
    root = str(tmp_path / "t")
    seedr = SnapshotTable(root)
    seedr.commit(
        spark.createDataFrame([(i, "x") for i in range(10)], "k long, v string")
    )
    victim = RacyTable(root)
    rival_tbl = SnapshotTable(root)
    victim.arm(
        lambda: rival_tbl.commit(
            spark.createDataFrame([(99, "new")], "k long, v string")
        )
    )
    with pytest.raises(ConcurrentCommitError):
        victim.optimize(spark, target_files=1)
    # nothing was lost: the append is visible, the optimize simply lost
    assert (99, "new") in _rows(SnapshotTable(root).read(spark))


def test_threaded_append_hammer_all_succeed(spark, tmp_path):
    """8 real threads, own table handle each, barrier-released: every
    append must succeed (rebase under genuine contention) and the
    final table is the exact union."""
    root = str(tmp_path / "t")
    SnapshotTable(root).commit(
        spark.createDataFrame([(-1, -1)], "w long, k long")
    )
    n = 8
    barrier = threading.Barrier(n)
    errors: list[Exception] = []

    def writer(i):
        try:
            t = SnapshotTable(root)
            df = spark.createDataFrame(
                [(i, i * 10 + j) for j in range(5)], "w long, k long"
            )
            barrier.wait()
            t.commit(df)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    tbl = SnapshotTable(root)
    assert tbl.latest_version() == 1 + n
    got = _rows(tbl.read(spark))
    want = sorted([(-1, -1)] + [(i, i * 10 + j) for i in range(n) for j in range(5)])
    assert got == want


def test_stats_table_concurrent_append_keeps_both_stats(spark, tmp_path):
    root = str(tmp_path / "t")
    seedr = StatsSnapshotTable(root, stats_cols=["k"])
    seedr.commit(spark.createDataFrame([(1,)], "k long"))

    class RacyStats(StatsSnapshotTable, RacyTable):
        pass

    victim = RacyStats(root, stats_cols=["k"])
    rival_tbl = StatsSnapshotTable(root, stats_cols=["k"])
    victim.arm(
        lambda: rival_tbl.commit(spark.createDataFrame([(100,)], "k long"))
    )
    victim.commit(spark.createDataFrame([(200,)], "k long"))
    m = victim.manifest()
    assert set(m["stats"]) == set(m["files"])  # stats for rival AND victim
    assert _rows(victim.read(spark)) == [(1,), (100,), (200,)]
