"""CDC APPLY INTO the snapshot table: apply_changes batch semantics
(sequencing, stale-skip, COW≡MOR) and the SnapshotMergeSink streaming
path (effectively-once under crash replay)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sources.snapshot import (
    SnapshotMergeSink,
    SnapshotTable,
)

SCHEMA = "k long, v string, seq long, _op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_apply_changes_out_of_order_batch_latest_per_key_wins(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(
        spark.createDataFrame([(1, "a", 10), (2, "b", 10)], "k long, v string, seq long")
    )
    # one batch, shuffled: k=1 upserted then deleted (delete is latest);
    # k=2 updated twice (seq 30 wins); k=3 deleted then inserted (insert wins)
    batch = _ch(
        spark,
        [
            (2, "b2", 20, "upsert"),
            (1, "a9", 40, "delete"),
            (3, "c1", 25, "upsert"),
            (2, "b3", 30, "upsert"),
            (1, "a2", 20, "upsert"),
            (3, None, 15, "delete"),
        ],
    )
    res = tbl.apply_changes(spark, batch, ["k"], seq_col="seq")
    assert res["upserted_rows"] == 2 and res["deleted_rows"] == 1
    assert _rows(tbl.read(spark)) == [(2, "b3", 30), (3, "c1", 25)]


def test_apply_changes_stale_batch_is_skipped(spark, tmp_path):
    """Cross-batch disorder: a batch arriving AFTER a later-sequenced
    batch must not regress the table — including a re-insert OLDER than
    an applied delete, which the delete's tombstone rejects."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    late = _ch(spark, [(1, "new", 50, "upsert"), (2, "gone", 60, "delete")])
    early = _ch(spark, [(1, "old", 10, "upsert"), (2, "back", 20, "upsert")])
    tbl.apply_changes(spark, late, ["k"], seq_col="seq")
    res = tbl.apply_changes(spark, early, ["k"], seq_col="seq")
    # BOTH stale: k=1's old upsert (row seq guards) and k=2's re-insert
    # (the seq-60 delete tombstone guards)
    assert res["skipped_stale"] == 2
    assert _rows(tbl.read(spark)) == [(1, "new", 50)]
    # a genuinely newer re-insert of k=2 lands
    tbl.apply_changes(
        spark, _ch(spark, [(2, "really back", 70, "upsert")]), ["k"],
        seq_col="seq",
    )
    assert _rows(tbl.read(spark)) == [(1, "new", 50), (2, "really back", 70)]


def test_apply_changes_any_batch_interleaving_converges(spark, tmp_path):
    """The order-insensitivity law, exhaustively: every permutation of
    3 micro-batches (containing delete-before-insert, insert-after-
    delete, and plain updates) converges to the identical table."""
    import itertools

    batches = [
        [(1, "a1", 10, "upsert"), (2, "b1", 11, "upsert"),
         (3, None, 12, "delete")],
        [(1, None, 20, "delete"), (3, "c2", 21, "upsert"),
         (4, "d2", 22, "upsert")],
        [(1, "a3", 30, "upsert"), (4, None, 31, "delete"),
         (5, "e3", 32, "upsert")],
    ]
    want = None
    for perm in itertools.permutations(range(3)):
        tbl = SnapshotTable(str(tmp_path / ("t" + "".join(map(str, perm)))))
        for i in perm:
            tbl.apply_changes(spark, _ch(spark, batches[i]), ["k"],
                              seq_col="seq")
        got = _rows(tbl.read(spark))
        if want is None:
            want = got
        assert got == want, (perm, got, want)
    assert want == [(1, "a3", 30), (2, "b1", 11), (3, "c2", 21),
                    (5, "e3", 32)]


def test_tombstone_expiry_reopens_window_deliberately(spark, tmp_path):
    """expire_tombstones drops guards <= the cutoff: after expiry a
    late change older than the expired delete CAN land — which is why
    retention must exceed source lateness (documented contract)."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.apply_changes(
        spark, _ch(spark, [(1, "a", 10, "upsert"), (2, None, 60, "delete")]),
        ["k"], seq_col="seq",
    )
    res = tbl.expire_tombstones(spark, "seq", before_seq=50)
    assert res["expired"] == 0 and res["retained"] == 1
    res = tbl.expire_tombstones(spark, "seq", before_seq=60)
    assert res["expired"] == 1 and res["retained"] == 0
    tbl.apply_changes(
        spark, _ch(spark, [(2, "late", 30, "upsert")]), ["k"], seq_col="seq"
    )
    assert _rows(tbl.read(spark)) == [(1, "a", 10), (2, "late", 30)]


def test_apply_changes_rejects_unknown_op_and_unordered_dups(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="unknown _op"):
        tbl.apply_changes(
            spark, _ch(spark, [(1, "a", 1, "UPSERT")]), ["k"], seq_col="seq"
        )
    with pytest.raises(ValueError, match="no seq_col"):
        tbl.apply_changes(
            spark,
            _ch(spark, [(1, "a", 1, "upsert"), (1, "b", 2, "upsert")]),
            ["k"],
        )


def test_apply_changes_cow_mor_equivalence_random_model(spark, tmp_path):
    """Model-based: the same random changelog stream applied COW and
    MOR must read back identically at every version, and both must
    equal a driver-side dict model."""
    import random

    rng = random.Random(20260814)
    cow = SnapshotTable(str(tmp_path / "cow"))
    mor = SnapshotTable(str(tmp_path / "mor"))
    model: dict[int, tuple] = {}
    seq = 0
    init = [(k, f"v{k}", 0) for k in range(20)]
    for k, v, s in init:
        model[k] = (k, v, s)
    df0 = spark.createDataFrame(init, "k long, v string, seq long")
    cow.commit(df0)
    mor.commit(df0)
    for _batch in range(6):
        rows = []
        for _ in range(rng.randint(2, 8)):
            seq += 1
            k = rng.randrange(30)
            if rng.random() < 0.3:
                rows.append((k, None, seq, "delete"))
                model.pop(k, None)
            else:
                rows.append((k, f"u{seq}", seq, "upsert"))
                model[k] = (k, f"u{seq}", seq)
        batch = _ch(spark, rows)
        rc = cow.apply_changes(spark, batch, ["k"], seq_col="seq", mode="cow")
        rm = mor.apply_changes(spark, batch, ["k"], seq_col="seq", mode="mor")
        got_c, got_m = _rows(cow.read(spark)), _rows(mor.read(spark))
        want = sorted(model.values())
        assert got_c == want, f"cow diverged at batch {_batch}"
        assert got_m == want, f"mor diverged at batch {_batch}"
        assert rm["rewritten_files"] == 0  # MOR never rewrites
        assert (rc["upserted_rows"], rc["deleted_rows"]) == (
            rm["upserted_rows"],
            rm["deleted_rows"],
        )
    # compaction materializes the MOR lineage to the same state
    mor.compact(spark)
    assert _rows(mor.read(spark)) == sorted(model.values())
    assert not mor.manifest().get("dv_files")


def _changelog_files(spark, src_dir, batches):
    """Write each batch as one parquet file with increasing mtimes so
    maxFilesPerTrigger=1 yields one micro-batch per file in order."""
    os.makedirs(src_dir, exist_ok=True)
    for i, rows in enumerate(batches):
        scratch = tempfile.mkdtemp(prefix="kdis_cdcs_")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"b{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(dst, (1_000 * (i + 1),) * 2)


BATCHES = [
    [(1, "a", 1, "upsert"), (2, "b", 2, "upsert"), (3, "c", 3, "upsert")],
    [(2, "b2", 5, "upsert"), (1, None, 4, "delete"), (4, "d", 6, "upsert")],
    [(3, None, 7, "delete"), (5, "e", 9, "upsert"), (5, "e0", 8, "upsert")],
]
FINAL = [(2, "b2", 5), (4, "d", 6), (5, "e", 9)]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_snapshot_merge_sink_streams_changelog_into_table(spark, tmp_path, mode):
    src = str(tmp_path / "src")
    _changelog_files(spark, src, BATCHES)
    tbl = SnapshotTable(str(tmp_path / f"t_{mode}"))
    sink = SnapshotMergeSink(tbl, ["k"], seq_col="seq", mode=mode)
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{mode}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(tbl.read(spark)) == FINAL
    # every published version carries its epoch (replay protection)
    assert all(
        "epoch_id" in tbl.manifest(v) for v in tbl.versions()
    ), [tbl.manifest(v) for v in tbl.versions()]


def test_snapshot_merge_sink_crash_replay_effectively_once(spark, tmp_path):
    """Kill the writer after data files land but before the manifest
    publishes; the restart replays that epoch and the final table is
    identical — no duplicates, no gaps (epoch-in-manifest protocol)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    _changelog_files(spark, src, BATCHES)
    tbl = SnapshotTable(str(tmp_path / "t"))
    sink = SnapshotMergeSink(tbl, ["k"], seq_col="seq")
    crashed = {"done": False}

    def crashing(batch_df, epoch_id):
        if epoch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            # die after writing data files, before any manifest publish
            tbl._write_data(batch_df, (tbl.latest_version() or 0) + 1)
            raise RuntimeError("injected crash before publish")
        sink(batch_df, epoch_id)

    def run(fn):
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(fn)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        run(crashing)
    assert tbl.versions() == [1]  # crashed epoch published nothing
    # restart with a FRESH sink instance (epoch set re-seeds from disk)
    run(SnapshotMergeSink(tbl, ["k"], seq_col="seq"))
    assert _rows(tbl.read(spark)) == FINAL
    epochs = [tbl.manifest(v).get("epoch_id") for v in tbl.versions()]
    assert epochs == [0, 1, 2]  # each epoch exactly once


def test_tombstone_expiry_is_transparent_to_changes_lineage(spark, tmp_path):
    """expire_tombstones changes no rows: batch changes() passes
    through the maintenance commit instead of raising."""
    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        changes,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.apply_changes(
        spark, _ch(spark, [(1, "a", 10, "upsert"), (2, None, 20, "delete")]),
        ["k"], seq_col="seq",
    )
    tbl.commit(
        spark.createDataFrame([(3, "c", 30)], "k long, v string, seq long")
    )
    tbl.expire_tombstones(spark, "seq", before_seq=20)
    tbl.commit(
        spark.createDataFrame([(4, "d", 40)], "k long, v string, seq long")
    )
    delta = changes(tbl, spark, from_version=1)
    assert sorted(tuple(r) for r in delta.collect()) == [
        (3, "c", 30), (4, "d", 40)
    ]


def test_apply_changes_equal_seq_upsert_tie_is_deterministic(spark, tmp_path):
    """ADVICE r6 (low): two upserts for the same key with EQUAL seq tie
    on both (seq desc, op desc) sort keys; the payload-hash tiebreaker
    must pick the same winner regardless of input order/partitioning."""
    winners = set()
    for perm in ([(1, "x", 10, "upsert"), (1, "y", 10, "upsert")],
                 [(1, "y", 10, "upsert"), (1, "x", 10, "upsert")]):
        for parts in (1, 4):
            tbl = SnapshotTable(
                str(tmp_path / f"t_{len(winners)}_{parts}_{perm[0][1]}")
            )
            tbl.apply_changes(
                spark, _ch(spark, perm).repartition(parts), ["k"],
                seq_col="seq",
            )
            winners.add(_rows(tbl.read(spark))[0][1])
    assert len(winners) == 1, f"nondeterministic tie winner: {winners}"


def test_merge_sink_mid_stream_schema_evolution(spark, tmp_path):
    """VERDICT r6 gap 3: the changelog source ADDS a column mid-stream
    (the commonest real CDC event, arriving as a consumer restart with
    the wider schema on the same checkpoint). The sink must WIDEN the
    table via apply_changes' merge-schema path instead of failing:
    pre-evolution rows read NULL for the new column, post-evolution
    upserts carry it, and sequence semantics are unaffected."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    tbl = SnapshotTable(str(tmp_path / "t"))

    def run(schema, sink):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase 1: original schema
    _changelog_files(spark, src, [BATCHES[0]])
    run(SCHEMA, SnapshotMergeSink(tbl, ["k"], seq_col="seq"))
    assert _rows(tbl.read(spark)) == [(1, "a", 1), (2, "b", 2), (3, "c", 3)]

    # phase 2: restart with a WIDER changelog schema (+ w long); the
    # new batch updates k=2 with w set and inserts k=6 with w set
    wide_schema = "k long, v string, w long, seq long, _op string"
    wide_rows = [(2, "b9", 90, 50, "upsert"), (6, "f", 60, 51, "upsert"),
                 (3, None, None, 52, "delete")]
    scratch = tempfile.mkdtemp(prefix="kdis_cdcs_")
    spark.createDataFrame(wide_rows, wide_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(scratch)
    shutil.move(
        glob.glob(os.path.join(scratch, "part-*.parquet"))[0],
        os.path.join(src, "b_wide.parquet"),
    )
    os.utime(os.path.join(src, "b_wide.parquet"), (9_000, 9_000))
    run(wide_schema, SnapshotMergeSink(tbl, ["k"], seq_col="seq"))

    got = _rows(tbl.read(spark).select("k", "v", "w", "seq"))
    assert got == [
        (1, "a", None, 1),    # pre-evolution row null-fills w
        (2, "b9", 90, 50),    # updated under the wider schema
        (6, "f", 60, 51),     # inserted with the new column
    ], got
    # a third phase on the widened table: stale change is still skipped
    tbl.apply_changes(
        spark,
        spark.createDataFrame([(2, "old", 5, 40, "upsert")], wide_schema),
        ["k"], seq_col="seq",
    )
    assert (2, "b9", 90, 50) in _rows(tbl.read(spark).select("k", "v", "w", "seq"))


def test_racing_epoch_stamped_applies_dont_double_apply(
    spark, tmp_path, monkeypatch
):
    """Round 12 (same fencing as replace_where_keys): an epoch-stamped
    INSERT-ONLY apply_changes batch (affected file set empty) that
    loses the commit race must not rebase-and-republish when the
    winner already claimed the same epoch — the zombie-writer /
    failover race a streaming sink's replay check alone cannot see.
    The loser raises; the rows land exactly once."""
    from kafka_database_import_spark.sources.snapshot import (
        ConcurrentCommitError,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(
        spark.createDataFrame(
            [(1, "a", 10)], "k long, v string, seq long"
        )
    )
    batch = _ch(spark, [(5, "new", 20, "upsert")])

    orig_publish = SnapshotTable._publish
    state = {"raced": False}

    def racy_publish(self, version, man):
        if not state["raced"] and man.get("mode") == "merge":
            state["raced"] = True
            winner = SnapshotTable(self.root)
            winner.apply_changes(
                spark, batch, ["k"], seq_col="seq", epoch_id=7
            )
        return orig_publish(self, version, man)

    monkeypatch.setattr(SnapshotTable, "_publish", racy_publish)
    with pytest.raises(ConcurrentCommitError, match="epoch"):
        tbl.apply_changes(spark, batch, ["k"], seq_col="seq", epoch_id=7)
    monkeypatch.undo()
    assert _rows(tbl.read(spark)) == [(1, "a", 10), (5, "new", 20)]
    # a genuinely newer epoch still rebases and lands
    res = tbl.apply_changes(
        spark,
        _ch(spark, [(6, "later", 30, "upsert")]),
        ["k"],
        seq_col="seq",
        epoch_id=8,
    )
    assert res["upserted_rows"] == 1
