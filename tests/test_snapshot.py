"""Snapshot table format (sources/snapshot.py): atomic manifest
commits, snapshot isolation, time travel, optimistic concurrency, and
state-preserving compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from kafka_database_import_spark.sources.snapshot import (
    ConcurrentCommitError,
    SnapshotTable,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_append_overwrite_and_time_travel(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.commit(_df(spark, [(1, "a"), (2, "b")]))
    v2 = tbl.commit(_df(spark, [(3, "c")]))  # append
    v3 = tbl.commit(_df(spark, [(9, "z")]), mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert _rows(tbl.read(spark)) == [(9, "z")]
    assert _rows(tbl.read(spark, version=2)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(tbl.read(spark, version=1)) == [(1, "a"), (2, "b")]
    assert tbl.versions() == [1, 2, 3]


def test_snapshot_isolation_reader_pinned_while_writer_commits(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    pinned = tbl.read(spark)  # planned from manifest v1
    tbl.commit(_df(spark, [(2, "b")]))
    tbl.commit(_df(spark, [(9, "z")]), mode="overwrite")
    # the pinned DataFrame still returns v1's rows after later commits
    assert _rows(pinned) == [(1, "a")]
    assert _rows(tbl.read(spark)) == [(9, "z")]


def test_concurrent_commit_loses_atomically_and_retry_rebase_wins(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    # writer B publishes version 2 between A's head read and A's link:
    # simulate by committing through a second handle first
    other = SnapshotTable(str(tmp_path / "t"))
    df_a = _df(spark, [(3, "c")])
    head = tbl.latest_version()
    files = tbl._write_data(df_a, head + 1)
    other.commit(_df(spark, [(2, "b")]))  # B wins version 2
    with pytest.raises(ConcurrentCommitError):
        tbl._publish(
            head + 1,
            {
                "version": head + 1,
                "base": head,
                "mode": "append",
                "schema": df_a.schema.json(),
                "files": tbl.manifest(head)["files"] + files,
            },
        )
    # loser retries from the new head — standard optimistic loop
    v3 = tbl.commit(df_a)
    assert v3 == 3
    assert _rows(tbl.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]


def test_compaction_preserves_state_and_history(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    for i in range(4):
        tbl.commit(_df(spark, [(i, f"v{i}")]))
    before = _rows(tbl.read(spark))
    n_files_before = len(tbl.manifest()["files"])
    v = tbl.compact(spark, target_files=1)
    assert _rows(tbl.read(spark, version=v)) == before
    assert len(tbl.manifest(v)["files"]) == 1 < n_files_before
    # pre-compaction versions still read their original immutable files
    assert _rows(tbl.read(spark, version=2)) == [(0, "v0"), (1, "v1")]


def test_empty_table_read_keeps_schema(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, []))
    got = tbl.read(spark)
    assert got.count() == 0
    assert got.schema == SCHEMA


def test_crashed_writer_leaves_no_visible_version(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    # a writer that died after writing data files but before publishing:
    tbl._write_data(_df(spark, [(2, "b")]), 2)
    assert tbl.versions() == [1]  # unreferenced files are invisible
    assert _rows(tbl.read(spark)) == [(1, "a")]
    # and the next successful commit takes version 2 cleanly
    assert tbl.commit(_df(spark, [(3, "c")])) == 2
    assert _rows(tbl.read(spark)) == [(1, "a"), (3, "c")]


def test_manifest_stats_prune_files_and_match_full_scan(spark, tmp_path):
    """Footer min/max stats recorded at commit time let read_pruned plan
    only overlapping files — and the result must equal the unpruned
    scan + filter exactly (pruning is planning-only)."""
    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    # three single-file commits with disjoint k ranges
    for base in (0, 100, 200):
        tbl.commit(
            _df(spark, [(base + i, f"r{base + i}") for i in range(10)]).coalesce(1)
        )
    pruned = tbl.read_pruned(spark, "k", 100, 109)
    kept, total = tbl.last_pruned_counts
    assert (kept, total) == (1, 3)  # only the middle file is planned
    full = tbl.read(spark).filter("k BETWEEN 100 AND 109")
    assert _rows(pruned) == _rows(full) == [(100 + i, f"r{100 + i}") for i in range(10)]
    # empty overlap: zero files planned, empty result, schema intact
    none = tbl.read_pruned(spark, "k", 900, 950)
    assert tbl.last_pruned_counts == (0, 3)
    assert none.count() == 0 and none.schema == SCHEMA


def test_changes_reads_only_the_version_delta(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import changes

    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.commit(_df(spark, [(1, "a")]))
    tbl.commit(_df(spark, [(2, "b")]))
    v3 = tbl.commit(_df(spark, [(3, "c")]))
    got = changes(tbl, spark, from_version=v1, to_version=v3)
    assert _rows(got) == [(2, "b"), (3, "c")]
    assert changes(tbl, spark, from_version=v3).count() == 0
    # an overwrite in the range resets lineage: must refuse, not
    # silently double-count
    tbl.commit(_df(spark, [(9, "z")]), mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        changes(tbl, spark, from_version=v1)


def test_stats_survive_append_and_compaction_recomputes(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    tbl.commit(_df(spark, [(1, "a"), (5, "e")]).coalesce(1))
    tbl.commit(_df(spark, [(100, "x")]).coalesce(1))
    m = tbl.manifest()
    assert len(m["files"]) == 2
    ranges = sorted(tuple(s["k"]) for s in m["stats"].values())
    assert ranges == [(1, 5), (100, 100)]
    v = tbl.compact(spark, target_files=1)
    m2 = tbl.manifest(v)
    assert len(m2["files"]) == 1
    (only_stats,) = m2["stats"].values()
    assert tuple(only_stats["k"]) == (1, 100)


def test_streaming_commit_sink_is_replay_idempotent(spark, tmp_path):
    """writeStream -> SnapshotTable: one version per micro-batch; a
    crash after data-write-before-publish plus Spark's epoch replay
    must yield exactly one visible version per epoch and the batch-
    oracle row set."""
    import glob
    import shutil
    import tempfile

    from kafka_database_import_spark.sources.snapshot import SnapshotCommitSink

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [[(1, "a"), (2, "b")], [(3, "c")], [(4, "d"), (5, "e")]]
    for i, rows in enumerate(batches):
        scratch = tempfile.mkdtemp(prefix="kdis_snapstream_")
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(dst, (1_000 * (i + 1),) * 2)

    tbl = SnapshotTable(str(tmp_path / "t"))
    sink = SnapshotCommitSink(tbl)
    crashed = {"done": False}

    def crashing(batch_df, epoch_id):
        if epoch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            # die after writing data files, before publishing a manifest
            tbl._write_data(batch_df, (tbl.latest_version() or 0) + 1)
            raise RuntimeError("injected crash before publish")
        sink(batch_df, epoch_id)

    def run():
        sdf = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            sdf.writeStream.foreachBatch(crashing)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from pyspark.errors.exceptions.captured import StreamingQueryException

    try:
        run()
        raise AssertionError("expected the injected crash")
    except StreamingQueryException:
        pass
    assert tbl.versions() == [1]  # crashed epoch published nothing

    run()  # restart: replays epoch 1, then epoch 2

    assert tbl.versions() == [1, 2, 3]
    assert sorted(
        tbl.manifest(v)["epoch_id"] for v in tbl.versions()
    ) == [0, 1, 2]
    assert _rows(tbl.read(spark)) == [(i, c) for i, c in
                                      [(1, "a"), (2, "b"), (3, "c"),
                                       (4, "d"), (5, "e")]]
    # replaying an already-visible epoch is a no-op
    sink(_df(spark, [(9, "z")]), 2)
    assert tbl.versions() == [1, 2, 3]


def test_vacuum_reclaims_unreferenced_files_keeps_live_versions(spark, tmp_path):
    import glob

    from kafka_database_import_spark.sources.snapshot import vacuum

    tbl = SnapshotTable(str(tmp_path / "t"))
    for i in range(3):
        tbl.commit(_df(spark, [(i, f"v{i}")]))
    v4 = tbl.compact(spark, target_files=1)  # rewrites into 1 file
    n_files_before = len(glob.glob(str(tmp_path / "t" / "data" / "*" / "*.parquet")))
    assert n_files_before > 1  # pre-compaction files + 1 compacted

    report = vacuum(tbl, retain_last=1)
    assert report["dropped_versions"] == 3
    assert report["removed_files"] == n_files_before - 1  # all but compacted
    assert report["retained_versions"] == [v4]
    # live version reads fine; history is gone
    assert _rows(tbl.read(spark)) == [(0, "v0"), (1, "v1"), (2, "v2")]
    assert tbl.versions() == [v4]
    n_files_after = len(glob.glob(str(tmp_path / "t" / "data" / "*" / "*.parquet")))
    assert n_files_after == 1
    # next commit continues the version sequence past the vacuum
    assert tbl.commit(_df(spark, [(9, "z")])) == v4 + 1


def test_vacuum_retains_multiple_versions_shared_files(spark, tmp_path):
    """Append-lineage versions SHARE files: vacuum must keep any file
    referenced by ANY retained manifest."""
    from kafka_database_import_spark.sources.snapshot import vacuum

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    tbl.commit(_df(spark, [(2, "b")]))
    tbl.commit(_df(spark, [(3, "c")]))
    report = vacuum(tbl, retain_last=2)
    assert report["dropped_versions"] == 1
    assert report["removed_files"] == 0  # v2's files are inside v3's list
    assert _rows(tbl.read(spark, version=2)) == [(1, "a"), (2, "b")]
    assert _rows(tbl.read(spark, version=3)) == [(1, "a"), (2, "b"), (3, "c")]


def test_schema_evolution_appends_columns_and_rejects_type_changes(spark, tmp_path):
    from pyspark.sql import types as T

    from kafka_database_import_spark.sources.snapshot import SchemaEvolutionError

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    wide = T.StructType(
        SCHEMA.fields + [T.StructField("w", T.DoubleType())]
    )
    tbl.commit(spark.createDataFrame([(2, "b", 2.5)], wide))
    got = {
        r["k"]: (r["v"], r["w"]) for r in tbl.read(spark).collect()
    }
    # old files yield NULL for the evolved column
    assert got == {1: ("a", None), 2: ("b", 2.5)}
    # time travel keeps the historical schema
    assert tbl.read(spark, version=1).columns == ["k", "v"]
    assert tbl.read(spark).columns == ["k", "v", "w"]

    # a writer that dropped a column appends fine (NULL-filled)...
    narrow = T.StructType([T.StructField("k", T.LongType())])
    tbl.commit(spark.createDataFrame([(3,)], narrow))
    got3 = {r["k"]: (r["v"], r["w"]) for r in tbl.read(spark).collect()}
    assert got3[3] == (None, None)

    # ...but a TYPE change is refused at commit time
    bad = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    with pytest.raises(SchemaEvolutionError, match="type CHANGE"):
        tbl.commit(spark.createDataFrame([(4, 4)], bad))
    # and the failed commit published nothing
    assert tbl.latest_version() == 3


def test_random_op_sequences_match_list_model(spark, tmp_path):
    """Model-based check of the whole table lifecycle: a random
    sequence of append/overwrite/compact/vacuum against an in-memory
    list model — current rows, historical reads of every still-retained
    version, and version numbering must all agree."""
    import random

    for seed in range(3):
        rng = random.Random(seed)
        tbl = SnapshotTable(str(tmp_path / f"t{seed}"))
        model: dict[int, list] = {}  # version -> rows
        cur: list = []
        next_k = 0
        for _step in range(rng.randint(6, 10)):
            roll = rng.random()
            if roll < 0.5 or not model:
                rows = [(next_k + i, f"s{next_k + i}") for i in range(rng.randint(1, 3))]
                next_k += len(rows)
                v = tbl.commit(_df(spark, rows))
                cur = cur + rows
            elif roll < 0.7:
                rows = [(next_k, f"o{next_k}")]
                next_k += 1
                v = tbl.commit(_df(spark, rows), mode="overwrite")
                cur = list(rows)
            elif roll < 0.85:
                v = tbl.compact(spark, target_files=1)
            else:
                from kafka_database_import_spark.sources.snapshot import vacuum

                keep = rng.randint(1, len(model))
                vacuum(tbl, retain_last=keep)
                dropped = sorted(model)[:-keep]
                for d in dropped:
                    model.pop(d)
                continue
            model[v] = list(cur)
        assert tbl.versions() == sorted(model)
        for v, rows in model.items():
            assert _rows(tbl.read(spark, version=v)) == sorted(rows), (
                f"seed={seed} version={v}"
            )


def test_time_sorted_commits_prune_most_files_on_time_ranges(spark, tmp_path):
    """The layout discipline that makes manifest pruning BITE at scale:
    committing time-range-partitioned files (repartitionByRange on ts)
    gives each file a narrow ts span, so a time-window query plans a
    small fraction of files from the manifest alone. This is the
    snapshot-format analog of the Z-order per-file span narrowing
    (operators/zorder.py) — same stats, layout chosen to make them
    selective."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.readers import load_table
    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id"
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()

    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["ts_us"])
    tbl.commit(ev.repartitionByRange(8, "ts_us"))
    n_files = len(tbl.manifest()["files"])
    assert n_files == 8

    span = hi - lo
    q_lo, q_hi = lo + span // 2, lo + span // 2 + span // 20  # 5% window
    pruned = tbl.read_pruned(spark, "ts_us", q_lo, q_hi)
    kept, total = tbl.last_pruned_counts
    assert total == 8 and kept <= 2, f"kept {kept}/{total} — layout not selective"
    full = tbl.read(spark).filter(F.col("ts_us").between(q_lo, q_hi))
    assert pruned.count() == full.count() > 0
    # contrast: the same data committed UNSORTED prunes nothing
    messy = StatsSnapshotTable(str(tmp_path / "m"), stats_cols=["ts_us"])
    messy.commit(ev.repartition(8))
    messy.read_pruned(spark, "ts_us", q_lo, q_hi)
    kept_m, total_m = messy.last_pruned_counts
    assert (kept_m, total_m) == (8, 8)  # every file spans ~the whole range


def test_commit_with_retry_wins_after_races_and_gives_up_eventually(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        ConcurrentCommitError,
        commit_with_retry,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    other = SnapshotTable(str(tmp_path / "t"))

    real_publish = tbl._publish
    races = {"left": 2}

    def racing_publish(version, manifest):
        if races["left"] > 0:
            races["left"] -= 1
            other.commit(_df(spark, [(50 + races["left"], "r")]))  # rival wins
        return real_publish(version, manifest)

    tbl._publish = racing_publish
    v = commit_with_retry(tbl, _df(spark, [(2, "b")]))
    assert v == 4  # two rivals took 2 and 3
    assert (2, "b") in _rows(tbl.read(spark))

    # permanent contention must still give up, not spin. Since r7,
    # commit() itself rebases appends up to _MAX_COMMIT_REBASE times
    # per call — shrink the bound so the give-up path is reachable in
    # test time (the product bound is 50 per attempt).
    import kafka_database_import_spark.sources.snapshot as _snap

    races["left"] = 99
    orig_bound = _snap._MAX_COMMIT_REBASE
    _snap._MAX_COMMIT_REBASE = 2
    try:
        with pytest.raises(ConcurrentCommitError):
            commit_with_retry(tbl, _df(spark, [(3, "c")]), attempts=3)
    finally:
        _snap._MAX_COMMIT_REBASE = orig_bound


# --------------------------------------------------- copy-on-write mutation


def _commit_in_parts(spark, tbl, groups):
    """Commit each group as its own version so the table has several
    independent files — the unit copy-on-write must preserve."""
    for g in groups:
        tbl.commit(_df(spark, g))


def test_delete_where_rewrites_only_affected_files(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(
        spark,
        tbl,
        [[(1, "a"), (2, "b")], [(3, "c"), (4, "d")], [(5, "e"), (6, "f")]],
    )
    before = tbl.manifest()["files"]
    res = tbl.delete_where(spark, "k = 3")
    assert res["deleted_rows"] == 1
    assert res["rewritten_files"] >= 1
    after = tbl.manifest()["files"]
    # untouched files carried BY REFERENCE: same relative paths survive
    carried = set(before) & set(after)
    assert len(carried) == len(before) - res["rewritten_files"]
    assert _rows(tbl.read(spark)) == [
        (1, "a"), (2, "b"), (4, "d"), (5, "e"), (6, "f")
    ]
    # time travel: the pre-delete version still has row 3
    assert (3, "c") in _rows(tbl.read(spark, version=3))
    assert tbl.manifest()["mode"] == "delete"


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, None), (3, "x")]))
    tbl.delete_where(spark, F.col("v") == "x")  # NULL == 'x' is NULL -> keep
    assert _rows(tbl.read(spark)) == [(1, "a"), (2, None)]


def test_delete_where_no_match_publishes_nothing(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    res = tbl.delete_where(spark, "k = 999")
    assert res["version"] == 1
    assert res["rewritten_files"] == 0 and res["deleted_rows"] == 0
    assert tbl.latest_version() == 1


def test_delete_where_stats_prune_skips_unaffected_files(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    for lo in (0, 100, 200):
        tbl.commit(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(10)], SCHEMA
            ).coalesce(1)
        )
    res = tbl.delete_where(spark, "k BETWEEN 105 AND 107", stats_range=("k", 105, 107))
    assert res["deleted_rows"] == 3
    assert res["rewritten_files"] == 1  # pruning confined the rewrite
    assert len(_rows(tbl.read(spark))) == 27
    # the rewritten file's stats were refreshed; kept files kept theirs
    m = tbl.manifest()
    assert all(f in m["stats"] for f in m["files"])


def test_merge_rows_upserts_and_carries_untouched_files(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(spark, tbl, [[(1, "a"), (2, "b")], [(3, "c"), (4, "d")]])
    before = tbl.manifest()["files"]
    src = _df(spark, [(2, "B2"), (9, "new")])
    res = tbl.merge_rows(spark, src, ["k"])
    assert res["matched_rows"] == 1 and res["inserted_rows"] == 1
    after = tbl.manifest()["files"]
    assert set(before) & set(after)  # file with k=3,4 carried by reference
    assert _rows(tbl.read(spark)) == [
        (1, "a"), (2, "B2"), (3, "c"), (4, "d"), (9, "new")
    ]
    assert tbl.manifest()["mode"] == "merge"
    # pre-merge version unchanged (time travel over the upsert)
    assert _rows(tbl.read(spark, version=2)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]


def test_merge_rows_matched_delete_and_ignore_modes(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # matched -> delete, unmatched -> ignore: pure CDC delete batch
    res = tbl.merge_rows(
        spark,
        _df(spark, [(2, None), (77, None)]),
        ["k"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    assert res["matched_rows"] == 1 and res["inserted_rows"] == 0
    assert _rows(tbl.read(spark)) == [(1, "a"), (3, "c")]
    # update-only (no inserts)
    res2 = tbl.merge_rows(
        spark,
        _df(spark, [(3, "C3"), (88, "nope")]),
        ["k"],
        when_not_matched="ignore",
    )
    assert res2["matched_rows"] == 1 and res2["inserted_rows"] == 0
    assert _rows(tbl.read(spark)) == [(1, "a"), (3, "C3")]


def test_merge_rows_rejects_duplicate_source_keys(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="duplicate merge keys"):
        tbl.merge_rows(spark, _df(spark, [(1, "x"), (1, "y")]), ["k"])


def test_merge_rows_schema_evolution_adds_column(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b")]))
    src = spark.createDataFrame(
        [(2, "B2", 7.5)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("v", T.StringType()),
                T.StructField("score", T.DoubleType()),
            ]
        ),
    )
    tbl.merge_rows(spark, src, ["k"])
    got = sorted(
        (r["k"], r["v"], r["score"]) for r in tbl.read(spark).collect()
    )
    assert got == [(1, "a", None), (2, "B2", 7.5)]


def test_merge_rows_into_empty_table_is_insert(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    res = tbl.merge_rows(spark, _df(spark, [(1, "a")]), ["k"])
    assert res["inserted_rows"] == 1 and res["version"] == 1
    assert _rows(tbl.read(spark)) == [(1, "a")]


def test_cow_delete_rebases_onto_concurrent_append(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        ConcurrentCommitError,
        SnapshotTable,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b")]))

    class RacingTable(SnapshotTable):
        # another writer lands a commit between the head read and the
        # publish: inject it during the data write
        def _write_data(self, df, version, schema_json=None):
            if not getattr(self, "_raced", False):
                self._raced = True
                SnapshotTable(self.root).commit(_df(spark, [(50, "r")]))
            return super()._write_data(df, version, schema_json)

    racing = RacingTable(str(tmp_path / "t"))
    # NEW contract (r7 disjoint-writer rebase): losing the race to an
    # APPEND no longer raises — the delete re-bases onto the new head
    # in one call, and the racer's row survives
    res = racing.delete_where(spark, "k = 1")
    assert res["deleted_rows"] == 1
    assert _rows(tbl.read(spark)) == [(2, "b"), (50, "r")]
    assert tbl.latest_version() == 3  # racer's v2, rebased delete v3


def test_row_changes_reports_cow_diff_exactly(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        row_changes,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(spark, tbl, [[(1, "a"), (2, "b")], [(3, "c"), (4, "d")]])
    v2 = tbl.latest_version()
    tbl.merge_rows(spark, _df(spark, [(2, "B2"), (9, "new")]), ["k"])
    tbl.delete_where(spark, "k = 3")
    diff = row_changes(tbl, spark, v2)
    got = sorted(
        (r["k"], r["v"], r["_change_type"]) for r in diff.collect()
    )
    # update = delete old + insert new; carried rows (1,4) cancel out
    assert got == [
        (1, "a", "delete"),  # carried through the k=2 rewrite? NO — see below
    ] or got == [
        (2, "B2", "insert"),
        (2, "b", "delete"),
        (3, "c", "delete"),
        (9, "new", "insert"),
    ]
    assert (2, "b", "delete") in got and (2, "B2", "insert") in got
    assert (3, "c", "delete") in got and (9, "new", "insert") in got
    assert (4, "d", "delete") not in got and (4, "d", "insert") not in got


def test_row_changes_empty_for_compaction(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        row_changes,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(spark, tbl, [[(1, "a")], [(2, "b")]])
    v = tbl.latest_version()
    tbl.compact(spark)
    assert row_changes(tbl, spark, v).count() == 0


def test_random_cow_mutation_sequences_match_list_model(spark, tmp_path):
    """Model-based lifecycle check EXTENDED with the round-5 row-level
    mutations: random append / merge_rows / delete_where / compact /
    vacuum sequences against an in-memory dict model. Current rows,
    historical reads of every retained version, version numbering, and
    the no-op-delete contract must all agree — the copy-on-write file
    bookkeeping has to survive arbitrary interleavings, not just the
    directed tests."""
    import random

    for seed in range(3):
        rng = random.Random(1000 + seed)
        tbl = SnapshotTable(str(tmp_path / f"m{seed}"))
        history: dict[int, dict] = {}  # version -> {k: v}
        cur: dict = {}
        next_k = 0
        for _step in range(rng.randint(8, 12)):
            roll = rng.random()
            if roll < 0.35 or not history:
                rows = [
                    (next_k + i, f"s{next_k + i}")
                    for i in range(rng.randint(1, 3))
                ]
                next_k += len(rows)
                v = tbl.commit(_df(spark, rows))
                cur = {**cur, **dict(rows)}
            elif roll < 0.6:
                # merge: update a random live key, insert a fresh one
                upd = rng.choice(sorted(cur)) if cur else 0
                src = [(upd, f"u{upd}"), (next_k, f"i{next_k}")]
                next_k += 1
                res = tbl.merge_rows(spark, _df(spark, src), ["k"])
                v = res["version"]
                cur = {**cur, **dict(src)}
            elif roll < 0.8:
                # delete a random subset by key-mod predicate
                m = rng.randint(2, 5)
                res = tbl.delete_where(spark, f"k % {m} = 0")
                survivors = {k: x for k, x in cur.items() if k % m != 0}
                if survivors == cur:  # nothing matched -> no new version
                    assert res["version"] == tbl.latest_version()
                    continue
                v = res["version"]
                assert res["deleted_rows"] == len(cur) - len(survivors)
                cur = survivors
            elif roll < 0.9:
                v = tbl.compact(spark, target_files=1)
            else:
                from kafka_database_import_spark.sources.snapshot import vacuum

                keep = rng.randint(1, len(history))
                vacuum(tbl, retain_last=keep)
                for d in sorted(history)[:-keep]:
                    history.pop(d)
                continue
            history[v] = dict(cur)
        assert tbl.versions() == sorted(history)
        for v, rows in history.items():
            assert _rows(tbl.read(spark, version=v)) == sorted(rows.items()), (
                f"seed={seed} version={v}"
            )


# ------------------------------------------------- merge-on-read deletes


def test_mor_delete_touches_no_data_files(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(spark, tbl, [[(1, "a"), (2, "b")], [(3, "c"), (4, "d")]])
    before = tbl.manifest()["files"]
    res = tbl.delete_where(spark, "k = 2", mode="mor")
    assert res["deleted_rows"] == 1 and res["rewritten_files"] == 0
    m = tbl.manifest()
    assert m["files"] == before  # zero write amplification on data
    assert m["dv_files"]
    assert _rows(tbl.read(spark)) == [(1, "a"), (3, "c"), (4, "d")]
    # time travel: pre-delete version still shows the row
    assert (2, "b") in _rows(tbl.read(spark, version=2))


def test_mor_deletes_accumulate_and_survive_appends(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    tbl.delete_where(spark, "k = 1", mode="mor")
    tbl.commit(_df(spark, [(4, "d")]))  # append must carry the DV
    tbl.delete_where(spark, "k = 3", mode="mor")
    assert _rows(tbl.read(spark)) == [(2, "b"), (4, "d")]
    # no-op MOR delete publishes nothing
    head = tbl.latest_version()
    res = tbl.delete_where(spark, "k = 999", mode="mor")
    assert res["version"] == head and tbl.latest_version() == head


def test_mor_then_cow_mutations_respect_deletion_vectors(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    tbl.delete_where(spark, "k = 2", mode="mor")
    # merge on the MOR-deleted key: it is NOT live, so it's an insert,
    # not an update — and it must not resurrect the old row alongside
    res = tbl.merge_rows(spark, _df(spark, [(2, "B2"), (3, "C3")]), ["k"])
    assert res["matched_rows"] == 1  # only k=3 was live
    assert _rows(tbl.read(spark)) == [(1, "a"), (2, "B2"), (3, "C3")]
    # cow delete over a table with DVs: counts only live rows
    res2 = tbl.delete_where(spark, "k >= 1")
    assert res2["deleted_rows"] == 3


def test_compact_materializes_mor_deletes_and_vacuum_reclaims_dv(
    spark, tmp_path
):
    import glob

    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        vacuum,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    tbl.delete_where(spark, "k = 2", mode="mor")
    assert glob.glob(str(tmp_path / "t" / "data" / "dv*" / "*.parquet"))
    tbl.compact(spark)
    m = tbl.manifest()
    assert "dv_files" not in m  # deletes materialized
    assert _rows(tbl.read(spark)) == [(1, "a"), (3, "c")]
    out = vacuum(tbl, retain_last=1)
    assert out["removed_files"] > 0
    # DV sidecars of dropped versions are reclaimed with them
    assert not glob.glob(str(tmp_path / "t" / "data" / "dv*" / "*.parquet"))
    assert _rows(tbl.read(spark)) == [(1, "a"), (3, "c")]


def test_row_changes_across_mor_delete(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        row_changes,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(spark, tbl, [[(1, "a"), (2, "b")], [(3, "c"), (4, "d")]])
    v = tbl.latest_version()
    tbl.delete_where(spark, "k IN (2, 3)", mode="mor")
    got = sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in row_changes(tbl, spark, v).collect()
    )
    assert got == [(2, "b", "delete"), (3, "c", "delete")]
    # and across a subsequent append the feed composes
    tbl.commit(_df(spark, [(9, "z")]))
    got2 = sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in row_changes(tbl, spark, v).collect()
    )
    assert got2 == [
        (2, "b", "delete"),
        (3, "c", "delete"),
        (9, "z", "insert"),
    ]


def test_mor_delete_on_stats_table_keeps_stats(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    tbl = StatsSnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    tbl.commit(spark.createDataFrame([(i, f"v{i}") for i in range(10)], SCHEMA))
    tbl.delete_where(spark, "k = 5", mode="mor")
    m = tbl.manifest()
    assert all(f in m["stats"] for f in m["files"])
    assert len(_rows(tbl.read(spark))) == 9


def test_update_where_rewrites_only_affected_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(spark, tbl, [[(1, "a"), (2, "b")], [(3, "c"), (4, "d")]])
    before = tbl.manifest()["files"]
    res = tbl.update_where(
        spark, "k = 2", {"v": F.concat(F.col("v"), F.lit("!"))}
    )
    assert res["updated_rows"] == 1 and res["rewritten_files"] >= 1
    assert set(before) & set(tbl.manifest()["files"])  # untouched carried
    assert _rows(tbl.read(spark)) == [(1, "a"), (2, "b!"), (3, "c"), (4, "d")]
    assert tbl.manifest()["mode"] == "update"
    assert (2, "b") in _rows(tbl.read(spark, version=2))  # time travel
    # SQL-string assignment form + null-condition rows untouched
    tbl.commit(_df(spark, [(5, None)]))
    tbl.update_where(spark, F.col("v") == "zzz", {"v": "'hit'"})
    assert tbl.latest_version() == 4  # NULL-cond rows unmatched -> no-op
    res2 = tbl.update_where(spark, "k >= 4", {"v": "upper(coalesce(v, 'x'))"})
    assert res2["updated_rows"] == 2
    assert _rows(tbl.read(spark)) == [
        (1, "a"), (2, "b!"), (3, "c"), (4, "D"), (5, "X")
    ]


def test_update_where_respects_deletion_vectors(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    tbl.delete_where(spark, "k = 2", mode="mor")
    res = tbl.update_where(spark, "k >= 1", {"v": "upper(v)"})
    assert res["updated_rows"] == 2  # the MOR-deleted row is not live
    assert _rows(tbl.read(spark)) == [(1, "A"), (3, "C")]


def test_update_where_rejects_unknown_column(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="unknown column"):
        tbl.update_where(spark, "k = 1", {"nope": "'x'"})


def test_commit_expectations_fail_mode_commits_nothing(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        ExpectationError,
        SnapshotTable,
        commit_with_expectations,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    bad = _df(spark, [(1, "a"), (-5, "neg"), (3, None)])
    with pytest.raises(ExpectationError) as ei:
        commit_with_expectations(
            tbl, bad, {"k_positive": "k > 0", "v_present": "v IS NOT NULL"}
        )
    assert ei.value.violations == {"k_positive": 1, "v_present": 1}
    assert tbl.latest_version() is None  # atomically nothing


def test_commit_expectations_drop_mode_quarantines(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        commit_with_expectations,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    bad = _df(spark, [(1, "a"), (-5, "neg"), (3, None), (4, "d")])
    res = commit_with_expectations(
        tbl,
        bad,
        {"k_positive": "k > 0", "v_present": "v IS NOT NULL"},
        on_violation="drop",
    )
    assert res["violations"] == {"k_positive": 1, "v_present": 1}
    assert res["committed"] == 2
    assert _rows(tbl.read(spark)) == [(1, "a"), (4, "d")]
    # clean batch: no violations key noise, normal commit
    res2 = commit_with_expectations(
        tbl, _df(spark, [(9, "z")]), {"k_positive": "k > 0"}
    )
    assert res2["violations"] == {} and res2["version"] == 2
    # NULL-evaluating predicate counts as violation (fail-closed)
    res3 = commit_with_expectations(
        tbl, _df(spark, [(10, None)]), {"v_short": "length(v) < 5"},
        on_violation="drop",
    )
    assert res3["version"] is None and res3["committed"] == 0


def test_cow_and_mor_deletes_are_equivalent(spark, tmp_path):
    """Property: for random predicates over random tables, mode='cow'
    and mode='mor' produce identical logical states (current read,
    counts) — the strategies differ only in physical layout."""
    import random

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    for seed in range(3):
        rng = random.Random(7000 + seed)
        rows = [
            (i, rng.choice(["a", "b", "c", None]))
            for i in range(rng.randint(10, 30))
        ]
        preds = [
            f"k % {rng.randint(2, 6)} = {rng.randint(0, 1)}",
            rng.choice(["v = 'a'", "v <> 'b'", "v IS NULL", "k > 12"]),
        ]
        tables = []
        for mode in ("cow", "mor"):
            t = SnapshotTable(str(tmp_path / f"{mode}{seed}"))
            for third in range(3):
                part = [r for r in rows if r[0] % 3 == third]
                if part:
                    t.commit(_df(spark, part))
            results = [t.delete_where(spark, p, mode=mode) for p in preds]
            tables.append((t, results))
        (cow_t, cow_r), (mor_t, mor_r) = tables
        assert _rows(cow_t.read(spark)) == _rows(mor_t.read(spark)), (
            f"seed={seed} preds={preds}"
        )
        for rc, rm in zip(cow_r, mor_r):
            assert rc["deleted_rows"] == rm["deleted_rows"]
            assert rm["rewritten_files"] == 0


def test_overwrite_where_replaces_slice_atomically(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(
        spark, tbl, [[(1, "a"), (2, "b")], [(10, "x"), (11, "y")]]
    )
    before = tbl.manifest()["files"]
    # rebuild the k>=10 slice: old slice rows vanish, new ones land,
    # all in one version
    res = tbl.overwrite_where(
        spark, "k >= 10", _df(spark, [(10, "X2"), (12, "Z")])
    )
    assert res["deleted_rows"] == 2 and res["inserted_rows"] == 2
    assert _rows(tbl.read(spark)) == [(1, "a"), (2, "b"), (10, "X2"), (12, "Z")]
    assert set(before) & set(tbl.manifest()["files"])  # k<10 file carried
    assert tbl.manifest()["mode"] == "overwrite_where"
    # time travel across the backfill
    assert (11, "y") in _rows(tbl.read(spark, version=2))
    # slice guard: replacement rows outside the predicate are rejected
    with pytest.raises(ValueError, match="must satisfy the predicate"):
        tbl.overwrite_where(spark, "k >= 10", _df(spark, [(5, "bad")]))
    # empty slice (nothing matched) still appends atomically
    res2 = tbl.overwrite_where(spark, "k = 777", _df(spark, [(777, "new")]))
    assert res2["deleted_rows"] == 0 and res2["inserted_rows"] == 1
    assert (777, "new") in _rows(tbl.read(spark))


def test_mor_delete_rebases_onto_concurrent_append(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import (
        ConcurrentCommitError,
        SnapshotTable,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b")]))

    class RacingTable(SnapshotTable):
        def _write_dv(self, hits, version):
            if not getattr(self, "_raced", False):
                self._raced = True
                SnapshotTable(self.root).commit(_df(spark, [(50, "r")]))
            return super()._write_dv(hits, version)

    racing = RacingTable(str(tmp_path / "t"))
    # NEW contract (r7): MOR deletes merge with concurrent appends —
    # one call, DV lands against the rebased head, racer's row kept
    res = racing.delete_where(spark, "k = 1", mode="mor")
    assert res["deleted_rows"] == 1
    assert _rows(tbl.read(spark)) == [(2, "b"), (50, "r")]
    assert tbl.latest_version() == 3


def test_merge_rows_duplicate_target_keys_stat_exact(spark, tmp_path):
    """ADVICE r5: a target holding duplicate keys (appends can create
    them) must not corrupt the inserted_rows stat — inserts are counted
    by anti-joining SOURCE against the target key set, never as
    source.count() - matched_target_rows (which can go negative)."""
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    # key 1 appears THREE times in the target across two appends
    _commit_in_parts(spark, tbl, [[(1, "a"), (1, "a2"), (2, "b")], [(1, "a3")]])
    src = _df(spark, [(1, "A"), (9, "new")])
    res = tbl.merge_rows(spark, src, ["k"])
    # matched_rows counts matched TARGET rows (documented): 3 here
    assert res["matched_rows"] == 3
    # inserted_rows counts source rows with NO target match: exactly 1
    assert res["inserted_rows"] == 1
    # duplicate target rows collapse onto the one source row (documented)
    assert _rows(tbl.read(spark)) == [(1, "A"), (2, "b"), (9, "new")]


def test_cow_and_mor_updates_and_merges_are_equivalent(spark, tmp_path):
    """Property (completes the COW≡MOR matrix the delete has): random
    interleaved update_where / merge_rows mutations produce identical
    logical states in both strategies; MOR never rewrites a data file;
    compaction converges the physical layouts."""
    import random

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    for seed in range(3):
        rng = random.Random(8100 + seed)
        rows = [(i, rng.choice(["a", "b", "c"])) for i in range(25)]
        tables = []
        for mode in ("cow", "mor"):
            t = SnapshotTable(str(tmp_path / f"um_{mode}{seed}"))
            for third in range(3):
                part = [r for r in rows if r[0] % 3 == third]
                t.commit(_df(spark, part))
            stats = []
            for step in range(4):
                # per-step seeded RNG so both modes see IDENTICAL ops
                srng = random.Random(9000 + seed * 10 + step)
                op = srng.choice(["update", "merge_ui", "merge_del"])
                if op == "update":
                    mod, val = srng.randint(2, 5), srng.randint(0, 1)
                    r = t.update_where(
                        spark,
                        f"k % {mod} = {val}",
                        {"v": f"concat(v, '+{step}')"},
                        mode=mode,
                    )
                elif op == "merge_ui":
                    src = _df(
                        spark,
                        [(srng.randrange(35), f"m{step}.{j}") for j in
                         srng.sample(range(9), 3)],
                    ).dropDuplicates(["k"])
                    r = t.merge_rows(spark, src, ["k"], mode=mode)
                else:
                    src = _df(
                        spark, [(srng.randrange(30), "x") for _ in range(2)]
                    ).dropDuplicates(["k"])
                    r = t.merge_rows(
                        spark, src, ["k"], when_matched="delete",
                        when_not_matched="ignore", mode=mode,
                    )
                if mode == "mor":
                    assert r["rewritten_files"] == 0, (seed, step, op)
                stats.append({k: v for k, v in r.items()
                              if k not in ("version", "rewritten_files",
                                           "kept_files")})
            tables.append((t, stats))
        (cow_t, cow_s), (mor_t, mor_s) = tables
        assert _rows(cow_t.read(spark)) == _rows(mor_t.read(spark)), seed
        assert cow_s == mor_s, seed
        mor_t.compact(spark)
        assert _rows(mor_t.read(spark)) == _rows(cow_t.read(spark))
        assert not mor_t.manifest().get("dv_files")


def test_mor_update_touches_no_data_files_and_time_travels(spark, tmp_path):
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    _commit_in_parts(spark, tbl, [[(1, "a"), (2, "b")], [(3, "c")]])
    files_before = set(tbl.manifest()["files"])
    res = tbl.update_where(spark, "k <= 2", {"v": "upper(v)"}, mode="mor")
    assert res["updated_rows"] == 2 and res["rewritten_files"] == 0
    # every pre-update data file still referenced; updates are appends+DV
    assert files_before < set(tbl.manifest()["files"])
    assert tbl.manifest()["dv_files"]
    assert _rows(tbl.read(spark)) == [(1, "A"), (2, "B"), (3, "c")]
    # time travel: the pre-update version is untouched
    assert _rows(tbl.read(spark, version=2)) == [(1, "a"), (2, "b"), (3, "c")]


def test_optimize_compacts_zorders_and_refreshes_stats(spark, tmp_path):
    """optimize() = compact + Z-order + stats in ONE state-preserving
    overwrite commit: MOR deletion vectors materialize, the file count
    drops, and read_pruned skips files on BOTH clustered columns where
    the pre-optimize layout pruned (almost) nothing."""
    import random

    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    rng = random.Random(42)
    tbl = StatsSnapshotTable(str(tmp_path / "t"), ["a", "b"])
    rows = [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(4000)]
    # 8 appends in random order: every file spans ~the full (a, b) range
    for c in range(8):
        chunk = rows[c * 500:(c + 1) * 500]
        tbl.commit(spark.createDataFrame(chunk, "k long, a long, b long"))
    tbl.delete_where(spark, "k % 97 = 0", mode="mor")  # pending DVs
    snap = lambda df: sorted(tuple(r) for r in df.collect())
    before = snap(tbl.read(spark))
    tbl.read_pruned(spark, "a", 100, 150).count()
    pruned_a_before = tbl.last_pruned_counts
    res = tbl.optimize(spark, zorder_by=("a", "b"), target_files=8)
    assert res["dv_cleared"] == 1 and not tbl.manifest().get("dv_files")
    assert res["files_after"] == 8
    # logical state preserved exactly
    assert snap(tbl.read(spark)) == before
    # pruning now bites on BOTH dimensions
    assert tbl.read_pruned(spark, "a", 100, 150).count() > 0
    pruned_a = tbl.last_pruned_counts
    tbl.read_pruned(spark, "b", 800, 850).count()
    pruned_b = tbl.last_pruned_counts
    assert pruned_a_before[0] == pruned_a_before[1]  # nothing pruned before
    assert pruned_a[0] < pruned_a[1], pruned_a
    assert pruned_b[0] < pruned_b[1], pruned_b
    # old version still reads its original files (time travel intact)
    assert len(snap(tbl.read(spark, version=8))) == 4000


def test_rename_column_reads_old_files_and_history(spark, tmp_path):
    """Field-id rename: metadata-only commit; files written under the
    OLD name resolve to the new name by parquet field id, appends after
    the rename interleave, and time travel reads each version under the
    names it had then."""
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a"), (2, "b")]))           # v1: (k, v)
    v2 = tbl.rename_column("v", "val")                      # v2: (k, val)
    assert v2 == 2 and tbl.manifest()["mode"] == "rename"
    assert tbl.manifest()["files"] == tbl.manifest(1)["files"]  # no rewrite
    tbl.commit(
        spark.createDataFrame([(3, "c")], "k long, val string")
    )                                                       # v3 append
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    assert tbl.read(spark).columns == ["k", "val"]
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # history: v1 still reads under the old name
    old = tbl.read(spark, version=1)
    assert old.columns == ["k", "v"]
    assert sorted(tuple(r) for r in old.collect()) == [(1, "a"), (2, "b")]
    # mutations keep working through the rename
    tbl.delete_where(spark, "val = 'b'")
    assert sorted(tuple(r) for r in tbl.read(spark).collect()) == [
        (1, "a"), (3, "c")
    ]


def test_drop_column_then_readd_does_not_resurrect(spark, tmp_path):
    """Drop tombstones the field id; re-adding the same NAME mints a
    fresh id, so pre-drop file data for that name reads NULL — never
    silently resurrected."""
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                              "k long, v string, w long")
    )
    v2 = tbl.drop_column("w")
    assert tbl.manifest()["mode"] == "drop"
    assert tbl.manifest()["dropped_ids"] == [3]
    assert tbl.read(spark).columns == ["k", "v"]
    # re-add same name via an evolved append: fresh id (4), old data invisible
    tbl.commit(spark.createDataFrame([(3, "c", 99)], "k long, v string, w long"))
    got = sorted(tuple(r) for r in tbl.read(spark).collect())
    assert got == [(1, "a", None), (2, "b", None), (3, "c", 99)], got
    assert tbl.manifest()["dropped_ids"] == [3]  # tombstone carried
    # time travel: v1 shows the original w values
    assert sorted(tuple(r) for r in tbl.read(spark, version=1).collect()) == [
        (1, "a", 10), (2, "b", 20)
    ]


def test_schema_evolution_refusals_and_legacy_upgrade(spark, tmp_path):
    """Ambiguity and legacy-table guards: rename onto a live name
    refuses; a pre-field-id table refuses rename/drop with the
    optimize() remedy, and after optimize() the rename works."""
    import json as _json

    import pytest as _pt

    from kafka_database_import_spark.sources.snapshot import (
        SchemaEvolutionError,
        SnapshotTable,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    with _pt.raises(SchemaEvolutionError, match="ambiguous"):
        tbl.rename_column("v", "k")
    with _pt.raises(KeyError, match="no column"):
        tbl.rename_column("nope", "x")
    tbl.drop_column("k")  # fine: one column remains
    with _pt.raises(SchemaEvolutionError, match="last column"):
        tbl.drop_column("v")

    # forge a LEGACY table: strip field ids from the manifest to mimic
    # a table created before this feature
    leg = SnapshotTable(str(tmp_path / "leg"))
    leg.commit(_df(spark, [(1, "a"), (2, "b")]))
    mp = leg._manifest_path(1)
    m = _json.load(open(mp))
    sch = _json.loads(m["schema"])
    for f in sch["fields"]:
        f["metadata"] = {}
    m["schema"] = _json.dumps(sch)
    _json.dump(m, open(mp, "w"))
    with _pt.raises(SchemaEvolutionError, match="optimize"):
        leg.rename_column("v", "val")
    leg.optimize(spark, target_files=1)  # overwrite stamps fresh ids
    leg.rename_column("v", "val")
    assert leg.read(spark).columns == ["k", "val"]
    assert sorted(tuple(r) for r in leg.read(spark).collect()) == [
        (1, "a"), (2, "b")
    ]


def test_optimize_small_files_is_selective(spark, tmp_path):
    """Incremental compaction: only under-sized files are rewritten;
    right-sized files are carried BY REFERENCE (O(small), not
    O(table)); DVs on rewritten files materialize, logical state is
    exactly preserved."""
    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    # one big file (300 rows), six small ones (10 each)
    tbl.commit(
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(300)], "k long, v string"
        ).coalesce(1)
    )
    for c in range(6):
        tbl.commit(
            spark.createDataFrame(
                [(1000 + c * 10 + j, "s") for j in range(10)], "k long, v string"
            ).coalesce(1)
        )
    tbl.delete_where(spark, "k = 1005", mode="mor")  # DV on a small file
    big = [f for f in tbl.manifest(1)["files"]]
    before = sorted(tuple(r) for r in tbl.read(spark).collect())
    res = tbl.optimize_small_files(spark, small_file_rows=100)
    assert res["compacted_files"] == 6 and res["kept_files"] == 1
    m = tbl.manifest()
    assert big[0] in m["files"]  # the big file carried by reference
    assert len(m["files"]) == 1 + res["new_files"]
    assert sorted(tuple(r) for r in tbl.read(spark).collect()) == before
    assert len(before) == 359  # 300 + 60 - 1 deleted
    # second pass: nothing left to compact
    res2 = tbl.optimize_small_files(spark, small_file_rows=100)
    assert res2["compacted_files"] == 0 and res2["version"] == res["version"]


def test_schema_widening_append_and_back(spark, tmp_path):
    """Safe type widening (int→bigint, float→double) on append: the
    manifest adopts the wider type, files written under EITHER width
    decode correctly, the field id survives, and a genuinely different
    type still refuses."""
    import json as _json

    import pytest as _pt

    from kafka_database_import_spark.sources.snapshot import (
        SchemaEvolutionError,
        SnapshotTable,
    )
    from pyspark.sql import types as T

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(spark.createDataFrame([(1, 1.5)], "k int, x float"))
    id_before = {
        f.name: f.metadata.get("parquet.field.id")
        for f in T.StructType.fromJson(
            _json.loads(tbl.manifest()["schema"])
        ).fields
    }
    # widening append
    tbl.commit(spark.createDataFrame([(2_000_000_000_000, 2.5)],
                                     "k long, x double"))
    got = tbl.read(spark)
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint", "double"
    ]
    assert sorted(tuple(r) for r in got.collect()) == [
        (1, 1.5), (2_000_000_000_000, 2.5)
    ]
    # narrow append into the widened table keeps the wide type
    tbl.commit(spark.createDataFrame([(3, 3.5)], "k int, x float"))
    got = tbl.read(spark)
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint", "double"
    ]
    assert got.count() == 3
    # identity preserved through the widening
    id_after = {
        f.name: f.metadata.get("parquet.field.id")
        for f in T.StructType.fromJson(
            _json.loads(tbl.manifest()["schema"])
        ).fields
    }
    assert id_after == id_before
    # a real type change still refuses
    with _pt.raises(SchemaEvolutionError, match="type CHANGE"):
        tbl.commit(spark.createDataFrame([("x", 1.0)], "k string, x double"))


def test_rename_carries_stats_and_history_reports(spark, tmp_path):
    """Stats pruning survives a rename (stat keys re-keyed to the new
    name in the metadata commit), and history() reports the lineage
    audit trail."""
    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    tbl = StatsSnapshotTable(str(tmp_path / "t"), ["k"])
    tbl.commit(
        spark.createDataFrame([(i, "x") for i in range(100)], "k long, v string")
        .coalesce(1)
    )
    tbl.commit(
        spark.createDataFrame(
            [(i, "y") for i in range(1000, 1100)], "k long, v string"
        ).coalesce(1)
    )
    tbl.rename_column("k", "key")
    # pruning on the NEW name hits the carried per-file ranges
    got = tbl.read_pruned(spark, "key", 1000, 1050)
    assert got.count() == 51
    assert tbl.last_pruned_counts == (1, 2)  # one of two files pruned away
    h = tbl.history()
    assert [e["mode"] for e in h] == ["append", "append", "rename"]
    assert h[-1]["n_files"] == 2 and h[-1]["rewrite_only"] is False


def test_optimize_zorders_three_dimensions(spark, tmp_path):
    """N-D Z-order through optimize(): after clustering on THREE keys,
    stats pruning bites on each of them individually."""
    import random

    from kafka_database_import_spark.sources.snapshot import StatsSnapshotTable

    rng = random.Random(7)
    tbl = StatsSnapshotTable(str(tmp_path / "t"), ["a", "b", "c"])
    rows = [
        (i, rng.randrange(1000), rng.randrange(1000), rng.randrange(1000))
        for i in range(4000)
    ]
    for ch in range(8):
        tbl.commit(
            spark.createDataFrame(
                rows[ch * 500:(ch + 1) * 500], "k long, a long, b long, c long"
            )
        )
    before = sorted(tuple(r) for r in tbl.read(spark).collect())
    tbl.optimize(spark, zorder_by=("a", "b", "c"), target_files=8)
    assert sorted(tuple(r) for r in tbl.read(spark).collect()) == before
    for col in ("a", "b", "c"):
        tbl.read_pruned(spark, col, 100, 140).count()
        kept, total = tbl.last_pruned_counts
        assert kept < total, (col, tbl.last_pruned_counts)


def test_timestamp_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: every commit path stamps committed_at_ms at
    the publish choke point; read_as_of resolves the newest version at
    or before the asked instant, across appends AND mutations."""
    import time

    import pytest as _pt

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    time.sleep(0.05)
    t_after_v1 = int(time.time() * 1000)
    time.sleep(0.05)
    tbl.commit(_df(spark, [(2, "b")]))
    tbl.delete_where(spark, "k = 1")
    t_now = int(time.time() * 1000) + 10
    assert tbl.version_as_of(t_after_v1) == 1
    assert _rows(tbl.read_as_of(spark, t_after_v1)) == [(1, "a")]
    assert tbl.version_as_of(t_now) == 3
    assert _rows(tbl.read_as_of(spark, t_now)) == [(2, "b")]
    # history carries the audit timestamps too
    assert all("committed_at_ms" in tbl.manifest(v) for v in tbl.versions())
    with _pt.raises(ValueError, match="no version"):
        tbl.version_as_of(t_after_v1 - 10_000_000)


def test_metadata_commits_get_fresh_timestamps(spark, tmp_path):
    """rename/drop must NOT inherit the parent's committed_at_ms —
    version_as_of stays monotone across metadata commits."""
    import time

    from kafka_database_import_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_df(spark, [(1, "a")]))
    time.sleep(0.05)
    t_mid = int(time.time() * 1000)
    time.sleep(0.05)
    tbl.rename_column("v", "val")
    assert tbl.manifest(2)["committed_at_ms"] > tbl.manifest(1)["committed_at_ms"]
    assert tbl.version_as_of(t_mid) == 1


def test_manifest_extra_rides_commits_atomically(spark, tmp_path):
    """Round 13: caller bookkeeping (e.g. a star view's dim pins)
    rides the data commit's own manifest — atomic by construction —
    and the protocol's reserved keys are defended."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    v1 = tbl.commit(df, manifest_extra={"dim_pins": {"/d": 3}})
    assert tbl.manifest(v1)["dim_pins"] == {"/d": 3}
    # replace_where_keys carries it on the swap commit too
    keys = spark.createDataFrame([(1,)], "k long")
    res = tbl.replace_where_keys(
        spark,
        keys,
        spark.createDataFrame([(1, "b")], "k long, v string"),
        ["k"],
        epoch_id=9,
        manifest_extra={"dim_pins": {"/d": 4}},
    )
    m = tbl.manifest(res["version"])
    assert m["dim_pins"] == {"/d": 4} and m["epoch_id"] == 9
    # a later plain commit does NOT inherit the extra
    v3 = tbl.commit(spark.createDataFrame([(2, "c")], "k long, v string"))
    assert "dim_pins" not in tbl.manifest(v3)
    # reserved keys are refused loudly, and non-JSON values fail fast
    with pytest.raises(ValueError, match="protocol-owned"):
        tbl.commit(df, manifest_extra={"files": []})
    with pytest.raises(TypeError):
        tbl.commit(df, manifest_extra={"x": object()})
