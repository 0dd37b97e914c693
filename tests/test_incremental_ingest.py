"""Incremental ingest end-to-end: two availableNow runs over a growing
source directory through the idempotent upsert sink — the operational
shape of the "database import" in production (catkup runs / cron
triggers). Asserts incrementality (run 2 reads only the new file),
sink completeness, and ledger growth."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kafka_database_import_spark.sinks.jdbc import ParquetUpsertSink


def _leaf_parquet(spark, path, ids):
    scratch = tempfile.mkdtemp(prefix="kdis_inc_")
    spark.createDataFrame([(i, f"u{i % 7}") for i in ids], "event_id LONG, uid STRING") \
        .coalesce(1).write.mode("overwrite").parquet(scratch)
    shutil.move(glob.glob(os.path.join(scratch, "part-*.parquet"))[0], path)


def test_incremental_runs_upsert_only_new_data(spark):
    src = tempfile.mkdtemp(prefix="kdis_inc_src_")
    ckpt = tempfile.mkdtemp(prefix="kdis_inc_ckpt_")
    sink = ParquetUpsertSink(tempfile.mkdtemp(prefix="kdis_inc_sink_"), ["event_id"])

    def run():
        schema = "event_id LONG, uid STRING"
        sdf = spark.readStream.schema(schema).parquet(src)
        q = (
            sdf.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    _leaf_parquet(spark, os.path.join(src, "a.parquet"), range(100))
    run()
    assert sink.read_back(spark).count() == 100

    _leaf_parquet(spark, os.path.join(src, "b.parquet"), range(80, 150))
    q2 = run()
    # run 2 touched only the new file's rows
    rows_in = sum(p["numInputRows"] for p in q2.recentProgress)
    assert rows_in == 70, rows_in
    # overlap keys (80..99) upserted, not duplicated
    table = sink.read_back(spark)
    assert table.count() == 150
    assert table.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    # epoch ledger grew by one committed epoch per non-empty run
    ledger = os.listdir(os.path.join(sink.root, "_ledger"))
    assert len(ledger) >= 2


def test_snapshot_changes_drive_incremental_aggregation(spark, tmp_path):
    """The consumer side of the table format: a downstream aggregate is
    maintained from changes() deltas only (the q99y IVM merge law:
    agg(state) ⊕ agg(delta) == agg(all)) and must equal the full
    recompute at every version. This is the O(delta) pipeline shape —
    the aggregating job never rescans the table."""
    from pyspark.sql import types as T

    from kafka_database_import_spark.sources.snapshot import SnapshotTable, changes

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    tbl = SnapshotTable(str(tmp_path / "t"))
    batches = [
        [("a", 1), ("b", 2)],
        [("a", 10), ("c", 3)],
        [("b", 5), ("c", 30), ("a", 100)],
    ]

    def agg(df):
        return df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def merge(state, delta):
        u = state.unionByName(delta)
        return u.groupBy("k").agg(F.sum("s").alias("s"), F.sum("n").alias("n"))

    state = None
    seen_version = None
    for rows in batches:
        v = tbl.commit(spark.createDataFrame(rows, schema))
        if state is None:
            state = agg(tbl.read(spark, v))
        else:
            delta = changes(tbl, spark, from_version=seen_version, to_version=v)
            state = merge(state, agg(delta))
        seen_version = v
        got = {r["k"]: (r["s"], r["n"]) for r in state.collect()}
        want = {
            r["k"]: (r["s"], r["n"]) for r in agg(tbl.read(spark, v)).collect()
        }
        assert got == want, f"version {v}: incremental {got} != full {want}"


def test_snapshot_changes_stream_tails_append_lineage(spark, tmp_path):
    """The table-as-a-stream source (sources/snapshot_stream.py):
    commits made BEFORE the stream starts arrive as the first batch,
    commits made between micro-batches arrive incrementally, offsets
    are versions, and a non-append commit poisons the lineage with a
    clear error. Replay determinism comes free from immutable files."""
    import glob
    import json
    import os
    import time

    from kafka_database_import_spark.sources.pyds import register as reg_sink
    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import register

    register(spark)
    reg_sink(spark)  # jsonl sink for the drain
    root = str(tmp_path / "tbl")
    tbl = SnapshotTable(root)
    tbl.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    tbl.commit(spark.createDataFrame([(3, "c")], "k long, v string"))

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("kdis_snapshot_changes")
        .option("path", root)
        .load()
        .writeStream.format("kdis_jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def drained(n):
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            rows = [
                json.loads(l)
                for p in glob.glob(os.path.join(out, "part-*.jsonl"))
                for l in open(p)
            ]
            if len(rows) >= n:
                return rows
            time.sleep(0.3)
        raise AssertionError(f"drain timeout below {n} rows")

    try:
        rows = drained(3)
        assert sorted((r["k"], r["v"]) for r in rows) == [
            (1, "a"), (2, "b"), (3, "c")
        ]
        # a commit while the stream runs arrives as a later batch
        tbl.commit(spark.createDataFrame([(4, "d")], "k long, v string"))
        rows = drained(4)
        assert (4, "d") in {(r["k"], r["v"]) for r in rows}
    finally:
        q.stop()

    # non-append commit resets lineage: the next read raises clearly
    tbl.delete_where(spark, "k = 1")
    from kafka_database_import_spark.sources.snapshot_stream import (
        SnapshotChangesDataSource,
    )

    ds = SnapshotChangesDataSource(options={"path": root})
    rdr = ds.simpleStreamReader(None)
    import pytest as _pt

    with _pt.raises(Exception, match="APPEND lineage"):
        it, _ = rdr.read({"version": 3})
        list(it)


def test_snapshot_changes_stream_caps_versions_per_batch(spark, tmp_path):
    """Admission control: maxVersionsPerBatch=1 makes each micro-batch
    exactly one commit's delta — a consumer starting on an old table
    catches up version-by-version (checkpointable progress) instead of
    swallowing the backlog in one driver-side batch. The SIMPLE reader
    caps EVERY batch (its read(start) is handed the true start); the
    partitioned reader documents first-batch-uncapped (see the reader's
    ADVICE-r6 note) and is asserted at the offset-protocol level
    below."""
    import time

    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import register

    register(spark)
    root = str(tmp_path / "tbl")
    tbl = SnapshotTable(root)
    for i in range(4):  # backlog of 4 versions before the stream starts
        tbl.commit(
            spark.createDataFrame([(i * 10 + j, f"v{i}") for j in range(3)],
                                  "k long, v string")
        )
    name = "kdis_capver_sink"
    q = (
        spark.readStream.format("kdis_snapshot_changes")
        .option("path", root)
        .option("reader", "simple")
        .option("maxVersionsPerBatch", "1")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if sum(p["numInputRows"] for p in q.recentProgress) >= 12:
                break
            time.sleep(0.3)
        batches = [
            p["numInputRows"] for p in q.recentProgress if p["numInputRows"]
        ]
        assert sum(batches) == 12
        assert max(batches) == 3  # never more than ONE version per batch
        assert spark.table(name).count() == 12
    finally:
        q.stop()


def test_snapshot_changes_partitioned_reader_offset_protocol(spark, tmp_path):
    """The partitioned reader's offset contract, asserted directly in
    the order Spark actually calls it (latestOffset FIRST, with no view
    of any checkpointed start): the first answer is the UNCAPPED head —
    never less than any committed offset, so a restart can't regress —
    and the cap applies from the second batch once partitions() has
    seeded the true start."""
    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import (
        SnapshotChangesDataSource,
    )

    root = str(tmp_path / "tbl")
    tbl = SnapshotTable(root)
    for i in range(6):
        tbl.commit(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string")
        )

    ds = SnapshotChangesDataSource(
        options={"path": root, "maxVersionsPerBatch": "2"}
    )
    # fresh-run instance: first latestOffset is uncapped (head=6)
    rdr = ds.streamReader(None)
    assert rdr.latestOffset() == {"version": 6}
    # ... and once a batch is planned, later batches are capped
    rdr.partitions({"version": 0}, {"version": 6})
    for i in range(6, 9):
        tbl.commit(spark.createDataFrame([(i, f"v{i}")], "k long, v string"))
    assert rdr.latestOffset() == {"version": 8}  # 6 + cap(2), head is 9

    # restart-shaped instance: committed offset 6 > start(0) + cap(2);
    # the first answer must never fall below 6
    rdr2 = ds.streamReader(None)
    off = rdr2.latestOffset()
    assert off["version"] >= 6, off
    assert [p.path for p in rdr2.partitions({"version": 6}, off)]  # only new


def test_snapshot_changes_cap_state_dir_caps_restart_batch(spark, tmp_path):
    """ADVICE r7 / VERDICT r8 item 3: without durable admission state,
    the FIRST micro-batch after a clean restart is uncapped (the Python
    offset protocol calls latestOffset before the reader can see the
    checkpointed start). ``option("capStateDir", dir)`` persists the
    max PLANNED offset — a floor provably >= every offset in the
    checkpoint log — so a restarted reader's first answer is
    ``min(head, floor + cap)``: capped, and never a regression even if
    maxVersionsPerBatch was lowered between runs."""
    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import (
        SnapshotChangesDataSource,
    )

    root = str(tmp_path / "tbl")
    state = str(tmp_path / "capstate")
    tbl = SnapshotTable(root)
    for i in range(6):
        tbl.commit(spark.createDataFrame([(i, f"v{i}")], "k long, v string"))

    opts = {"path": root, "maxVersionsPerBatch": "2", "capStateDir": state}
    ds = SnapshotChangesDataSource(options=opts)
    rdr = ds.streamReader(None)
    # very first run ever: no state yet -> documented uncapped head
    assert rdr.latestOffset() == {"version": 6}
    rdr.partitions({"version": 0}, {"version": 6})

    # the table grows, then the query restarts cleanly at offset 6
    for i in range(6, 14):
        tbl.commit(spark.createDataFrame([(i, f"v{i}")], "k long, v string"))
    rdr2 = SnapshotChangesDataSource(options=opts).streamReader(None)
    off = rdr2.latestOffset()
    assert off == {"version": 8}, off  # floor(6) + cap(2), NOT head(14)
    assert rdr2.partitions({"version": 6}, off)  # only the capped delta
    # subsequent batches stay capped and converge on the head
    assert rdr2.latestOffset() == {"version": 10}

    # safety under a LOWERED cap: the persisted floor is the max
    # PLANNED offset (10), so a new instance can never answer below an
    # offset the checkpoint may carry
    opts_low = dict(opts, maxVersionsPerBatch="1")
    rdr3 = SnapshotChangesDataSource(options=opts_low).streamReader(None)
    assert rdr3.latestOffset() == {"version": 11}

    # start_version dominates a stale/missing floor from another table
    # state dir: floor never drags the answer below the configured start
    opts_sv = dict(opts, capStateDir=str(tmp_path / "fresh"),
                   startVersion="12")
    rdr4 = SnapshotChangesDataSource(options=opts_sv).streamReader(None)
    assert rdr4.latestOffset() == {"version": 14}  # no state -> uncapped
    rdr5 = SnapshotChangesDataSource(options=opts_sv).streamReader(None)
    assert rdr5.latestOffset() == {"version": 14}  # floor 14 = head


def test_snapshot_changes_stream_null_fills_evolved_schema(spark, tmp_path):
    """ADVICE r5 (medium): files written BEFORE a column was added must
    null-fill that column by NAME, not zip positionally — the stream
    schema is frozen from the head manifest, and v1's two-column files
    arrive projected to the three-column schema."""
    import time

    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import register

    register(spark)
    root = str(tmp_path / "tbl")
    tbl = SnapshotTable(root)
    tbl.commit(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    tbl.commit(
        spark.createDataFrame([(3, "c", 30)], "k long, v string, w long")
    )

    for reader, name in (("partitioned", "kdis_evo_part"), ("simple", "kdis_evo_simple")):
        q = (
            spark.readStream.format("kdis_snapshot_changes")
            .option("path", root)
            .option("reader", reader)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{reader}"))
            .start()
        )
        try:
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                if sum(p["numInputRows"] for p in q.recentProgress) >= 3:
                    break
                time.sleep(0.3)
            rows = sorted(
                (r["k"], r["v"], r["w"]) for r in spark.table(name).collect()
            )
            assert rows == [(1, "a", None), (2, "b", None), (3, "c", 30)], (
                reader,
                rows,
            )
        finally:
            q.stop()


def test_snapshot_changes_partitioned_reader_parity(spark, tmp_path):
    """The partition-planned reader (one InputPartition per added file,
    executor-side Arrow reads) must be row-for-row identical to the
    Simple driver-side reader on the same lineage, and must split a
    multi-file append into multiple input partitions."""
    import time

    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import (
        SnapshotChangesDataSource,
        register,
    )

    register(spark)
    root = str(tmp_path / "tbl")
    tbl = SnapshotTable(root)
    # a bulk append: 4 files in one commit, plus a second small commit
    tbl.commit(
        spark.createDataFrame(
            [(i, f"u{i % 5}") for i in range(400)], "k long, v string"
        ).repartition(4)
    )
    tbl.commit(spark.createDataFrame([(1000, "z")], "k long, v string"))

    # planner check, direct: the first version's batch is 4 partitions
    ds = SnapshotChangesDataSource(options={"path": root})
    rdr = ds.streamReader(None)
    parts = rdr.partitions({"version": 0}, {"version": 1})
    assert len(parts) == 4, [p.path for p in parts]

    got = {}
    for reader, name in (("partitioned", "kdis_par_p"), ("simple", "kdis_par_s")):
        q = (
            spark.readStream.format("kdis_snapshot_changes")
            .option("path", root)
            .option("reader", reader)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{reader}"))
            .start()
        )
        try:
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                if sum(p["numInputRows"] for p in q.recentProgress) >= 401:
                    break
                time.sleep(0.3)
            got[reader] = sorted(
                (r["k"], r["v"]) for r in spark.table(name).collect()
            )
        finally:
            q.stop()
    assert got["partitioned"] == got["simple"]
    assert len(got["partitioned"]) == 401


def test_snapshot_changes_restart_beyond_cap_no_redelivery(spark, tmp_path):
    """ADVICE r6 (high): a clean restart whose checkpointed offset V
    exceeds startVersion + maxVersionsPerBatch must NOT regress the
    offset. The buggy path: a fresh reader (_last_end=None) capped
    latestOffset at start+cap < V, Spark planned (V, smaller], an empty
    partitions() let the regressed offset commit, and the next batch
    re-read versions <= V as duplicates. The fix returns the uncapped
    head until the true start is known, so run 2 delivers exactly the
    new version's rows — no duplicates, no loss."""
    import glob as _glob
    import json as _json
    import time

    from kafka_database_import_spark.sources.pyds import register as reg_sink
    from kafka_database_import_spark.sources.snapshot import SnapshotTable
    from kafka_database_import_spark.sources.snapshot_stream import register

    register(spark)
    reg_sink(spark)
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    tbl = SnapshotTable(root)
    # 5 versions' backlog with cap=2 → run 1 needs 3 batches and
    # commits offset 5, which is > startVersion(0) + cap(2).
    for i in range(5):
        tbl.commit(
            spark.createDataFrame(
                [(i * 10 + j, f"v{i}") for j in range(3)], "k long, v string"
            )
        )

    def read_sink():
        return [
            _json.loads(l)
            for p in _glob.glob(os.path.join(out, "part-*.jsonl"))
            for l in open(p)
        ]

    def run_until(n):
        q = (
            spark.readStream.format("kdis_snapshot_changes")
            .option("path", root)
            .option("maxVersionsPerBatch", "2")
            .load()
            .writeStream.format("kdis_jsonl_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                if len(read_sink()) >= n:
                    break
                time.sleep(0.3)
            # let any in-flight (possibly duplicating) batch land too
            time.sleep(1.5)
        finally:
            q.stop()

    run_until(15)
    assert len(read_sink()) == 15

    tbl.commit(
        spark.createDataFrame([(900 + j, "v5") for j in range(3)],
                              "k long, v string")
    )
    run_until(18)
    rows = read_sink()
    keys = sorted(r["k"] for r in rows)
    assert len(keys) == 18, f"re-delivery or loss: {len(keys)} rows"
    assert len(set(keys)) == 18, "duplicate keys after restart"
    assert {900, 901, 902} <= set(keys)


def test_vacuum_vs_lagging_stream_reader_retention(spark, tmp_path):
    """The vacuum/stream-reader contract: min_retained_version pins the
    manifests a lagging changes consumer still needs (exactly-once
    continues); vacuuming past the reader makes the next batch fail
    LOUDLY with the vacuumed-lineage error, never wrongly."""
    import pytest as _pt

    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        vacuum,
    )
    from kafka_database_import_spark.sources.snapshot_stream import (
        SnapshotChangesDataSource,
    )

    def build(root):
        t = SnapshotTable(root)
        for i in range(5):
            t.commit(
                spark.createDataFrame(
                    [(i * 10 + j, f"v{i}") for j in range(3)], "k long, v string"
                )
            )
        return t

    # Case 1: guarded vacuum — reader lagging at version 2 continues
    t1 = build(str(tmp_path / "a"))
    res = vacuum(t1, retain_last=1, min_retained_version=2)
    assert res["retained_versions"] == [2, 3, 4, 5]
    rdr = SnapshotChangesDataSource(options={"path": t1.root}).streamReader(None)
    parts = rdr.partitions({"version": 2}, {"version": 5})
    got = sorted(
        tup
        for p in parts
        for batch in rdr.read(p)
        for tup in zip(*(c.to_pylist() for c in batch.columns))
    )
    want = sorted((i * 10 + j, f"v{i}") for i in (2, 3, 4) for j in range(3))
    assert got == want  # exactly the deltas of versions 3..5, once each

    # Case 2: unguarded vacuum — the lagging read fails loudly
    t2 = build(str(tmp_path / "b"))
    vacuum(t2, retain_last=1)
    rdr2 = SnapshotChangesDataSource(options={"path": t2.root}).streamReader(None)
    with _pt.raises(ValueError, match="vacuumed"):
        rdr2.partitions({"version": 2}, {"version": 5})


def test_maintenance_compaction_does_not_break_changes_stream(spark, tmp_path):
    """Rewrite-only commits (compact/optimize) are logically neutral:
    the streaming changes reader passes THROUGH them — no rows, no
    lineage reset — while a genuine mutation still raises. Batch
    changes() gets the same contract."""
    import time

    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        changes,
    )
    from kafka_database_import_spark.sources.snapshot_stream import register

    register(spark)
    root = str(tmp_path / "t")
    tbl = SnapshotTable(root)
    tbl.commit(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))

    name = "kdis_compat_stream"
    q = (
        spark.readStream.format("kdis_snapshot_changes")
        .option("path", root)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def drained(n):
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.table(name).count() >= n:
                return
            time.sleep(0.3)
        raise AssertionError(f"timeout below {n}")

    try:
        drained(2)
        tbl.optimize(spark, target_files=1)  # v2: rewrite-only
        tbl.commit(spark.createDataFrame([(3, "c")], "k long, v string"))  # v3
        drained(3)
        got = sorted((r["k"], r["v"]) for r in spark.table(name).collect())
        assert got == [(1, "a"), (2, "b"), (3, "c")]  # no dupes, no loss
    finally:
        q.stop()

    # batch changes() across the compaction: only the append's rows
    delta = changes(tbl, spark, from_version=1)
    assert sorted(tuple(r) for r in delta.collect()) == [(3, "c")]
    # a genuine mutation still resets lineage loudly
    tbl.delete_where(spark, "k = 1")
    import pytest as _pt

    with _pt.raises(ValueError, match="append"):
        changes(tbl, spark, from_version=1).collect()


def test_rename_after_optimize_still_resets_stream_lineage(spark, tmp_path):
    """Regression: a rename following a rewrite-only optimize must NOT
    inherit the rewrite_only marker — the changes stream has to RESET
    on the rename (its frozen schema carries the old name), never pass
    through and silently null-fill."""
    import pytest as _pt

    from kafka_database_import_spark.sources.snapshot import (
        SnapshotTable,
        changes,
    )
    from kafka_database_import_spark.sources.snapshot_stream import (
        SnapshotChangesDataSource,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    tbl.optimize(spark, target_files=1)          # v2: rewrite_only
    tbl.rename_column("v", "val")                 # v3: must NOT inherit it
    assert "rewrite_only" not in tbl.manifest(3)
    with _pt.raises(ValueError, match="append"):
        changes(tbl, spark, from_version=1).collect()
    rdr = SnapshotChangesDataSource(options={"path": tbl.root}).streamReader(None)
    with _pt.raises(Exception, match="APPEND lineage"):
        rdr.partitions({"version": 1}, {"version": 3})
