"""Streaming semantics that only show up across micro-batches:
watermark late-data drop (Q33's contract) and multi-batch equivalence
(SURVEY §5.2 batch-equivalence strategy). The per-query results
themselves are differentially oracle-checked in test_correctness."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _write_batch(spark, path, rows, mtime=None):
    """Materialize rows as a single *leaf* parquet file at ``path`` —
    the file stream source lists leaf files under its input dir; nested
    ``dir/part-*.parquet`` layouts are not reliably discovered. The
    source picks files up oldest-mtime-first, so tests that depend on
    batch order pin ``mtime`` explicitly."""
    import glob
    import shutil

    scratch = tempfile.mkdtemp(prefix="kdis_wb_")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        scratch
    )
    part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(scratch, ignore_errors=True)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def _drain(sdf, mode):
    name = f"wm_test_{abs(hash(mode + sdf.schema.simpleString())) % 10**8}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kdis_wm_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name), q


def test_watermark_drops_late_rows_across_restart(spark):
    """Run 1 advances the watermark to 10:20 (max event 10:30 − 10 min)
    and commits it to the checkpoint. Run 2 — same checkpoint, i.e. a
    restart — delivers a 09:00 straggler, which the restored watermark
    must drop from the stateful dedup's input. (Within a single
    ``availableNow`` run Spark 4.1 applies the query-start watermark to
    every drained batch, so the drop is only observable across runs —
    which is also the realistic at-least-once-redelivery scenario.)"""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0)
    src = tempfile.mkdtemp(prefix="kdis_wm_src_")
    ckpt = tempfile.mkdtemp(prefix="kdis_wm_ckpt_")
    got: list[tuple[str, int]] = []

    def sink(batch_df, epoch_id):
        got.extend((r["ts"].strftime("%H:%M"), r["v"]) for r in batch_df.collect())

    def run():
        sdf = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .dropDuplicates(["v", "ts"])
        )
        q = (
            sdf.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    _write_batch(
        spark,
        os.path.join(src, "f1.parquet"),
        [(base + dt.timedelta(minutes=m), 1) for m in (0, 5, 20, 30)],
    )
    run()
    _write_batch(
        spark,
        os.path.join(src, "f2.parquet"),
        [(dt.datetime(2024, 1, 1, 9, 0), 99), (base + dt.timedelta(minutes=35), 1)],
    )
    q2 = run()

    times = {t for t, _ in got}
    assert "09:00" not in times, f"late row leaked into {sorted(got)}"
    assert {"10:00", "10:05", "10:20", "10:30", "10:35"} <= times
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped >= 1  # the engine itself reported the drop


def test_multi_batch_equals_single_batch(spark):
    """The same windowed aggregation over 1-batch and 2-batch delivery
    must converge to identical final counts (complete mode)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [(base + dt.timedelta(minutes=3 * i), i) for i in range(40)]
    one = tempfile.mkdtemp(prefix="kdis_eq1_")
    two = tempfile.mkdtemp(prefix="kdis_eq2_")
    _write_batch(spark, os.path.join(one, "all.parquet"), rows)
    _write_batch(spark, os.path.join(two, "a.parquet"), rows[:20])
    _write_batch(spark, os.path.join(two, "b.parquet"), rows[20:])

    def run(src, max_files):
        sdf = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", str(max_files))
            .parquet(src)
            .groupBy(F.window("ts", "10 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        table, _ = _drain(sdf, "complete")
        return sorted(
            (r["window"].start.isoformat(), r["n"]) for r in table.collect()
        )

    assert run(one, 10) == run(two, 1)


KV_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _write_kv(spark, path, rows, mtime):
    import glob
    import shutil

    scratch = tempfile.mkdtemp(prefix="kdis_kv_")
    spark.createDataFrame(rows, KV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(scratch)
    part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(scratch, ignore_errors=True)
    os.utime(path, (mtime, mtime))


def test_foreachbatch_crash_recovery_resumes_from_checkpoint(spark, tmp_path):
    """Kill a foreachBatch import mid-stream — after its batch is STAGED
    but before the ledger commit — and restart from the same checkpoint.
    Spark replays the failed epoch (same epoch id); the sink's
    drop-and-restage makes the replay idempotent and the final table
    must equal the batch oracle. This crash-exercises the replay path
    the epoch ledger promises (sinks/jdbc.py steps 1-4), not just a
    polite double-call."""
    import sqlite3

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from kafka_database_import_spark.sinks.jdbc import DbApiUpsertSink

    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "sink.sqlite")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE imported (k INTEGER PRIMARY KEY, v TEXT)")

    # three mtime-ordered files -> three micro-batches with
    # maxFilesPerTrigger=1; keys overlap across batches so the upsert
    # (not just append) semantics are what the oracle checks
    _write_kv(spark, os.path.join(src, "f0.parquet"), [(1, "a"), (2, "b")], 1_000)
    _write_kv(spark, os.path.join(src, "f1.parquet"), [(2, "B"), (3, "c")], 2_000)
    _write_kv(spark, os.path.join(src, "f2.parquet"), [(1, "A2"), (4, "d")], 3_000)

    sink = DbApiUpsertSink(lambda: sqlite3.connect(db), "imported", ["k"])
    crashed = {"done": False}

    def crashing(batch_df, epoch_id):
        if epoch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            # simulate dying AFTER staging, BEFORE upsert+ledger: stage
            # the rows in a committed table, then crash the query
            rows = [tuple(r) for r in batch_df.collect()]
            with sqlite3.connect(db) as con:
                con.execute("DROP TABLE IF EXISTS imported__stage")
                con.execute("CREATE TABLE imported__stage (k INTEGER, v TEXT)")
                con.executemany("INSERT INTO imported__stage VALUES (?, ?)", rows)
            raise RuntimeError("injected crash after staging")
        sink(batch_df, epoch_id)

    def run():
        sdf = (
            spark.readStream.schema(KV_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            sdf.writeStream.foreachBatch(crashing)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run()
        raise AssertionError("expected the injected crash to kill run 1")
    except StreamingQueryException:
        pass
    assert crashed["done"]
    with sqlite3.connect(db) as con:
        # epoch 0 landed, epoch 1 staged but never reached the target
        assert con.execute("SELECT COUNT(*) FROM imported").fetchone()[0] == 2

    run()  # restart from checkpoint: replays epoch 1, then epoch 2

    with sqlite3.connect(db) as con:
        got = dict(con.execute("SELECT k, v FROM imported ORDER BY k").fetchall())
        epochs = sorted(
            e for (e,) in con.execute("SELECT epoch_id FROM imported__epochs")
        )
    assert got == {1: "A2", 2: "B", 3: "c", 4: "d"}  # batch oracle
    assert epochs == [0, 1, 2]  # failed epoch replayed under its own id


def test_multifile_time_shuffled_window_upsert(spark, tmp_path):
    """The q99za topology over a deliberately multi-file, time-SHUFFLED
    source: the newest-timestamp file arrives in batch 0 (file source
    orders by mtime, not event time). With a watermark wider than the
    fixture span, update-mode re-emissions must converge through the
    keyed upsert to exactly the batch aggregate — the multi-batch path
    q99za itself no longer exercises (see plans/streaming_queries.py)."""
    import datetime as dt
    import sqlite3

    from kafka_database_import_spark.sinks.jdbc import DbApiUpsertSink

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [(base + dt.timedelta(minutes=3 * i), i) for i in range(40)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    # newest window first, oldest last — worst case for a finite watermark
    _write_batch(spark, os.path.join(src, "late.parquet"), rows[30:], mtime=1_000)
    _write_batch(spark, os.path.join(src, "mid.parquet"), rows[10:30], mtime=2_000)
    _write_batch(spark, os.path.join(src, "early.parquet"), rows[:10], mtime=3_000)

    db = str(tmp_path / "win.sqlite")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE win_agg (window_start_us INTEGER PRIMARY KEY, "
            "n INTEGER, sum_v INTEGER)"
        )

    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "4 hours")  # wider than the 2 h fixture span
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "n",
            "sum_v",
        )
    )
    sink = DbApiUpsertSink(
        lambda: sqlite3.connect(db), "win_agg", ["window_start_us"]
    )
    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 3  # genuinely multi-batch

    batch = {
        r.window_start_us: (r.n, r.sum_v)
        for r in spark.createDataFrame(rows, SCHEMA)
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "n",
            "sum_v",
        )
        .collect()
    }
    with sqlite3.connect(db) as con:
        got = {
            w: (n, s)
            for w, n, s in con.execute(
                "SELECT window_start_us, n, sum_v FROM win_agg"
            )
        }
    assert got == batch


def test_cdc_sink_applies_deletes_and_guards_out_of_order(spark, tmp_path):
    """Stream a Debezium-shaped changelog (key, seq, op, payload) through
    CdcDbApiSink into SQLite, one file per micro-batch. The final mirror
    must equal batch apply_changelog over the full log — including a
    DELETE landing after updates, a key resurrected... no: a key deleted
    in the last batch staying gone, within-batch multi-version
    compaction, and a STALE row (old seq) arriving in the last batch
    that the seq guard must ignore. Then a replayed epoch must be a
    no-op via the ledger."""
    import sqlite3

    from pyspark.sql import types as T

    from kafka_database_import_spark.operators.cdc import apply_changelog
    from kafka_database_import_spark.sinks.jdbc import CdcDbApiSink

    cdc_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    batches = [
        [(1, 10, "U", "a"), (2, 11, "U", "b"), (3, 12, "U", "c")],
        [(4, 19, "U", "d-early"), (2, 20, "U", "B"), (3, 21, "D", None),
         (4, 22, "U", "d")],
        # stale (2, 5): older than the mirrored seq 20 — must NOT regress
        [(1, 30, "D", None), (4, 31, "U", "D2"), (5, 32, "U", "e"),
         (2, 5, "U", "stale")],
    ]

    src = str(tmp_path / "src")
    os.makedirs(src)
    import glob
    import shutil

    for i, rows in enumerate(batches):
        scratch = tempfile.mkdtemp(prefix="kdis_cdc_")
        spark.createDataFrame(rows, cdc_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(dst, (1_000 * (i + 1),) * 2)

    db = str(tmp_path / "mirror.sqlite")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE mirror (k INTEGER PRIMARY KEY, seq INTEGER, v TEXT)")

    sink = CdcDbApiSink(lambda: sqlite3.connect(db), "mirror", ["k"], "seq")
    sdf = (
        spark.readStream.schema(cdc_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    with sqlite3.connect(db) as con:
        got = {
            k: (seq, v)
            for k, seq, v in con.execute("SELECT k, seq, v FROM mirror")
        }
        epochs = sorted(
            e for (e,) in con.execute("SELECT epoch_id FROM mirror__epochs")
        )
    # batch oracle: apply_changelog over the concatenated log
    full = spark.createDataFrame(
        [r for b in batches for r in b], cdc_schema
    )
    expect = {
        r["k"]: (r["seq"], r["v"])
        for r in apply_changelog(full, ["k"], "seq", "op").collect()
    }
    assert got == expect == {2: (20, "B"), 4: (31, "D2"), 5: (32, "e")}
    assert epochs == [0, 1, 2]

    # replayed epoch (ledger hit) is a no-op even with regressive rows
    sink.apply_rows([(2, 1, "D", None)], ["k", "seq", "op", "v"], 1)
    with sqlite3.connect(db) as con:
        assert con.execute("SELECT seq, v FROM mirror WHERE k = 2").fetchone() == (
            20,
            "B",
        )


def test_rocksdb_state_store_matches_default_and_survives_restart(spark, tmp_path):
    """RocksDB state backend (EngineConfig.rocksdb_state): the
    off-heap/SSD state provider that keeps 100-TB streaming state off
    the executor heap. Asserted here: (1) the provider actually engages
    (rocksdb* custom metrics in the query progress), (2) results equal
    the default HDFS-backed provider, (3) state written by run 1 is
    recovered from the checkpoint by run 2 — the restart path RocksDB
    serves from its changelog/snapshot files, not recomputation."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(i % 5, i) for i in range(40)]
    rows2 = [(i % 5, 1000 + i) for i in range(25)]

    def write_kv_long(path, rows, mtime):
        import glob
        import shutil

        scratch = tempfile.mkdtemp(prefix="kdis_rocks_")
        spark.createDataFrame(rows, "k long, v long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
        shutil.move(part, path)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(path, (mtime, mtime))

    def start(provider):
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        try:
            sdf = (
                spark.readStream.schema("k long, v long")
                .parquet(src)
                .groupBy("k")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            )
            q = (
                sdf.writeStream.format("memory")
                .queryName("rocks_sum")
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return q
        finally:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    write_kv_long(os.path.join(src, "b1.parquet"), rows1, mtime=1_000)

    q1 = start(rocksdb)
    custom = q1.lastProgress["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in custom)  # provider engaged

    write_kv_long(os.path.join(src, "b2.parquet"), rows2, mtime=2_000)
    q2 = start(rocksdb)
    got = {
        (r.k): (r.s, r.n) for r in spark.table("rocks_sum").collect()
    }

    expect_df = spark.createDataFrame(rows1 + rows2, "k long, v long").groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    expect = {r.k: (r.s, r.n) for r in expect_df.collect()}
    assert got == expect

    # cross-provider equality: same pipeline, default provider, fresh state
    import shutil, tempfile as _tf

    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    shutil.copy(os.path.join(src, "b1.parquet"), os.path.join(src2, "b1.parquet"))
    shutil.copy(os.path.join(src, "b2.parquet"), os.path.join(src2, "b2.parquet"))
    sdf = (
        spark.readStream.schema("k long, v long")
        .parquet(src2)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    q3 = (
        sdf.writeStream.format("memory")
        .queryName("rocks_sum_default")
        .outputMode("complete")
        .option("checkpointLocation", _tf.mkdtemp(prefix="kdis_def_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination()
    got_default = {
        r.k: (r.s, r.n) for r in spark.table("rocks_sum_default").collect()
    }
    assert got_default == expect


def test_incremental_neardup_stream_flags_history_and_batch(spark, tmp_path):
    """Streaming LSH near-dup (operators/dedup.incremental_neardup_sink):
    batch 2's near-copy of a batch-1 doc is flagged against the STORE,
    batch-internal near-copies are flagged once, unrelated docs aren't,
    and a replayed epoch is a no-op (atomic epoch=<id> snapshot dirs)."""
    import glob

    from kafka_database_import_spark.operators.dedup import incremental_neardup_sink

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carefully watch the harvest moon rise over the bay"
    )
    other = (
        "completely different prose about distributed query engines and "
        "columnar storage formats with vectorized execution pipelines here"
    )
    b1 = [(1, base), (2, other)]
    b2 = [
        (101, base + " tonight"),          # near-dup of store doc 1
        (102, "unrelated third text about alpine meadows and quiet rivers flowing north through limestone valleys"),
        (103, base + " tonight again"),    # near-dup of 101 within batch (and of 1)
    ]

    src = str(tmp_path / "src"); os.makedirs(src)
    store = str(tmp_path / "store")

    def write_docs(path, rows, mtime):
        import glob as g, shutil
        scratch = tempfile.mkdtemp(prefix="kdis_nd_")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = g.glob(os.path.join(scratch, "part-*.parquet"))[0]
        shutil.move(part, path)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(path, (mtime, mtime))

    write_docs(os.path.join(src, "b1.parquet"), b1, 1_000)
    write_docs(os.path.join(src, "b2.parquet"), b2, 2_000)

    sink = incremental_neardup_sink(store, est_threshold=0.5)
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sig_epochs = sorted(glob.glob(os.path.join(store, "signatures", "epoch=*")))
    assert len(sig_epochs) == 2
    matches = spark.read.parquet(os.path.join(store, "matches", "epoch=*"))
    pairs = {(r.id_new, r.id_base) for r in matches.collect()}
    assert (101, 1) in pairs          # new vs history
    assert (103, 1) in pairs
    assert (101, 103) in pairs        # within batch, single orientation
    assert (103, 101) not in pairs
    assert all(102 not in p and 2 not in p for p in pairs)

    # replayed epoch: same batch df re-sent with a committed epoch id
    before = sorted(glob.glob(os.path.join(store, "*", "epoch=*")))
    sink(spark.createDataFrame(b2, "doc_id long, text string"), 1)
    assert sorted(glob.glob(os.path.join(store, "*", "epoch=*"))) == before
    # the default store layout is banded (round 14): band rows, one per
    # (doc, band) — layout-agnostic invariant is the distinct doc set
    sig = spark.read.option("basePath", os.path.join(store, "signatures")).parquet(
        *sig_epochs
    )
    assert sig.select("doc_id").distinct().count() == 5


def test_incremental_neardup_banded_layout_same_matches(spark, tmp_path):
    """banded_layout_k: the partition-pruned store layout produces the
    IDENTICAL match set as the plain signature store on the same
    staged stream, and the store directories are hive-partitioned by
    pb so the per-batch read can prune."""
    import glob

    from kafka_database_import_spark.operators.dedup import incremental_neardup_sink

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carefully watch the harvest moon rise over the bay"
    )
    b1 = [(1, base), (2, "a wholly different passage regarding compiler design and register allocation strategies for modern pipelines")]
    b2 = [(101, base + " tonight"), (103, base + " tonight again")]

    def write_docs(src, path, rows, mtime):
        import glob as g, shutil
        scratch = tempfile.mkdtemp(prefix="kdis_ndb_")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = g.glob(os.path.join(scratch, "part-*.parquet"))[0]
        shutil.move(part, path)
        shutil.rmtree(scratch, ignore_errors=True)
        os.utime(path, (mtime, mtime))

    results = {}
    for mode, kwargs in (
        ("plain", {"banded_layout_k": None}),
        ("banded", {"banded_layout_k": 16}),
    ):
        src = str(tmp_path / f"src_{mode}"); os.makedirs(src)
        store = str(tmp_path / f"store_{mode}")
        write_docs(src, os.path.join(src, "b1.parquet"), b1, 1_000)
        write_docs(src, os.path.join(src, "b2.parquet"), b2, 2_000)
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(incremental_neardup_sink(store, **kwargs))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{mode}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        m = spark.read.parquet(os.path.join(store, "matches", "epoch=*"))
        results[mode] = {(r.id_new, r.id_base, r.est) for r in m.collect()}
        if mode == "banded":
            pbs = glob.glob(os.path.join(store, "signatures", "epoch=*", "pb=*"))
            assert pbs, "banded store must be hive-partitioned by pb"

    assert results["plain"] == results["banded"]
    assert (101, 1) in {(a, b) for a, b, _ in results["plain"]}  # history match present


def test_neardup_store_compaction_preserves_history(spark, tmp_path):
    """compact_neardup_store merges all signature epochs into one
    snapshot; a batch arriving AFTER compaction still matches
    pre-compaction history, and duplicate rows from a simulated
    crash-between-publish-and-removal stay benign (identical matches
    only, thanks to the matcher's distinct())."""
    import glob

    from kafka_database_import_spark.operators.dedup import (
        compact_neardup_store,
        incremental_neardup_sink,
    )

    base = (
        "pack my box with five dozen liquor jugs while zephyrs vex the "
        "quick daft sphinx and waltzing nymphs judge the bad fox quiver"
    )
    store = str(tmp_path / "store")
    sink = incremental_neardup_sink(store)
    sink(spark.createDataFrame([(1, base)], "doc_id long, text string"), 0)
    sink(
        spark.createDataFrame(
            [(2, "entirely unrelated text about tidal estuaries and migratory birds resting on sandbars at dusk")],
            "doc_id long, text string",
        ),
        1,
    )
    assert compact_neardup_store(spark, store) == 2
    sig_epochs = glob.glob(os.path.join(store, "signatures", "epoch=*"))
    assert len(sig_epochs) == 1 and sig_epochs[0].endswith("epoch=c1")

    # post-compaction batch still sees pre-compaction history
    sink(
        spark.createDataFrame([(50, base + " nightly")], "doc_id long, text string"),
        2,
    )
    pairs = {
        (r.id_new, r.id_base)
        for r in spark.read.parquet(os.path.join(store, "matches", "epoch=*")).collect()
    }
    assert (50, 1) in pairs

    # simulated crash: duplicate an epoch dir, matches stay identical
    import shutil

    shutil.copytree(
        os.path.join(store, "signatures", "epoch=c1"),
        os.path.join(store, "signatures", "epoch=9"),
    )
    sink(
        spark.createDataFrame([(60, base + " nightly too")], "doc_id long, text string"),
        3,
    )
    m = spark.read.parquet(os.path.join(store, "matches", "epoch=3"))
    got = [(r.id_new, r.id_base) for r in m.collect()]
    assert len(got) == len(set(got))  # duplicates collapsed, not multiplied
    assert (60, 1) in set(got)


def test_offline_exact_verify_of_streaming_matches(spark, tmp_path):
    """The documented offline pass: streaming matches (estimate-based,
    store has no text) re-verified exactly by joining the published
    pairs back to the text-bearing corpus via exact_jaccard_for_pairs.
    True near-dups keep high exact Jaccard; the estimate and the exact
    value agree within the 16-hash resolution."""
    import os

    from kafka_database_import_spark.operators.dedup import (
        exact_jaccard_for_pairs,
        incremental_neardup_sink,
    )

    base = (
        "how vexingly quick daft zebras jump over the lazy river stones "
        "while bright jackdaws love my big sphinx of quartz at dawn"
    )
    docs = [(1, base), (2, base + " extra"), (3, "different text entirely about orchestral tuning and concert hall acoustics in winter")]
    store = str(tmp_path / "store")
    sink = incremental_neardup_sink(store)
    sink(spark.createDataFrame(docs[:1], "doc_id long, text string"), 0)
    sink(spark.createDataFrame(docs[1:], "doc_id long, text string"), 1)

    matches = spark.read.parquet(os.path.join(store, "matches", "epoch=*"))
    assert matches.count() >= 1
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    verified = exact_jaccard_for_pairs(
        matches, corpus, "doc_id", "text", "id_new", "id_base"
    )
    rows = {(r.id_new, r.id_base): r.jaccard for r in verified.collect()}
    assert rows[(2, 1)] > 0.8  # true near-dup confirmed exactly
    assert all(j > 0.4 for j in rows.values())  # no estimate-only garbage


def test_neardup_sink_ignores_inprogress_residue(spark, tmp_path):
    """A crash can leave an epoch=N.inprogress directory in the store;
    the next batch must read only COMMITTED epochs (explicit path
    list, not the epoch=* glob that also matches the residue) — a
    partial parquet dir in the glob would poison the store read."""
    import os as _os

    from kafka_database_import_spark.operators.dedup import incremental_neardup_sink

    base = (
        "sphinx of black quartz judge my vow while five boxing wizards "
        "jump quickly over the lazy brown river dog tonight"
    )
    store = str(tmp_path / "store")
    sink = incremental_neardup_sink(store)
    sink(spark.createDataFrame([(1, base)], "doc_id long, text string"), 0)

    # simulate a crash: an in-progress epoch dir with a corrupt file
    residue = _os.path.join(store, "signatures", "epoch=9.inprogress")
    _os.makedirs(residue)
    with open(_os.path.join(residue, "part-00000.parquet"), "w") as f:
        f.write("not parquet at all")

    sink(
        spark.createDataFrame([(50, base + " again")], "doc_id long, text string"),
        1,
    )
    pairs = {
        (r.id_new, r.id_base)
        for r in spark.read.parquet(
            _os.path.join(store, "matches", "epoch=1")
        ).collect()
    }
    assert (50, 1) in pairs  # committed history still matched, residue ignored


def test_neardup_replay_after_compaction_is_noop(spark, tmp_path):
    """ADVICE r4: compaction deletes the epoch=N replay-marker dirs, so
    a stream that crashed after sink-publish but before checkpoint
    commit — with compaction run before restart — would replay epoch N
    against a store that now contains that batch's own ids. The
    _compacted_epochs.json manifest must keep the replay a no-op, and
    the matcher's id_new != id_base guard must hold as defense in
    depth."""
    import glob
    import os as _os

    from kafka_database_import_spark.operators.dedup import (
        compact_neardup_store,
        incremental_neardup_sink,
    )

    base = (
        "how vexingly quick daft zebras jump over the lazy dog while "
        "pack my red box with five dozen quality liquor jugs tonight"
    )
    store = str(tmp_path / "store")
    sink = incremental_neardup_sink(store)
    df0 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    df1 = spark.createDataFrame(
        [(2, base + " encore")], "doc_id long, text string"
    )
    sink(df0, 0)
    sink(df1, 1)  # publishes matches/epoch=1 with the (2, 1) pair
    before = sorted(
        (r.id_new, r.id_base)
        for r in spark.read.parquet(
            _os.path.join(store, "matches", "epoch=1")
        ).collect()
    )
    assert (2, 1) in set(before)

    # compaction removes the epoch marker dirs...
    assert compact_neardup_store(spark, store) == 2
    assert not _os.path.exists(_os.path.join(store, "signatures", "epoch=1"))
    # ...then the checkpointless restart replays epoch 1: must be a no-op
    sink(df1, 1)
    after = sorted(
        (r.id_new, r.id_base)
        for r in spark.read.parquet(
            _os.path.join(store, "matches", "epoch=1")
        ).collect()
    )
    assert after == before  # match dir untouched — no self-pairs, no overwrite
    # store still holds exactly the compacted snapshot (no re-published sigs)
    sig_epochs = glob.glob(_os.path.join(store, "signatures", "epoch=*"))
    assert len(sig_epochs) == 1 and sig_epochs[0].endswith("epoch=c1")


def test_neardup_matcher_refuses_self_matches(spark):
    """Defense-in-depth contract: even if a store ever contains the
    batch's own ids (violated disjoint-ids discipline), the matchers
    never emit id_new == id_base est=1.0 self-pairs."""
    from kafka_database_import_spark.operators.dedup import (
        minhash_signatures,
        neardup_matches_against,
    )

    text = (
        "the five boxing wizards jump quickly over a lazy dog while "
        "sphinx of black quartz judges my vow at midnight again"
    )
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    sig = minhash_signatures(df, "doc_id", "text")
    out = neardup_matches_against(sig, sig, "doc_id", 0.5).collect()
    assert all(r.id_new != r.id_base for r in out)


def test_flagship_crash_restart_replays_exactly_once(spark, tmp_path):
    """Round 13 (VERDICT r12 item 5): the one-DAG flagship topology
    (wire parse → broadcast dim join → foreachBatch into upsert sink +
    snapshot commit + MV refresh) CRASHES mid-drain AFTER its sinks
    applied a batch but BEFORE Spark committed the checkpoint — the
    worst replay — then restarts from the same checkpoint. The
    replayed epoch must dedupe through the parquet ledger AND the
    snapshot manifest epochs AND the MV's applied-version marker:
    final state equals a single clean run, no duplicate keys, MV ==
    recompute."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from kafka_database_import_spark.sinks.jdbc import ParquetUpsertSink
    from kafka_database_import_spark.sources.mv import MaterializedView
    from kafka_database_import_spark.sources.snapshot import (
        SnapshotCommitSink,
        SnapshotTable,
    )

    # 4 wire files -> 4 micro-batches (maxFilesPerTrigger=1); the
    # corrupt row and an unmatched-user row exercise both routes
    rows = [
        (i, i % 5 + 1, f"t{i % 3}", i * 10)  # (event_id, user, type, cents)
        for i in range(40)
    ]
    wire_dir = str(tmp_path / "wire")
    payload = F.to_json(F.struct("event_id", "user_id", "event_type", "val_cents"))
    value = F.concat(F.lit('{"data":'), payload, F.lit(',"source":"database"}'))
    (
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, val_cents long"
        )
        .select(
            F.col("event_id").alias("offset"),
            F.when(F.col("event_id") % 13 == 0,
                   F.concat(F.lit("CORRUPT<"), value)).otherwise(value)
            .alias("value"),
        )
        .repartition(4)
        .write.parquet(wire_dir)
    )
    env_schema = T.StructType([
        T.StructField("data", T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("val_cents", T.LongType()),
        ])),
        T.StructField("source", T.StringType()),
    ])
    dim = spark.createDataFrame([(u,) for u in (1, 2, 3)], "c_custkey long")
    stream = (
        spark.readStream.schema("offset long, value string")
        .option("maxFilesPerTrigger", "1")
        .parquet(wire_dir)
        .withColumn("env", F.from_json("value", env_schema))
        .join(F.broadcast(dim),
              F.col("env.data.user_id") == F.col("c_custkey"), "left")
    )
    imported = SnapshotTable(str(tmp_path / "imported"))
    imported.commit(
        spark.createDataFrame([], "event_id long, event_type string, val_cents long")
    )
    mv = MaterializedView.create(
        spark, imported, str(tmp_path / "mv"), ["event_type"],
        [{"fn": "count", "alias": "n"},
         {"fn": "sum", "col": "val_cents", "alias": "cents"}],
    )
    main_sink = ParquetUpsertSink(str(tmp_path / "sink"), ["event_id"])
    dlq_sink = ParquetUpsertSink(str(tmp_path / "dlq"), ["offset"])
    snap_sink = SnapshotCommitSink(imported)
    crash_flag = str(tmp_path / "crash_once")
    open(crash_flag, "w").close()

    def _import(batch_df, epoch):
        bad = batch_df.filter(F.col("env.data").isNull()).select("offset", "value")
        good = batch_df.filter(
            F.col("env.data").isNotNull() & F.col("c_custkey").isNotNull()
        ).select(
            F.col("env.data.event_id").alias("event_id"),
            F.col("env.data.event_type").alias("event_type"),
            F.col("env.data.val_cents").alias("val_cents"),
        )
        dlq_sink(bad, epoch)
        main_sink(good, epoch)
        snap_sink(good, epoch)
        mv.refresh(spark)
        if epoch == 1 and os.path.exists(crash_flag):
            os.unlink(crash_flag)
            # sinks applied, checkpoint NOT committed -> epoch 1 replays
            raise RuntimeError("simulated crash after apply")

    def _drain():
        q = (
            stream.writeStream.foreachBatch(_import)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    import pytest as _pytest

    with _pytest.raises(StreamingQueryException, match="simulated crash"):
        _drain()
    assert imported.latest_version() >= 2  # batch 0 and 1 landed
    _drain()  # restart: replays epoch 1, then drains the rest
    got = imported.read(spark)
    expected = [
        (eid, et, c) for eid, u, et, c in rows
        if eid % 13 != 0 and u in (1, 2, 3)
    ]
    assert got.count() == len(expected)
    assert got.select("event_id").distinct().count() == len(expected)
    assert main_sink.read_back(spark).count() == len(expected)
    assert dlq_sink.read_back(spark).count() == sum(
        1 for eid, *_ in rows if eid % 13 == 0
    )
    mv.refresh(spark)
    want = sorted(
        (tuple(r) for r in got.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("val_cents").alias("cents"),
        ).collect()),
        key=str,
    )
    assert sorted((tuple(r) for r in mv.read(spark).collect()), key=str) == want
