"""Structured Streaming surface (SURVEY §2.2 Q03, Q33–Q38).

Every query here is a *real* streaming plan (readStream → transform →
writeStream) drained with ``trigger(availableNow=True)`` over the
file-backed events stream (no broker in the sandbox; SURVEY §5.2). The
windowed aggregations run in complete mode so the drained memory table
equals the batch answer — which makes them DuckDB-oracle-checkable,
a stronger check than smoke. Watermark *semantics* (late-data drop,
state eviction) are exercised in tests/test_streaming.py with staged
multi-batch input, where they are observable.

Scale notes: watermarks bound state for append/update modes at real
scale; complete mode is for the bounded test drain only. Session
windows shuffle on the session key; dedup state is evicted by
watermark because the dedup subset includes the event-time column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_database_import_spark.functions.numeric import mround
from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sinks.kafka import envelope_json
from kafka_database_import_spark.sources.readers import load_table
from kafka_database_import_spark.streaming.runner import (
    events_stream,
    run_available_now,
)


@query(
    "q03_kafka_source_shape",
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS key,
           '{"data":' || props || ',"source":"database"}' AS value,
           'device-data' AS topic,
           0 AS partition,
           event_id AS "offset"
    FROM events
    ORDER BY key NULLS LAST, value NULLS LAST, topic NULLS LAST,
             partition NULLS LAST, "offset" NULLS LAST
    """,
)
def q03_kafka_source_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka streaming source (Q03). The real source is
    ``spark.readStream.format("kafka")`` + ``sinks.kafka
    .kafka_reader_options`` (no broker/connector in the sandbox — the
    option wiring is unit-tested). Here the same topology runs with the
    file stream standing in for the topic, emitting the *exact* Kafka
    wire schema: un-keyed envelope messages on partition 0, mirroring
    what the reference produces (``kafka-database-import.go:208-210``,
    offset = record index)."""
    stream = events_stream(spark, sf_dir)
    framed = stream.select(
        F.lit(None).cast("string").alias("key"),
        envelope_json("props").alias("value"),
        F.lit("device-data").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
    )
    return ordered(run_available_now(framed, "append"))


@query(
    "q33_stream_tumbling_window",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_us,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY time_bucket(INTERVAL '5 minutes', ts)
    ORDER BY window_start_us NULLS LAST, n_events NULLS LAST, sum_value NULLS LAST
    """,
)
def q33_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregation with a 10-minute watermark.
    Complete-mode drain ⇒ the result equals the batch answer, checked
    against DuckDB ``time_bucket`` — real differential coverage for a
    streaming plan. Late-data drop itself: tests/test_streaming.py."""
    stream = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = stream.groupBy(F.window("ts", "5 minutes")).agg(
        F.count(F.lit(1)).alias("n_events"),
        mround(F.sum("value")).alias("sum_value"),
    )
    out = run_available_now(agg, "complete").select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "n_events",
        "sum_value",
    )
    return ordered(out)


@query(
    "q34_stream_sliding_window",
    oracle="""
    SELECT epoch_us(ws) AS window_start_us, COUNT(*) AS n_events
    FROM (SELECT time_bucket(INTERVAL '5 minutes', ts)
                 - u * INTERVAL '5 minutes' AS ws
          FROM events, unnest([0, 1]) AS probe(u))
    GROUP BY ws
    ORDER BY window_start_us NULLS LAST, n_events NULLS LAST
    """,
)
def q34_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute length, 5-minute slide): each event
    lands in 2 windows. Oracle expands the same membership with an
    unnest probe — closed-form cross-engine check of window assignment."""
    stream = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = stream.groupBy(F.window("ts", "10 minutes", "5 minutes")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = run_available_now(agg, "complete").select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"), "n_events"
    )
    return ordered(out)


@query(
    "q35_stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id NULLS LAST, session_start_us NULLS LAST, n_events NULLS LAST
    """,
)
def q35_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user. Oracle reconstructs
    sessions with gaps-and-islands SQL — differential check of the
    sessionization semantics. State shuffles on the session key
    (user_id); watermark bounds it in production modes."""
    stream = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = run_available_now(agg, "complete").select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        "n_events",
    )
    return ordered(out)


@query(
    "q36_stream_static_join",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE user_id IN (SELECT c_custkey FROM customer)
    ORDER BY event_id NULLS LAST, user_id NULLS LAST, event_type NULLS LAST
    """,
)
def q36_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static semi-join — the reference pipeline R4, streamed:
    the static filter side broadcasts to every micro-batch; stateless,
    so append mode passes rows straight through."""
    users = load_table(spark, sf_dir, "customer").select("c_custkey")
    stream = events_stream(spark, sf_dir)
    joined = stream.join(
        F.broadcast(users), stream.user_id == users.c_custkey, "left_semi"
    ).select("event_id", "user_id", "event_type")
    return ordered(run_available_now(joined, "append"))


@query(
    "q37_stream_dedup",
    oracle="""
    SELECT DISTINCT event_id, user_id FROM events
    ORDER BY event_id NULLS LAST, user_id NULLS LAST
    """,
)
def q37_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: the stream unioned with itself (every
    event delivered twice — at-least-once Kafka semantics simulated)
    must emit each event exactly once. Dedup subset includes the
    event-time column so the 1-hour watermark can evict state — the
    100 TB requirement (unbounded dedup state OOMs)."""
    s1 = events_stream(spark, sf_dir)
    s2 = events_stream(spark, sf_dir)
    doubled = s1.select("event_id", "user_id", "ts").unionAll(
        s2.select("event_id", "user_id", "ts")
    )
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id", "ts"])
        .select("event_id", "user_id")
    )
    return ordered(run_available_now(deduped, "append"))


@query(
    "q58_stream_stream_join",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id AS uid
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
    ORDER BY id_a NULLS LAST, id_b NULLS LAST, uid NULLS LAST
    """,
)
def q58_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: pairs of same-user events within a
    5-minute follow window. Both sides carry watermarks and the join
    condition bounds event-time distance, so each side's state is
    evictable — the requirement for an unbounded-input join at scale
    (an un-watermarked stream-stream join accumulates state forever)."""
    a = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes").alias("a")
    b = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes").alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 5 minutes")),
    ).select(
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        F.col("a.user_id").alias("uid"),
    )
    return ordered(run_available_now(joined, "append"))


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


@query(
    "q38_stream_stateful_counters",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id NULLS LAST, n_events NULLS LAST, total_value NULLS LAST
    """,
)
def q38_stream_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing (``applyInPandasWithState``):
    per-user running counters persisted in GroupState across
    micro-batches — the custom-operator escape hatch for semantics the
    built-ins can't express. Each batch emits the updated totals; the
    final emission equals the batch aggregate (oracle). Mirrors the
    reference's row counter (``kafka-database-import.go:215-218``) as
    distributed per-key state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].to_numpy(dtype="float64").sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [float(np.floor(total * 100 + 0.5) / 100)],
            }
        )

    stream = events_stream(spark, sf_dir).select("user_id", "value")
    counted = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_STATE_SCHEMA,
        stateStructType="n_events BIGINT, total_value DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    drained = run_available_now(counted, "update")
    # availableNow may split input into several batches, emitting a row
    # per update; the final state per user is the max-count emission.
    final = drained.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    return ordered(
        final.select("user_id", F.col("s.n_events").alias("n_events"),
                     F.col("s.total_value").alias("total_value"))
    )


@query(
    "q99q_stream_outer_join",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id AS uid
    FROM events a LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
    WHERE a.ts <= (SELECT MAX(ts) FROM events) - INTERVAL '16 minutes'
    ORDER BY id_a NULLS LAST, id_b NULLS LAST, uid NULLS LAST
    """,
)
def q99q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — q58's inner join plus the
    null-extended rows for events with no follower. An outer row can
    only emit once the watermark proves no match can still arrive, so
    this exercises exactly the state-eviction machinery that makes
    unbounded outer joins feasible: both sides watermarked, the
    time-bound join condition limits how long a left row waits.
    The final watermark of a bounded drain stops at ``max(ts) − delay``
    — left rows newer than ``max(ts) − (delay + join window)`` are
    never provably final and stay in state, which is CORRECT streaming
    semantics, not loss. Both engines therefore compare the provably
    final region (``a.ts ≤ max(ts) − 16 min``, one minute clear of the
    15-minute finality boundary)."""
    max_ts = (
        load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    )  # 1-row bounds aggregate (test-harness drain only)
    a = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .filter(F.col("ts") <= F.lit(max_ts) - F.expr("interval 16 minutes"))
        .alias("a")
    )
    b = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes").alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 5 minutes")),
        "left_outer",
    ).select(
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        F.col("a.user_id").alias("uid"),
    )
    return ordered(run_available_now(joined, "append"))


@query(
    "q99u_stream_chained_windows",
    oracle="""
    WITH s1 AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS w5, user_id,
             COUNT(*) AS n
      FROM events GROUP BY w5, user_id
    ),
    s2 AS (
      SELECT time_bucket(INTERVAL '15 minutes', w5) AS w15,
             SUM(n) AS total_events, COUNT(*) AS active_pairs
      FROM s1 GROUP BY w15
    )
    SELECT epoch_us(w15) AS w15_us, total_events, active_pairs
    FROM s2
    WHERE w15 + INTERVAL '15 minutes'
          <= (SELECT MAX(ts) FROM events) - INTERVAL '11 minutes'
    ORDER BY w15_us NULLS LAST, total_events NULLS LAST,
             active_pairs NULLS LAST
    """,
)
def q99u_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful operators chained in one append-mode stream
    (Spark 3.4+ multi-stateful support): 5-minute window × user counts,
    re-aggregated into 15-minute windows of (total events, active
    user-window pairs) via ``window()`` over the first stage's window
    column. Each stage's state evicts on the shared watermark; stage-2
    rows emit only when their 15-minute window is provably final, so —
    as in q99q — both engines compare the provably-final region
    (window end ≤ max(ts) − 11 min, one minute clear of the 10-minute
    watermark boundary)."""
    stream = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    s1 = stream.groupBy(F.window("ts", "5 minutes"), F.col("user_id")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s2 = s1.groupBy(F.window(F.col("window"), "15 minutes").alias("w15")).agg(
        F.sum("n").alias("total_events"),
        F.count(F.lit(1)).alias("active_pairs"),
    )
    drained = run_available_now(s2, "append")
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    out = drained.filter(
        F.col("w15.end") <= F.lit(max_ts) - F.expr("interval 11 minutes")
    ).select(
        F.unix_micros(F.col("w15.start")).alias("w15_us"),
        "total_events",
        "active_pairs",
    )
    return ordered(out)


@query(
    "q99za_stream_window_upsert",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_us,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY time_bucket(INTERVAL '5 minutes', ts)
    ORDER BY window_start_us NULLS LAST, n_events NULLS LAST,
             sum_value NULLS LAST
    """,
)
def q99za_stream_window_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-mode windowed aggregation draining into the DB-API upsert
    sink — the full production topology with MUTABLE rows: each
    micro-batch re-emits windows whose counts changed, and the sink's
    key-level upsert (window_start as primary key) makes the repeated
    emissions converge to the final aggregate instead of duplicating —
    update-mode output REQUIRES an idempotent keyed sink, which is
    exactly what q04's epoch ledger + ON CONFLICT machinery provides.
    The oracle checks the SQL table's final contents against the batch
    aggregate over all events."""
    import os
    import sqlite3
    import tempfile

    from kafka_database_import_spark.sinks.jdbc import DbApiUpsertSink
    from kafka_database_import_spark.streaming.runner import (
        events_stream,
        run_foreach_batch,
    )

    db = os.path.join(tempfile.mkdtemp(prefix="kdis_winup_"), "win.sqlite")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE win_agg (window_start_us INTEGER PRIMARY KEY, "
            "n_events INTEGER, sum_value REAL)"
        )
    # No maxFilesPerTrigger here: combined with a finite watermark it
    # would silently drop late rows if the fixture were ever split into
    # multiple part files that are not event-time ordered (the file
    # source orders batches by mtime, not ts). The multi-batch +
    # watermark topology is exercised by
    # tests/test_streaming.py::test_multifile_time_shuffled_window_upsert
    # with a deliberately time-shuffled multi-file source.
    stream = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        stream.groupBy(F.window("ts", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            mround(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )
    sink = DbApiUpsertSink(
        lambda: sqlite3.connect(db), "win_agg", ["window_start_us"]
    )
    run_foreach_batch(agg, sink, output_mode="update")
    with sqlite3.connect(db) as con:
        rows = con.execute(
            "SELECT window_start_us, n_events, sum_value FROM win_agg"
        ).fetchall()
    out = spark.createDataFrame(
        rows, "window_start_us long, n_events long, sum_value double"
    )
    return ordered(out)


@query(
    "q99zz_stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT event_id FROM events
    ORDER BY event_id NULLS LAST
    """,
)
def q99zz_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — the retry-tolerant dedup
    variant q37 can't express: the dedup KEY excludes event time, so
    at-least-once redeliveries that carry a DIFFERENT timestamp (the
    realistic Kafka-retry shape — producer re-sends stamp new times)
    still collapse to one row, while the watermark bounds state by
    time rather than by key cardinality. Simulated here by unioning
    the stream with a 30-second-shifted copy of itself: plain
    dropDuplicates(["event_id"]) without the time column would keep
    state forever, and dropDuplicates(["event_id", "ts"]) would let
    every shifted retry through (2× rows); this operator is the only
    one that both dedups and evicts. The oracle is the batch DISTINCT
    over the key — the retry copies must vanish entirely."""
    s1 = events_stream(spark, sf_dir).select("event_id", "ts")
    retries = (
        events_stream(spark, sf_dir)
        .select("event_id", (F.col("ts") + F.expr("INTERVAL 30 SECONDS")).alias("ts"))
    )
    doubled = s1.unionAll(retries)
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    return ordered(run_available_now(deduped, "append"))


@query(
    "q99zzg_stream_full_outer_join",
    oracle="""
    WITH bounded AS (
      SELECT * FROM events
      WHERE ts <= (SELECT MAX(ts) FROM events) - INTERVAL '16 minutes'
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           COALESCE(a.user_id, b.user_id) AS uid
    FROM bounded a FULL OUTER JOIN bounded b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
    ORDER BY id_a NULLS LAST, id_b NULLS LAST, uid NULLS LAST
    """,
)
def q99zzg_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join (VERDICT r4 item 3) — completes
    the q58 (inner) / q99q (left outer) family with the variant whose
    eviction must fire on BOTH sides: a LEFT row null-extends when the
    watermark proves no future match can arrive for it (passes
    a.ts + 5 min), and a RIGHT row null-extends when the watermark
    passes b.ts — two different finality conditions live in the same
    state store. Both inputs are pre-filtered to the provably-final
    region (ts ≤ max(ts) − 16 min, one minute clear of the 15-minute
    left-side boundary = 10-min watermark + 5-min join window), so the
    bounded drain emits every row exactly once and the batch FULL
    OUTER oracle reproduces it. At 100 TB the time-bound condition is
    what keeps both state stores finite: each side holds only the
    watermark-deep tail, evicted per microbatch."""
    max_ts = (
        load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    )  # 1-row bounds aggregate (test-harness drain only)
    bound = F.lit(max_ts) - F.expr("interval 16 minutes")
    a = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .filter(F.col("ts") <= bound)
        .alias("a")
    )
    b = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .filter(F.col("ts") <= bound)
        .alias("b")
    )
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 5 minutes")),
        "full_outer",
    ).select(
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("uid"),
    )
    return ordered(run_available_now(joined, "append"))


@query(
    "q99zzn_statestore_read",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
    FROM events
    GROUP BY event_type
    ORDER BY event_type NULLS LAST, n NULLS LAST, cents NULLS LAST
    """,
)
def q99zzn_statestore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATE STORE READER (``spark.read.format("statestore")``) —
    streaming-state observability: after a drained streaming aggregation
    over events, the query reads the raw aggregation state OUT OF THE
    CHECKPOINT (never touching the query's own sink) and the oracle is
    the equivalent batch GROUP BY over the base table. What this
    proves: the checkpoint's state rows — key struct, aggregation
    buffer, across all partitions — hold exactly the final aggregate.
    At 100 TB this is the debugging surface for stateful streams
    (inspect skewed keys, audit state size per partition, validate a
    migration) without replaying the stream. The companion
    ``state-metadata`` format is asserted in the drain guard."""
    import tempfile as _tf

    from kafka_database_import_spark.sources.readers import load_table

    ckpt = _tf.mkdtemp(prefix="kdis_ssread_ckpt_")
    stream = events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    meta = spark.read.format("state-metadata").load(ckpt)
    assert meta.count() >= 1  # the operator registered its store
    st = spark.read.format("statestore").load(ckpt)
    # state buffer fields carry the AGGREGATE FUNCTION names
    # (count/sum), not the query's output aliases — re-alias here
    out = st.select("key.*", "value.*").select(
        "event_type",
        F.col("count").alias("n"),
        F.col("sum").alias("cents"),
    )
    return ordered(out, "event_type", "n", "cents")
