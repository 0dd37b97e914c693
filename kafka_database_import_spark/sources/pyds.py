"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the modern extension point for sources Spark has no built-in connector
for (the reference's Mongo collection scan is exactly this shape:
``kafka-database-import.go:148-158`` hand-rolls a cursor; Spark-side a
custom source declares schema + partitions and the engine handles
distribution, pushdown of limits, and scheduling).

``SyntheticEventsDataSource`` is a deterministic closed-form event
generator: every row is a pure function of ``event_id``, so (a) the
source needs no external system, (b) it reads in parallel — one
``InputPartition`` per shard, rows generated partition-local, never
through the driver — and (c) a DuckDB ``range()`` query can produce the
identical rows, giving a differential oracle for the *connector
machinery itself* (registration, schema, partition planning, Arrow
batch return path).

All classes are built by a factory so their qualnames contain
``<locals>`` — cloudpickle then serializes them BY VALUE when Spark
ships the source to its Python workers, which must not need this
package importable (the driver harness runs from a foreign cwd)."""

from __future__ import annotations

MULT = 2654435761  # Knuth multiplicative constant, also used in q99n
TYPES = ("click", "view", "purchase", "error")


def _make():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    mult = MULT
    types = TYPES

    def synth_row(i: int) -> tuple:
        """Closed-form row for event_id = i. DuckDB twin (q99v oracle):
        the same integer arithmetic over ``range(n)``."""
        h = (i * mult) % 1_000_003
        return (i, h % 500, types[h % 4], float(h % 10_000) / 100.0)

    class _SynthPartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("rows", "1000"))
            self.n_parts = int(options.get("partitions", "8"))

        def partitions(self):
            step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
            return [
                _SynthPartition(lo, min(lo + step, self.n_rows))
                for lo in range(0, self.n_rows, step)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield synth_row(i)

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        """Micro-batch reader over the same closed-form rows: the
        offset is just the next row index, so restart recovery
        (``readBetweenOffsets``) replays any committed range exactly —
        the contract a Kafka-like source must honor."""

        def __init__(self, options):
            self.n_rows = int(options.get("rows", "1000"))
            self.batch = int(options.get("batchSize", "200"))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            end = min(pos + self.batch, self.n_rows)
            return (iter([synth_row(i) for i in range(pos, end)]), {"pos": end})

        def readBetweenOffsets(self, start, end):
            return iter([synth_row(i) for i in range(start["pos"], end["pos"])])

    class SyntheticEventsDataSource(DataSource):
        """``spark.read.format("kdis_synthetic_events")
        .option("rows", n)`` — batch and micro-batch stream over the
        same deterministic rows."""

        @classmethod
        def name(cls) -> str:
            return "kdis_synthetic_events"

        def schema(self) -> str:
            return (
                "event_id bigint, user_id bigint, "
                "event_type string, value double"
            )

        def reader(self, schema):
            return SyntheticEventsReader(self.options)

        def simpleStreamReader(self, schema):
            return SyntheticEventsStreamReader(self.options)

    return SyntheticEventsDataSource, synth_row


SyntheticEventsDataSource, synth_row = _make()





def _make_sink():
    """JSON-lines writer DataSource — the WRITE half of the Spark 4
    Python connector API (``DataSource.writer`` → executor-side
    ``write(iterator) -> WriterCommitMessage`` → driver-side
    ``commit/abort``), implementing the classic two-phase file commit:

    * each task writes to a uniquely-named ``_tmp_*.jsonl`` and reports
      it in its commit message — a retried/speculative attempt leaves a
      stray temp, never a visible file;
    * ``commit`` publishes ONLY reported temps via atomic ``os.replace``
      renames, removes strays, and stamps ``_SUCCESS`` with the row
      count — readers see all-or-nothing;
    * ``abort`` deletes every temp, leaving the directory untouched.

    The same factory/by-value-pickling discipline as the reader classes
    above (workers must not need this package importable)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Done(WriterCommitMessage):
        def __init__(self, tmp_name: str, rows: int):
            self.tmp_name = tmp_name
            self.rows = rows

    class JsonlWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("kdis_jsonl_sink: 'path' option is required")
            self.overwrite = overwrite

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            tmp = f"_tmp_{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, tmp), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), sort_keys=True, default=str))
                    f.write("\n")
                    n += 1
            return _Done(tmp, n)

        def commit(self, messages):
            import glob
            import json
            import os
            import uuid

            keep = {m.tmp_name for m in messages if m is not None}
            if self.overwrite:
                for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                    os.remove(old)
            total = 0
            for i, m in enumerate(m for m in messages if m is not None):
                final = f"part-{i:05d}-{uuid.uuid4().hex[:8]}.jsonl"
                os.replace(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, final),
                )
                total += m.rows
            for stray in glob.glob(os.path.join(self.path, "_tmp_*.jsonl")):
                if os.path.basename(stray) not in keep:
                    os.remove(stray)
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                json.dump({"rows": total}, f)

        def abort(self, messages):
            """Remove every temp. A straggler task killed AFTER this
            sweep can still drop its temp file — harmless: temps are
            invisible to readers and the next successful commit's
            stray sweep removes them (two-phase commit only guarantees
            the VISIBLE namespace, parts + _SUCCESS)."""
            import glob
            import os

            for stray in glob.glob(os.path.join(self.path, "_tmp_*.jsonl")):
                os.remove(stray)

    class JsonlStreamWriter(DataSourceStreamWriter):
        """Epoch-aware variant: Structured Streaming calls
        ``commit(messages, batchId)`` per micro-batch. Effectively-once
        by the same epoch-ledger discipline as ``sinks/jdbc``: commit
        first checks ``_epoch_<batchId>``; a replayed epoch (restart
        after a crash between publish and checkpoint advance) discards
        its temps and publishes nothing, so every row lands exactly
        once no matter how many times the batch re-runs."""

        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("kdis_jsonl_sink: 'path' option is required")

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            tmp = f"_tmp_{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, tmp), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), sort_keys=True, default=str))
                    f.write("\n")
                    n += 1
            return _Done(tmp, n)

        def commit(self, messages, batchId):
            import glob
            import json
            import os

            ledger = os.path.join(self.path, f"_epoch_{batchId}")
            done = [m for m in messages if m is not None]
            if os.path.exists(ledger):  # replayed epoch: discard, no-op
                for m in done:
                    tmp = os.path.join(self.path, m.tmp_name)
                    if os.path.exists(tmp):
                        os.remove(tmp)
                return
            # A crash mid-commit (some part files renamed, ledger not
            # stamped) replays the batch; if the replay plans FEWER
            # partitions, part files with i >= the new count would
            # survive as orphans and be double-read. Sweep the batch's
            # namespace before publishing so a replay fully replaces
            # any partial first attempt.
            for stale in glob.glob(
                os.path.join(self.path, f"part-{batchId:05d}-*.jsonl")
            ):
                os.remove(stale)
            total = 0
            for i, m in enumerate(done):
                final = f"part-{batchId:05d}-{i:05d}.jsonl"
                os.replace(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, final),
                )
                total += m.rows
            with open(ledger + ".inprogress", "w") as f:
                json.dump({"rows": total}, f)
            os.replace(ledger + ".inprogress", ledger)  # atomic publish

        def abort(self, messages, batchId):
            import os

            for m in messages:
                if m is not None:
                    tmp = os.path.join(self.path, m.tmp_name)
                    if os.path.exists(tmp):
                        os.remove(tmp)

    class JsonlSinkDataSource(DataSource):
        """``df.write.format("kdis_jsonl_sink").option("path", d)`` —
        append or overwrite; schema is whatever the frame carries."""

        @classmethod
        def name(cls) -> str:
            return "kdis_jsonl_sink"

        def writer(self, schema, overwrite: bool):
            return JsonlWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite: bool):
            return JsonlStreamWriter(self.options, overwrite)

    return JsonlSinkDataSource


JsonlSinkDataSource = _make_sink()


def register(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
