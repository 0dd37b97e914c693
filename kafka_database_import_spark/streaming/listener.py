"""Per-epoch import progress (R9) as a ``StreamingQueryListener``.

The reference prints a progress line every 1,000 exported records
(``kafka-database-import.go:215-218``). The Spark-native equivalent is
not a counter in the data path — it is the engine's own progress bus:
every micro-batch already reports ``numInputRows`` plus any
``observe()`` metrics riding the query, so progress costs zero extra
scans and zero sink-side instrumentation. This listener turns those
events into the reference's cadence (one line per crossed 1,000-record
mark) plus one structured line per epoch, and keeps the per-epoch
records for programmatic assertion.

Events are delivered asynchronously on the listener bus; ``drain()``
blocks until the terminated event lands (or timeout) so callers can
detach the listener without racing the last epochs.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("kafka_database_import_spark.progress")


class EpochProgressLogger(StreamingQueryListener):
    """Logs per-epoch row counts and observed metrics; records them in
    ``self.epochs`` for tests/dashboards.

    ``log_every`` reproduces the reference's every-N-records line; the
    per-epoch structured line always fires."""

    def __init__(self, log_every: int = 1000):
        self.log_every = log_every
        self.epochs: list[dict] = []
        self.total_rows = 0
        self.terminated = False
        self._next_mark = log_every

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:
        log.info("import started: id=%s runId=%s", event.id, event.runId)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rows = int(p.numInputRows or 0)
        observed = {
            name: row.asDict() for name, row in (p.observedMetrics or {}).items()
        }
        self.total_rows += rows
        self.epochs.append(
            {
                "batch_id": p.batchId,
                "rows": rows,
                "total_rows": self.total_rows,
                "observed": observed,
            }
        )
        log.info(
            "epoch %d: %d rows (%d total) observed=%s",
            p.batchId,
            rows,
            self.total_rows,
            observed,
        )
        while self.total_rows >= self._next_mark:
            # the reference's cadence: one line per 1,000 records
            log.info("imported %d records", self._next_mark)
            self._next_mark += self.log_every

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated = True
        log.info(
            "import finished: %d epochs, %d records", len(self.epochs), self.total_rows
        )

    # -- test/caller support ---------------------------------------------
    def drain(self, timeout: float = 15.0) -> bool:
        """Wait for the async listener bus to deliver the terminated
        event (all progress events precede it in bus order)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self.terminated:
                return True
            time.sleep(0.05)
        return self.terminated
