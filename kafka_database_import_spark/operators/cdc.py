"""Change-data-capture apply — changelog → table state.

The reference imports an *append-only* record stream into a database
(kafka-database-import.go:171-218); real CDC feeds (Debezium, DMS,
binlog tailers) also carry updates and deletes with a total order
(LSN / binlog position / Kafka offset — ``seq_col`` here). Two halves:

* :func:`apply_changelog` — BATCH compaction: reduce a changelog to
  the final table state (last writer wins per key, deletes drop the
  key). One shuffle on the key columns; the per-key winner is found
  with a max-seq window, so state never exceeds one row per key and a
  100 TB changelog compacts with exactly the same plan shape as q25's
  per-group top-1 (WindowGroupLimit pushes the rank-1 filter into the
  sort, so no full sort materializes).
* :class:`~kafka_database_import_spark.sinks.jdbc.CdcDbApiSink` — the
  STREAMING half: per microbatch, compact the batch with
  ``apply_changelog`` and apply it to a SQL mirror table in one
  transaction (delete staged deletes, conditionally upsert the rest),
  guarded by the same epoch ledger as ``DbApiUpsertSink`` and by a
  seq comparison so replayed or out-of-order rows can never regress
  the mirror (last-writer-wins is enforced IN the database, not
  assumed of the transport).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
    valid_ops: Sequence[str] | None = None,
) -> DataFrame:
    """Compact a changelog to final state: per key, keep the row with
    the highest ``seq_col``; if that row's ``op_col`` is ``delete_op``
    the key is gone. Requires ``seq_col`` to totally order changes
    within a key (ties would make "last" ambiguous — CDC sources
    guarantee this by construction: LSNs are unique per row).

    Every op other than ``delete_op`` is an upsert — which silently
    absorbs CORRUPT op codes. Pass ``valid_ops`` (e.g. Debezium's
    ``("c", "u", "r", "d")``) to fail the job on the first unknown op
    instead: a poisoned feed should stop the pipeline, not write
    garbage rows into the mirror (the q49 dead-letter split is the
    right tool when quarantine is preferred over failure).

    The output keeps ``seq_col`` and drops ``op_col`` — downstream
    consumers (and :class:`CdcDbApiSink`'s mirror table) need the seq
    for monotonic-apply guards but not the already-applied op.
    """
    if valid_ops is not None:
        if delete_op not in valid_ops:
            raise ValueError(f"delete_op {delete_op!r} not in valid_ops {valid_ops}")
        # the check rides the op column itself — a side-channel assert
        # column would be pruned away by the optimizer before executing
        df = df.withColumn(
            op_col,
            F.when(F.col(op_col).isin(*valid_ops), F.col(op_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "unknown CDC op (expected one of "
                            + ", ".join(f"'{o}'" for o in valid_ops)
                            + "): "
                        ),
                        F.col(op_col),
                    )
                )
            ),
        )
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", op_col)
    )
