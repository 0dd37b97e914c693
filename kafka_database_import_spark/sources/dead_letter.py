"""Dead-letter channel for malformed dynamic payloads (reference R8).

The reference logs-and-continues on BSON decode / JSON marshal errors
(``kafka-database-import.go:188-197,211-214``) — rows are silently
dropped with only a log line. Spark-side we make the skip *auditable*:
PERMISSIVE parsing keeps the raw record, the split below routes parse
failures to a quarantine DataFrame, and the quarantine writer persists
them for replay. At 100 TB a silent drop is a data-loss incident; a
quarantine table is an operational queue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Open JSON payloads parse to map<string,string>: scalar values coerce
# to strings, only *malformed* JSON nulls the whole map — which is the
# signal we split on (never force a rigid struct on open payloads;
# SURVEY §7.3 "dynamic data payloads").
OPEN_PAYLOAD_SCHEMA = T.MapType(T.StringType(), T.StringType())


def is_corrupt(json_col: Column | str, schema: T.DataType = OPEN_PAYLOAD_SCHEMA) -> Column:
    """True where the payload is non-null yet unparseable."""
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return c.isNotNull() & F.from_json(c, schema).isNull()


def split_corrupt(
    df: DataFrame, json_col: str, schema: T.DataType = OPEN_PAYLOAD_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) split on payload parseability. One predicate,
    two filters — Catalyst evaluates the parse once per branch and both
    scans share the same pushed filters; no caching or collect."""
    bad = is_corrupt(json_col, schema)
    return df.filter(~bad), df.filter(bad)


def quarantine(bad: DataFrame, path: str, run_id: str = "adhoc") -> None:
    """Persist quarantined rows for replay, partitioned by run so
    re-imports append cleanly (the reference's dropped rows are simply
    gone; ``kafka-database-import.go:196``)."""
    bad.withColumn("_quarantine_run", F.lit(run_id)).write.mode("append").partitionBy(
        "_quarantine_run"
    ).parquet(path)
