"""File-backed Structured Streaming harness (SURVEY §5.2: no Kafka
broker in tests → file-source streams + ``availableNow`` triggers).

The production topology is Kafka source → transformations →
``foreachBatch`` JDBC sink; in tests the *same* streaming plan runs
over the fixture parquet as a file stream and drains with
``trigger(availableNow=True)``, which processes all available input in
bounded micro-batches and stops — semantics identical to a caught-up
Kafka consumer.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEQ = itertools.count()


def _stream_dir(file_path: str) -> str:
    """Spark's file stream source requires a flat *directory of leaf
    files*; fixtures are single parquet files (driver testdata) or
    parquet part-file directories (Spark-written). Stage a per-source
    symlink directory (keyed by the resolved source path, created once
    per process) holding one link per leaf file — a nested
    ``dir/part-*.parquet`` layout would not be listed by the source."""
    key = hashlib.sha1(os.path.realpath(file_path).encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "kdis_stream_src", key)
    if os.path.isdir(file_path):
        leaves = [
            os.path.join(file_path, f)
            for f in sorted(os.listdir(file_path))
            if f.endswith(".parquet")
        ]
    else:
        leaves = [file_path]
    os.makedirs(d, exist_ok=True)
    # Prune stale links first: if the source was rewritten with different
    # part-file names (driver regenerates fixtures between rounds), old
    # links would dangle — or worse, point at stale data — and the file
    # stream source would fail or double-read.
    wanted = {os.path.basename(leaf) for leaf in leaves}
    for existing in os.listdir(d):
        link = os.path.join(d, existing)
        if existing not in wanted or not os.path.exists(link):
            try:
                os.unlink(link)
            except FileNotFoundError:
                pass  # concurrent pruner won
    for leaf in leaves:
        link = os.path.join(d, os.path.basename(leaf))
        if not os.path.islink(link):
            try:
                os.symlink(leaf, link)
            except FileExistsError:
                pass  # concurrent creator won
    return d


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming view of the ``events`` fixture (the ``deviceData``
    analog, FIXTURES.md role map). File sources need an explicit schema;
    we take it from a batch read of the same path, so stream and batch
    plans are guaranteed schema-identical — the precondition for the
    batch-equivalence tests. ``ts`` arrives as nanos-as-long (see
    ``sources.readers.load_table``) and gets the identical floor-to-µs
    conversion."""
    path = _stream_dir(os.path.join(sf_dir, "events.parquet"))
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    sdf = reader.parquet(path)
    if dict(sdf.dtypes).get("ts") == "bigint":
        floor_us = "(ts - ((ts % 1000) + 1000) % 1000) div 1000"
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr(floor_us)))
    from kafka_database_import_spark.sources.readers import normalize_ntz

    return normalize_ntz(sdf)


def run_available_now(sdf: DataFrame, output_mode: str = "append") -> DataFrame:
    """Drain a streaming DataFrame through a memory sink with
    ``availableNow`` and return the materialized result as a batch
    DataFrame. Fresh checkpoint + unique table name per run so catalog
    queries stay side-effect-free and re-runnable."""
    name = f"kdis_stream_{next(_SEQ)}"
    checkpoint = tempfile.mkdtemp(prefix="kdis_ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def run_foreach_batch(
    sdf: DataFrame, batch_fn, output_mode: str = "append", listener=None
) -> None:
    """Drain a streaming DataFrame through ``foreachBatch`` (the JDBC
    sink path, SURVEY §4.2) with ``availableNow``.

    ``listener`` (e.g. :class:`~kafka_database_import_spark.streaming.
    listener.EpochProgressLogger`) is attached for the run and detached
    after draining its async event bus — per-epoch R9 progress without
    touching the data path."""
    checkpoint = tempfile.mkdtemp(prefix="kdis_ckpt_")
    spark = sdf.sparkSession
    if listener is not None:
        spark.streams.addListener(listener)
    try:
        q = (
            sdf.writeStream.foreachBatch(batch_fn)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if listener is not None:
            if hasattr(listener, "drain"):
                listener.drain()
            spark.streams.removeListener(listener)
