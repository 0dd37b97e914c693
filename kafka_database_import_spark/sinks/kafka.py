"""Kafka sink: envelope transform + producer-frame shaping (reference
R6+R7, ``kafka-database-import.go:199-210``).

The reference wraps each decoded document as ``{"data": <doc>,
"source": "database"}`` and produces one message per record —
un-keyed, to partition 0, one round-trip per record (the dominant
inefficiency; ``kafka-go/conn.go:1038``). Spark-side the same logical
sink is ``df.write.format("kafka")``: messages batch per task, the
producer partitions natively, and throughput scales with executors
instead of a single TCP connection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_database_import_spark.session import EngineConfig

# Kafka source/sink fixed schema (public Spark Kafka integration).
KAFKA_FRAME_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp")


def envelope_json(data_json_col: Column | str) -> Column:
    """R6 envelope: ``{"data": <doc>, "source": "database"}``
    (``kafka-database-import.go:199-204``).

    The payload is already a JSON object string (the analog of the
    reference's decoded ``bson.M``), so the wrap is pure string
    concatenation — stays in whole-stage codegen and, unlike
    ``to_json`` of a parsed struct, is byte-identical across engines
    (no engine-specific float/timestamp re-formatting)."""
    c = F.col(data_json_col) if isinstance(data_json_col, str) else data_json_col
    return F.concat(F.lit('{"data":'), c, F.lit(',"source":"database"}'))


def to_kafka_frame(
    df: DataFrame, value_col: str = "value", key_col: str | None = None
) -> DataFrame:
    """Shape a DataFrame for the Kafka sink: ``value`` (required,
    binary/string) + optional ``key``. The reference writes un-keyed
    messages (``kafka-database-import.go:208-210``); we surface the key
    column so callers *can* partition by key (fixing the vestigial
    ``user_filter.partition`` routing, ``sql/createUserFilter.sql:4``)."""
    cols = [F.col(value_col).cast("string").alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def write_kafka(df: DataFrame, cfg: EngineConfig, mode: str = "append") -> None:
    """Batch Kafka producer write. Requires the Kafka connector on the
    classpath and a live broker — not available in the sandbox, so this
    is exercised by plan-construction tests only."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_brokers)
        .option("topic", cfg.kafka_topic)
        .mode(mode)
        .save()
    )


def kafka_writer_options(cfg: EngineConfig) -> dict[str, str]:
    """Option dict for the Kafka sink — split out so option wiring is
    unit-testable without a broker."""
    return {
        "kafka.bootstrap.servers": cfg.kafka_brokers,
        "topic": cfg.kafka_topic,
    }


def kafka_reader_options(cfg: EngineConfig, starting: str = "earliest") -> dict[str, str]:
    """Option dict for the Kafka streaming source (Q03). The reference's
    consumer-side twin would read the topic this job produces
    (``kafka-database-import.go:103-105`` env config)."""
    return {
        "kafka.bootstrap.servers": cfg.kafka_brokers,
        "subscribe": cfg.kafka_topic,
        "startingOffsets": starting,
        "failOnDataLoss": "false",
    }
