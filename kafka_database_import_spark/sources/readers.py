"""Batch sources: Parquet / CSV / JSON readers (SURVEY §2.2 Q01–Q02).

The reference's only batch source is an unfiltered MongoDB collection
scan materialized client-side (``kafka-database-import.go:148-158``) and
a predicate-pushdown filtered scan (``:169-170``). Spark-side, scans are
declarative: Catalyst pushes predicates and prunes columns into the
Parquet reader (check ``PushedFilters`` / ``ReadSchema`` in
``.explain``), so *no* manual pushdown machinery exists here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Explicit schemas for schema-on-read sources (CSV/JSON). Parquet is
# self-describing; these mirror FIXTURES.md §B so CSV/JSON round-trips
# type identically to the parquet originals.
NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain ``spark.read.parquet`` — filters and
    projections applied downstream reach the scan via Catalyst.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read nanos as long and floor-divide to micros —
    the same floor DuckDB applies casting TIMESTAMP_NS→TIMESTAMP, so
    both engines see identical microsecond timestamps. The conversion is
    exact integer floor division (``div`` truncates toward zero, wrong
    for pre-epoch nanos; float division loses precision above 2^53)."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        # get_spark() sets this at build time; guard for foreign sessions
        # (the driver harness constructs its own) without re-setting per scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        # same foreign-session guard: NTZ inference wraps every
        # timestamp in a cast downstream (normalize_ntz), which blocks
        # parquet pushdown for OR-predicates; under a UTC session the
        # LTZ reading is value-identical (verified differentially).
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        floor_us = "(ts - ((ts % 1000) + 1000) % 1000) div 1000"
        df = df.withColumn("ts", F.timestamp_micros(F.expr(floor_us)))
    return normalize_ntz(df)


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (LTZ).

    Parquet timestamp[us] with isAdjustedToUTC=false infers as
    TIMESTAMP_NTZ in Spark 4. The session timezone is pinned to UTC, so
    the cast keeps wall-clock values identical to DuckDB's naive reading
    while restoring the type every instant function (unix_micros,
    window, watermark, datediff-vs-date) expects. Fixture generators may
    emit either annotation across rounds; this makes the engine
    insensitive to that."""
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def csv_scan_with_schema(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """CSV scan with an explicit schema (Q02) — never infer on open data.

    Schema inference re-reads the input; at 100 TB that is a full extra
    pass. Explicit schemas also keep corrupt rows visible via
    ``columnNameOfCorruptRecord`` instead of silently widening types.
    """
    opts = {"header": "true", "mode": "PERMISSIVE"}
    opts.update(options)
    return spark.read.schema(schema).options(**opts).csv(path)


def json_scan_with_schema(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """JSON-lines scan with explicit schema (Q02). PERMISSIVE mode keeps
    malformed rows (the reference logs-and-continues on decode errors,
    ``kafka-database-import.go:192-197``) rather than aborting."""
    opts = {"mode": "PERMISSIVE"}
    opts.update(options)
    return spark.read.schema(schema).options(**opts).json(path)
