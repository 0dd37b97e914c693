"""Query-catalog registry.

Every operator the engine claims (SURVEY.md §2.2 Q01–Q48 plus the
LLM-pipeline extensions) registers here as a named query:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
* ``oracle`` — equivalent ANSI SQL for DuckDB differential testing
  (``None`` for streaming/approximate ops → driver records a weaker
  rows-only check).

Binding output conventions (FIXTURES.md "Oracle canonicalization"):
every query ends in a total ORDER BY over all output columns with
explicit NULLS LAST; floating aggregates are ROUND(x, 2); timestamps are
projected as epoch microseconds (``unix_micros`` / ``epoch_us``) so no
string-formatting skew exists between engines; every computed column is
aliased identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# Modules that populate the registry on import.
_CATALOG_MODULES = (
    "kafka_database_import_spark.plans.relational",
    "kafka_database_import_spark.plans.windows",
    "kafka_database_import_spark.plans.scalars",
    "kafka_database_import_spark.plans.udfs",
    "kafka_database_import_spark.plans.extensions",
    "kafka_database_import_spark.plans.analytics",
    "kafka_database_import_spark.plans.datacleaning",
    "kafka_database_import_spark.plans.llmops",
    "kafka_database_import_spark.plans.sketches",
    "kafka_database_import_spark.plans.tpch",
    "kafka_database_import_spark.plans.tpcds",
    "kafka_database_import_spark.plans.reference_pipeline",
    "kafka_database_import_spark.plans.streaming_queries",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query. ``oracle=None`` → smoke-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    for mod in _CATALOG_MODULES:
        importlib.import_module(mod)
    return dict(sorted(_REGISTRY.items()))


def ordered(df: DataFrame, *cols: str) -> DataFrame:
    """Total ORDER BY over (given or all) columns, NULLS LAST, for
    hash-stable differential comparison."""
    names = list(cols) if cols else df.columns
    return df.orderBy(*[df[c].asc_nulls_last() for c in names])
