"""Driver contract for the spark-graft builder (PySpark target).

Thin adapters over ``kafka_database_import_spark.plans.registry``: the
catalog registers every implemented operator from SURVEY.md §2 as a
named ``Query`` carrying both the Spark-first implementation and (where
SQL-expressible) the DuckDB oracle SQL. The driver runs each
``queries()[name]`` at sf=0.01 against ``oracle_sql()[name]`` and
records row-count + schema + order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_database_import_spark.plans.registry import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's own pipeline (SURVEY §7.2 —
    broadcast semi-join → limit → envelope) on sf0.001; falls back to
    the semi-join core if the pipeline query is not registered."""
    catalog = all_queries()
    for name in ("q48_reference_pipeline", "q11_join_semi"):
        if name in catalog:
            return catalog[name].fn(spark, _SMOKE_SF_DIR)
    raise RuntimeError("catalog is empty — no flagship query registered")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; queries without an oracle
    (streaming/approximate/ML ops) are omitted → rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
