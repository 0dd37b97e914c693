"""Plan-linter (operators/plan_lint): the repo's scale rules as
executable checks — known-bad frames must be flagged, and every
headline catalog query must lint clean (with the two SURVEY-mandated
exceptions allowed explicitly)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_database_import_spark.operators.plan_lint import assert_clean, lint
from kafka_database_import_spark.plans.registry import all_queries

_QS = all_queries()


def _rules(df):
    return {f.rule for f in lint(df)}


def test_flags_cartesian_product(spark):
    a, b = spark.range(10), spark.range(10).withColumnRenamed("id", "id2")
    assert "cartesian-product" in _rules(a.crossJoin(b))


def test_flags_row_at_a_time_python_udf(spark):
    @F.udf(T.LongType())
    def slow(x):
        return x + 1

    assert "python-row-udf" in _rules(spark.range(10).select(slow("id")))


def test_flags_unbounded_window(spark):
    w = Window.orderBy("id")
    df = spark.range(10).withColumn("r", F.row_number().over(w))
    assert "unbounded-window" in _rules(df)


def test_flags_single_partition_sort(spark):
    # repartition(1) + sort plans as Sort over Exchange SinglePartition
    df = spark.range(100).repartition(1).sortWithinPartitions("id")
    assert "single-partition-sort" in _rules(df)


def test_plain_order_by_is_not_flagged(spark, sf_dir):
    from kafka_database_import_spark.sources.readers import load_table

    df = load_table(spark, sf_dir, "orders").orderBy("o_orderkey")
    assert "single-partition-sort" not in _rules(df)


def test_pushed_filter_scan_is_clean(spark, sf_dir):
    from kafka_database_import_spark.sources.readers import load_table

    df = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") > 5)
    assert_clean(df)


# The headline set must lint clean; allowances are the two queries
# whose "anti-pattern" IS the declared surface (SURVEY §2.2):
# q13 bounded cross join, q39 row-at-a-time UDF on a dimension.
_ALLOW = {
    "q13_join_cross": {"cartesian-product"},
    "q39_scalar_udf": {"python-row-udf"},
}
_HEADLINE = [
    "q16_agg_hash", "q08_join_broadcast", "q09_join_shuffle",
    "q25_topk_per_group", "q24_sort_limit", "q15_join_asof",
    "q48_reference_pipeline", "q45_cosine_topk", "q43_exact_dedup",
    "q46_text_stats", "q13_join_cross", "q39_scalar_udf",
    "q99zq_xml_roundtrip", "q99zs_map_in_arrow", "q99zr_grouped_map",
]


@pytest.mark.parametrize("name", _HEADLINE)
def test_headline_queries_lint_clean(spark, sf_dir, name):
    df = _QS[name].fn(spark, sf_dir)
    assert_clean(df, allow=_ALLOW.get(name, set()))
