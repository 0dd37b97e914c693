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


def test_single_partition_sort_not_masked_by_topk_elsewhere(spark):
    """ADVICE r4: classification anchors to the matched subtree — a
    TakeOrderedAndProject in one branch must not suppress a genuine
    Sort-over-Exchange-SinglePartition in another."""
    bad = (
        spark.range(100)
        .repartition(1)
        .sortWithinPartitions("id")
        .withColumn("tag", F.lit("a"))
    )
    topk = spark.range(100).orderBy("id").limit(5).withColumn("tag", F.lit("b"))
    df = bad.unionByName(topk)  # one plan containing both shapes
    assert "TakeOrderedAndProject" in df._jdf.queryExecution().executedPlan().toString()
    assert "single-partition-sort" in _rules(df)


def test_partitioned_window_plus_single_sort_not_misreported(spark):
    """ADVICE r4: a PARTITIONED window elsewhere in the plan must not
    re-label an explicit repartition(1)+sort as 'unbounded-window' —
    the Window node adjacency, not its mere presence, decides."""
    w = Window.partitionBy(F.col("id") % 3).orderBy("id")
    df = (
        spark.range(100)
        .withColumn("r", F.row_number().over(w))
        .repartition(1)
        .sortWithinPartitions("id")
    )
    rules = _rules(df)
    assert "single-partition-sort" in rules
    assert "unbounded-window" not in rules


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


# Full-catalog audit as a regression test: every batch query's plan
# stays lint-clean under the documented allowances. (Streaming-module
# queries are excluded — building them executes the stream; their plan
# shapes are locked by their own tests.) This audit's first run caught
# a real regression: q07's OR-predicate had silently lost pushdown to
# an NTZ cast (fixed in session.resolve_conf).
_AUDIT_ALLOW = {
    # SURVEY-mandated surface
    "q13_join_cross": {"cartesian-product"},
    "q39_scalar_udf": {"python-row-udf"},
    "q84_chunk_udtf": {"python-row-udf"},  # class UDTFs are row-at-a-time by API
    # broadcast-1-row bounds crosses (audited in VERDICT r3: tiny side
    # by construction; the linter cannot see cardinality)
    "q77_zorder_layout": {"cartesian-product"},
    "q99zc_scd2_pointintime_join": {"cartesian-product"},
    # global-order semantics: the op IS a total order (ntile/contiguous
    # ranks); documented single-task reduce over pre-aggregated input
    "q79_ntile_discretize": {"unbounded-window"},
    "q99m_vocab_build": {"unbounded-window"},
    # rank-meet: two opposite total orders of a per-item aggregate
    # (dimension-sized input, documented single-task reduce)
    "tpcds_q44": {"unbounded-window"},
    # computed predicates (corrupt-injection CASE, length/token
    # blocking) are inherently non-convertible to parquet filters
    "q49_dead_letter": {"no-pushed-filters"},
    "q99k_editdist_blocked_join": {"no-pushed-filters"},
    "q76_repetition_filter": {"no-pushed-filters"},  # Gopher text ratios (computed)
    "q99r_salted_skew_join": {"no-pushed-filters"},  # null-injection CASE synth
    # the synthesized inventory relation (plans/tpcds._inventory) fans
    # a 20% item subset across the week spine via a DELIBERATE
    # broadcast cross — bounded dimension × dimension by construction
    # (|item|/5 × |weeks| × 4), never fact-sized; the linter cannot
    # see cardinality
    # q22 additionally inherits an isnotnull(<computed d_week_seq>)
    # scan filter from the week semi-join key — epoch-day arithmetic is
    # not a parquet-convertible predicate (same class as the computed-
    # predicate allowances above)
    "tpcds_q22": {"cartesian-product", "no-pushed-filters"},
    "tpcds_q37": {"cartesian-product", "no-pushed-filters"},
    "tpcds_q82": {"cartesian-product", "no-pushed-filters"},
    "tpcds_q72": {"cartesian-product", "no-pushed-filters"},
    # hour(ts) is computed (never parquet-convertible) and the events
    # table's nanos-timestamp guard blocks the inferred isnotnull from
    # pushing — the q49/q76 computed-predicate class
    "tpcds_q71": {"no-pushed-filters"},
}


def test_full_catalog_lints_clean(spark, sf_dir):
    import time

    findings = {}
    for name, q in _QS.items():
        if q.fn.__module__.endswith("streaming_queries"):
            continue
        if name in (
            "q99zw_stream_neardup",
            "q99j_stream_sql_import",
            "q99zj_snapshot_time_travel",
            "q99zzi_snapshot_changes_stream",  # building runs a stream drain
        ):
            continue  # building these runs streams / stateful side effects
        try:
            fs = [
                f
                for f in lint(q.fn(spark, sf_dir))
                if f.rule not in _AUDIT_ALLOW.get(name, set())
            ]
        except Exception as e:  # building must not crash either
            findings[name] = [f"build-error: {e!r}"[:120]]
            continue
        if fs:
            findings[name] = [f"{f.rule}: {f.detail}" for f in fs]
    assert not findings, findings


def test_single_partition_classifier_skips_sibling_subtree():
    """ADVICE r5: in a multi-child plan the line directly above a Sort
    can be the last leaf of a SIBLING subtree — the classifier must
    find the true parent by tree depth, not take lines[li-1]."""
    from kafka_database_import_spark.operators.plan_lint import (
        _single_partition_findings,
    )

    # Union's second child is the Sort; the line above it is the first
    # child's deepest leaf, which (adversarially) mentions Window in a
    # projection name but is NOT the parent.
    plan = "\n".join(
        [
            "Union",
            ":- Project [a]",
            ":  +- Window [row_number() ...] leaf-of-first-subtree",
            "+- Sort [a ASC NULLS FIRST], false, 0",
            "   +- Exchange SinglePartition, ...",
            "      +- Scan parquet [a]",
        ]
    )
    got = _single_partition_findings(plan)
    assert [f.rule for f in got] == ["single-partition-sort"]

    # and the true-parent-Window case still classifies as unbounded
    plan2 = "\n".join(
        [
            "Window [sum(a) windowspecdefinition(...)]",
            "+- Sort [a ASC NULLS FIRST], false, 0",
            "   +- Exchange SinglePartition, ...",
            "      +- Scan parquet [a]",
        ]
    )
    got2 = _single_partition_findings(plan2)
    assert [f.rule for f in got2] == ["unbounded-window"]
