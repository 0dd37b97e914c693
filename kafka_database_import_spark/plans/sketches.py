"""Mergeable-sketch operators — the aggregation pattern that makes
100 TB distinct-counting incremental.

``approx_count_distinct`` (q18) answers one query; a *persisted* HLL
sketch answers every future query over any union of the sketched
groups without rescanning the data: build per-partition/per-day
sketches once (binary column, a few KB each), store them, and
``hll_union_agg`` collapses any subset — cross-day, cross-source,
cross-table — into an estimate in milliseconds. That build-once /
merge-forever shape is the only way rolling distinct-user metrics stay
sublinear at corpus scale; re-aggregating raw events is a full scan
per question. Spark's implementation is the public Apache DataSketches
HllSketch (``F.hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

Reference parity: the reference has no sketch surface (its metric is
an exact running row counter, kafka-database-import.go:215-218); this
is declared engine surface for the training-data-pipeline tier.

No DuckDB oracle — sketch binaries are engine-specific — so the
contract is pinned by property tests (tests/test_properties.py):
±5 % accuracy vs exact distinct, and exact merge-consistency
(union of per-group sketches ≡ one global sketch, byte-for-byte
estimate equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_database_import_spark.plans.registry import ordered, query
from kafka_database_import_spark.sources.readers import load_table

# Fixed log2m so sketches built in different jobs/rounds stay
# union-compatible; unions of mismatched precisions downgrade.
HLL_LGK = 12


def build_sketches(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, sketch) — one mergeable HLL binary per group. This is
    the map-side-combinable aggregation: partial sketches merge inside
    each partition before the single shuffle on ``group_col``."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(HLL_LGK)).alias("sketch")
    )


def merge_sketches(sketches: DataFrame, group_col: str | None = None) -> DataFrame:
    """Collapse stored sketches — the no-rescan re-aggregation path.
    ``group_col=None`` → one global row."""
    agg = F.hll_union_agg("sketch").alias("sketch")
    return (
        sketches.groupBy(group_col).agg(agg) if group_col else sketches.agg(agg)
    )


@query("q69_hll_sketch_merge")  # no oracle: sketch binaries are engine-specific
def q69_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable distinct count: per-event-type HLL sketches
    over ``user_id``, then a global estimate from *unioning the
    sketches* — the raw events are scanned exactly once. Output is one
    row per event type plus an ``__all__`` row whose estimate comes
    from the sketch union, never from re-reading events."""
    events = load_table(spark, sf_dir, "events")
    per_type = build_sketches(events, "event_type", "user_id")
    type_rows = per_type.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sketch").alias("n_users_est"),
    )
    global_row = merge_sketches(per_type).select(
        F.lit("__all__").alias("scope"),
        F.hll_sketch_estimate("sketch").alias("n_users_est"),
    )
    return ordered(type_rows.unionAll(global_row))
