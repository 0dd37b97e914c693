"""IN-list guard (operators/inlist.py): strategy switch + result
equivalence across the three paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.operators.inlist import filter_by_inlist
from kafka_database_import_spark.sources.readers import load_table


def _ids(df):
    return {r.event_id for r in df.select("event_id").collect()}


def test_small_list_uses_isin_plan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = filter_by_inlist(ev, "user_id", [1, 2, 3])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # small list stays a scan-side filter
    assert _ids(out) == _ids(ev.filter(F.col("user_id").isin([1, 2, 3])))


def test_large_list_switches_to_broadcast_semi_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    big = list(range(1, 1500))
    out = filter_by_inlist(ev, "user_id", big)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan
    assert _ids(out) == _ids(ev.filter(F.col("user_id").isin(big)))


def test_dataframe_values_always_semi_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    users = load_table(spark, sf_dir, "customer").select("c_custkey").limit(50)
    out = filter_by_inlist(ev, "user_id", users)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    keys = {r.c_custkey for r in users.collect()}
    assert _ids(out) == _ids(ev.filter(F.col("user_id").isin(list(keys))))


def test_multi_column_values_frame_rejected(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    two = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    with pytest.raises(ValueError, match="exactly one column"):
        filter_by_inlist(ev, "user_id", two)
