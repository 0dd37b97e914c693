"""Reference-fidelity edge cases (FIXTURES.md §A1–A3 generation notes):
the behaviors a user of kafka-database-import would observe, asserted
against the Spark pipeline on synthetic A1/A2-shaped data.

* empty filter table  ⇒ zero output rows (``$in []`` semantics,
  kafka-database-import.go:169-170);
* duplicate ``user_id`` in the filter ⇒ semi-join must NOT multiply
  device rows (the reference's IN-list naturally dedups);
* limit boundary ⇒ exactly MAX_RECS rows out of a larger input
  (documented intent; the reference's off-by-one emits 250001,
  kafka-database-import.go:111,182-184);
* hot-user skew (one user ≈ 10 % of rows) ⇒ result correctness is
  unaffected (AQE handles the physical skew);
* malformed payloads ⇒ skip-and-continue into quarantine, never abort
  (kafka-database-import.go:188-197).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.sinks.kafka import envelope_json
from kafka_database_import_spark.sources.dead_letter import split_corrupt


@pytest.fixture(scope="module")
def device_data(spark):
    """A2-shaped: (_userId, payload JSON string), 30k rows, one hot
    user with ~10% of rows, ~1% malformed payloads."""
    rows = spark.range(30_000).select(
        F.when(F.col("id") % 10 == 0, F.lit("hot-user"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 500).cast("string")))
        .alias("_userId"),
        F.when(
            F.col("id") % 97 == 0, F.lit("{malformed")
        ).otherwise(
            F.concat(F.lit('{"seq": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("payload"),
        F.col("id"),
    )
    return rows


def _pipeline(device, users, max_recs=None):
    """The reference dataflow on A1/A2 shapes: semi-join → (limit) →
    envelope."""
    out = device.join(
        F.broadcast(users), device["_userId"] == users["user_id"], "left_semi"
    )
    if max_recs is not None:
        out = out.limit(max_recs)
    return out.select("id", envelope_json("payload").alias("value"))


def test_empty_filter_yields_zero_rows(spark, device_data):
    users = spark.createDataFrame([], "user_id STRING")
    assert _pipeline(device_data, users).count() == 0


def test_duplicate_filter_keys_do_not_multiply(spark, device_data):
    once = spark.createDataFrame([("u1",)], "user_id STRING")
    twice = spark.createDataFrame([("u1",), ("u1",)], "user_id STRING")
    n_once = _pipeline(device_data, once).count()
    n_twice = _pipeline(device_data, twice).count()
    assert n_once == n_twice > 0


def test_limit_boundary_exact(spark, device_data):
    """Documented intent: exactly max_recs (the reference emits
    max_recs+1 — divergence recorded in reference_pipeline.MAX_RECS)."""
    users = spark.createDataFrame(
        [("hot-user",)] + [(f"u{i}",) for i in range(500)], "user_id STRING"
    )
    assert _pipeline(device_data, users, max_recs=20_000).count() == 20_000


def test_hot_user_skew_correctness(spark, device_data):
    users = spark.createDataFrame([("hot-user",)], "user_id STRING")
    n = _pipeline(device_data, users).count()
    assert n == 3000  # exactly the 10% hot slice


def test_malformed_payloads_quarantine_not_abort(spark, device_data):
    good, bad = split_corrupt(device_data, "payload")
    n_bad = bad.count()
    assert n_bad == 30_000 // 97 + 1
    # good rows survive and produce parseable envelopes end-to-end
    users = spark.createDataFrame([("hot-user",)], "user_id STRING")
    sample = _pipeline(good, users).limit(5).collect()
    for r in sample:
        parsed = json.loads(r.value)
        assert parsed["source"] == "database" and "seq" in parsed["data"]


def test_envelope_round_trips_dynamic_payloads(spark):
    """R6 fidelity: arbitrary JSON payload shapes pass through the
    envelope byte-identically (the reference re-serializes decoded
    BSON; we never parse, so nested/unicode/array payloads survive)."""
    payloads = [
        '{"nested": {"a": [1, 2, {"b": null}]}}',
        '{"unicode": "héllo wörld ✓"}',
        '{"empty": {}}',
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "payload STRING")
    for row, original in zip(
        df.select(envelope_json("payload").alias("v")).collect(), payloads
    ):
        assert json.loads(row.v) == {"data": json.loads(original), "source": "database"}


def test_cli_writes_parquet_output(spark, tmp_path):
    """The package runs as a CLI like the reference binary: query →
    parquet sink, row-verified via read-back."""
    from kafka_database_import_spark.__main__ import main

    out = str(tmp_path / "cli_out.parquet")
    rc = main(
        ["--query", "q16_agg_hash", "--sf-dir", "/root/testdata/sf0.001",
         "--output", out]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_cli_rejects_unknown_query():
    from kafka_database_import_spark.__main__ import main

    assert main(["--query", "not_a_query"]) == 2
