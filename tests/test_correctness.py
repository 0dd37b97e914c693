"""Differential correctness: every oracle-carrying catalog query must
hash-match DuckDB on the same fixtures (the driver's t2 gate, run here at
sf0.001 for speed — set KDIS_TEST_SF_DIR=/root/testdata/sf0.01 for the
full-fidelity run)."""

from __future__ import annotations

import pytest

from kafka_database_import_spark.oracle import compare, duckdb_connection
from kafka_database_import_spark.plans.registry import all_queries

_QUERIES = all_queries()
_ORACLE_NAMES = [n for n, q in _QUERIES.items() if q.oracle is not None]
_SMOKE_NAMES = [n for n, q in _QUERIES.items() if q.oracle is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, con, name):
    q = _QUERIES[name]
    res = compare(name, q.fn(spark, sf_dir), q.oracle, con)
    assert res.match, (
        f"{name}: spark_rows={res.spark_rows} oracle_rows={res.oracle_rows} "
        f"{res.sample_diff}"
    )


@pytest.mark.parametrize("name", _SMOKE_NAMES)
def test_smoke(spark, sf_dir, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_checksum_compare_agrees_with_hash_compare(spark, sf_dir, con):
    """compare_checksum must agree with full hash compare on a query
    where both are feasible — and detect an injected off-by-one."""
    from pyspark.sql import functions as F

    from kafka_database_import_spark.oracle import compare_checksum

    q = _QUERIES["q99zi_cdc_apply"]
    df = q.fn(spark, sf_dir)
    r = compare_checksum("q99zi", df, q.oracle, con, ["k", "last_seq"])
    assert r.match and r.spark_rows == r.oracle_rows > 0
    tampered = df.withColumn("last_seq", F.col("last_seq") + (F.col("k") == 7).cast("long"))
    r2 = compare_checksum("q99zi_tampered", tampered, q.oracle, con, ["k", "last_seq"])
    assert not r2.match
