"""Multimodal decode plumbing (Q47b): the Arrow/mapInPandas path with
the deterministic byte-statistics extractor, and the explicit
degradation of codec-dependent extractors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_database_import_spark.multimodal.decode import (
    _HAS_PIL,
    extract_image_features,
    extract_text_features,
)


def test_text_features_match_python_expectation(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"")), (3, bytearray(bytes([0, 255])))],
        "doc_id LONG, payload BINARY",
    )
    rows = {r.doc_id: r for r in extract_text_features(df).collect()}
    assert rows[1].n_bytes == 3 and abs(rows[1].mean_byte - (97 + 98 + 99) / 3) < 1e-9
    assert rows[2].n_bytes == 0 and rows[2].mean_byte == 0.0
    assert rows[3].n_bytes == 2 and rows[3].mean_byte == 127.5
    assert all(r.modality == "text" for r in rows.values())


def test_feature_schema_stable_over_fixture(spark, sf_dir):
    from kafka_database_import_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = extract_text_features(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "modality", "n_bytes", "mean_byte",
    ]
    # n_bytes from the binary payload must equal n_chars (ASCII fixture)
    joined = out.join(load_table(spark, sf_dir, "documents"), "doc_id")
    assert joined.filter(F.col("n_bytes") != F.col("n_chars")).count() == 0


@pytest.mark.skipif(_HAS_PIL, reason="sandbox has PIL; stub path not reachable")
def test_image_extractor_degrades_explicitly(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id LONG, payload BINARY")
    with pytest.raises(NotImplementedError, match="PIL"):
        extract_image_features(df)
