"""Multimodal decode plumbing (Q47b/q99h): the Arrow/mapInPandas path
with the byte-statistics extractor, and the real codec-free image
decode (BMP/PPM header parse + NumPy)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_database_import_spark.multimodal.decode import (
    decode_image,
    encode_bmp,
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


@given(
    w=st.integers(min_value=1, max_value=37),
    h=st.integers(min_value=1, max_value=23),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=50, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    """encode_bmp → decode_image is the identity for any geometry —
    covers row padding at every width mod 4."""
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    fmt, back = decode_image(encode_bmp(img))
    assert fmt == "bmp"
    assert np.array_equal(back, img)


def test_ppm_decode_with_comment():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    fmt, back = decode_image(buf)
    assert fmt == "ppm"
    assert np.array_equal(back, img)


def test_decode_rejects_garbage_without_raising():
    assert decode_image(b"") == (None, None)
    assert decode_image(b"\x89PNG\r\n\x1a\n not really") == (None, None)
    assert decode_image(encode_bmp(np.zeros((4, 4, 3), np.uint8))[:20]) == (None, None)


def test_image_extractor_decodes_bmp_in_spark(spark):
    """End-to-end through mapInPandas: generated BMPs decode to exact
    dimensions and channel means; a corrupt payload degrades to a
    null-feature row in the same batch instead of failing it."""
    rng = np.random.default_rng(42)
    imgs = {i: rng.integers(0, 256, (5 + i, 7 + i, 3), dtype=np.uint8) for i in range(4)}
    rows = [(i, bytearray(encode_bmp(img))) for i, img in imgs.items()]
    rows.append((99, bytearray(b"not an image")))
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert len(got) == 5
    for i, img in imgs.items():
        r = got[i]
        assert (r.format, r.width, r.height, r.channels) == ("bmp", 7 + i, 5 + i, 3)
        means = img.reshape(-1, 3).mean(axis=0)
        assert abs(r.mean_r - means[0]) < 1e-9
        assert abs(r.mean_g - means[1]) < 1e-9
        assert abs(r.mean_b - means[2]) < 1e-9
    bad = got[99]
    assert bad.format is None and bad.width is None and bad.mean_r is None
