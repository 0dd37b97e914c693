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


# --------------------------------------------------------------------------
# Audio (WAV/RIFF PCM) — multimodal/media.py
# --------------------------------------------------------------------------

from kafka_database_import_spark.multimodal.media import (  # noqa: E402
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    extract_audio_features,
    resize_images,
    resize_nearest,
    sample_video_frames,
)


@given(
    n=st.integers(min_value=1, max_value=400),
    channels=st.integers(min_value=1, max_value=3),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_property(n, channels, sr, seed):
    """encode_wav → decode_wav is the identity for any geometry,
    including odd data-chunk sizes (RIFF even-padding path)."""
    x = np.random.default_rng(seed).integers(-(2**15), 2**15, (n, channels)).astype(np.int16)
    got_sr, back = decode_wav(encode_wav(x, sr))
    assert got_sr == sr
    assert np.array_equal(back, x)


def test_wav_decode_rejects_garbage_without_raising():
    assert decode_wav(b"") == (None, None)
    assert decode_wav(b"RIFF\x00\x00\x00\x00JUNK") == (None, None)
    # 8-bit / non-PCM formats are declined, not misparsed
    buf = bytearray(encode_wav(np.zeros((4, 1), np.int16), 8000))
    buf[20] = 3  # audio_format = IEEE float
    assert decode_wav(bytes(buf)) == (None, None)


def test_audio_extractor_integer_features_in_spark(spark):
    """Integer-exact features (Σx², peak, zero-crossings) through the
    Arrow path match a NumPy reference; corrupt payloads degrade to a
    null-feature row."""
    rng = np.random.default_rng(7)
    waves = {
        i: rng.integers(-(2**15), 2**15, (50 + 13 * i, 1 + i % 2)).astype(np.int16)
        for i in range(4)
    }
    rows = [(i, bytearray(encode_wav(w, 16000))) for i, w in waves.items()]
    rows.append((99, bytearray(b"not audio")))
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r.doc_id: r for r in extract_audio_features(df).collect()}
    assert len(got) == 5
    for i, w in waves.items():
        r = got[i]
        x = w.astype(np.int64)
        assert (r.sample_rate, r.channels, r.n_frames) == (16000, w.shape[1], w.shape[0])
        assert r.sum_sq == int((x * x).sum())
        assert r.peak == int(np.abs(x).max())
        s = x[:, 0] >= 0
        assert r.zero_crossings == int((s[1:] != s[:-1]).sum())
    assert got[99].sample_rate is None and got[99].sum_sq is None


# --------------------------------------------------------------------------
# Video (Y4M) — frame sampling
# --------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    n_frames=st.integers(min_value=1, max_value=12),
    every_n=st.integers(min_value=1, max_value=5),
    mono=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=50, deadline=None)
def test_y4m_frame_sampling_property(w, h, n_frames, every_n, mono, seed):
    """decode_y4m returns exact geometry, total frame count, and the
    every-Nth sampled Y planes bit-identically, for C444 and Cmono."""
    rng = np.random.default_rng(seed)
    if mono:
        frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n_frames)]
        ys = frames
    else:
        frames = [rng.integers(0, 256, (3, h, w), dtype=np.uint8) for _ in range(n_frames)]
        ys = [f[0] for f in frames]
    gw, gh, gn, sampled = decode_y4m(encode_y4m(frames), every_n)
    assert (gw, gh, gn) == (w, h, n_frames)
    expect = list(range(0, n_frames, every_n))
    assert [i for i, _ in sampled] == expect
    for i, y in sampled:
        assert np.array_equal(y, ys[i])


def test_y4m_decode_rejects_garbage_and_subsampled():
    assert decode_y4m(b"")[0] is None
    assert decode_y4m(b"MPEG2 W4 H4\n")[0] is None
    # C420 (subsampled chroma) is declared unsupported, not misparsed
    buf = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\nFRAME\n" + bytes(6)
    assert decode_y4m(buf)[0] is None


def test_video_frame_sampler_fan_out_in_spark(spark):
    """One-to-many mapInPandas: rows out = Σ ceil(n_frames/every_n);
    luma sums match NumPy; a corrupt payload yields one null row."""
    rng = np.random.default_rng(3)
    vids = {}
    for i in range(3):
        n = 2 + 3 * i
        vids[i] = [rng.integers(0, 256, (3, 4 + i, 6), dtype=np.uint8) for _ in range(n)]
    rows = [(i, bytearray(encode_y4m(f))) for i, f in vids.items()]
    rows.append((99, bytearray(b"not video")))
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    out = sample_video_frames(df, every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, frames in vids.items():
        got = sorted(by_doc[i], key=lambda r: r.frame_idx)
        expect_idx = list(range(0, len(frames), 2))
        assert [r.frame_idx for r in got] == expect_idx
        for r in got:
            assert (r.n_frames, r.width, r.height) == (len(frames), 6, 4 + i)
            assert r.y_sum == int(frames[r.frame_idx][0].sum(dtype="int64"))
    assert len(by_doc[99]) == 1 and by_doc[99][0].width is None


# --------------------------------------------------------------------------
# Resize (nearest-neighbor)
# --------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=30),
    h=st.integers(min_value=1, max_value=20),
    ow=st.integers(min_value=1, max_value=15),
    oh=st.integers(min_value=1, max_value=15),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_resize_nearest_matches_index_map(w, h, ow, oh, seed):
    """resize_nearest equals the explicit (dst*src)//out floor map for
    any up/down-scale combination, and is the identity at same size."""
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = resize_nearest(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    for r in range(oh):
        for c in range(ow):
            assert (out[r, c] == img[(r * h) // oh, (c * w) // ow]).all()
    assert np.array_equal(resize_nearest(img, w, h), img)


def test_resize_images_roundtrip_in_spark(spark):
    """decode → resize → BMP re-encode through the Arrow pass: resized
    payloads decode back to the exact nearest-neighbor thumbnail."""
    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, (6 + i, 9 + i, 3), dtype=np.uint8) for i in range(3)}
    rows = [(i, bytearray(encode_bmp(img))) for i, img in imgs.items()]
    rows.append((99, bytearray(b"junk")))
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r.doc_id: r for r in resize_images(df, out_w=5, out_h=4).collect()}
    for i, img in imgs.items():
        r = got[i]
        assert (r.width, r.height) == (5, 4)
        fmt, px = decode_image(bytes(r.payload))
        assert fmt == "bmp"
        assert np.array_equal(px, resize_nearest(img, 5, 4))
    assert got[99].payload is None


def test_yield_chunked_covers_frame_exactly():
    from kafka_database_import_spark.multimodal.media import yield_chunked
    import pandas as pd

    pdf = pd.DataFrame({"a": range(1300)})
    parts = list(yield_chunked(pdf, max_rows=512))
    assert [len(p) for p in parts] == [512, 512, 276]
    assert pd.concat(parts)["a"].tolist() == list(range(1300))
    assert "<locals>" in yield_chunked.__qualname__  # by-value pickling contract


def test_degenerate_parameters_rejected_on_driver(spark):
    """every_n=0 and non-positive resize dims must fail fast on the
    driver (a ZeroDivisionError inside a worker batch would otherwise
    surface as an opaque task failure)."""
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id LONG, payload BINARY")
    import pytest as _pt

    with _pt.raises(ValueError, match="every_n"):
        sample_video_frames(df, every_n=0)
    with _pt.raises(ValueError, match="target dims"):
        resize_images(df, out_w=0, out_h=4)


def test_codec_golden_bytes_match_specs():
    """Wire formats pinned byte-for-byte against spec-derived goldens
    (hand-verified field by field: RIFF/fmt/data chunk layout, BMP
    header offsets + BGR order + 4-byte row padding, YUV4MPEG2
    parameter line). Guards the encoders against silent drift — any
    layout change breaks real consumers, not just our decoders."""
    from kafka_database_import_spark.multimodal.media import encode_wav, encode_y4m

    wav = encode_wav(np.array([[1000], [-1000]], np.int16), 8000)
    assert wav.hex() == (
        "524946462800000057415645666d7420100000000100010040"
        "1f0000803e0000020010006461746104000000e80318fc"
    )
    bmp = encode_bmp(np.array([[[255, 0, 128]]], np.uint8))
    assert bmp.hex() == (
        "424d3a00000000000000360000002800000001000000010000000100"
        "18000000000004000000000000000000000000000000000000008000ff00"
    )
    y4m = encode_y4m([np.array([[7]], np.uint8)])
    assert y4m == b"YUV4MPEG2 W1 H1 F25:1 Ip A1:1 Cmono\nFRAME\n\x07"
