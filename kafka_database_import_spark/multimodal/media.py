"""Audio / video multimodal plumbing (SURVEY §2.2 Q47 extensions).

Same design contract as :mod:`.decode` (images): media payloads are
opaque ``binary`` columns; decode and feature extraction run as
Arrow-batched ``mapInPandas`` so payload bytes never enter the JVM row
format; corrupt payloads degrade to null-feature rows instead of
failing the batch (the reference logs-and-continues on decode errors,
``kafka-database-import.go:192-197``).

The sandbox has no media codec libraries, so the REAL formats used are
the two that need none:

* **WAV (RIFF PCM 16-bit)** — the canonical uncompressed audio
  container; chunk walk + ``np.frombuffer``. ``encode_wav`` /
  ``decode_wav`` round-trip.
* **Y4M (YUV4MPEG2)** — the canonical uncompressed video stream
  format (mplayer/ffmpeg interchange); ASCII parameter header +
  ``FRAME`` markers + raw planes. ``C444`` (three full-res planes) and
  ``Cmono`` (Y only) are supported.

Feature extraction is deliberately **integer-exact** (sum of squares,
peak, zero-crossings, per-frame luma sums as int64) so the catalog
queries over synthesized corpora can carry full DuckDB hash oracles:
both engines reproduce the numbers bit-identically, no float-rounding
canonicalization needed.

All codec helpers are built by factory functions so their qualnames
contain ``<locals>`` and cloudpickle embeds them BY VALUE in worker
closures — a module-level function pickles by reference and breaks on
workers that cannot import this package (see the verified gotcha in
``decode.extract_text_features``).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# WAV (RIFF PCM) codec — 16-bit little-endian, any channel count
# --------------------------------------------------------------------------


def _make_wav_codec():
    def encode_wav(samples, sample_rate: int) -> bytes:
        """Minimal RIFF/WAVE PCM-16 writer. ``samples`` is an
        ``(n_frames, channels)`` (or ``(n_frames,)`` mono) int16
        array; frames are interleaved per the spec."""
        import numpy as np

        arr = np.asarray(samples, dtype="<i2")
        if arr.ndim == 1:
            arr = arr[:, None]
        n_frames, channels = arr.shape
        data = arr.tobytes()  # row-major == interleaved frames
        block_align = channels * 2
        fmt = (
            (1).to_bytes(2, "little")  # PCM
            + channels.to_bytes(2, "little")
            + sample_rate.to_bytes(4, "little")
            + (sample_rate * block_align).to_bytes(4, "little")
            + block_align.to_bytes(2, "little")
            + (16).to_bytes(2, "little")  # bits per sample
        )
        body = (
            b"WAVE"
            + b"fmt "
            + len(fmt).to_bytes(4, "little")
            + fmt
            + b"data"
            + len(data).to_bytes(4, "little")
            + data
        )
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    def decode_wav(buf: bytes):
        """Chunk-walking RIFF parser for PCM-16 WAV. Returns
        ``(sample_rate, (n_frames × channels) int16 array)`` or
        ``(None, None)`` for anything unrecognized (wrong container,
        compressed codec, non-16-bit) — never raises on corrupt
        input."""
        import numpy as np

        try:
            if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                return None, None
            pos, sample_rate, channels, data = 12, None, None, None
            while pos + 8 <= len(buf):
                cid = buf[pos : pos + 4]
                size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
                payload = buf[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    audio_format = int.from_bytes(payload[0:2], "little")
                    channels = int.from_bytes(payload[2:4], "little")
                    sample_rate = int.from_bytes(payload[4:8], "little")
                    bits = int.from_bytes(payload[14:16], "little")
                    if audio_format != 1 or bits != 16 or channels < 1:
                        return None, None
                elif cid == b"data":
                    data = payload
                pos += 8 + size + (size & 1)  # chunks pad to even
            if sample_rate is None or data is None:
                return None, None
            n = len(data) // (2 * channels)
            arr = np.frombuffer(data, "<i2", n * channels).reshape(n, channels)
            return sample_rate, arr
        except (ValueError, IndexError):
            return None, None

    return encode_wav, decode_wav


encode_wav, decode_wav = _make_wav_codec()


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio decode + feature extraction over binary WAV payloads via
    Arrow ``mapInPandas``. Features are integer-exact and therefore
    engine-reproducible: ``sum_sq`` (Σx² over every sample, int64 —
    exact for int16 PCM up to ~8.6×10⁹ samples), ``peak``
    (max |x|), ``zero_crossings`` on channel 0 (count of i where
    ``(x[i]≥0) != (x[i+1]≥0)``). RMS/duration are one codegen
    expression downstream (``sqrt(sum_sq/(n_frames*channels))``,
    ``n_frames/sample_rate``) — derived, not stored, so the stored
    features stay exact. Unrecognized payloads yield a null-feature
    row."""

    dec = decode_wav  # factory-made → pickles by value

    def _audio_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def one(buf):
            sr, arr = dec(bytes(buf))
            if arr is None:
                return (None, None, None, None, None, None)
            x = arr.astype(np.int64)
            sum_sq = int((x * x).sum())
            peak = int(np.abs(x).max()) if x.size else 0
            ch0 = x[:, 0] >= 0
            zc = int((ch0[1:] != ch0[:-1]).sum()) if len(ch0) > 1 else 0
            return (int(sr), int(arr.shape[1]), int(arr.shape[0]), sum_sq, peak, zc)

        cols = ["sample_rate", "channels", "n_frames", "sum_sq", "peak", "zero_crossings"]
        for pdf in batches:
            feats = pd.DataFrame(
                [one(b) for b in pdf["payload"]], columns=cols, index=pdf.index
            )
            out = pd.concat([pdf[["doc_id"]], feats], axis=1)
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            out["channels"] = out["channels"].astype("Int32")
            out["peak"] = out["peak"].astype("Int32")
            yield out

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_audio_batches, schema=AUDIO_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) codec — C444 / Cmono, raw planes
# --------------------------------------------------------------------------


def _make_y4m_codec():
    def encode_y4m(frames, fps: int = 25) -> bytes:
        """Minimal YUV4MPEG2 writer. ``frames`` is a list of dicts or
        arrays: each frame is an ``(h, w)`` uint8 Y plane (Cmono) or an
        ``(3, h, w)`` uint8 YUV stack (C444)."""
        import numpy as np

        first = np.asarray(frames[0], np.uint8)
        mono = first.ndim == 2
        h, w = first.shape if mono else first.shape[1:]
        colour = b"Cmono" if mono else b"C444"
        out = [
            b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 %s\n" % (w, h, fps, colour)
        ]
        for fr in frames:
            arr = np.asarray(fr, np.uint8)
            out.append(b"FRAME\n")
            out.append(arr.tobytes())
        return b"".join(out)

    def decode_y4m(buf: bytes, every_n: int = 1):
        """Parse a YUV4MPEG2 stream; return ``(width, height, n_frames,
        sampled)`` where ``sampled`` is a list of ``(frame_idx,
        y_plane)`` for every ``every_n``-th frame (frame-sampling
        without materializing unsampled frames' pixels — at scale the
        skip is a pointer bump, not a copy). ``(None, None, None,
        None)`` for anything unrecognized."""
        import numpy as np

        try:
            nl = buf.index(b"\n")
            header = buf[:nl].split(b" ")
            if header[0] != b"YUV4MPEG2":
                return None, None, None, None
            w = h = None
            colour = b"C420"
            for tok in header[1:]:
                if tok[:1] == b"W":
                    w = int(tok[1:])
                elif tok[:1] == b"H":
                    h = int(tok[1:])
                elif tok[:1] == b"C":
                    colour = tok
            if w is None or h is None:
                return None, None, None, None
            if colour == b"Cmono":
                frame_bytes = w * h
            elif colour == b"C444":
                frame_bytes = w * h * 3
            else:  # subsampled chroma — not needed for the corpus here
                return None, None, None, None
            pos, idx, sampled = nl + 1, 0, []
            while pos < len(buf):
                fnl = buf.index(b"\n", pos)
                if buf[pos:fnl].split(b" ")[0] != b"FRAME":
                    return None, None, None, None
                body = fnl + 1
                if idx % every_n == 0:
                    y = np.frombuffer(buf, np.uint8, w * h, body).reshape(h, w)
                    sampled.append((idx, y))
                pos = body + frame_bytes
                idx += 1
            return w, h, idx, sampled
        except (ValueError, IndexError):
            return None, None, None, None

    return encode_y4m, decode_y4m


encode_y4m, decode_y4m = _make_y4m_codec()


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("y_sum", T.LongType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sample binary Y4M payloads: one OUTPUT row per sampled
    frame (every ``every_n``-th), carrying the stream geometry and the
    integer luma sum of that frame — the one-to-many ``mapInPandas``
    shape (decode fan-out), which is exactly how frame extraction runs
    at 100 TB: rows out ≠ rows in, all inside one Arrow pass, no
    intermediate per-frame blobs shuffled. Corrupt payloads yield a
    single null-geometry row so they stay visible downstream."""

    dec = decode_y4m
    step = int(every_n)
    if step < 1:
        raise ValueError(f"sample_video_frames: every_n must be >= 1, got {every_n}")

    def _frame_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = ["doc_id", "frame_idx", "n_frames", "width", "height", "y_sum"]
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, n, sampled = dec(bytes(buf), step)
                if w is None:
                    rows.append((doc_id, None, None, None, None, None))
                    continue
                for idx, y in sampled:
                    rows.append((doc_id, idx, n, w, h, int(y.sum(dtype="int64"))))
            out = pd.DataFrame(rows, columns=cols)
            for c in ("frame_idx", "n_frames", "width", "height"):
                out[c] = out[c].astype("Int32")
            yield out

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_frame_batches, schema=VIDEO_FRAME_SCHEMA)


# --------------------------------------------------------------------------
# Image resize (nearest-neighbor) — pure NumPy, codec-free
# --------------------------------------------------------------------------


def _make_resizer():
    def resize_nearest(arr, out_w: int, out_h: int):
        """Nearest-neighbor resize of an ``(h, w, c)`` (or ``(h, w)``)
        array by integer source-index mapping ``src = (dst * src_dim)
        // dst_dim`` — floor semantics, so the result is deterministic
        integer arithmetic both engines can reproduce."""
        import numpy as np

        a = np.asarray(arr)
        h, w = a.shape[:2]
        rows = (np.arange(out_h) * h) // out_h
        cols = (np.arange(out_w) * w) // out_w
        return a[rows][:, cols]

    return resize_nearest


resize_nearest = _make_resizer()


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Thumbnail pass: decode each BMP/PPM payload (codec-free,
    :func:`..decode.decode_image`), nearest-neighbor resize to
    ``out_w × out_h``, re-encode as BMP. Binary in, binary out, one
    Arrow pass — the standard media-normalization stage of a training
    pipeline. Undecodable payloads yield a null payload row."""
    from kafka_database_import_spark.multimodal.decode import decode_image, encode_bmp

    dec, enc, rsz = decode_image, encode_bmp, resize_nearest
    ow, oh = int(out_w), int(out_h)
    if ow < 1 or oh < 1:
        raise ValueError(f"resize_images: target dims must be >= 1, got {out_w}x{out_h}")

    def _resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def one(buf):
            fmt, px = dec(bytes(buf))
            if px is None:
                return (None, None, None)
            return (ow, oh, enc(rsz(px, ow, oh)))

        cols = ["width", "height", "payload"]
        for pdf in batches:
            feats = pd.DataFrame(
                [one(b) for b in pdf["payload"]], columns=cols, index=pdf.index
            )
            out = pd.concat([pdf[["doc_id"]], feats], axis=1)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_resize_batches, schema=RESIZED_IMAGE_SCHEMA)


def _make_chunker():
    """Factory for the same by-value-pickling reason as the codecs:
    producers closure-capture ``yield_chunked`` into worker-side
    generators, so it must not pickle by module reference."""

    def yield_chunked(pdf, max_rows: int = 512):
        for lo in range(0, len(pdf), max_rows):
            yield pdf.iloc[lo : lo + max_rows]

    return yield_chunked


yield_chunked = _make_chunker()
yield_chunked.__doc__ = """Slice a produced pandas frame into ≤``max_rows`` pieces before
    yielding from a ``mapInPandas`` producer.

    Why this exists (measured, SCALE.md round 4): JVM→Python transfer
    is byte-capped (``spark.sql.execution.arrow.maxBytesPerBatch``,
    64 MB default), but Python→JVM is NOT — each yielded frame becomes
    Arrow batches sliced by RECORD count only, so a producer that
    synthesizes fat binary payloads from thin input rows (10 k-row
    input batch × 12 KB payloads = 120 MB) hands the JVM direct-memory
    allocations that overflow netty's cap (1 GiB default) at 32
    concurrent tasks. Producers of payload columns must bound their
    own frames; 512 rows × ≤64 KB payloads ≈ 32 MB worst case."""
