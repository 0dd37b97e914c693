"""Multimodal decode / feature-extraction plumbing (SURVEY §2.2 Q47).

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct alongside (modality, byte size, origin). Decode and
feature extraction run as Arrow-batched ``mapInPandas`` — the only
viable shape at 100 TB: payload bytes never pass through the JVM row
format, batches amortize Python overhead, and partitioning by content
hash spreads hot media evenly.

The sandbox has no image/audio codecs (PIL/librosa); each extractor
declares its dependency and degrades explicitly:

* ``extract_text_features``  — always available (pure NumPy,
  deterministic: byte statistics).
* ``extract_image_features`` — real decode with no codec dependency:
  BMP (BI_RGB) and binary PPM are parsed header-first with NumPy
  (``decode_image``); PIL, when installed, extends coverage to
  compressed formats (JPEG/PNG) as a fallback. Unrecognized payloads
  yield null-feature rows rather than failing the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)

try:  # pragma: no cover - not present in the sandbox
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def extract_text_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic byte-statistics features over binary payloads —
    the dependency-free extractor, and the stand-in that keeps the
    Arrow/mapInPandas plumbing honest where real codecs are absent.

    The batch function is nested so cloudpickle serializes it BY VALUE:
    a module-level function is pickled by reference and requires this
    package importable on every Python worker — which fails when the
    driving process found the package via a sys.path edit the workers
    don't inherit."""

    def _byte_stats_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["modality"] = "text"
            out["n_bytes"] = pdf["payload"].map(len).astype("int32")
            out["mean_byte"] = pdf["payload"].map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else 0.0
            )
            yield out

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_byte_stats_batches, schema=FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def _make_decoder():
    """Factory so the decoder's qualname contains ``<locals>`` —
    cloudpickle then serializes it BY VALUE into worker closures (see
    ``extract_text_features`` docstring for why by-reference pickling
    is a trap here)."""

    def decode_image(buf: bytes):
        """Pure-NumPy decode of the two uncompressed formats whose
        headers are trivially parseable without a codec library: BMP
        (BI_RGB 24/32 bpp) and binary PPM (P6, maxval 255). Returns
        ``(format, H×W×3 uint8 array)`` or ``(None, None)`` for anything
        unrecognized — corrupt payloads degrade to a null-feature row,
        they never fail the batch (the reference logs-and-continues on
        decode errors, kafka-database-import.go:192-197)."""
        import numpy as np

        try:
            if buf[:2] == b"BM" and len(buf) >= 54:
                off = int.from_bytes(buf[10:14], "little")
                width = int.from_bytes(buf[18:22], "little", signed=True)
                height = int.from_bytes(buf[22:26], "little", signed=True)
                bpp = int.from_bytes(buf[28:30], "little")
                compression = int.from_bytes(buf[30:34], "little")
                if compression != 0 or bpp not in (24, 32) or width <= 0:
                    return None, None
                top_down = height < 0
                height = abs(height)
                nch = bpp // 8
                stride = (width * nch + 3) & ~3  # rows pad to 4 bytes
                px = np.frombuffer(buf, np.uint8, stride * height, off)
                px = px.reshape(height, stride)[:, : width * nch]
                px = px.reshape(height, width, nch)
                if not top_down:
                    px = px[::-1]  # BMP stores bottom-up
                return "bmp", px[:, :, 2::-1]  # BGR(A) → RGB
            if buf[:2] == b"P6":
                # header = magic, width, height, maxval as ASCII tokens
                # separated by whitespace (comments '#…' allowed)
                tokens, i = [], 2
                while len(tokens) < 3 and i < len(buf):
                    c = buf[i : i + 1]
                    if c == b"#":
                        i = buf.index(b"\n", i)
                    elif c.isspace():
                        i += 1
                    else:
                        j = i
                        while j < len(buf) and not buf[j : j + 1].isspace():
                            j += 1
                        tokens.append(int(buf[i:j]))
                        i = j
                i += 1  # single whitespace after maxval
                width, height, maxval = tokens
                if maxval != 255:
                    return None, None
                px = np.frombuffer(buf, np.uint8, width * height * 3, i)
                return "ppm", px.reshape(height, width, 3)
        except (ValueError, IndexError):
            pass
        return None, None

    return decode_image


decode_image = _make_decoder()


def _make_encoder():
    """Same by-value-pickling factory trick as ``_make_decoder``."""

    def encode_bmp(arr) -> bytes:
        """Minimal 24-bpp BI_RGB BMP writer (test fixtures, synthetic
        corpora, round-trip property tests). Input is an H×W×3 uint8
        RGB array."""
        import numpy as np

        h, w, _ = arr.shape
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
        data = rows.tobytes()
        header = (
            b"BM"
            + (54 + len(data)).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(data).to_bytes(4, "little")
            + b"\x00" * 16
        )
        return header + data

    return encode_bmp


encode_bmp = _make_encoder()


def extract_image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Image decode + feature extraction (dimensions, per-channel means)
    over binary payloads — real decode, no codec library: BMP/PPM header
    parse + NumPy reshape (``decode_image``). Same Arrow/mapInPandas
    plan shape as ``extract_text_features``: payload bytes move
    Arrow-batched, never through the JVM row format. Unrecognized or
    corrupt payloads yield a null-feature row (format NULL) instead of
    failing the batch. If PIL is installed it is used as a fallback for
    formats the NumPy path declines (JPEG/PNG)."""

    decode = decode_image  # closure-captured; pickles by value (factory-made)
    has_pil = _HAS_PIL

    def _image_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def one(buf):
            fmt, px = decode(bytes(buf))
            if px is None and has_pil:  # pragma: no cover - no PIL here
                import io

                from PIL import Image

                try:
                    im = Image.open(io.BytesIO(bytes(buf))).convert("RGB")
                    fmt, px = im.format.lower() if im.format else "pil", np.asarray(im)
                except Exception:
                    px = None
            if px is None:
                return (None, None, None, None, None, None, None)
            means = px.reshape(-1, 3).mean(axis=0)
            return (
                fmt,
                int(px.shape[1]),
                int(px.shape[0]),
                3,
                float(means[0]),
                float(means[1]),
                float(means[2]),
            )

        cols = ["format", "width", "height", "channels", "mean_r", "mean_g", "mean_b"]
        for pdf in batches:
            feats = pd.DataFrame(
                [one(b) for b in pdf["payload"]], columns=cols, index=pdf.index
            )
            out = pd.concat([pdf[["doc_id"]], feats], axis=1)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["channels"] = out["channels"].astype("Int32")
            yield out

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_image_batches, schema=IMAGE_FEATURE_SCHEMA)
