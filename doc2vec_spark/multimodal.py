"""Multimodal columns (BASELINE.json north star): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
mapInPandas stages.

The Spark-side plumbing — schema, partition-parallel batch shape, UDF
signatures — is real and tested; the codec calls are STUBBED behind
``decode_image_stub`` (this container ships no PIL/ffmpeg): the stub derives
deterministic pseudo-metadata/features from the bytes so pipelines are
testable end-to-end. ``decode_image_real`` raises NotImplementedError with
the exact drop-in point for a real codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_url", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def decode_image_real(data: bytes, size: tuple[int, int] = (8, 8)) -> np.ndarray:
    """Real image decode, import-gated on pillow: bytes -> grayscale ->
    resize -> float32 array in [0,1]. When pillow is absent (this container)
    it raises NotImplementedError and callers stay on the deterministic stub;
    when present, tests/test_multimodal_ops.py decodes a real fixture PNG
    through this exact path."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "image codec not installed; use extract_features (deterministic "
            "stub) or install pillow to activate this path"
        ) from e
    import io

    img = Image.open(io.BytesIO(data)).convert("L").resize(size)
    return np.asarray(img, dtype=np.float32) / 255.0


def real_image_feature(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Feature from real pixels: decoded 8x8 grayscale thumbnail, flattened
    and L2-normalized, truncated/padded to ``dim`` — the drop-in replacement
    for ``_stub_feature`` once pillow is installed."""
    px = decode_image_real(data).reshape(-1)[:dim]
    if px.size < dim:
        px = np.pad(px, (0, dim - px.size))
    n = float(np.linalg.norm(px))
    return (px / n if n else px).astype(np.float32).tolist()


def _stub_feature(data: bytes) -> list[float]:
    """Deterministic fake embedding from the bytes (same seeding scheme as
    embedding.py, so tests are hermetic and stable)."""
    digest = hashlib.sha256(data or b"").digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    v = rng.randn(FEATURE_DIM)
    n = float(np.linalg.norm(v))
    return (v / n if n else v).astype(np.float32).tolist()


def extract_features(media: DataFrame) -> DataFrame:
    """media(media_id, mime, data, meta) -> per-item features.

    mapInPandas: binary columns arrive as Arrow buffers in zero-copy batches;
    each partition decodes independently — the correct 100 TB shape (media
    bytes never pass through the driver)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for mid, mime, data in zip(pdf["media_id"], pdf["mime"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                out["media_id"].append(mid)
                out["mime"].append(mime)
                out["n_bytes"].append(len(blob))
                out["content_hash"].append(hashlib.sha256(blob).hexdigest())
                out["feature"].append(_stub_feature(blob))
            yield pd.DataFrame(out)

    return media.select("media_id", "mime", "data").mapInPandas(process, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp from
    the metadata (decode stubbed). Shows the explode shape: a 2-hour video
    at 1 fps becomes 7200 rows processed across the cluster."""
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    ).withColumn("frame_ts_ms", F.col("frame_index") * every_ms)
