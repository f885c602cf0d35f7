"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata structs; the
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing — is real and tested. The codec step itself is stubbed:
the decode libraries (PIL/ffmpeg/librosa) are not in this container, so
``decode=`` defaults to a deterministic fake that derives features from the
bytes' md5 (clearly marked; swap in a real decoder by passing one).

Scale notes: mapInPandas streams Arrow batches, so per-executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × max blob size;
re-partition by size before heavy decodes (``repartition_for_media``).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _blob_hash60(blob: bytes) -> int:
    """60-bit md5-derived blob hash — the same value ANSI SQL computes as
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``, so fake-decoder
    outputs are verifiable against a DuckDB oracle."""
    import hashlib

    return int(hashlib.md5(blob).hexdigest()[:15], 16)


def fake_decode_image(blob: bytes) -> tuple[int, int, np.ndarray]:
    """DETERMINISTIC FAKE decoder (no image libs in this container): derives
    (width, height, 8-dim feature) from an md5-based hash of the bytes —
    pure arithmetic, so an external SQL oracle can recompute every output.
    Replace with a real PIL/torchvision decoder in production."""
    h = _blob_hash60(blob)
    w = 16 + (h & 0xFF)
    ht = 16 + ((h >> 8) & 0xFF)
    feat = np.array([((h >> (4 * j)) & 0xFF) / 256.0 for j in range(8)],
                    dtype="float32")
    return w, ht, feat


def extract_image_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    decode: Callable[[bytes], tuple[int, int, np.ndarray]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over a binary column. The plumbing
    (batch iteration, schema, null handling) is production-shaped; only the
    decoder is a stub by default."""
    dec = decode or fake_decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    rows.append((row[id_col], None, None, 0, None))
                    continue
                b = bytes(blob)
                w, h, feat = dec(b)
                rows.append((row[id_col], w, h, len(b), feat.tolist()))
            yield pd.DataFrame(rows, columns=["id", "width", "height", "n_bytes", "feature"])

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def fake_decode_audio(blob: bytes) -> tuple[int, int, np.ndarray]:
    """DETERMINISTIC FAKE audio decoder (no audio libs in this container):
    (duration_ms, sample_rate, 8-dim feature) from an md5-based hash —
    SQL-oracle-verifiable arithmetic. Swap for a real soundfile/librosa
    decoder in production."""
    h = _blob_hash60(blob)
    duration = 100 + (h & 0xFFFF)
    rate = (8000, 16000, 22050, 44100)[(h >> 16) & 3]
    feat = np.array([((h >> (4 * j + 2)) & 0xFF) / 256.0 for j in range(8)],
                    dtype="float32")
    return duration, rate, feat


def extract_audio_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    decode: Callable[[bytes], tuple[int, int, np.ndarray]] | None = None,
) -> DataFrame:
    """mapInPandas audio feature extraction — same plumbing contract as
    extract_image_features (decode is the stubbed step)."""
    dec = decode or fake_decode_audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    rows.append((row[id_col], None, None, 0, None))
                    continue
                b = bytes(blob)
                dur, rate, feat = dec(b)
                rows.append((row[id_col], dur, rate, len(b), feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["id", "duration_ms", "sample_rate", "n_bytes", "feature"])

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
    id_col: str = "id",
) -> DataFrame:
    """Video frame-sampling *plan*: (id, frame_ts_ms) rows — pure Column
    sequence explode; the decode of each frame is the stubbed step."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def repartition_for_media(df: DataFrame, target_bytes_per_task: int = 256 << 20,
                          size_col: str | None = None, blob_col: str = "blob") -> DataFrame:
    """Repartition so each task holds ~target_bytes of media, keeping decode
    memory bounded regardless of blob-size skew."""
    size = F.col(size_col) if size_col else F.length(F.col(blob_col))
    total = df.agg(F.sum(size)).first()[0] or 0
    n = max(1, int(total / target_bytes_per_task) + 1)
    return df.repartition(n)
