"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata structs; the
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing — is real and tested. Decoding is layered:

- REAL stdlib decoders handle the formats that need no external library:
  WAV (``wave``), uncompressed 24/32-bit BMP (``struct``), and 8-bit
  greyscale/RGB/RGBA non-interlaced PNG (``zlib`` + full filter
  reconstruction incl. Paeth). These run by default when the blob's magic
  bytes match and the parse succeeds.
- Anything else (JPEG/MP4/compressed codecs — their libraries are not in
  this container) falls back to a deterministic md5-derived fake that an
  SQL oracle can recompute (clearly marked; swap in a real PIL/ffmpeg
  decoder by passing ``decode=``).

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


def _pixel_features(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """8-dim image feature from an (n, 3) RGB float array in [0, 255]:
    per-channel mean and std (normalized) + aspect terms."""
    mean = px.mean(axis=0) / 255.0
    std = px.std(axis=0) / 255.0
    return np.array([*mean, *std, w / (w + h), h / (w + h)], dtype="float32")


def decode_bmp(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL decoder for uncompressed 24/32-bit BI_RGB BMP (pure struct +
    numpy, no external libs). Returns None for other BMP variants AND for
    corrupt/truncated data — never raises."""
    try:
        return _decode_bmp(blob)
    except Exception:
        return None


def _decode_bmp(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    import struct

    if blob[:2] != b"BM" or len(blob) < 54:
        return None
    (data_off,) = struct.unpack_from("<I", blob, 10)
    (hdr_size, w, h) = struct.unpack_from("<Iii", blob, 14)
    (planes, bpp, comp) = struct.unpack_from("<HHI", blob, 26)
    if hdr_size < 40 or comp != 0 or bpp not in (24, 32):
        return None
    flipped = h > 0  # positive height = bottom-up row order
    h = abs(h)
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4 if bpp == 24 else w * 4
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        return None
    if len(blob) < data_off + h * stride:
        return None  # truncated pixel data: not decodable
    rows = []
    for r in range(h):
        off = data_off + r * stride
        row = np.frombuffer(blob, dtype=np.uint8, count=w * nb, offset=off)
        rows.append(row.reshape(w, nb)[:, :3][:, ::-1])  # BGR(A) → RGB
    if flipped:
        rows.reverse()
    px = np.concatenate(rows).astype(np.float64)
    return w, h, _pixel_features(px, w, h)


#: image decode guard: refuse dimensions whose pixel buffers could OOM an
#: executor before the fallback path ever runs (zip-bomb IDAT / absurd IHDR)
_MAX_PIXELS = 64 << 20  # 64 Mpx ≈ 192 MB of RGB float work, bounded


def _png_unfilter(raw: np.ndarray, w: int, h: int, bpp: int) -> np.ndarray:
    """PNG scanline reconstruction (filters 0-4 incl. Paeth), returning
    (h, w*bpp) reconstructed bytes. Filters 0/2 are whole-row numpy ops;
    1/3/4 loop per PIXEL with vectorized bpp-wide slices (left-neighbor
    dependency makes them inherently sequential along the row)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        pos = r * (stride + 1)
        ftype = int(raw[pos])
        line = raw[pos + 1:pos + 1 + stride].astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = line.copy()
            zero = np.zeros(bpp, dtype=np.int64)
            for i in range(0, stride, bpp):
                a = cur[i - bpp:i] if i else zero
                b = prev[i:i + bpp]
                if ftype == 1:
                    cur[i:i + bpp] = (cur[i:i + bpp] + a) & 0xFF
                elif ftype == 3:
                    cur[i:i + bpp] = (cur[i:i + bpp] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - bpp:i] if i else zero
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pr = np.where((pa <= pb) & (pa <= pc), a,
                                  np.where(pb <= pc, b, c))
                    cur[i:i + bpp] = (cur[i:i + bpp] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL decoder for 8-bit greyscale/RGB/RGBA non-interlaced PNG (pure
    zlib + struct + numpy). Returns None for palette/16-bit/interlaced AND
    for corrupt/truncated/bomb-shaped data — never raises."""
    try:
        return _decode_png(blob)
    except Exception:
        return None


def _decode_png(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    import struct
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4:pos + 8]
        body = blob[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            meta = (w, h, depth, color, interlace)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        return None
    w, h, depth, color, interlace = meta
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        return None
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        return None  # absurd IHDR: refuse before allocating
    expected = h * (1 + w * channels)
    # bounded inflate: a zip-bomb IDAT cannot expand past the declared size
    dec = zlib.decompressobj()
    inflated = dec.decompress(idat, expected)
    # oversized detection must check unconsumed_tail too: when max_length
    # truncates output, the pending compressed bytes sit there and a
    # dec.decompress(b"", 1) probe can't see them
    if (len(inflated) != expected or dec.unconsumed_tail
            or dec.decompress(b"", 1) or dec.flush()):
        return None  # truncated or oversized pixel stream
    raw = np.frombuffer(inflated, dtype=np.uint8)
    recon = _png_unfilter(raw, w, h, channels)
    px = recon.reshape(h * w, channels).astype(np.float64)
    if channels <= 2:   # grey(+alpha) → replicate luma across RGB
        px = np.repeat(px[:, :1], 3, axis=1)
    else:
        px = px[:, :3]
    return w, h, _pixel_features(px, w, h)


def decode_image(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    """Stdlib-real image decode (BMP/PNG); None when the format needs an
    external library or the parse fails — callers fall back."""
    try:
        if blob[:2] == b"BM":
            return decode_bmp(blob)
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(blob)
    except Exception:
        return None
    return None


def default_decode_image(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Real decode when the format is stdlib-decodable, else the
    deterministic fake (oracle-verifiable)."""
    out = decode_image(blob)
    return out if out is not None else fake_decode_image(blob)


def extract_image_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    decode: Callable[[bytes], tuple[int, int, np.ndarray]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over a binary column. The plumbing
    (batch iteration, schema, null handling) is production-shaped; BMP/PNG
    decode for real via the stdlib, other formats use the documented
    fake unless a decoder is passed."""
    dec = decode or default_decode_image

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


def decode_wav(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL WAV decoder (stdlib ``wave`` + numpy): (duration_ms,
    sample_rate, 8-segment RMS envelope of the first channel). Returns
    None for non-RIFF/WAVE blobs or unsupported sample widths."""
    import io
    import wave

    if blob[:4] != b"RIFF" or len(blob) < 12 or blob[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(blob)) as wf:
            rate = wf.getframerate()
            nframes = wf.getnframes()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(nframes)
    except (wave.Error, EOFError):
        return None  # RIFF-tagged but not a parseable WAV
    if rate <= 0 or width not in (1, 2, 4):
        return None
    duration_ms = int(nframes * 1000 / rate)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    a = np.frombuffer(frames, dtype=dtype).astype(np.float64)
    if width == 1:
        a = a - 128.0  # 8-bit WAV is unsigned, centered at 128
    a = a[::max(nch, 1)]  # first channel
    denom = float(127 if width == 1 else np.iinfo(dtype).max)
    segs = np.array_split(a, 8)
    feat = np.array(
        [np.sqrt(np.mean(s * s)) / denom if s.size else 0.0 for s in segs],
        dtype="float32")
    return duration_ms, rate, feat


def default_decode_audio(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Real WAV decode when the blob is RIFF/WAVE, else the deterministic
    fake (oracle-verifiable)."""
    try:
        out = decode_wav(blob)
    except Exception:
        out = None
    return out if out is not None else fake_decode_audio(blob)


def extract_audio_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    decode: Callable[[bytes], tuple[int, int, np.ndarray]] | None = None,
) -> DataFrame:
    """mapInPandas audio feature extraction — same plumbing contract as
    extract_image_features (WAV decodes for real, other formats fake)."""
    dec = decode or default_decode_audio

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
