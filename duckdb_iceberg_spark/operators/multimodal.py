"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata structs; the
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing — is real and tested. Decoding is layered:

- REAL stdlib decoders handle the formats that need no external library:
  WAV (``wave``), uncompressed 24/32-bit BMP (``struct``), 8-bit
  greyscale/RGB/RGBA non-interlaced PNG (``zlib`` + full filter
  reconstruction incl. Paeth), and baseline sequential JPEG (full T.81
  pipeline: huffman entropy decode, dequant, batched-numpy IDCT, chroma
  upsampling, YCbCr→RGB; verified against an independently-written
  encoder in tests/jpeg_encoder.py). These run by default when the blob's
  magic bytes match and the parse succeeds.
- Anything else (progressive JPEG, MP4/compressed codecs — their
  libraries are not in this container) falls back to a deterministic
  md5-derived fake that an SQL oracle can recompute (clearly marked; swap
  in a real PIL/ffmpeg decoder by passing ``decode=``).

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
    out = _decode_bmp_px(blob)
    if out is None:
        return None
    w, h, px = out
    return w, h, _pixel_features(px, w, h)


def _decode_bmp_px(blob: bytes) -> tuple[int, int, np.ndarray] | None:
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
    return w, h, px


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
    out = _decode_png_px(blob)
    if out is None:
        return None
    w, h, px = out
    return w, h, _pixel_features(px, w, h)


def _decode_png_px(blob: bytes) -> tuple[int, int, np.ndarray] | None:
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
    return w, h, px


# ---------------------------------------------------------------------------
# baseline JPEG (ITU-T T.81 / ISO 10918-1) — pure stdlib + numpy
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal 8-point DCT-II matrix; IDCT of block B is C.T @ B @ C
_DCT_C = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) *
     (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
     for x in range(8)] for u in range(8)])


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with byte
    unstuffing (FF00 → FF) and restart-marker detection."""

    __slots__ = ("data", "pos", "bitbuf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d, n = self.data, len(self.data)
        while self.nbits <= 24:
            if self.pos >= n:
                # pad with 1-bits past the end (T.81 F.2.2.5): lets a final
                # partially-padded huffman code complete
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < n else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # EOI or other marker: stop feeding
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        if self.nbits < n:
            # marker encountered mid-code on a corrupt stream: refuse
            # rather than shifting by a negative count
            raise ValueError("bit underrun at marker")
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def resync(self) -> bool:
        """Skip to just past the next restart marker; True on success."""
        self.bitbuf = 0
        self.nbits = 0
        d, n = self.data, len(self.data)
        i = self.pos
        while i + 1 < n:
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                return True
            i += 1
        return False


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol map per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude value (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL decoder for baseline sequential JPEG (SOF0, 8-bit, greyscale or
    YCbCr with sampling factors 1-2, restart markers honored) — pure
    stdlib + numpy, no libjpeg. Progressive/arithmetic/12-bit streams
    return None and fall back. IDCT runs as one batched matmul over all of
    a component's blocks; only the huffman bit-walk is per-symbol Python.

    The reference ships no media ops at all; this exists for the LLM-data
    pipeline surface (extract_image_features over crawl blobs), where
    JPEG is the dominant real-world format."""
    try:
        return _decode_jpeg(blob)
    except Exception:
        return None


def _decode_jpeg(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    out = _decode_jpeg_px(blob)
    if out is None:
        return None
    w, h, px = out
    return w, h, _pixel_features(px, w, h)


def _decode_jpeg_px(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    import struct

    if blob[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None           # (h, w, [(cid, hs, vs, tq), ...])
    restart_interval = 0
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        body = blob[pos + 4:pos + 2 + seglen]
        if marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/progressive/lossless/arithmetic
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(body):
                tc_th = body[off]
                counts = list(body[off + 1:off + 17])
                total = sum(counts)
                syms = body[off + 17:off + 17 + total]
                tbl = _build_huffman(counts, syms)
                (huff_dc if tc_th >> 4 == 0 else huff_ac)[tc_th & 0xF] = tbl
                off += 17 + total
        elif marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4 != 0:
                    return None  # 16-bit tables: not baseline
                vals = np.frombuffer(body[off + 1:off + 65], dtype=np.uint8)
                qt[pq_tq & 0xF] = vals.astype(np.int64)
                off += 65
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, td_ta = body[1 + 2 * i:3 + 2 * i]
                scan.append((cs, td_ta >> 4, td_ta & 0xF))
            data_start = pos + 2 + seglen
            return _decode_scan(blob, data_start, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += 2 + seglen
    return None


#: JPEG-specific pixel cap, far below _MAX_PIXELS: the huffman walk is
#: per-symbol Python (inherently sequential), so decode time is O(pixels)
#: interpreter work — ~4 Mpx keeps a worst-case block under a second or two
#: per executor task; larger JPEGs take the deterministic-fake fallback
#: rather than stalling the stage.
_JPEG_MAX_PIXELS = 4 << 20


def _decode_scan(blob, data_start, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame
    if h <= 0 or w <= 0 or h * w > _JPEG_MAX_PIXELS:
        return None
    if len(scan) != len(comps):
        return None  # multi-scan not supported (progressive)
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the MCU is
        # one 8x8 data unit over a ceil(w/8) x ceil(h/8) grid, and the
        # declared sampling factors (legally e.g. 2x2 on greyscale) do NOT
        # shape the entropy stream
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    by_id = {cs: (td, ta) for cs, td, ta in scan}
    plan = []            # per component: (hs, vs, tq, td, ta, blocks_list)
    for cid, hs, vs, tq in comps:
        if cid not in by_id or tq not in qt:
            return None
        td, ta = by_id[cid]
        if td not in huff_dc or ta not in huff_ac:
            return None
        plan.append([hs, vs, tq, td, ta, []])

    br = _BitReader(blob[data_start:])
    preds = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            if not br.resync():
                return None
            preds = [0] * len(comps)
        for ci, (hs, vs, tq, td, ta, blocks) in enumerate(plan):
            for _ in range(hs * vs):
                coef = np.zeros(64, dtype=np.int64)
                t = _huff_decode(br, huff_dc[td])
                diff = _extend(br.bits(t), t)
                preds[ci] += diff
                coef[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _huff_decode(br, huff_ac[ta])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break        # EOB
                    k += r
                    if k > 63:
                        return None
                    coef[k] = _extend(br.bits(s), s)
                    k += 1
                blocks.append(coef)

    # batched dequant + dezigzag + IDCT per component (one matmul chain)
    planes = []
    for (hs, vs, tq, _td, _ta, blocks) in plan:
        arr = np.stack(blocks)                     # (nb, 64) zigzag order
        # the DQT stream is ALSO zigzag-ordered (T.81 B.2.4.1), so dequant
        # is element-wise in the zigzag domain — no permutation here
        arr = arr * qt[tq]
        nat = np.zeros_like(arr)
        nat[:, _ZIGZAG] = arr                      # dezigzag
        b8 = nat.reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ux,nuv,vy->nxy", _DCT_C, b8, _DCT_C) + 128.0
        planes.append(np.clip(px, 0, 255))

    # reassemble MCU-interleaved blocks into full component planes, then
    # upsample to (h, w)
    full = []
    for ci, (hs, vs, tq, _td, _ta, _blocks) in enumerate(plan):
        cw, ch = mcux * hs * 8, mcuy * vs * 8
        plane = np.zeros((ch, cw))
        bi = 0
        blocks8 = planes[ci]
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for byi in range(vs):
                for bxi in range(hs):
                    y0 = (my * vs + byi) * 8
                    x0 = (mx * hs + bxi) * 8
                    plane[y0:y0 + 8, x0:x0 + 8] = blocks8[bi]
                    bi += 1
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)      # replicate upsample
        full.append(plane[:h, :w])

    if len(full) == 1:
        rgb = np.repeat(full[0].reshape(h * w, 1), 3, axis=1)
    else:
        y, cb, cr = (p.reshape(h * w) for p in full)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.stack([r, g, b], axis=1), 0, 255)
    return w, h, rgb


def decode_image(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    """Stdlib-real image decode (BMP/PNG/baseline JPEG); None when the
    format needs an external library or the parse fails — callers fall
    back."""
    try:
        if blob[:2] == b"BM":
            return decode_bmp(blob)
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(blob)
        if blob[:2] == b"\xff\xd8":
            return decode_jpeg(blob)
    except Exception:
        return None
    return None


def default_decode_image(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Real decode when the format is stdlib-decodable, else the
    deterministic fake (oracle-verifiable)."""
    out = decode_image(blob)
    return out if out is not None else fake_decode_image(blob)


# ---------------------------------------------------------------------------
# perceptual hashing (dHash) + image near-dup
# ---------------------------------------------------------------------------

def decode_image_pixels(blob: bytes) -> tuple[int, int, np.ndarray] | None:
    """(w, h, row-major (h*w, 3) float pixel array) for stdlib-decodable
    formats (BMP/PNG/baseline JPEG); None otherwise — callers fall back."""
    try:
        if blob[:2] == b"BM":
            return _decode_bmp_px(blob)
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png_px(blob)
        if blob[:2] == b"\xff\xd8":
            return _decode_jpeg_px(blob)
    except Exception:
        return None
    return None


def fake_decode_gray_grid(blob: bytes) -> tuple[int, int, np.ndarray]:
    """DETERMINISTIC FAKE pixel decoder for non-decodable blobs: a 9x8
    grayscale grid whose bytes come from chained md5 digests — the same
    values ANSI SQL computes as bytes of md5(blob || 'p<i>'), so every
    downstream dHash bit is oracle-verifiable. The grid is exactly the
    dHash sample resolution, making the sampler the identity on it."""
    import hashlib

    raw = b"".join(
        hashlib.md5(blob + b"p%d" % i).digest() for i in range(5))[:72]
    px = np.repeat(
        np.frombuffer(raw, dtype=np.uint8).astype(np.float64)[:, None],
        3, axis=1)
    return 9, 8, px


def dhash64_from_pixels(w: int, h: int, px: np.ndarray) -> int:
    """64-bit difference hash (dHash, the standard perceptual near-dup
    fingerprint): grayscale, nearest-neighbor sample to a 9x8 grid, bit
    (r, c) = grid[r][c] > grid[r][c+1], packed row-major with bit 63 as
    the int64 sign (the simhash packing convention). Integer-exact: no
    resampling interpolation, so the fake path's bytes survive to the
    comparisons untouched and SQL can replay every bit."""
    gray = px.mean(axis=1).reshape(h, w)
    rows = [(r * h) // 8 for r in range(8)]
    cols = [(c * w) // 9 for c in range(9)]
    grid = gray[np.ix_(rows, cols)]
    bits = grid[:, :-1] > grid[:, 1:]
    v = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            v += -(1 << 63) if i == 63 else (1 << i)
    return v


def image_dhash(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    decode: Callable[[bytes], tuple[int, int, np.ndarray] | None] | None = None,
) -> DataFrame:
    """(id, dhash): perceptual hash per image blob via mapInPandas (Arrow
    batches, never per-row Python in the plan). Real pixels for
    BMP/PNG/JPEG; other formats take the md5-grid fake so the pipeline
    stays total and oracle-verifiable. Null blobs hash to null."""
    dec = decode or decode_image_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    rows.append((row[id_col], None))
                    continue
                b = bytes(blob)
                out = dec(b)
                if out is None:
                    out = fake_decode_gray_grid(b)
                w, h, px = out
                rows.append((row[id_col], dhash64_from_pixels(w, h, px)))
            yield pd.DataFrame(rows, columns=["id", "dhash"])

    return df.mapInPandas(
        run,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]),
    )


def image_neardup(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    max_hamming: int = 6,
    bands: int = 4,
    decode: Callable[[bytes], tuple[int, int, np.ndarray] | None] | None = None,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Perceptual image near-dedup: dHash -> 16-bit-band LSH candidates
    (two hashes within Hamming distance 3 of each other share a band by
    pigeonhole; wider radii trade recall exactly like SimHash text dedup,
    whose banding this reuses) -> exact Hamming verify JVM-side
    (bit_count(xor)) -> drop the higher id of each verified pair.

    Scale shape: the only corpus-sized work is the one dHash pass — it
    persists eagerly because three consumers read it (banding + both
    verify sides) and a lazy cache double-builds under AQE's parallel
    stages (caller owns the cache lifetime, as everywhere in the dedup
    family; pass precomputed ``hashes`` to share/skip the pass). The
    self-join shuffles on (band, chunk) keys so skew is bounded by
    bucket population, and the verify runs on candidate pairs only — no
    all-pairs comparison anywhere."""
    from .dedup import simhash_candidates

    if hashes is None:
        hashes = image_dhash(df, blob_col, id_col, decode).persist()
        hashes.count()
    cands = simhash_candidates(
        hashes.select(F.col("id").alias(id_col),
                      F.col("dhash").alias("simhash")),
        id_col, bands)
    ha = hashes.select(F.col("id").alias("id_a"), F.col("dhash").alias("__ha"))
    hb = hashes.select(F.col("id").alias("id_b"), F.col("dhash").alias("__hb"))
    losers = (
        cands.join(ha, "id_a").join(hb, "id_b")
        .filter(F.bit_count(
            F.col("__ha").bitwiseXOR(F.col("__hb"))) <= max_hamming)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


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
    out = decode_wav_samples(blob)
    if out is None:
        return None
    duration_ms, rate, a, denom = out
    segs = np.array_split(a, 8)
    feat = np.array(
        [np.sqrt(np.mean(s * s)) / denom if s.size else 0.0 for s in segs],
        dtype="float32")
    return duration_ms, rate, feat


def decode_wav_samples(
    blob: bytes,
) -> tuple[int, int, np.ndarray, float] | None:
    """(duration_ms, rate, first-channel float64 samples, full-scale
    denominator) for RIFF/WAVE blobs; None otherwise."""
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
    return duration_ms, rate, a, denom


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


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container metadata (real stdlib parse; frame DECODE stays
# stubbed — H.264/H.265 entropy decoding genuinely needs ffmpeg)
# ---------------------------------------------------------------------------

VIDEO_META_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("real_parse", T.BooleanType()),
])

#: ISO BMFF container boxes whose children we walk; everything else is an
#: opaque leaf. Bounded: depth ≤ 8, boxes visited ≤ 4096.
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def parse_mp4_meta(blob: bytes) -> tuple[int, int, int, int] | None:
    """REAL ISO BMFF (MP4/MOV) container metadata parse — stdlib struct
    only: (duration_ms, width, height, n_tracks) from mvhd (movie
    timescale + duration) and the largest tkhd (track dims, 16.16 fixed
    point). Frame pixels are NOT decoded (codec work — needs ffmpeg);
    this parses the container the way a 100 TB crawl pipeline needs for
    sampling/stratification: duration, geometry, track census. Returns
    None on non-BMFF bytes, truncation, or bomb-shaped box trees."""
    try:
        return _parse_mp4_meta(blob)
    except Exception:
        return None


def _parse_mp4_meta(blob: bytes) -> tuple[int, int, int, int] | None:
    import struct

    n = len(blob)
    if n < 16 or blob[4:8] != b"ftyp":
        return None
    state = {"dur_ms": None, "w": 0, "h": 0, "tracks": 0, "visited": 0}

    def walk(lo: int, hi: int, depth: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            state["visited"] += 1
            if state["visited"] > 4096 or depth > 8:
                raise ValueError("box bomb")
            (size,) = struct.unpack_from(">I", blob, pos)
            btype = blob[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack_from(">Q", blob, pos + 8)
                body = pos + 16
            elif size == 0:  # to end of enclosing box
                size = hi - pos
            if size < 8 or pos + size > hi:
                raise ValueError("bad box size")
            if btype in _MP4_CONTAINERS:
                walk(body, pos + size, depth + 1)
            elif btype == b"mvhd":
                ver = blob[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", blob, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", blob, body + 12)
                if ts > 0:
                    state["dur_ms"] = int(dur * 1000 // ts)
            elif btype == b"tkhd":
                state["tracks"] += 1
                ver = blob[body]
                # width sits after version+flags(4) + times/track/duration
                # (20 for v0, 32 for v1) + reserved/layer/volume/matrix (52)
                off = body + (88 if ver == 1 else 76)
                tw, th = struct.unpack_from(">II", blob, off)
                tw, th = tw >> 16, th >> 16  # 16.16 fixed point
                if tw * th > state["w"] * state["h"]:
                    state["w"], state["h"] = tw, th
            pos += size

    walk(0, n, 0)
    if state["dur_ms"] is None:
        return None
    return state["dur_ms"], state["w"], state["h"], state["tracks"]


def fake_video_meta(blob: bytes) -> tuple[int, int, int, int]:
    """DETERMINISTIC FAKE for non-BMFF video bytes: md5-derived
    (duration_ms, width, height, n_tracks) — SQL-oracle-recomputable."""
    h = _blob_hash60(blob)
    return 1000 + (h & 0xFFFF), 320 + ((h >> 4) & 0xFF), \
        240 + ((h >> 8) & 0xFF), 1 + ((h >> 16) & 1)


def extract_video_meta(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
) -> DataFrame:
    """mapInPandas video-container metadata extraction: real ISO BMFF parse
    when the blob is MP4/MOV, the documented fake otherwise; never raises.
    Feeds frame_sample_plan with REAL durations for actual MP4s."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    rows.append((row[id_col], None, None, None, None, 0, False))
                    continue
                b = bytes(blob)
                meta = parse_mp4_meta(b)
                real = meta is not None
                if meta is None:
                    meta = fake_video_meta(b)
                dur, w, h, nt = meta
                rows.append((row[id_col], dur, w, h, nt, len(b), real))
            yield pd.DataFrame(rows, columns=[
                "id", "duration_ms", "width", "height", "n_tracks",
                "n_bytes", "real_parse"])

    return df.mapInPandas(run, VIDEO_META_SCHEMA)


def repartition_for_media(df: DataFrame, target_bytes_per_task: int = 256 << 20,
                          size_col: str | None = None, blob_col: str = "blob") -> DataFrame:
    """Repartition so each task holds ~target_bytes of media, keeping decode
    memory bounded regardless of blob-size skew."""
    size = F.col(size_col) if size_col else F.length(F.col(blob_col))
    total = df.agg(F.sum(size)).first()[0] or 0
    n = max(1, int(total / target_bytes_per_task) + 1)
    return df.repartition(n)


# ---------------------------------------------------------------------------
# audio fingerprinting (Haitsma-Kalker-style robust hash) + audio near-dup
# ---------------------------------------------------------------------------

def fake_audio_grid(blob: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE energy grid for non-WAV blobs: 9x9 bytes from
    chained md5 digests (bytes of md5(blob || 'a<i>')), so every
    fingerprint bit is oracle-verifiable integer arithmetic."""
    import hashlib

    raw = b"".join(
        hashlib.md5(blob + b"a%d" % i).digest() for i in range(6))[:81]
    return np.frombuffer(raw, dtype=np.uint8).astype(np.float64).reshape(9, 9)


def audio_energy_grid(samples: np.ndarray) -> np.ndarray:
    """9 time frames x 9 spectral bands of energy: each frame is an equal
    slice of the waveform, FFT'd, power summed over 9 equal bands of the
    non-DC bins. Deterministic numpy; empty slices yield zero rows."""
    grid = np.zeros((9, 9))
    for i, fr in enumerate(np.array_split(samples, 9)):
        if fr.size < 2:
            continue
        spec = np.abs(np.fft.rfft(fr)) ** 2
        for j, band in enumerate(np.array_split(spec[1:], 9)):
            if band.size:
                grid[i, j] = band.sum()
    return grid


def audio_fingerprint64(grid: np.ndarray) -> int:
    """64-bit robust audio hash (Haitsma & Kalker 2002 shape): bit (i, j)
    is the sign of the time-AND-band double difference
    (E[i+1][j+1]-E[i+1][j]) - (E[i][j+1]-E[i][j]) over the 9x9 energy
    grid — invariant to uniform gain (energies scale together, signs
    don't move), packed row-major with bit 63 as the int64 sign (the
    simhash convention, so the banding/Hamming machinery is shared)."""
    d = np.diff(grid, axis=1)          # band differences, (9, 8)
    bits = (d[1:, :] - d[:-1, :]) > 0  # frame-to-frame difference, (8, 8)
    v = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            v += -(1 << 63) if i == 63 else (1 << i)
    return v


def audio_fingerprint(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
) -> DataFrame:
    """(id, afp): robust audio fingerprint per blob via mapInPandas. WAV
    decodes for real (spectral energy grid); other formats take the
    md5-grid fake so the pipeline stays total and oracle-verifiable."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    rows.append((row[id_col], None))
                    continue
                b = bytes(blob)
                out = decode_wav_samples(b)
                grid = (audio_energy_grid(out[2]) if out is not None
                        else fake_audio_grid(b))
                rows.append((row[id_col], audio_fingerprint64(grid)))
            yield pd.DataFrame(rows, columns=["id", "afp"])

    return df.mapInPandas(
        run,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("afp", T.LongType()),
        ]),
    )


def audio_neardup(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    max_hamming: int = 6,
    bands: int = 4,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Audio near-dedup: fingerprint -> 16-bit-band LSH candidates ->
    exact bit_count(xor) Hamming verify -> drop the higher id per
    verified pair. Same scale shape (and eager-persist discipline, and
    precomputed-``hashes`` sharing) as image_neardup: one corpus-sized
    fingerprint pass, (band, chunk)-keyed self-join, candidate-only
    verification."""
    from .dedup import simhash_candidates

    if hashes is None:
        hashes = audio_fingerprint(df, blob_col, id_col).persist()
        hashes.count()
    cands = simhash_candidates(
        hashes.select(F.col("id").alias(id_col),
                      F.col("afp").alias("simhash")),
        id_col, bands)
    ha = hashes.select(F.col("id").alias("id_a"), F.col("afp").alias("__ha"))
    hb = hashes.select(F.col("id").alias("id_b"), F.col("afp").alias("__hb"))
    losers = (
        cands.join(ha, "id_a").join(hb, "id_b")
        .filter(F.bit_count(
            F.col("__ha").bitwiseXOR(F.col("__hb"))) <= max_hamming)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# video near-dup: frame-sampled perceptual hashes + temporal voting
# ---------------------------------------------------------------------------

def fake_frame_grid(blob: bytes, ts_ms: int) -> tuple[int, int, np.ndarray]:
    """DETERMINISTIC FAKE frame pixels at timestamp ``ts_ms``: the dHash
    9x8 grid from chained md5(blob || 'f<ts>p<i>') digests — the frame
    analogue of fake_decode_gray_grid, SQL-replayable byte for byte."""
    import hashlib

    raw = b"".join(
        hashlib.md5(blob + b"f%dp%d" % (ts_ms, i)).digest()
        for i in range(5))[:72]
    px = np.repeat(
        np.frombuffer(raw, dtype=np.uint8).astype(np.float64)[:, None],
        3, axis=1)
    return 9, 8, px


def video_frame_hashes(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    duration_col: str = "duration_ms",
    every_ms: int = 1000,
    decode_frame: Callable[[bytes, int],
                           tuple[int, int, np.ndarray] | None] | None = None,
) -> DataFrame:
    """(id, frame_ts, fhash): one dHash per sampled frame. Each video is
    read ONCE inside the UDF and emits its frame rows from there — the
    blob never replicates across frame rows in a shuffle (exploding
    first, as frame_sample_plan's planning shape does, would carry the
    blob bytes once per frame). ``decode_frame(blob, ts_ms)`` plugs in a
    real codec (not in this container); the default is the md5-grid
    fake, clearly marked and oracle-verifiable."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _i, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                b = bytes(blob)
                dur = int(row[duration_col] or 0)
                for ts in range(0, max(dur, 1), every_ms):
                    out = decode_frame(b, ts) if decode_frame else None
                    if out is None:
                        out = fake_frame_grid(b, ts)
                    w, h, px = out
                    rows.append(
                        (row[id_col], ts, dhash64_from_pixels(w, h, px)))
            yield pd.DataFrame(rows, columns=["id", "frame_ts", "fhash"])

    return df.mapInPandas(
        run,
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("frame_ts", T.LongType()),
            T.StructField("fhash", T.LongType()),
        ]),
    )


def video_neardup(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    duration_col: str = "duration_ms",
    every_ms: int = 1000,
    match_fraction: float = 0.8,
    decode_frame: Callable[[bytes, int],
                           tuple[int, int, np.ndarray] | None] | None = None,
) -> DataFrame:
    """Video near-dedup by temporal voting: two videos are duplicates
    when >= ``match_fraction`` of the longer one's sampled frames hash
    identically at the same timestamp — the standard frame-hash voting
    shape for re-upload/re-container detection (byte-level hashing
    misses re-muxed files; per-frame perceptual hashes don't).

    Scale shape: one corpus pass computes frame hashes; candidates join
    on the (frame_ts, fhash) key, so only videos sharing an identical
    frame at the same offset ever pair; the vote is a groupBy on the
    pair key. Caveat, documented: a frame hash common across many
    videos (black frames, title cards) makes that bucket quadratic —
    production sharding drops the top-k most frequent frame hashes
    first (the 'stop-frame' analogue of stopwords), which only LOWERS
    recall of all-boilerplate pairs."""
    fh = video_frame_hashes(
        df, blob_col, id_col, duration_col, every_ms, decode_frame).persist()
    # eager materialization: counts and both join sides consume fh, and
    # AQE's parallel stage submission double-builds a lazy cache (the
    # verify_jaccard lesson; observed as BlockManager already-exists
    # warnings here). Caller owns the cache lifetime, as everywhere.
    fh.count()
    counts = fh.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    a = fh.select(F.col("id").alias("id_a"), "frame_ts", "fhash")
    b = fh.select(F.col("id").alias("id_b"), "frame_ts", "fhash")
    matches = (
        a.join(b, ["frame_ts", "fhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    na = counts.select(F.col("id").alias("id_a"), F.col("__n").alias("__na"))
    nb = counts.select(F.col("id").alias("id_b"), F.col("__n").alias("__nb"))
    losers = (
        matches.join(na, "id_a").join(nb, "id_b")
        .filter(F.col("__m") >= match_fraction
                * F.greatest(F.col("__na"), F.col("__nb")))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")
