"""Minimal Parquet Variant binary codec for Iceberg v3 variant statistics.

Iceberg v3 stores lower/upper bounds of shredded variant columns as one
serialized variant OBJECT keyed by normalized JSON path ("$['a']['b']") —
the reference builds these in
src/storage/statistics/iceberg_variant_statistics.cpp (SerializeBoundsVariant
concatenates the variant metadata and value blobs; Deserialize splits them
back). This module decodes exactly that shape — metadata dictionary +
value tree — per the public Parquet VariantEncoding spec, plus an encoder
used by tests and by writers that materialize bounds.

Only the primitive types that can appear in bounds are implemented; unknown
type tags decode to ``None`` so pruning stays conservative.
"""

from __future__ import annotations

import datetime as _dt
import struct
from decimal import Decimal
from typing import Any

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

# primitive type tags (VariantEncoding.md)
_P_NULL, _P_TRUE, _P_FALSE = 0, 1, 2
_P_INT8, _P_INT16, _P_INT32, _P_INT64 = 3, 4, 5, 6
_P_DOUBLE = 7
_P_DEC4, _P_DEC8, _P_DEC16 = 8, 9, 10
_P_DATE = 11
_P_TS_TZ, _P_TS_NTZ = 12, 13
_P_FLOAT = 14
_P_BINARY, _P_STRING = 15, 16


def _read_le(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off:off + n], "little")


def decode_metadata(blob: bytes) -> tuple[list[str], int]:
    """Parse the metadata dictionary; returns (keys, bytes consumed)."""
    header = blob[0]
    if header & 0x0F != 1:
        raise ValueError(f"unsupported variant metadata version {header & 0x0F}")
    offset_size = ((header >> 6) & 0b11) + 1
    pos = 1
    dict_size = _read_le(blob, pos, offset_size)
    pos += offset_size
    offsets = [_read_le(blob, pos + i * offset_size, offset_size)
               for i in range(dict_size + 1)]
    pos += (dict_size + 1) * offset_size
    strings_start = pos
    keys = [
        blob[strings_start + offsets[i]: strings_start + offsets[i + 1]].decode()
        for i in range(dict_size)
    ]
    return keys, strings_start + offsets[dict_size]


def _decode_value(blob: bytes, pos: int, keys: list[str]) -> tuple[Any, int]:
    header = blob[pos]
    basic = header & 0b11
    info = header >> 2
    pos += 1
    if basic == 1:  # short string
        ln = info
        return blob[pos:pos + ln].decode(), pos + ln
    if basic == 0:  # primitive
        t = info
        if t == _P_NULL:
            return None, pos
        if t == _P_TRUE:
            return True, pos
        if t == _P_FALSE:
            return False, pos
        if t in (_P_INT8, _P_INT16, _P_INT32, _P_INT64):
            n = {_P_INT8: 1, _P_INT16: 2, _P_INT32: 4, _P_INT64: 8}[t]
            return int.from_bytes(blob[pos:pos + n], "little", signed=True), pos + n
        if t == _P_DOUBLE:
            return struct.unpack("<d", blob[pos:pos + 8])[0], pos + 8
        if t == _P_FLOAT:
            return struct.unpack("<f", blob[pos:pos + 4])[0], pos + 4
        if t in (_P_DEC4, _P_DEC8, _P_DEC16):
            n = {_P_DEC4: 4, _P_DEC8: 8, _P_DEC16: 16}[t]
            scale = blob[pos]
            unscaled = int.from_bytes(blob[pos + 1:pos + 1 + n], "little", signed=True)
            from .types import DEC38
            return Decimal(unscaled).scaleb(-scale, context=DEC38), pos + 1 + n
        if t == _P_DATE:
            days = int.from_bytes(blob[pos:pos + 4], "little", signed=True)
            return _EPOCH_DATE + _dt.timedelta(days=days), pos + 4
        if t in (_P_TS_TZ, _P_TS_NTZ):
            us = int.from_bytes(blob[pos:pos + 8], "little", signed=True)
            ts = _EPOCH_TS + _dt.timedelta(microseconds=us)
            return (ts if t == _P_TS_TZ else ts.replace(tzinfo=None)), pos + 8
        if t in (_P_BINARY, _P_STRING):
            ln = _read_le(blob, pos, 4)
            raw = blob[pos + 4:pos + 4 + ln]
            return (raw if t == _P_BINARY else raw.decode()), pos + 4 + ln
        return None, len(blob)  # unknown primitive: conservative, stop
    if basic == 2:  # object
        offset_size = (info & 0b11) + 1
        id_size = ((info >> 2) & 0b11) + 1
        is_large = (info >> 4) & 1
        n_sz = 4 if is_large else 1
        num = _read_le(blob, pos, n_sz)
        pos += n_sz
        ids = [_read_le(blob, pos + i * id_size, id_size) for i in range(num)]
        pos += num * id_size
        offs = [_read_le(blob, pos + i * offset_size, offset_size)
                for i in range(num + 1)]
        pos += (num + 1) * offset_size
        base = pos
        out = {}
        for i in range(num):
            v, _ = _decode_value(blob, base + offs[i], keys)
            out[keys[ids[i]]] = v
        return out, base + offs[num]
    # array
    offset_size = (info & 0b11) + 1
    is_large = (info >> 2) & 1
    n_sz = 4 if is_large else 1
    num = _read_le(blob, pos, n_sz)
    pos += n_sz
    offs = [_read_le(blob, pos + i * offset_size, offset_size)
            for i in range(num + 1)]
    pos += (num + 1) * offset_size
    base = pos
    arr = []
    for i in range(num):
        v, _ = _decode_value(blob, base + offs[i], keys)
        arr.append(v)
    return arr, base + offs[num]


def decode_variant(blob: bytes) -> Any:
    """Decode a concatenated (metadata || value) variant blob into Python
    values (the reference's SerializeBoundsVariant layout)."""
    keys, consumed = decode_metadata(blob)
    value, _ = _decode_value(blob, consumed, keys)
    return value


def decode_bounds(blob: bytes) -> dict[str, Any]:
    """Variant stats bounds: an object keyed by normalized JSON path."""
    v = decode_variant(bytes(blob))
    return v if isinstance(v, dict) else {}


# ---------------------------------------------------------------------------
# encoder (tests + bound materialization)
# ---------------------------------------------------------------------------

def _encode_primitive(v: Any) -> bytes:
    if v is None:
        return bytes([_P_NULL << 2])
    if v is True:
        return bytes([_P_TRUE << 2])
    if v is False:
        return bytes([_P_FALSE << 2])
    if isinstance(v, int):
        for t, n in ((_P_INT8, 1), (_P_INT16, 2), (_P_INT32, 4), (_P_INT64, 8)):
            if -(1 << (8 * n - 1)) <= v < (1 << (8 * n - 1)):
                return bytes([t << 2]) + v.to_bytes(n, "little", signed=True)
        raise ValueError("int too large for variant")
    if isinstance(v, float):
        return bytes([_P_DOUBLE << 2]) + struct.pack("<d", v)
    if isinstance(v, Decimal):
        scale = -v.as_tuple().exponent
        unscaled = int(v.scaleb(scale))
        return (bytes([_P_DEC8 << 2, scale])
                + unscaled.to_bytes(8, "little", signed=True))
    if isinstance(v, _dt.datetime):
        tz = v.tzinfo is not None
        base = v if tz else v.replace(tzinfo=_dt.timezone.utc)
        us = int((base - _EPOCH_TS).total_seconds() * 1_000_000)
        t = _P_TS_TZ if tz else _P_TS_NTZ
        return bytes([t << 2]) + us.to_bytes(8, "little", signed=True)
    if isinstance(v, _dt.date):
        days = (v - _EPOCH_DATE).days
        return bytes([_P_DATE << 2]) + days.to_bytes(4, "little", signed=True)
    if isinstance(v, str):
        raw = v.encode()
        if len(raw) < 64:
            return bytes([(len(raw) << 2) | 1]) + raw
        return bytes([_P_STRING << 2]) + len(raw).to_bytes(4, "little") + raw
    if isinstance(v, (bytes, bytearray)):
        return (bytes([_P_BINARY << 2])
                + len(v).to_bytes(4, "little") + bytes(v))
    raise TypeError(f"cannot encode {type(v).__name__} as variant")


def encode_variant(obj: Any) -> bytes:
    """Encode a Python value (dicts/lists/primitives) as metadata || value."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}

    def collect(o: Any) -> None:
        if isinstance(o, dict):
            for k, v in o.items():
                if k not in key_idx:
                    key_idx[k] = len(keys)
                    keys.append(k)
                collect(v)
        elif isinstance(o, list):
            for v in o:
                collect(v)

    collect(obj)

    def _sz(maxval: int) -> int:
        for n in (1, 2, 3, 4):
            if maxval < (1 << (8 * n)):
                return n
        raise ValueError("variant too large")

    def enc(o: Any) -> bytes:
        if isinstance(o, dict):
            items = list(o.items())
            vals = [enc(v) for _, v in items]
            offs, total = [], 0
            for v in vals:
                offs.append(total)
                total += len(v)
            offs.append(total)
            osz = _sz(total)
            isz = _sz(max(key_idx[k] for k, _ in items) if items else 0)
            is_large = len(items) > 255
            header = ((1 if is_large else 0) << 4) | ((isz - 1) << 2) | (osz - 1)
            out = bytes([(header << 2) | 2])
            out += len(items).to_bytes(4 if is_large else 1, "little")
            out += b"".join(key_idx[k].to_bytes(isz, "little") for k, _ in items)
            out += b"".join(x.to_bytes(osz, "little") for x in offs)
            return out + b"".join(vals)
        if isinstance(o, list):
            vals = [enc(v) for v in o]
            offs, total = [], 0
            for v in vals:
                offs.append(total)
                total += len(v)
            offs.append(total)
            osz = _sz(total)
            is_large = len(vals) > 255
            header = ((1 if is_large else 0) << 2) | (osz - 1)
            out = bytes([(header << 2) | 3])
            out += len(vals).to_bytes(4 if is_large else 1, "little")
            out += b"".join(x.to_bytes(osz, "little") for x in offs)
            return out + b"".join(vals)
        return _encode_primitive(o)

    value = enc(obj)

    offs, total = [], 0
    raws = [k.encode() for k in keys]
    for r in raws:
        offs.append(total)
        total += len(r)
    offs.append(total)
    osz = _sz(max(total, len(keys)))
    meta = bytes([0x01 | ((osz - 1) << 6)])  # version 1, unsorted
    meta += len(keys).to_bytes(osz, "little")
    meta += b"".join(x.to_bytes(osz, "little") for x in offs)
    meta += b"".join(raws)
    return meta + value
