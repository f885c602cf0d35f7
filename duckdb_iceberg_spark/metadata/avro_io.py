"""Pure-Python Avro Object Container File reader/writer.

The reference reads manifest lists / manifests through its host's
``read_avro`` function (reference: src/planning/metadata_io/avro/avro_scan.cpp:25-55)
and writes them with an embedded Avro codec
(reference: src/core/metadata/iceberg_avro_codec.cpp). We are driver-side
Python with no fastavro available, so this module implements the small
subset of Avro 1.11 needed for Iceberg metadata:

- container format (magic ``Obj\\x01``, metadata map, sync markers, blocks)
- codecs: ``null`` and ``deflate`` (zlib raw)
- types: null, boolean, int, long (zigzag varint), float, double, bytes,
  string, fixed, enum, array, map, union, record

Decoding is *writer-schema driven* and returns plain dicts; encoding takes a
schema dict + dicts. Iceberg manifests are small (KBs-MBs) so driver-side
Python decode is fine; at huge scale manifests can instead be read
distributed (see plans/pruner.py notes).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO, Iterable, Iterator

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------

def _write_long(out: io.BytesIO, n: int) -> None:
    # zigzag varint
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            break


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _write_str(out: io.BytesIO, s: str) -> None:
    _write_bytes(out, s.encode("utf-8"))


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------

class _Decoder:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes) -> None:
        self.buf = memoryview(data)
        self.pos = 0

    def long(self) -> int:
        v, self.pos = _read_long(self.buf, self.pos)
        return v

    def raw(self, n: int) -> bytes:
        b = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return b

    def decode(self, schema: Any) -> Any:
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union
            idx = self.long()
            return self.decode(schema[idx])
        else:
            t = schema["type"]

        if t == "null":
            return None
        if t == "boolean":
            b = self.buf[self.pos]
            self.pos += 1
            return b != 0
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            (v,) = struct.unpack_from("<f", self.buf, self.pos)
            self.pos += 4
            return v
        if t == "double":
            (v,) = struct.unpack_from("<d", self.buf, self.pos)
            self.pos += 8
            return v
        if t == "bytes":
            return self.raw(self.long())
        if t == "string":
            return self.raw(self.long()).decode("utf-8")
        if t == "fixed":
            return self.raw(schema["size"])
        if t == "enum":
            return schema["symbols"][self.long()]
        if t == "array":
            items = schema["items"]
            out = []
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    self.long()  # block byte size, unused
                    n = -n
                for _ in range(n):
                    out.append(self.decode(items))
            return out
        if t == "map":
            values = schema["values"]
            out_m: dict[str, Any] = {}
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    self.long()
                    n = -n
                for _ in range(n):
                    k = self.raw(self.long()).decode("utf-8")
                    out_m[k] = self.decode(values)
            return out_m
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]] = self.decode(f["type"])
            return rec
        # nested named-type reference or {"type": {...}} wrapper
        if isinstance(t, (dict, list)):
            return self.decode(t)
        raise ValueError(f"unsupported avro type: {t!r}")


# ---------------------------------------------------------------------------
# schema-driven encode
# ---------------------------------------------------------------------------

def _union_branch(schema: list, value: Any) -> tuple[int, Any]:
    """Pick the union branch for value. Iceberg metadata unions are
    ``["null", X]`` (or ``[X, "null"]``), which is all we need."""
    for i, s in enumerate(schema):
        if (s == "null" or (isinstance(s, dict) and s.get("type") == "null")) and value is None:
            return i, s
    for i, s in enumerate(schema):
        if s == "null" or (isinstance(s, dict) and s.get("type") == "null"):
            continue
        return i, s
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def _encode(out: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        idx, branch = _union_branch(schema, value)
        _write_long(out, idx)
        _encode(out, branch, value)
        return
    else:
        t = schema["type"]

    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if t in ("int", "long"):
        _write_long(out, int(value))
        return
    if t == "float":
        out.write(struct.pack("<f", value))
        return
    if t == "double":
        out.write(struct.pack("<d", value))
        return
    if t == "bytes":
        _write_bytes(out, bytes(value))
        return
    if t == "string":
        _write_str(out, value)
        return
    if t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.write(b)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(value))
        return
    if t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(out, schema["items"], v)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_str(out, k)
                _encode(out, schema["values"], v)
        _write_long(out, 0)
        return
    if t == "record":
        for f in schema["fields"]:
            name = f["name"]
            if isinstance(value, dict):
                v = value.get(name, f.get("default"))
                if name not in value and "default" not in f and not _nullable(f["type"]):
                    raise ValueError(f"missing required record field {name}")
            else:
                v = getattr(value, name)
            _encode(out, f["type"], v)
        return
    if isinstance(t, (dict, list)):
        _encode(out, t, value)
        return
    raise ValueError(f"unsupported avro type: {t!r}")


def _nullable(schema: Any) -> bool:
    return isinstance(schema, list) and any(
        s == "null" or (isinstance(s, dict) and s.get("type") == "null") for s in schema
    )


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def read_avro_file(path_or_bytes: str | bytes) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an Avro OCF. Returns (writer_schema, file_metadata, records)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        from .. import io as fio

        data = fio.get_io(path_or_bytes).read_bytes(path_or_bytes)
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    dec = _Decoder(data)
    dec.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = dec.long()
        if n == 0:
            break
        if n < 0:
            dec.long()
            n = -n
        for _ in range(n):
            k = dec.raw(dec.long()).decode("utf-8")
            meta[k] = dec.raw(dec.long())
    sync = dec.raw(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records: list[dict] = []
    total = len(data)
    while dec.pos < total:
        count = dec.long()
        size = dec.long()
        block = dec.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec}")
        bdec = _Decoder(block)
        for _ in range(count):
            records.append(bdec.decode(schema))
        if dec.raw(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, meta, records


def write_avro_file(
    path: str,
    schema: dict,
    records: Iterable[Any],
    metadata: dict[str, str | bytes] | None = None,
    codec: str = "deflate",
) -> None:
    body = io.BytesIO()
    count = 0
    for rec in records:
        _encode(body, schema, rec)
        count += 1
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()

    out = io.BytesIO()
    out.write(MAGIC)
    meta: dict[str, bytes] = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else v
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_str(out, k)
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = os.urandom(16)
    out.write(sync)
    if count:
        _write_long(out, count)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    else:
        # zero-record file: no data blocks at all is valid
        pass
    from .. import io as fio

    fio.get_io(path).write_bytes(path, out.getvalue())
