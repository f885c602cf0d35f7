"""Puffin / deletion-vector-v1 tests: roaring serialization roundtrips,
blob framing + CRC, container file, and v3 merge-on-read DELETE end-to-end
(reference behaviors: iceberg_deletion_vector.cpp, iceberg_delete.cpp)."""

import os
import struct
import zlib

import numpy as np
import pytest

from duckdb_iceberg_spark.metadata import puffin as pf


# ---------------------------------------------------------------------------
# roaring 32-bit
# ---------------------------------------------------------------------------

def _roundtrip32(vals):
    arr = np.unique(np.asarray(vals, dtype=np.uint32))
    buf = pf.roaring32_serialize(arr)
    out, used = pf.roaring32_deserialize(buf)
    assert used == len(buf)
    np.testing.assert_array_equal(np.sort(out), arr)


def test_roaring_array_container():
    _roundtrip32([0, 1, 5, 65535, 65536, 70000, 2**32 - 1])


def test_roaring_bitset_container():
    # >4096 values in one 16-bit chunk forces a bitset container
    rng = np.random.RandomState(7)
    _roundtrip32(rng.choice(65536, size=8000, replace=False).astype(np.uint32))


def test_roaring_mixed_chunks():
    rng = np.random.RandomState(11)
    sparse = rng.randint(0, 2**32, size=5000, dtype=np.uint64).astype(np.uint32)
    dense = (np.uint32(3) << np.uint32(16)) | rng.choice(
        65536, size=6000, replace=False).astype(np.uint32)
    _roundtrip32(np.concatenate([sparse, dense]))


def test_roaring_run_container_read():
    # hand-build a run-container serialization: cookie 12347, 1 container,
    # run flag set, key=2, cardinality 10, runs [(5, len 4), (100, len 5)]
    buf = struct.pack("<HH", 12347, 0)  # cookie, containers-1
    buf += bytes([0x01])  # run-flag bitset
    buf += struct.pack("<HH", 2, 9)  # key, card-1
    # n < 4 with run cookie -> no offsets section
    buf += struct.pack("<H", 2)  # n_runs
    buf += struct.pack("<HH", 5, 3) + struct.pack("<HH", 100, 4)
    out, used = pf.roaring32_deserialize(buf)
    assert used == len(buf)
    base = 2 << 16
    expect = np.array([base + v for v in [5, 6, 7, 8, 100, 101, 102, 103, 104]],
                      dtype=np.uint32)
    np.testing.assert_array_equal(np.sort(out), expect)


# ---------------------------------------------------------------------------
# deletion-vector blob
# ---------------------------------------------------------------------------

def test_dv_blob_roundtrip():
    pos = np.array([0, 5, 7, 2**31, 2**32 + 3, 2**33 + 10, 2**40], dtype=np.int64)
    blob = pf.serialize_dv_blob(pos)
    assert blob[4:8] == pf.DV_MAGIC
    out = pf.parse_dv_blob(blob)
    np.testing.assert_array_equal(out, np.sort(pos))


def test_dv_blob_crc_and_framing():
    blob = bytearray(pf.serialize_dv_blob(np.arange(100, dtype=np.int64)))
    (length,) = struct.unpack_from(">I", bytes(blob), 0)
    body = bytes(blob[4:4 + length])
    (stored,) = struct.unpack_from(">I", bytes(blob), 4 + length)
    assert stored == (zlib.crc32(body) & 0xFFFFFFFF)
    blob[10] ^= 0xFF  # corrupt a bitmap byte
    with pytest.raises(ValueError, match="CRC|corrupt"):
        pf.parse_dv_blob(bytes(blob))


def test_dv_blob_bad_magic():
    blob = bytearray(pf.serialize_dv_blob(np.arange(10, dtype=np.int64)))
    blob[4] = 0x00
    with pytest.raises(ValueError, match="[Mm]agic"):
        pf.parse_dv_blob(bytes(blob))


# ---------------------------------------------------------------------------
# puffin container
# ---------------------------------------------------------------------------

def test_puffin_file_roundtrip(tmp_path):
    path = str(tmp_path / "dv.puffin")
    dvs = {
        "/data/a.parquet": np.array([1, 2, 3], dtype=np.int64),
        "/data/b.parquet": np.array([10, 2**33], dtype=np.int64),
    }
    blobs = pf.write_puffin_dvs(path, dvs)
    with open(path, "rb") as fh:
        raw = fh.read()
    assert raw[:4] == pf.PUFFIN_MAGIC and raw[-4:] == pf.PUFFIN_MAGIC

    footer = pf.read_puffin_footer(path)
    assert len(footer) == 2
    assert {b.properties["referenced-data-file"] for b in footer} == set(dvs)
    for b in footer:
        assert b.type == pf.DV_BLOB_TYPE
        assert b.snapshot_id == -1 and b.sequence_number == -1

    for ref, positions in dvs.items():
        by_offset = pf.read_dv_positions(path, blobs[ref].offset, blobs[ref].length)
        np.testing.assert_array_equal(by_offset, np.sort(positions))
        by_footer = pf.read_dv_positions(path, None, None, ref)
        np.testing.assert_array_equal(by_footer, np.sort(positions))


# ---------------------------------------------------------------------------
# end-to-end v3 DELETE with deletion vectors
# ---------------------------------------------------------------------------

def test_v3_delete_writes_dv_and_scan_applies(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t_dv")
    df = spark.range(0, 1000).selectExpr("id", "id % 10 AS k")
    write_iceberg(df, loc, format_version=3)

    delete_from(spark, loc, "k = 3", mode="merge-on-read")
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    dv_entries = [d for t in plan.tasks for d in t.positional_deletes
                  if (d.file_format or "").lower() == "puffin"]
    assert dv_entries, "expected deletion-vector entries in the plan"
    for d in dv_entries:
        assert d.referenced_data_file
        assert d.content_offset is not None and d.content_size_in_bytes is not None

    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(1000) if i % 10 != 3]


def test_v3_second_delete_merges_dv(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t_dv2")
    df = spark.range(0, 500).selectExpr("id", "id % 10 AS k")
    write_iceberg(df, loc, format_version=3)
    delete_from(spark, loc, "k = 1", mode="merge-on-read")
    delete_from(spark, loc, "k = 2", mode="merge-on-read")

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    # at most ONE deletion vector per data file after the second delete
    for t in plan.tasks:
        dvs = [d for d in t.positional_deletes
               if (d.file_format or "").lower() == "puffin"]
        refs = {d.file_path + ":" + str(d.content_offset) for d in dvs}
        assert len(refs) <= 1, "a data file must have at most one DV"

    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(500) if i % 10 not in (1, 2)]


def test_v3_update_merge_on_read_uses_dv(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.dml import update_iceberg

    loc = str(tmp_path / "t_dv3")
    df = spark.range(0, 300).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    write_iceberg(df, loc, format_version=3)
    update_iceberg(spark, loc, {"v": "v + 1000.0"}, "id < 50", mode="merge-on-read")

    rows = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert len(rows) == 300
    assert rows[0] == 1000.0 and rows[49] == 1049.0 and rows[50] == 50.0


def test_dv_write_never_ships_raw_positions_to_driver(spark, tmp_path, monkeypatch):
    """100 TB guard: _write_deletion_vectors must collect only compressed
    per-file bitmap blobs, never raw position lists (no toPandas of the
    pairs frame)."""
    from pyspark.sql import DataFrame
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "dv_guard")
    write_iceberg(spark.range(1000).selectExpr("id", "id % 7 AS k"), loc,
                  format_version=3)

    def _blocked(self, *a, **kw):
        raise AssertionError("driver toPandas during DV write")

    monkeypatch.setattr(DataFrame, "toPandas", _blocked)
    delete_from(spark, loc, "id % 10 = 0", mode="merge-on-read")
    monkeypatch.undo()
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(1000) if i % 10 != 0]


def test_dv_write_collects_stats_not_blobs(spark, tmp_path):
    """100 TB guard (round-5 ADVICE): Puffin DVs are written FROM EXECUTORS;
    the executor→driver row carries only entry stats — no binary column —
    and each affected data file gets its own Puffin file whose footer
    matches the manifest entry's offsets."""
    from pyspark.sql import types as T
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.puffin import read_puffin_footer
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.dml import _DV_STATS_SCHEMA, delete_from

    schema = T._parse_datatype_string(_DV_STATS_SCHEMA)
    assert not any(isinstance(f.dataType, T.BinaryType) for f in schema.fields), \
        "DV stats schema must not ship blob bytes to the driver"

    loc = str(tmp_path / "dv_stats")
    # several data files so the DELETE spans multiple DV groups
    df = spark.range(900).selectExpr("id", "id % 3 AS part").repartition(3)
    write_iceberg(df, loc, format_version=3)
    delete_from(spark, loc, "id % 9 = 0", mode="merge-on-read")

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.current_snapshot())
    dv_by_file = {}
    for t in plan.tasks:
        for d in t.positional_deletes:
            if (d.file_format or "").lower() == "puffin":
                dv_by_file[t.data_file.file_path] = d
    assert len(dv_by_file) >= 2, "expected DVs on multiple data files"
    # one Puffin per data file, footer agrees with the manifest entry
    paths = {d.file_path for d in dv_by_file.values()}
    assert len(paths) == len(dv_by_file)
    for d in dv_by_file.values():
        blobs = read_puffin_footer(d.file_path)
        assert len(blobs) == 1
        assert blobs[0].offset == d.content_offset
        assert blobs[0].length == d.content_size_in_bytes
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(900) if i % 9 != 0]
