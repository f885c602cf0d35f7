"""Interop reads: foreign-written Iceberg tables from the reference's
``data/persistent`` fixtures, asserted against the golden results embedded in
the reference's own sqllogictests.

Every other correctness signal in this repo is a self-roundtrip (our writer →
our reader). These tables were written by OTHER engines (Spark/Iceberg-java,
PyIceberg, Flink-style CDC writers, hand-crafted legacy metadata), so they
prove the reader against the spec, not against our writer's habits:

- identity partitions over every primitive type, incl. values absent from
  the data files (test/sql/local/partitioning/identity/*.test)
- equality deletes written by Flink-style CDC (equality_deletes.test,
  equality_delete_cross_partition.test, equality_delete_extra_column.test)
- legacy v1: embedded snapshot ``manifests``, bare ``partition-spec``
  (iceberg_scans/iceberg_v1_deprecated_metadata.test), EXISTING entries
  without sequence numbers (iceberg_v1_existing_manifest_entry.test)
- name-mapping / column-mapping files without parquet field-ids
  (column_mapping.test, column_mapping_delete.test)
- case-sensitive duplicate names (case_sensitive_names.test)
- uuid / timestamptz_ns / fixed / decimal(38) exotic types
- initial-defaults over all types (initial_default_all_types.test)
- bare-blob deletion vectors (legacy_bare_deletion_vector.test)
- moved tables: stale/relative recorded locations, file://-relative URIs,
  stale .crc sidecars (map_stats, custom_write_paths)
"""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

import pytest

from duckdb_iceberg_spark import iceberg_scan

P = "/root/reference/data/persistent"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(P), reason="reference persistent fixtures not present")


def rows_of(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# identity partitions over primitive types (partitioning/identity/*.test)
# ---------------------------------------------------------------------------

IDENTITY_CASES = [
    # (table path, all rows, filter, filtered user_ids)
    (f"{P}/partition_bool",
     [(False, 67890, "purchase"), (True, 12345, "click")],
     "partition_col = true", [12345]),
    (f"{P}/partition_integer",
     [(42, 12345, "click"), (1337, 67890, "purchase")],
     "partition_col = 42", [12345]),
    (f"{P}/partition_bigint",
     [(-9223372036854775808, 67890, "purchase"),
      (9223372036854775807, 12345, "click")],
     "partition_col = 9223372036854775807", [12345]),
    (f"{P}/partition_decimal_smallint",
     [(Decimal("1.23"), 12345, "click"), (Decimal("4.56"), 67890, "purchase")],
     "partition_col = 1.23", [12345]),
    (f"{P}/partition_decimal_integer",
     [(Decimal("1.2300"), 67890, "purchase"),
      (Decimal("42.5630"), 12345, "click"),
      (Decimal("1234.5432"), 111213, "delete")],
     "partition_col = 42.5630", [12345]),
]


@pytest.mark.parametrize(
    "path,expected,flt,flt_ids", IDENTITY_CASES,
    ids=[c[0].rsplit("/", 1)[-1] for c in IDENTITY_CASES])
def test_identity_partition_primitives(spark, path, expected, flt, flt_ids):
    df = iceberg_scan(spark, path)
    assert rows_of(df) == sorted(expected)
    got = iceberg_scan(spark, path, where=flt).select("user_id").collect()
    assert sorted(r.user_id for r in got) == sorted(flt_ids)


def test_identity_partition_float(spark):
    rows = rows_of(iceberg_scan(spark, f"{P}/partition_float"))
    assert [r[1:] for r in rows] == [(12345, "click"), (67890, "purchase")]
    assert rows[0][0] == pytest.approx(1.23, abs=1e-6)
    assert rows[1][0] == pytest.approx(4.56, abs=1e-6)


def test_identity_partition_double(spark):
    """The fixture's manifest declares the partition value as avro float32
    (writer quirk); the reference decodes the same 4-byte value — compare
    approximately like its sqllogictest float comparison does."""
    rows = rows_of(iceberg_scan(spark, f"{P}/partition_double"))
    assert [r[1:] for r in rows] == [(67890, "purchase"), (12345, "click")]
    assert rows[0][0] == pytest.approx(2.718281828, abs=1e-6)
    assert rows[1][0] == pytest.approx(3.141592653, abs=1e-6)


def test_identity_partition_binary(spark):
    path = f"{P}/partition_binary"
    assert rows_of(iceberg_scan(spark, path)) == [
        (b"\x01\x02\x03", 12345, "click"), (b"\xaa\xbb\xcc", 67890, "purchase")]
    got = iceberg_scan(spark, path, where="partition_col = X'010203'")
    assert [r.user_id for r in got.collect()] == [12345]


def test_identity_partition_decimal_bigint(spark):
    path = f"{P}/partition_decimal_bigint"
    rows = rows_of(iceberg_scan(spark, path))
    assert len(rows) == 10
    assert rows[0] == (Decimal("-9876.54321098765"), 222333, "view")
    assert rows[-1] == (Decimal("9999.99999999999"), 666777, "hover")
    got = iceberg_scan(spark, path, where="partition_col = 123.45678901234")
    assert [r.user_id for r in got.collect()] == [123456]


def test_identity_partition_decimal_hugeint(spark):
    """decimal(36,23) — wide-precision decode must be exact (int128 analog)."""
    path = f"{P}/partition_decimal_hugeint"
    rows = rows_of(iceberg_scan(spark, path))
    assert len(rows) == 15
    assert rows[0] == (Decimal("-1000000000000.00000000000000000001000"),
                       246802, "rotate")
    assert rows[-1] == (Decimal("9999999999999.99999999999999999999000"),
                        666777, "hover")
    got = iceberg_scan(spark, path,
                       where="partition_col = 3.14159265358979323846264")
    assert [r.user_id for r in got.collect()] == [314159]


def test_identity_partition_fixed_length_binary(spark):
    path = (f"{P}/partition_fixed_length_binary/default.db/"
            "partition_fixed_length_binary/metadata/"
            "00001-b4b3d6d2-cac2-4480-952e-0e4b3b88b5d7.metadata.json")
    assert rows_of(iceberg_scan(spark, path)) == [
        (b"fixed value", 67890, "purchase"), (b"hello world", 12345, "click")]
    got = iceberg_scan(spark, path, where="partition_col = X'68656c6c6f20776f726c64'")
    assert [r.user_id for r in got.collect()] == [12345]


def test_identity_partition_time(spark):
    """time surfaces as a real Spark TimeType (4.1+, r10 — the SURVEY
    §1.2 tagged-Long gap lifted); pruning accepts TIME'...' literals."""
    path = (f"{P}/partition_time/default.db/partition_time/metadata/"
            "00001-44546aa6-1ee5-48c5-9e3b-bc6c0bc0a60c.metadata.json")
    assert rows_of(iceberg_scan(spark, path)) == [
        (dt.time(8, 21, 9), 67890, "purchase"),
        (dt.time(12, 34, 56), 12345, "click")]
    got = iceberg_scan(spark, path, where="partition_col = TIME'12:34:56'")
    assert [r.user_id for r in got.collect()] == [12345]


def test_identity_partition_timestamp(spark):
    path = (f"{P}/partition_timestamp/default.db/partition_timestamp/metadata/"
            "00001-0c9938a5-103e-4185-b46d-331368ae4db7.metadata.json")
    assert rows_of(iceberg_scan(spark, path)) == [
        (dt.datetime(2023, 5, 15, 14, 30, 45), 12345, "click"),
        (dt.datetime(2023, 8, 22, 9, 15, 20), 67890, "purchase")]
    got = iceberg_scan(spark, path,
                       where="partition_col = TIMESTAMP '2023-05-15 14:30:45'")
    assert [r.user_id for r in got.collect()] == [12345]


def test_identity_partition_timestamptz(spark):
    path = (f"{P}/partition_timestamptz/default.db/partition_timestamptz/"
            "metadata/00001-ffeadb58-2a9e-46ba-8b4f-f363f05de68c.metadata.json")
    # session TZ is UTC; golden shows +02 renderings of the same instants
    assert rows_of(iceberg_scan(spark, path)) == [
        (dt.datetime(2023, 5, 15, 14, 30, 45), 12345, "click"),
        (dt.datetime(2023, 8, 22, 9, 15, 20), 67890, "purchase")]


def test_hive_partitioned_spec_evolution(spark):
    """identity_date_and_string.test: spec evolved from (event_date) to
    (event_date, event_type) mid-table."""
    path = f"{P}/hive_partitioned_table"
    assert rows_of(iceberg_scan(spark, path)) == [
        (dt.date(2024, 1, 1), 12345, "click"),
        (dt.date(2024, 1, 2), 67890, "purchase"),
        (dt.date(2024, 1, 3), 13579, "view"),
        (dt.date(2024, 1, 3), 24680, "click"),
        (dt.date(2024, 1, 4), 86420, "view"),
        (dt.date(2024, 1, 4), 97531, "purchase")]
    got = iceberg_scan(spark, path, where="event_date = DATE '2024-01-02'")
    assert [r.user_id for r in got.collect()] == [67890]


# ---------------------------------------------------------------------------
# exotic types (uuid_type.test, timestamptz_ns_type.test)
# ---------------------------------------------------------------------------

UUID_GOLDEN = sorted([
    "8dc314d8-3fd4-4b3a-8bf5-c008f363c2e4", "a217c09f-06fa-4e91-8315-ff44753c4a54",
    "abd6f939-9b99-4e1d-9cda-0dc8ce60a161", "e6218567-354b-4a9c-8cd7-3d4b6a2470f8",
    "f9f28465-51cf-45f1-8985-e01d9a82253c", "1571effb-facd-42a3-90e9-0af522e9b6c2",
    "160a53fe-3d8b-443d-bd36-ad66287f585a", "37afa09a-f496-48a8-89a9-61ea7ccd85d5",
    "3ef257b8-e9c6-4c53-9c22-973729e1043f", "7fae299c-cf05-4777-9b42-57a52e1415ed"])


def test_uuid_type(spark):
    df = iceberg_scan(spark, f"{P}/uuid")
    assert sorted(r[0] for r in df.collect()) == UUID_GOLDEN
    got = iceberg_scan(spark, f"{P}/uuid",
                       where="uuid = '1571effb-facd-42a3-90e9-0af522e9b6c2'")
    assert [r[0] for r in got.collect()] == [
        "1571effb-facd-42a3-90e9-0af522e9b6c2"]


def test_uuid_filter_prunes_files(spark):
    """reference golden: 5 records' worth of files skipped by the filter."""
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    tm = load_table_metadata(f"{P}/uuid")
    plan = plan_scan(tm, tm.select_snapshot(),
                     "uuid = '1571effb-facd-42a3-90e9-0af522e9b6c2'")
    total = plan.stats["files_total"]
    kept = len(plan.tasks)
    assert plan.stats["files_pruned"] >= 1 and kept < total


def test_timestamptz_ns(spark):
    df = iceberg_scan(spark, f"{P}/timestamptz_ns/metadata/v1.metadata.json")
    assert df.count() == 0
    assert "val" in df.columns


# ---------------------------------------------------------------------------
# null stats / filter pruning (null_stats.test, is_not_null.test)
# ---------------------------------------------------------------------------

def test_null_stats_versioned(spark):
    path = f"{P}/null_stats/default/test_nulls"
    ver = "00003-9d6a621e-8a72-4190-a880-f6ca02e32b86"
    df = iceberg_scan(spark, path, version=ver)
    assert df.count() == 9
    nulls = iceberg_scan(spark, path, version=ver, where="flag IS NULL")
    assert sorted(r.id for r in nulls.collect()) == [4, 5, 7, 8, 9]
    notnulls = iceberg_scan(spark, path, version=ver, where="flag IS NOT NULL")
    assert sorted(r.id for r in notnulls.collect()) == [1, 2, 3, 6]


def test_is_null_is_not_null(spark):
    path = f"{P}/is_null_is_not_null"
    base = iceberg_scan(spark, path)
    assert rows_of(base) == [
        (1, None), (2, None), (3, None), (4, "foo"),
        (5, "bar"), (6, "baz"), (7, None), (8, "blah")]
    assert sorted(r.id for r in iceberg_scan(
        spark, path, where="value IS NULL").collect()) == [1, 2, 3, 7]
    assert sorted(r.id for r in iceberg_scan(
        spark, path, where="value IS NOT NULL").collect()) == [4, 5, 6, 8]
    assert sorted(r.id for r in iceberg_scan(
        spark, path, where="value = 'blah'").collect()) == [8]
    # unsupported-for-pruning forms still filter exactly (residual only)
    assert sorted(r.id for r in iceberg_scan(
        spark, path, where="value IS DISTINCT FROM 'zzz'").collect()) == list(range(1, 9))


def test_is_not_null_prunes_all_null_file(spark):
    """The all-null file (ids 1-3, record_count 3) must be pruned for
    ``value = 'blah'`` — reference asserts exactly 3 skipped records."""
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    tm = load_table_metadata(f"{P}/is_null_is_not_null")
    plan = plan_scan(tm, tm.select_snapshot(), "value = 'blah'")
    kept_records = sum(t.data_file.record_count for t in plan.tasks)
    all_records = 8
    assert all_records - kept_records == 3


def test_expression_filter(spark):
    from pyspark.sql import functions as F

    df = iceberg_scan(spark, f"{P}/expression_filter")
    assert rows_of(df) == [(1, "foo"), (2, "bar"), (3, "baz")]
    role = df.select(
        "id", F.expr("CASE WHEN value = 'foo' THEN 'not null' END").alias("role"))
    assert sorted(r.id for r in role.filter("role IS NULL").collect()) == [2, 3]
    assert sorted(r.id for r in role.filter("role IS NOT NULL").collect()) == [1]


def test_generated_bounds(spark):
    got = iceberg_scan(spark, f"{P}/generated_bounds",
                       where="block_number BETWEEN 5000000 AND 5000100")
    assert got.count() == 0


# ---------------------------------------------------------------------------
# equality deletes written by other engines (equality_deletes.test & friends)
# ---------------------------------------------------------------------------

def test_foreign_equality_deletes_unpartitioned(spark):
    path = f"{P}/equality_deletes/warehouse/mydb/mytable"
    df = iceberg_scan(spark, path)
    assert rows_of(df) == [
        (4, "d", dt.date(2025, 1, 4)), (5, "e", dt.date(2025, 1, 5))]
    # projections that drop the equality-delete key columns must still apply
    assert sorted(r.bir for r in df.select("bir").collect()) == [
        dt.date(2025, 1, 4), dt.date(2025, 1, 5)]
    assert sorted(r.name for r in df.select("name").collect()) == ["d", "e"]
    assert df.count() == 2
    # filter on a delete-key column composes with the delete
    got = iceberg_scan(spark, path, where="id = 4").select("bir").collect()
    assert [r.bir for r in got] == [dt.date(2025, 1, 4)]
    # virtual filename column coexists with equality deletes
    fi = iceberg_scan(spark, path, with_file_info=True)
    assert all("equality_deletes" in r.filename for r in fi.collect())
    # equality deletes apply when the scan is NOT the first child of a
    # join and only a non-key column is projected (reference:
    # equality_deletes_join.test — delete-key columns are private scan
    # inputs the projection must not starve)
    one = spark.range(1).selectExpr("CAST(id AS INT) AS x")
    joined = one.crossJoin(iceberg_scan(spark, path)).select("bir")
    assert sorted(r.bir for r in joined.collect()) == [
        dt.date(2025, 1, 4), dt.date(2025, 1, 5)]


def test_foreign_equality_deletes_partitioned(spark):
    path = f"{P}/equality_deletes/warehouse/mydb/mytable_partitioned"
    df = iceberg_scan(spark, path)
    assert rows_of(df) == [
        (1, "a", dt.date(2025, 1, 1)), (4, "d", dt.date(2025, 1, 4)),
        (5, "e", dt.date(2025, 1, 5))]
    assert sorted(r.id for r in df.select("id").collect()) == [1, 4, 5]


def test_equality_delete_cross_partition(spark):
    """A delete scoped to partition part=0 must NOT remove (part=1,key=100)."""
    path = (f"{P}/equality_delete_cross_partition/warehouse/ns/t/metadata/"
            "vfinal.metadata.json")
    assert rows_of(iceberg_scan(spark, path)) == [
        (0, 999, "p0-k999"), (1, 100, "p1-k100"), (1, 888, "p1-k888")]


def test_equality_delete_extra_column(spark):
    path = (f"{P}/equality_delete_extra_column/warehouse/ns/t/metadata/"
            "vfinal.metadata.json")
    df = iceberg_scan(spark, path)
    assert rows_of(df) == [(1, "a"), (3, "c")]
    assert df.count() == 2
    assert sorted(r.val for r in df.select("val").collect()) == ["a", "c"]


# ---------------------------------------------------------------------------
# legacy v1 (iceberg_v1_deprecated_metadata.test, v1_existing_manifest_entry)
# ---------------------------------------------------------------------------

def test_v1_deprecated_embedded_manifests(spark):
    path = f"{P}/iceberg_v1_deprecated/default/legacy_v1"
    assert rows_of(iceberg_scan(spark, path)) == [
        (1, "alpha", 10), (2, "beta", 20), (3, "alpha", None)]
    got = iceberg_scan(spark, path, where="category = 'beta'")
    assert [(r.id, r.amount) for r in got.collect()] == [(2, 20)]


def test_v1_deprecated_metadata_tables(spark):
    from duckdb_iceberg_spark.sources.metadata_tables import (
        iceberg_metadata, iceberg_snapshots)

    path = f"{P}/iceberg_v1_deprecated/default/legacy_v1"
    md = iceberg_metadata(spark, path)
    assert sorted(map(tuple, md.select(
        "content", "data_sequence_number", "file_sequence_number")
        .distinct().collect())) == [("DATA", 0, 0)]
    sn = iceberg_snapshots(spark, path)
    assert [r.manifest_list for r in sn.collect()] == [None]


def test_v1_existing_manifest_entry(spark):
    path = (f"{P}/iceberg_v1_repro/repro/merch_v1/metadata/"
            "00003-8d01e4aa-d143-49c9-898e-b5e477577b70.metadata.json")
    assert rows_of(iceberg_scan(spark, path)) == [
        (2, "nba", 20), (3, "mlb", 30), (4, "nhl", 40), (6, "nba", 60)]

    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_metadata
    md = iceberg_metadata(spark, path)
    assert sorted(map(tuple, md.select(
        "content", "data_sequence_number", "file_sequence_number")
        .distinct().collect())) == [("DATA", 0, 0)]


def test_v1_upgraded_to_v3_null_counts(spark):
    """v3 metadata referencing a V1 manifest list; V1-optional count fields
    NULL — must still scan."""
    path = (f"{P}/iceberg_v1_repro/repro/merch_v1/metadata/"
            "00004-v3-upgraded-v1-null-counts.metadata.json")
    assert rows_of(iceberg_scan(spark, path)) == [
        (2, "nba", 20), (3, "mlb", 30), (4, "nhl", 40), (6, "nba", 60)]

    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_metadata
    md = iceberg_metadata(spark, path)
    assert sorted(map(tuple, md.select(
        "manifest_sequence_number", "manifest_content")
        .distinct().collect())) == [(0, "DATA")]


# ---------------------------------------------------------------------------
# name mapping / column mapping (column_mapping.test, column_mapping_delete)
# ---------------------------------------------------------------------------

def test_column_mapping_nested(spark):
    """Files without parquet field-ids, nested struct/list/map columns,
    recorded under a RELATIVE path outside the table dir."""
    df = iceberg_scan(spark, f"{P}/column_mapping/warehouse/default.db/my_table")
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert [r.id for r in rows] == [1, 2, 3]
    assert [r.name for r in rows] == ["Alice", "Bob", "Charlie"]
    assert [r.age for r in rows] == [25, 30, 35]
    assert rows[0].scores == [85, 90]
    assert rows[1].scores == [78, 82, 88]
    assert rows[0].attributes["height"] == "5.5"  # map<string,string>
    assert rows[2].profile.email == "charlie@example.com"
    assert rows[2].profile.verified is True


NM_T1 = f"{P}/name_mapping/warehouse_1/mydb/t1"
NM_SNAP = 6597550917742534971


@pytest.mark.parametrize("version,where,expected", [
    ("3", "b IS NULL", 0),
    ("3", "b IS NOT NULL", 10000),
    ("3.1", "b IS NULL", 10000),     # b dropped from name-mapping
    ("3.2", "a IS NULL AND b IS NULL", 10000),  # all dropped
    ("4", "b IS NOT NULL", 10000),   # b dropped from schema, kept in mapping
    ("4.1", "b IS NULL", 10000),     # dropped from both
])
def test_name_mapping_versions(spark, version, where, expected):
    df = iceberg_scan(spark, NM_T1, version=version,
                      snapshot_id=NM_SNAP, where=where)
    assert df.count() == expected


def test_name_mapping_readd_column(spark):
    # 'b' deleted and re-added with a different field-id → NULL
    df = iceberg_scan(spark, NM_T1, version="7",
                      snapshot_id=2651609110244230974, where="b IS NULL")
    assert df.count() == 10000


def test_case_sensitive_names(spark):
    """Schema holds user_id AND uSeR_Id; second surfaces disambiguated
    (reference golden: uSeR_Id_1)."""
    path = (f"{P}/case_sensitive_names/default.db/case_sensitive_names/"
            "metadata/00001-a7a3a44c-4aac-4619-bebd-11be37b27351.metadata.json")
    df = iceberg_scan(spark, path)
    assert sorted(df.columns) == ["uSeR_Id_1", "user_id"]
    assert rows_of(df) == [(1, "user_1"), (2, "user_2"), (3, "user_3")]
    assert sorted(r.uSeR_Id_1 for r in df.collect()) == [
        "user_1", "user_2", "user_3"]


# ---------------------------------------------------------------------------
# initial defaults over all types (initial_default_all_types.test)
# ---------------------------------------------------------------------------

def test_initial_defaults_all_types(spark):
    path = (f"{P}/add_columns_with_defaults/default.db/add_columns_with_defaults/"
            "metadata/00003-3f1801a5-7dfb-4072-b14a-39cd12f9279b.metadata.json")
    df = iceberg_scan(spark, path)
    rows = sorted(df.collect(), key=lambda r: (r.col_boolean, r.col1 or ""))
    assert len(rows) == 3
    # two rows predate every added column → pure defaults
    defaulted = [r for r in rows if r.col_string == "HELLO"]
    assert len(defaulted) == 2
    d = defaulted[0]
    assert d.col_boolean is True
    assert d.col_integer == 342342
    assert d.col_long == -9223372036854775808
    assert d.col_float == pytest.approx(0.34234)
    assert d.col_double == pytest.approx(0.342343242342342)
    assert d.col_decimal == Decimal("12345.00")
    assert d.col_date == dt.date(2003, 10, 20)
    assert d.col_time == dt.time(0, 0, 0, 12345)  # real TimeType (r10)
    assert d.col_timestamp == dt.datetime(1970, 1, 1, 0, 0, 0, 12345)
    assert d.col_uuid == "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    assert d.col_fixed == b"\x01\x02\x03\xff\x03"
    assert d.col_binary == b"\x01\x02"
    # the later row carries real (non-default) written values
    w = [r for r in rows if r.col_string == "World"][0]
    assert w.col_integer == 453243
    assert w.col_decimal == Decimal("3423434.23")
    assert w.col_date == dt.date(11, 3, 5)


# ---------------------------------------------------------------------------
# moved tables / legacy DVs / map stats
# ---------------------------------------------------------------------------

def test_custom_write_paths(spark):
    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_metadata

    df = iceberg_scan(spark, f"{P}/custom_write_paths")
    assert df.count() == 0
    assert iceberg_metadata(spark, f"{P}/custom_write_paths").count() == 0


def test_legacy_bare_deletion_vector(spark):
    """V3 table whose DV file is a bare blob (no Puffin container); current
    manifest list carries a carried-forward V2 data manifest + V3 delete
    manifest."""
    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_metadata

    path = (f"{P}/legacy_bare_deletion_vector/warehouse/default/"
            "legacy_bare_deletion_vector")
    md = iceberg_metadata(spark, path)
    groups = sorted(map(tuple, md.groupBy("manifest_content", "content")
                        .count().collect()))
    assert groups == [("DATA", "DATA", 1), ("DELETE", "POSITION_DELETES", 1)]
    df = iceberg_scan(spark, path)
    assert rows_of(df) == [(1, "legacy"), (3, "legacy")]


def test_map_stats_moved_table(spark):
    """Table recorded under file://<relative> URIs with missing-map-bounds
    stats; must localize and read (missing_map_bounds.test)."""
    path = f"{P}/map_stats/default.db/map_stats"
    ver = "00002-0e059d4b-e5e8-41af-a763-76cbf3a3d0bc"
    df = iceberg_scan(spark, path, version=ver)
    rows = sorted(df.collect(), key=lambda r: r.timestamp)
    assert len(rows) == 2
    assert rows[0].timestamp == dt.datetime(2026, 1, 1, 0, 0)
    assert rows[0].metadata == {"key": "value1"}
    got = iceberg_scan(
        spark, path, version=ver,
        where="timestamp >= TIMESTAMP '2026-01-01' AND timestamp < TIMESTAMP '2026-01-02'")
    flt = [r for r in got.collect() if r.metadata.get("key") == "value1"]
    assert len(flt) == 1


# ---------------------------------------------------------------------------
# the last three foreign fixtures: struct defaults, error-path behavior
# ---------------------------------------------------------------------------

def test_initial_defaults_in_struct(spark):
    """Nested initial-defaults: columns added INSIDE a struct after the
    first write take their defaults for old rows (reference golden:
    initial_default_in_struct_all_types.test). Also the only foreign table
    with a uuid field nested in a struct — exercises the nested-uuid
    FIXED(16)->string read path."""
    path = (f"{P}/add_columns_with_defaults_in_struct/default.db/"
            "add_columns_with_defaults_in_struct/metadata/"
            "00003-21a957f9-c2ee-431a-9d18-bf257b561198.metadata.json")
    rows = sorted((r.a for r in iceberg_scan(spark, path).collect()),
                  key=lambda a: a.col_string)
    assert len(rows) == 2
    d = rows[0]  # pre-evolution row: every added struct member defaulted
    assert d.col_string == "HELLO" and d.col1 == "test"
    assert d.col_boolean is True
    assert d.col_integer == 342342
    assert d.col_long == -9223372036854775808
    assert d.col_float == pytest.approx(0.34234)
    assert d.col_double == pytest.approx(0.342343242342342)
    assert d.col_decimal == Decimal("12345.00")
    assert d.col_date == dt.date(2003, 10, 20)
    assert d.col_time == dt.time(0, 0, 0, 12345)  # real TimeType (r10)
    assert d.col_timestamp == dt.datetime(1970, 1, 1, 0, 0, 0, 12345)
    assert d.col_uuid == "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    assert d.col_fixed == b"\x01\x02\x03\xff\x03"
    assert d.col_binary == b"\x01\x02"
    w = rows[1]  # written row: real values, nullable members NULL
    assert w.col_string == "World"
    assert w.col_integer == 453243
    assert w.col_decimal == Decimal("3423434.23")
    assert w.col_date == dt.date(11, 3, 5)
    assert w.col_uuid is None and w.col_fixed is None
    assert w.col_binary == b"\x80\x00\x80"


def test_bad_data_clean_error(spark):
    """Feeding a non-metadata file (reference fixture bad_data/
    bad_iceberg_metadata.json — an NDJSON data file) must fail with a
    user-facing ValueError naming the path, not a bare JSON traceback."""
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    bad = f"{P}/bad_data/bad_iceberg_metadata.json"
    with pytest.raises(ValueError, match="bad_iceberg_metadata.json.*not Iceberg table metadata"):
        load_table_metadata(bad)
    with pytest.raises(ValueError, match="not Iceberg table metadata"):
        iceberg_scan(spark, bad)
    # a table dir with no metadata at all stays a clean FileNotFoundError
    with pytest.raises(FileNotFoundError):
        load_table_metadata(f"{P}/bad_data")


def test_big_query_error_table_reads(spark):
    """BigQuery-exported table whose Avro manifests carry no field-ids —
    the reference SKIPS its own test (big_query_read.test FIXME: 'the
    MultiFileReader doesn't forgive'); our manifest reader resolves Avro by
    name, so the table reads and matches the skipped test's golden."""
    df = iceberg_scan(spark, f"{P}/big_query_error")
    assert rows_of(df) == [
        (1, "Alice", dt.datetime(2024, 1, 1, 10, 0)),
        (2, "Bob", dt.datetime(2024, 2, 1, 11, 30)),
    ]
