"""v3 row lineage: first-row-id assignment at commit, manifest/file
round-trip, reader-side inheritance, and the _row_id virtual column.

Reference behavior: test_row_lineage_*.test (row ids stable across scans,
next-row-id advances per commit by the added record count).
"""

import os

import pytest

from duckdb_iceberg_spark.metadata import manifest as mf
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

from tests.conftest import load


def _mk_entry(n_rows: int, status=mf.STATUS_ADDED, first_row_id=None,
              content=mf.CONTENT_DATA):
    return mf.ManifestEntry(
        status=status, snapshot_id=1, sequence_number=1,
        file_sequence_number=1,
        data_file=mf.DataFile(
            content=content, file_path=f"f{n_rows}.parquet",
            file_format="PARQUET", partition={}, record_count=n_rows,
            file_size_in_bytes=1, first_row_id=first_row_id,
        ),
    )


def test_inherit_first_row_ids_running_offsets():
    entries = [
        _mk_entry(5),                          # inherits 100
        _mk_entry(3, status=mf.STATUS_EXISTING, first_row_id=7),  # keeps 7
        _mk_entry(4),                          # inherits 105 (after the 5)
        _mk_entry(2, first_row_id=50),         # explicit value kept, no advance
        _mk_entry(6),                          # inherits 109 (5 + 4; explicit files don't advance)
    ]
    mf.inherit_first_row_ids(entries, 100)
    got = [e.data_file.first_row_id for e in entries]
    assert got == [100, 7, 105, 50, 109]
    # no manifest first_row_id -> no-op
    e2 = [_mk_entry(5)]
    mf.inherit_first_row_ids(e2, None)
    assert e2[0].data_file.first_row_id is None


def test_v3_commit_assigns_and_advances(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg

    loc = os.path.join(str(tmp_path), "lineage_v3")
    nat = load(spark, sf_dir, "nation")
    write_iceberg(nat, loc, format_version=3)
    tm = load_table_metadata(loc)
    snap1 = tm.current_snapshot()
    assert snap1.first_row_id == 0
    assert tm.next_row_id == 25

    write_iceberg(nat.limit(10), loc, format_version=3)
    tm = load_table_metadata(loc)
    snap2 = tm.current_snapshot()
    assert snap2.first_row_id == 25
    assert tm.next_row_id == 35

    df = iceberg_scan(spark, loc, with_row_lineage=True)
    rows = df.select("_row_id").collect()
    ids = sorted(r._row_id for r in rows)
    assert ids == list(range(35))  # dense, unique, stable across appends


def test_v2_commit_assigns_nothing(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import write_iceberg

    loc = os.path.join(str(tmp_path), "lineage_v2")
    write_iceberg(load(spark, sf_dir, "nation"), loc, format_version=2)
    tm = load_table_metadata(loc)
    assert tm.current_snapshot().first_row_id is None


def test_manifest_list_round_trips_first_row_id(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import write_iceberg

    loc = os.path.join(str(tmp_path), "lineage_ml")
    write_iceberg(load(spark, sf_dir, "region"), loc, format_version=3)
    tm = load_table_metadata(loc)
    mlist = mf.read_manifest_list(tm.current_snapshot().manifest_list)
    data_manifests = [m for m in mlist if m.content == mf.MANIFEST_DATA]
    assert data_manifests and all(m.first_row_id == 0 for m in data_manifests)
    entries = mf.read_manifest(data_manifests[0].manifest_path)
    firsts = [e.data_file.first_row_id for e in entries]
    assert None not in firsts  # explicit per-file values, not inheritance


def test_v2_to_v3_upgrade_mixed_delete_history(spark, tmp_path):
    """Mirror of the reference's test_upgrade_format_version_2_to_3.test:
    v2 table + parquet positional delete, upgrade via SET
    ('format-version'=3), first v3 commit retroactively assigns row ids to
    the carried v2 manifest (pre-upgrade rows keep their file positions),
    then a v3 DELETE writes a Puffin DV — BOTH delete mechanisms apply in
    one scan."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.ddl import set_table_properties, table_properties
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = os.path.join(str(tmp_path), "upgrade")
    rows = [(i, f"row_{i}") for i in range(10)]
    write_iceberg(spark.createDataFrame(rows, "id: int, val: string")
                  .coalesce(1), loc, format_version=2)
    delete_from(spark, loc, "id % 2 = 0", mode="merge-on-read")
    assert sorted(r.id for r in iceberg_scan(spark, loc).collect()) == [1, 3, 5, 7, 9]
    tm = load_table_metadata(loc)
    assert tm.format_version == 2 and tm.current_snapshot().first_row_id is None

    # upgrade through the properties surface (reference ALTER TABLE SET)
    set_table_properties(loc, {"format-version": "3"})
    tm = load_table_metadata(loc)
    assert tm.format_version == 3
    assert "format-version" not in table_properties(loc)  # not a plain prop
    with pytest.raises(ValueError, match="downgrade"):
        set_table_properties(loc, {"format-version": "2"})

    # first v3 commit: new rows continue AFTER the old file's 10 rows
    write_iceberg(spark.createDataFrame(
        [(10 + i, f"new_row_{i}") for i in range(5)], "id: int, val: string")
        .coalesce(1), loc)
    got = {r.id: r._row_id
           for r in iceberg_scan(spark, loc, with_row_lineage=True).collect()}
    assert {k: v for k, v in got.items() if k < 10} == {
        1: 1, 3: 3, 5: 5, 7: 7, 9: 9}  # retroactive: position in old file
    assert {k: v for k, v in got.items() if k >= 10} == {
        10: 10, 11: 11, 12: 12, 13: 13, 14: 14}

    # v3 DELETE writes a DV; the v2 parquet positional delete stays live
    delete_from(spark, loc, "id IN (10, 13)", mode="merge-on-read")
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    fmts = sorted((d.file_format or "").lower()
                  for t in plan.tasks for d in t.positional_deletes)
    assert "parquet" in fmts and "puffin" in fmts, fmts
    final = {r.id: r._row_id
             for r in iceberg_scan(spark, loc, with_row_lineage=True).collect()}
    assert sorted(final) == [1, 3, 5, 7, 9, 11, 12, 14]
    assert final[11] == 11 and final[3] == 3  # lineage survives the DV

    # time travel to the pre-upgrade snapshot: its manifests carry no
    # first_row_id, so _row_id is NULL — ids are NOT invented
    # retroactively for historical reads (reference:
    # test_row_lineage_read_from_upgraded.test shows NULL at every
    # pre-rewrite snapshot)
    tm2 = load_table_metadata(loc)
    v2_snap = min(tm2.snapshots, key=lambda s: s.timestamp_ms)
    old = iceberg_scan(spark, loc, snapshot_id=v2_snap.snapshot_id,
                       with_row_lineage=True).collect()
    assert sorted(r.id for r in old) == list(range(10))
    assert all(r._row_id is None for r in old)
    assert all(r._last_updated_sequence_number == 1 for r in old)
