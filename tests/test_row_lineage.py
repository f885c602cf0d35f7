"""v3 row lineage: first-row-id assignment at commit, manifest/file
round-trip, reader-side inheritance, and the _row_id virtual column.

Reference behavior: test_row_lineage_*.test (row ids stable across scans,
next-row-id advances per commit by the added record count).
"""

import os

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
