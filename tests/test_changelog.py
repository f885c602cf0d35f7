"""Row-level changelog (CDC) scan between snapshots.

Semantics mirror Apache Iceberg's Spark changelog view: net inserts and
deletes per snapshot; an UPDATE surfaces as delete+insert at one
ordinal; compaction emits nothing.
"""

import os

from pyspark.sql import functions as F

from duckdb_iceberg_spark import write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.streaming.changelog import changelog_scan


def _snap_ids(loc):
    tm = load_table_metadata(loc)
    return [s.snapshot_id for s in tm.snapshots]


def test_changelog_insert_delete_update(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "cdc")
    write_iceberg(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"), loc)
    base = _snap_ids(loc)[-1]

    # snapshot 2: append
    write_iceberg(spark.createDataFrame([(4, "d")], "id int, v string"), loc)
    # snapshot 3: MoR delete of id=2
    from duckdb_iceberg_spark.sources.dml import delete_from, update_iceberg

    delete_from(spark, loc, "id = 2", mode="merge-on-read")
    # snapshot 4: CoW update of id=3
    update_iceberg(spark, loc, {"v": "upper(v)"}, "id = 3")

    out = changelog_scan(spark, loc, from_snapshot_id=base)
    rows = [(r.id, r.v, r._change_type, r._change_ordinal)
            for r in out.collect()]
    by_ord = {}
    for rid, v, kind, o in rows:
        by_ord.setdefault(o, set()).add((rid, v, kind))

    assert by_ord[0] == {(4, "d", "insert")}
    assert by_ord[1] == {(2, "b", "delete")}
    # the CoW update: old row out, new row in, same ordinal
    assert by_ord[2] == {(3, "c", "delete"), (3, "C", "insert")}


def test_changelog_skips_compaction(spark, tmp_path):
    from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files

    loc = os.path.join(str(tmp_path), "cdc2")
    write_iceberg(spark.range(5).selectExpr("CAST(id AS INT) AS id"), loc)
    base = _snap_ids(loc)[-1]
    write_iceberg(spark.range(5, 8).selectExpr("CAST(id AS INT) AS id"), loc)
    rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1)

    out = changelog_scan(spark, loc, from_snapshot_id=base)
    rows = [(r.id, r._change_type) for r in out.collect()]
    assert sorted(rows) == [(5, "insert"), (6, "insert"), (7, "insert")]


def test_changelog_ordinal_skips_compaction(spark, tmp_path):
    """Upstream-parity ordinal convention (BaseIncrementalChangelogScan
    filters REPLACE snapshots before computeSnapshotOrdinals): a compaction
    inside the range emits no rows AND consumes no ordinal, so the insert
    after it sits at ordinal 1, exactly as Spark's create_changelog_view
    would emit."""
    from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files

    loc = os.path.join(str(tmp_path), "cdc_ord")
    write_iceberg(spark.range(3).selectExpr("CAST(id AS INT) AS id"), loc)
    base = _snap_ids(loc)[-1]
    write_iceberg(spark.range(3, 5).selectExpr("CAST(id AS INT) AS id"), loc)  # ord 0
    rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1)        # no ord
    write_iceberg(spark.range(5, 6).selectExpr("CAST(id AS INT) AS id"), loc)  # ord 1

    out = changelog_scan(spark, loc, from_snapshot_id=base)
    got = {(r.id, r._change_type, r._change_ordinal) for r in out.collect()}
    assert got == {(3, "insert", 0), (4, "insert", 0), (5, "insert", 1)}


def test_changelog_equality_delete(spark, tmp_path):
    from duckdb_iceberg_spark.sources.dml import equality_delete

    loc = os.path.join(str(tmp_path), "cdc3")
    write_iceberg(spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id int, v string"), loc)
    base = _snap_ids(loc)[-1]
    equality_delete(spark, loc,
                    spark.createDataFrame([(2,)], "id int"), ["id"])

    out = changelog_scan(spark, loc, from_snapshot_id=base)
    rows = [(r.id, r.v, r._change_type) for r in out.collect()]
    assert rows == [(2, "y", "delete")]


def test_changelog_empty_range(spark, tmp_path):
    loc = os.path.join(str(tmp_path), "cdc4")
    write_iceberg(spark.range(3).selectExpr("CAST(id AS INT) AS id"), loc)
    tip = _snap_ids(loc)[-1]
    out = changelog_scan(spark, loc, from_snapshot_id=tip)
    assert out.count() == 0
    assert "_change_type" in out.columns
