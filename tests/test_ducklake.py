"""iceberg_to_ducklake migration (SURVEY §2 #12; reference:
src/function/ducklake/iceberg_to_ducklake.cpp).

The conversion rewrites METADATA only: ducklake_* catalog tables in a
duckdb file point at the existing parquet. Checked here: every
historical snapshot's live file set survives migration (time travel),
tip row counts reconstruct from record/delete counts, schema evolution
becomes column versioning, partitions and values land, and equality
deletes refuse conversion like the reference.
"""

import os

import duckdb
import pytest

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.scan_plan import plan_scan
from duckdb_iceberg_spark.sources.ducklake import iceberg_to_ducklake


def _live_files(con, dl_snap):
    return sorted(r[0] for r in con.execute(
        "SELECT path FROM ducklake_data_file WHERE begin_snapshot <= ? "
        "AND (end_snapshot IS NULL OR end_snapshot > ?)",
        [dl_snap, dl_snap]).fetchall())


def test_history_survives_migration(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg(spark.range(100).selectExpr(
        "CAST(id AS INT) AS id", "concat('v', id) AS v"), loc)
    write_iceberg(spark.range(100, 200).selectExpr(
        "CAST(id AS INT) AS id", "concat('v', id) AS v"), loc)
    from duckdb_iceberg_spark.sources.dml import delete_from
    from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files

    delete_from(spark, loc, "id % 10 = 0", mode="merge-on-read")
    rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1)

    db = str(tmp_path / "lake.duckdb")
    summary = iceberg_to_ducklake({"t": loc}, db)
    con = duckdb.connect(db)

    tm = load_table_metadata(loc)
    for ice_id, dl_id in summary["tables"]["t"]["snapshot_map"].items():
        plan = plan_scan(tm, tm.snapshot_by_id(ice_id), None)
        assert _live_files(con, dl_id) == sorted(
            t.data_file.file_path for t in plan.tasks)

    total = con.execute("SELECT sum(record_count) FROM ducklake_data_file "
                        "WHERE end_snapshot IS NULL").fetchone()[0]
    deleted = con.execute(
        "SELECT coalesce(sum(delete_count), 0) FROM ducklake_delete_file "
        "WHERE end_snapshot IS NULL").fetchone()[0]
    assert total - deleted == iceberg_scan(spark, loc).count() == 180
    # every live delete file references a live data file
    dangling = con.execute("""
        SELECT count(*) FROM ducklake_delete_file dl
        WHERE dl.end_snapshot IS NULL AND NOT EXISTS (
            SELECT 1 FROM ducklake_data_file df
            WHERE df.data_file_id = dl.data_file_id
              AND df.end_snapshot IS NULL)""").fetchone()[0]
    assert dangling == 0


def test_schema_evolution_becomes_column_versions(spark, tmp_path):
    from duckdb_iceberg_spark.sources import ddl

    loc = str(tmp_path / "evo")
    write_iceberg(spark.createDataFrame(
        [(1, "a")], "id int, name string"), loc)
    ddl.add_column(loc, "score", "double")
    write_iceberg(spark.createDataFrame(
        [(2, "b", 0.5)], "id int, name string, score double"), loc)
    ddl.rename_column(loc, "name", "label")
    write_iceberg(spark.createDataFrame(
        [(3, "c", 1.5)], "id int, label string, score double"), loc)

    db = str(tmp_path / "evo.duckdb")
    iceberg_to_ducklake({"evo": loc}, db)
    con = duckdb.connect(db)
    cols = con.execute(
        "SELECT column_name, begin_snapshot, end_snapshot FROM "
        "ducklake_column ORDER BY column_id, begin_snapshot").fetchall()
    names = [c[0] for c in cols]
    assert "name" in names and "label" in names and "score" in names
    # the rename closed the old version and opened the new at one snapshot
    name_row = next(c for c in cols if c[0] == "name")
    label_row = next(c for c in cols if c[0] == "label")
    assert name_row[2] == label_row[1]  # end(name) == begin(label)
    # current view resolves to the renamed column
    tip = con.execute("SELECT max(snapshot_id) FROM ducklake_snapshot").fetchone()[0]
    live = {c[0] for c in cols if c[2] is None or c[2] > tip}
    assert live == {"id", "label", "score"}


def test_partition_values_land(spark, tmp_path):
    loc = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "A")], "id int, grp string")
    write_iceberg(df, loc, partition_by=["grp"])
    db = str(tmp_path / "part.duckdb")
    iceberg_to_ducklake({"part": loc}, db)
    con = duckdb.connect(db)
    pcols = con.execute("SELECT partition_key_index, transform FROM "
                        "ducklake_partition_column").fetchall()
    assert pcols == [(0, "identity")]
    vals = {r[0] for r in con.execute(
        "SELECT partition_value FROM ducklake_file_partition_value").fetchall()}
    assert vals == {"A", "B"}


def test_equality_deletes_refuse_conversion(spark, tmp_path):
    from duckdb_iceberg_spark.sources.dml import equality_delete

    loc = str(tmp_path / "eq")
    write_iceberg(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, v string"), loc)
    equality_delete(spark, loc,
                    spark.createDataFrame([(1,)], "id int"), ["id"])
    with pytest.raises(ValueError, match="equality deletes"):
        iceberg_to_ducklake({"eq": loc}, str(tmp_path / "eq.duckdb"))


def test_multi_table_and_skip(spark, tmp_path):
    loc_a = str(tmp_path / "a")
    loc_b = str(tmp_path / "b")
    write_iceberg(spark.range(5).selectExpr("CAST(id AS INT) AS id"), loc_a)
    write_iceberg(spark.range(7).selectExpr("CAST(id AS INT) AS id"), loc_b)
    db = str(tmp_path / "multi.duckdb")
    summary = iceberg_to_ducklake(
        {"a": loc_a, "b": loc_b, "c": loc_b}, db, skip_tables=["c"])
    assert set(summary["tables"]) == {"a", "b"}
    con = duckdb.connect(db)
    tables = {r[0] for r in con.execute(
        "SELECT table_name FROM ducklake_table").fetchall()}
    assert tables == {"a", "b"}
    # snapshot ids are globally unique and ordered
    snaps = [r[0] for r in con.execute(
        "SELECT snapshot_id FROM ducklake_snapshot ORDER BY snapshot_id").fetchall()]
    assert snaps == list(range(len(snaps)))


def test_migrated_catalog_queryable_with_plain_sql(spark, tmp_path):
    """The migrated catalog is usable by ANY engine with parquet + SQL —
    no ducklake extension needed: reconstruct the tip table state from
    ducklake_data_file / ducklake_delete_file with read_parquet and an
    anti-join on (path, rowid), and compare VALUES against iceberg_scan."""
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "q")
    write_iceberg(spark.range(50).selectExpr(
        "CAST(id AS INT) AS id", "concat('v', id) AS v"), loc)
    delete_from(spark, loc, "id % 5 = 0", mode="merge-on-read")

    db = str(tmp_path / "q.duckdb")
    iceberg_to_ducklake({"q": loc}, db)
    con = duckdb.connect(db)
    live = [r[0] for r in con.execute(
        "SELECT path FROM ducklake_data_file WHERE end_snapshot IS NULL").fetchall()]
    dels = [r[0] for r in con.execute(
        "SELECT path FROM ducklake_delete_file "
        "WHERE end_snapshot IS NULL AND format = 'parquet'").fetchall()]
    def lst(paths):
        return "[" + ", ".join("'" + p.replace("'", "''") + "'"
                               for p in paths) + "]"

    got = con.execute(f"""
        WITH rows_ AS (
          SELECT d.id, d.v, d.filename AS fp,
                 row_number() OVER (PARTITION BY d.filename ORDER BY d.file_row_number) - 1 AS pos
          FROM read_parquet({lst(live)}, filename=true, file_row_number=true) d
        ), dels AS (
          SELECT file_path AS fp, pos FROM read_parquet({lst(dels)})
        )
        SELECT r.id, r.v FROM rows_ r
        ANTI JOIN dels d ON r.fp = d.fp AND r.pos = d.pos
        ORDER BY id
    """).fetchall()
    want = sorted((r.id, r.v) for r in iceberg_scan(spark, loc).collect())
    assert got == want and len(got) == 40
