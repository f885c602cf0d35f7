"""r11 parity batch: behaviors the reference pins in test files that had
no named twin here yet —

- IN-list partition pruning (test/sql/local/partitioning/in_filter.test:
  `l_shipmode IN ('RAIL','FOB')` over an identity-partitioned table plans
  exactly the matching partitions' data files)
- NULL identity-partition values end-to-end incl. DELETE WHERE col IS NULL
  (catalog_agnostic/delete/partitions/delete_null_partition.test)
- high-precision decimal identity partitions (partitioning/identity/
  identity_decimal_hugeint.test — 38-digit decimals survive the hive-dir
  encode/parse roundtrip and prune on equality)
- no-match DELETE is a 0-row no-op that leaves data intact
  (catalog_agnostic/delete/empty_delete.test, delete_from_empty_source.test)
- DELETE over truncate- and month-partitioned layouts rewrites only the
  matching partitions (delete_truncate_partitions.test,
  delete_temporal_transforms.test)
- a column added AFTER a snapshot is absent when time-traveling to it
  (alter_add_column_time_travel.test — snapshot schema-id resolution)
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.scan_plan import plan_scan

from .conftest import load


def test_in_list_partition_pruning(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "documents").select("doc_id", "source",
                                                  "n_chars")
    loc = str(tmp_path / "docs_by_source")
    write_iceberg(src, loc, partition_by=["source"])

    tm = load_table_metadata(loc)
    full = plan_scan(tm, tm.select_snapshot())
    pruned = plan_scan(tm, tm.select_snapshot(),
                       where="source IN ('src3', 'src7')")
    kept_parts = {t.data_file.partition.get("source") for t in pruned.tasks}
    assert kept_parts == {"src3", "src7"}
    assert 0 < len(pruned.tasks) < len(full.tasks)

    out = iceberg_scan(spark, loc, where="source IN ('src3', 'src7')")
    want = src.filter("source IN ('src3', 'src7')")
    assert out.count() == want.count()


def test_null_identity_partition_roundtrip_and_delete(spark, tmp_path):
    from duckdb_iceberg_spark.sources.dml import delete_from

    df = spark.createDataFrame(
        [(1, "A"), (2, None), (3, "B"), (4, None), (5, "C")],
        "id int, category string")
    loc = str(tmp_path / "null_part")
    write_iceberg(df, loc, partition_by=["category"])

    out = iceberg_scan(spark, loc)
    assert out.count() == 5
    assert out.filter("category IS NULL").count() == 2
    rows = {(r.id, r.category) for r in out.collect()}
    assert rows == {(1, "A"), (2, None), (3, "B"), (4, None), (5, "C")}

    delete_from(spark, loc, "category IS NULL", mode="copy-on-write")
    left = iceberg_scan(spark, loc)
    assert left.count() == 3
    assert left.filter("category IS NULL").count() == 0


def test_decimal_hugeint_identity_partition(spark, tmp_path):
    vals = [
        (Decimal("-1000000000000.00000000000000000001000"), 246802),
        (Decimal("-5432109876.10987654321098765432109"), 654321),
        (Decimal("3.14159265358979323846264"), 314159),
    ]
    df = spark.createDataFrame(vals, "partition_col decimal(38,23), user_id int")
    loc = str(tmp_path / "dec_part")
    write_iceberg(df, loc, partition_by=["partition_col"])

    out = iceberg_scan(spark, loc)
    got = {(r.partition_col, r.user_id) for r in out.collect()}
    assert got == set(vals)

    tm = load_table_metadata(loc)
    pruned = plan_scan(
        tm, tm.select_snapshot(),
        where="partition_col = CAST('3.14159265358979323846264'"
              " AS DECIMAL(38,23))")
    assert len(pruned.tasks) == 1
    hit = iceberg_scan(
        spark, loc,
        where="partition_col = CAST('3.14159265358979323846264'"
              " AS DECIMAL(38,23))")
    assert [r.user_id for r in hit.collect()] == [314159]


def test_empty_delete_is_noop(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark.sources.dml import delete_from

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "nation_nozap")
    write_iceberg(src, loc)
    tm0 = load_table_metadata(loc)
    n_snaps = len(tm0.snapshots)

    delete_from(spark, loc, "n_nationkey > 10000")
    tm1 = load_table_metadata(loc)
    # bounds prune every file -> no new snapshot, data intact
    assert len(tm1.snapshots) == n_snaps
    assert iceberg_scan(spark, loc).count() == src.count()


@pytest.mark.parametrize("spec,pred", [
    (["truncate(2, o_orderpriority)"], "o_orderpriority = '1-URGENT'"),
    (["month(o_orderdate)"],
     "o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-04-01'"),
])
def test_delete_on_transform_partitions(spark, sf_dir, tmp_path, spec, pred):
    from duckdb_iceberg_spark.sources.dml import delete_from

    src = load(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date"))
    loc = str(tmp_path / ("orders_" + spec[0].split("(")[0]))
    write_iceberg(src, loc, partition_by=spec)

    want_left = src.filter(f"NOT ({pred})").count()
    delete_from(spark, loc, pred, mode="copy-on-write")
    out = iceberg_scan(spark, loc)
    assert out.count() == want_left
    assert out.filter(pred).count() == 0


def test_added_column_absent_in_time_travel(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark.sources.ddl import add_column

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "region_tt")
    write_iceberg(src, loc)
    tm = load_table_metadata(loc)
    snap0 = tm.current_snapshot().snapshot_id

    add_column(loc, "status", "string", default="new")
    write_iceberg(src.withColumn("status", F.lit("later")), loc)

    now = iceberg_scan(spark, loc)
    assert "status" in now.columns
    past = iceberg_scan(spark, loc, snapshot_id=snap0)
    assert "status" not in past.columns
    assert past.count() == src.count()
