"""Top-k scan-order tests (reference: iceberg_scan_order.cpp,
scan_order_limit_pruning.test)."""

from duckdb_iceberg_spark import write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.scan_order import topk_order_plan
from duckdb_iceberg_spark.plans.scan_plan import plan_scan
from duckdb_iceberg_spark.sources.scan import topk_scan


def _disjoint_table(spark, loc, files=8, rows_per=100):
    # each append = one file with a disjoint id range -> perfect bounds
    for i in range(files):
        write_iceberg(
            spark.range(i * rows_per, (i + 1) * rows_per)
            .selectExpr("id", "id * 2 AS v").coalesce(1), loc)


def test_topk_prunes_files_desc(spark, tmp_path):
    loc = str(tmp_path / "t")
    _disjoint_table(spark, loc)
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    assert len(plan.tasks) == 8

    top = topk_order_plan(plan, "id", 50, descending=True)
    assert top.stats["topk_files_kept"] == 1  # last file alone guarantees 50 rows
    assert top.tasks[0].data_file.record_count == 100

    top2 = topk_order_plan(plan, "id", 150, descending=True)
    assert top2.stats["topk_files_kept"] == 2

    got = [r.id for r in topk_scan(spark, loc, "id", 5).collect()]
    assert got == [799, 798, 797, 796, 795]


def test_topk_ascending(spark, tmp_path):
    loc = str(tmp_path / "t2")
    _disjoint_table(spark, loc)
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    top = topk_order_plan(plan, "id", 30, descending=False)
    assert top.stats["topk_files_kept"] == 1
    got = [r.id for r in topk_scan(spark, loc, "id", 3, descending=False).collect()]
    assert got == [0, 1, 2]


def test_topk_no_prune_with_deletes(spark, tmp_path):
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t3")
    _disjoint_table(spark, loc, files=4)
    delete_from(spark, loc, "id % 7 = 0", mode="merge-on-read")
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    top = topk_order_plan(plan, "id", 10, descending=True)
    # deletes disable pruning (record_count overcounts) but keep ordering
    assert top.stats["topk_files_kept"] == 4
    got = [r.id for r in topk_scan(spark, loc, "id", 4).collect()]
    assert got == [398, 397, 396, 395]  # 399 = 7*57 is deleted


def test_topk_non_numeric_column_falls_back(spark, tmp_path):
    loc = str(tmp_path / "t4")
    write_iceberg(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, s: string"), loc)
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    top = topk_order_plan(plan, "s", 1)
    assert "topk_files_kept" not in top.stats  # untouched plan
