"""Distributed manifest pruning must agree exactly with the driver planner."""

from duckdb_iceberg_spark import write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.distributed_planner import plan_scan_distributed
from duckdb_iceberg_spark.plans.scan_plan import plan_scan
from duckdb_iceberg_spark.sources.scan import scan_to_dataframe


def _many_manifest_table(spark, loc, appends=12):
    # each append writes one manifest; ids are range-partitioned so file
    # bounds make predicates selective
    for i in range(appends):
        write_iceberg(
            spark.range(i * 100, (i + 1) * 100).selectExpr("id", "id % 7 AS k")
            .coalesce(1), loc)


def _file_sets(plan):
    return {t.data_file.file_path for t in plan.tasks}


def test_distributed_matches_driver_planner(spark, tmp_path):
    loc = str(tmp_path / "t")
    _many_manifest_table(spark, loc)
    tm = load_table_metadata(loc)
    snap = tm.select_snapshot()

    for where in [None, "id >= 800", "id BETWEEN 250 AND 450"]:
        driver = plan_scan(tm, snap, where)
        dist = plan_scan_distributed(spark, tm, snap, where, manifest_threshold=4)
        assert dist.stats["distributed_manifests"] >= 4
        assert _file_sets(dist) == _file_sets(driver), where

    dist = plan_scan_distributed(spark, tm, snap, "id >= 800", manifest_threshold=4)
    assert len(dist.tasks) == 4  # files 800-1199 only
    got = sorted(r.id for r in scan_to_dataframe(spark, dist).collect())
    assert got == list(range(800, 1200))


def test_distributed_fallback_below_threshold(spark, tmp_path):
    loc = str(tmp_path / "t2")
    _many_manifest_table(spark, loc, appends=3)
    tm = load_table_metadata(loc)
    snap = tm.select_snapshot()
    plan = plan_scan_distributed(spark, tm, snap, None, manifest_threshold=64)
    assert "distributed_manifests" not in plan.stats  # driver path used
    assert len(plan.tasks) == 3


def test_distributed_with_deletes(spark, tmp_path):
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t3")
    _many_manifest_table(spark, loc, appends=8)
    delete_from(spark, loc, "k = 2", mode="merge-on-read")
    tm = load_table_metadata(loc)
    snap = tm.select_snapshot()
    dist = plan_scan_distributed(spark, tm, snap, None, manifest_threshold=4)
    assert any(t.positional_deletes for t in dist.tasks)
    got = sorted(r.id for r in scan_to_dataframe(spark, dist).collect())
    assert got == [i for i in range(800) if i % 7 != 2]
