"""Dynamic file-list re-pruning from a join build side
(reference: IcebergMultiFileList::DynamicFilterPushdown,
src/planning/iceberg_multi_file_list.cpp:243-273)."""

import os

from pyspark.sql import functions as F

from tests.conftest import load


def test_runtime_filter_prunes_files(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, scan_with_runtime_filter, write_iceberg

    loc = os.path.join(str(tmp_path), "supplier_bucketed")
    write_iceberg(load(spark, sf_dir, "supplier"), loc,
                  partition_by=["bucket(8, s_suppkey)"])
    full = iceberg_scan(spark, loc)
    n_full = len(full.inputFiles())
    assert n_full >= 4  # bucketed into multiple files

    dim = spark.createDataFrame([(1,), (5,)], "s_suppkey long")
    pruned = scan_with_runtime_filter(spark, loc, dim, "s_suppkey")
    n_pruned = len(pruned.inputFiles())
    assert n_pruned < n_full  # the point: fewer files planned in

    got = sorted(r.s_suppkey for r in
                 pruned.join(dim.withColumnRenamed("s_suppkey", "k"),
                             F.col("s_suppkey") == F.col("k")).collect())
    assert got == [1, 5]


def test_runtime_filter_range_fallback(spark, sf_dir, tmp_path):
    """Past max_in_keys the filter degrades to the build side's min/max
    range — still correct, still a valid pruning predicate."""
    from duckdb_iceberg_spark import scan_with_runtime_filter, write_iceberg

    loc = os.path.join(str(tmp_path), "nation_plain")
    write_iceberg(load(spark, sf_dir, "nation"), loc)
    dim = spark.range(3, 7).select(F.col("id").alias("n_nationkey"))
    df = scan_with_runtime_filter(spark, loc, dim, "n_nationkey",
                                  max_in_keys=2)
    got = sorted(r.n_nationkey for r in df.collect())
    assert got == [3, 4, 5, 6]


def test_runtime_filter_empty_build_side(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import scan_with_runtime_filter, write_iceberg

    loc = os.path.join(str(tmp_path), "region_plain")
    write_iceberg(load(spark, sf_dir, "region"), loc)
    dim = spark.createDataFrame([], "r_regionkey long")
    df = scan_with_runtime_filter(spark, loc, dim, "r_regionkey")
    # no keys -> conservative full scan (correctness over pruning)
    assert df.count() == 5


def test_runtime_filter_string_keys_and_extra_where(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import scan_with_runtime_filter, write_iceberg

    loc = os.path.join(str(tmp_path), "nation_str")
    write_iceberg(load(spark, sf_dir, "nation"), loc)
    # NATION_3 is in region 3 (filtered out); O'HARA exercises quote
    # escaping through BOTH the pruning parser and Spark's residual filter
    dim = spark.createDataFrame([("NATION_1",), ("NATION_6",), ("NATION_3",),
                                 ("O'HARA",)], "n_name string")
    df = scan_with_runtime_filter(spark, loc, dim, "n_name",
                                  where="n_regionkey = 1")
    got = sorted(r.n_name for r in df.collect())
    assert got == ["NATION_1", "NATION_6"]
