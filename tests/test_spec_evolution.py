"""Partition-spec and sort-order evolution (reference: SET PARTITIONED BY
iceberg_schema_entry.cpp:388, SET SORTED BY :399): new writes use the new
layout while existing files keep their original spec; scans plan both."""

import os

from tests.conftest import load


def test_set_partitioned_by_evolves_spec(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.ddl import set_partitioned_by

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t")
    write_iceberg(src.where("n_nationkey < 10"), loc)  # unpartitioned
    set_partitioned_by(loc, ["n_regionkey"])
    write_iceberg(src.where("n_nationkey >= 10"), loc)

    tm = load_table_metadata(loc)
    assert len(tm.partition_specs) == 2
    assert tm.default_spec().fields[0].transform == "identity"

    # full scan still returns everything across both specs
    got = iceberg_scan(spark, loc).orderBy("n_nationkey").collect()
    want = src.orderBy("n_nationkey").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]

    # new-spec files are hive-partitioned on the raw column
    newdirs = [d for root, dirs, _ in os.walk(os.path.join(loc, "data"))
               for d in dirs if d.startswith("n_regionkey=")]
    assert newdirs

    # pruning applies per-file: new-spec files narrow to the matching
    # partition, old-spec files are conservatively kept
    plan_all = plan_scan(tm, tm.select_snapshot())
    plan_one = plan_scan(tm, tm.select_snapshot(), "n_regionkey = 1")
    assert len(plan_one.tasks) < len(plan_all.tasks)
    rows = iceberg_scan(spark, loc, where="n_regionkey = 1").collect()
    assert {r.n_regionkey for r in rows} == {1}
    assert len(rows) == src.where("n_regionkey = 1").count()


def test_set_partitioned_by_reuses_identical_spec(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.ddl import set_partitioned_by

    loc = str(tmp_path / "t")
    write_iceberg(load(spark, sf_dir, "region"), loc,
                  partition_by=["r_regionkey"])
    before = load_table_metadata(loc)
    set_partitioned_by(loc, ["r_regionkey"])
    after = load_table_metadata(loc)
    assert len(after.partition_specs) == len(before.partition_specs)
    assert after.default_spec_id == before.default_spec_id


def test_set_sorted_by_applies_to_new_writes(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.ddl import set_sorted_by

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t")
    write_iceberg(src.where("n_nationkey < 10"), loc)
    set_sorted_by(loc, [("n_name", "desc")])

    tm = load_table_metadata(loc)
    assert tm.default_sort_order().fields[0].direction == "desc"

    before = {os.path.join(r, n) for r, _, ns in os.walk(os.path.join(loc, "data"))
              for n in ns if n.endswith(".parquet")}
    write_iceberg(src.where("n_nationkey >= 10").coalesce(1), loc)
    after = {os.path.join(r, n) for r, _, ns in os.walk(os.path.join(loc, "data"))
             for n in ns if n.endswith(".parquet")}
    [newfile] = sorted(after - before)
    names = pq.read_table(newfile, columns=["n_name"])["n_name"].to_pylist()
    assert names == sorted(names, reverse=True)


def test_set_sorted_by_empty_unsorts(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.ddl import set_sorted_by

    loc = str(tmp_path / "t")
    write_iceberg(load(spark, sf_dir, "region"), loc,
                  sort_by=[("r_name", "asc")])
    assert load_table_metadata(loc).default_sort_order().fields
    set_sorted_by(loc, [])
    assert not load_table_metadata(loc).default_sort_order().fields


def test_tags_and_branches(spark, sf_dir, tmp_path):
    """Snapshot refs: tag a snapshot, append more data, scan by ref name
    (metadata ``refs`` map; scans resolve branch/tag → snapshot-id)."""
    import pytest

    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import create_branch, create_tag, drop_ref

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t")
    write_iceberg(src.where("n_nationkey < 10"), loc)
    create_tag(loc, "v1")
    create_branch(loc, "audit")
    write_iceberg(src.where("n_nationkey >= 10"), loc)

    assert iceberg_scan(spark, loc).count() == src.count()
    assert iceberg_scan(spark, loc, ref="v1").count() == 10
    assert iceberg_scan(spark, loc, ref="audit").count() == 10
    assert iceberg_scan(spark, loc, ref="main").count() == src.count()

    drop_ref(loc, "v1")
    with pytest.raises(KeyError):
        iceberg_scan(spark, loc, ref="v1")
    with pytest.raises(ValueError):
        drop_ref(loc, "main")


def test_delete_after_partition_spec_evolution(spark, sf_dir, tmp_path):
    """DELETE on a table whose partition spec evolved mid-history
    (reference: delete/partitions/delete_after_partition_spec_evolution.test):
    the delete must hit matching rows in files written under BOTH specs —
    merge-on-read positional deletes carry the right per-file spec, and the
    delete-apply anti-join removes rows regardless of which spec's layout
    their data file uses."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.ddl import set_partitioned_by
    from duckdb_iceberg_spark.sources.dml import delete_from

    src = load(spark, sf_dir, "nation")
    for mode in ("merge-on-read", "copy-on-write"):
        loc = str(tmp_path / f"t_{mode}")
        write_iceberg(src.where("n_nationkey < 10"), loc)   # spec 0: none
        set_partitioned_by(loc, ["n_regionkey"])
        write_iceberg(src.where("n_nationkey >= 10"), loc)  # spec 1

        # n_regionkey = 1 rows exist on both sides of the spec change
        assert src.where("n_regionkey = 1 AND n_nationkey < 10").count() > 0
        assert src.where("n_regionkey = 1 AND n_nationkey >= 10").count() > 0
        delete_from(spark, loc, "n_regionkey = 1", mode=mode)

        got = iceberg_scan(spark, loc)
        assert got.where("n_regionkey = 1").count() == 0
        want = src.where("n_regionkey <> 1").orderBy("n_nationkey").collect()
        assert [r.asDict() for r in got.orderBy("n_nationkey").collect()] == \
            [r.asDict() for r in want]
        if mode == "merge-on-read":
            tm = load_table_metadata(loc)
            assert len(tm.partition_specs) == 2  # deletes didn't fork a spec


def test_sort_order_transform_day_nulls_last(spark, tmp_path):
    """Mirrors the reference's sorting/day suite (day_timestamp.test):
    ALTER ... SET SORTED BY (day(ts) ASC NULLS LAST, id ASC NULLS LAST)
    records the transform in the sort order and new files come back
    day-bucket-ordered with ties in id order and null timestamps LAST —
    sorting the raw timestamp instead of the day transform would
    over-order inside a day and diverge from the reference's file
    contents."""
    import datetime as dt

    import pyarrow.parquet as pq

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(0, dt.datetime(2020, 1, 1))],
                              "id long, ts timestamp"), loc)
    register_table(spark, "sort_day_t", loc)
    execute_sql(
        spark,
        "ALTER TABLE sort_day_t SET SORTED BY "
        "(day(ts) ASC NULLS LAST, id ASC NULLS LAST)")

    order = load_table_metadata(loc).default_sort_order()
    assert [(f.transform, f.direction, f.null_order) for f in order.fields] \
        == [("day", "asc", "nulls-last"), ("identity", "asc", "nulls-last")]

    # same-day rows arrive id-descending; a raw-ts sort would put id=4
    # (09:00) before id=3 (10:00) — the day transform must tie them and
    # fall through to id
    rows = [
        (4, dt.datetime(2020, 2, 2, 9, 0)),
        (2, dt.datetime(2020, 1, 31, 5, 0)),
        (3, dt.datetime(2020, 2, 2, 10, 0)),
        (6, None),
        (1, dt.datetime(2020, 1, 4, 3, 0)),
    ]
    before = {os.path.join(r, n)
              for r, _, ns in os.walk(os.path.join(loc, "data"))
              for n in ns if n.endswith(".parquet")}
    write_iceberg(
        spark.createDataFrame(rows, "id long, ts timestamp").coalesce(1), loc)
    after = {os.path.join(r, n)
             for r, _, ns in os.walk(os.path.join(loc, "data"))
             for n in ns if n.endswith(".parquet")}
    [newfile] = sorted(after - before)
    assert pq.read_table(newfile, columns=["id"])["id"].to_pylist() \
        == [1, 2, 3, 4, 6]


def test_sql_set_partitioned_by_transform(spark, tmp_path):
    """SET PARTITIONED BY through the SQL router with a transform
    expression: the new spec carries bucket[4] and subsequent writes lay
    out under it."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "t")
    write_iceberg(spark.range(20).selectExpr("id", "id % 3 AS k"), loc)
    register_table(spark, "spec_sql_t", loc)
    execute_sql(spark, "ALTER TABLE spec_sql_t SET PARTITIONED BY (bucket(4, id))")
    spec = load_table_metadata(loc).default_spec()
    assert [f.transform for f in spec.fields] == ["bucket[4]"]
