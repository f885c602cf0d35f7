"""Write-Audit-Publish (r12): branch writes stage commits invisible to
main, fast_forward publishes them, rollback/set_current_snapshot manage
main's head. Spark procedure analogues: spark.wap.branch /
system.fast_forward / system.rollback_to_snapshot."""

import pytest

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.sources.ddl import (
    fast_forward,
    rollback_to_snapshot,
    set_current_snapshot,
)

from .conftest import load


def test_branch_write_stages_then_publishes(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_wap")
    write_iceberg(src, loc)
    main_before = load_table_metadata(loc).current_snapshot().snapshot_id

    # stage an append on the audit branch (auto-forks from main head)
    write_iceberg(src.filter("r_regionkey < 2"), loc, branch="audit")
    tm = load_table_metadata(loc)
    assert tm.current_snapshot().snapshot_id == main_before, \
        "main must not see staged work"
    assert iceberg_scan(spark, loc).count() == src.count()
    staged = iceberg_scan(spark, loc, ref="audit")
    assert staged.count() == src.count() + 2, "branch sees the staged rows"

    # a second staged append stacks on the branch head
    write_iceberg(src.filter("r_regionkey = 4"), loc, branch="audit")
    assert iceberg_scan(spark, loc, ref="audit").count() == src.count() + 3
    assert iceberg_scan(spark, loc).count() == src.count()

    # publish: fast-forward main to the audit head
    fast_forward(loc, "main", "audit")
    tm = load_table_metadata(loc)
    assert tm.current_snapshot().snapshot_id == \
        tm.refs["audit"]["snapshot-id"]
    assert iceberg_scan(spark, loc).count() == src.count() + 3

    # fast-forward refuses a non-linear move (audit is now AT main; a
    # bogus target behind it is not a descendant)
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward(loc, "audit", main_before)


def test_branch_overwrite_and_tag_guard(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark.sources.ddl import create_tag

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_wap_ow")
    write_iceberg(src, loc)
    write_iceberg(src.limit(1), loc, mode="overwrite", branch="fix")
    assert iceberg_scan(spark, loc, ref="fix").count() == 1
    assert iceberg_scan(spark, loc).count() == src.count()

    create_tag(loc, "v1")
    with pytest.raises(ValueError, match="tag, not a branch"):
        write_iceberg(src, loc, branch="v1")


def test_rollback_and_set_current(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_rb")
    write_iceberg(src, loc)
    s1 = load_table_metadata(loc).current_snapshot().snapshot_id
    write_iceberg(src.limit(2), loc)
    s2 = load_table_metadata(loc).current_snapshot().snapshot_id
    assert iceberg_scan(spark, loc).count() == src.count() + 2

    rollback_to_snapshot(loc, s1)
    assert load_table_metadata(loc).current_snapshot().snapshot_id == s1
    assert iceberg_scan(spark, loc).count() == src.count()

    # s2 is NOT an ancestor of s1 — rollback refuses, set_current allows
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_to_snapshot(loc, s2)
    set_current_snapshot(loc, s2)
    assert iceberg_scan(spark, loc).count() == src.count() + 2

    # timestamp log recorded the moves (last entry is s2)
    tm = load_table_metadata(loc)
    assert tm.snapshot_log[-1]["snapshot-id"] == s2


def test_branch_dml_stages_delete_update_merge(spark, sf_dir, tmp_path):
    """r12: DELETE/UPDATE/MERGE stage on a branch — main isolated until
    fast_forward, the branch stacks all three, publish lands the net."""
    from pyspark.sql import functions as F

    from duckdb_iceberg_spark.sources.dml import (
        delete_from,
        merge_into,
        update_iceberg,
    )

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t_wap_dml")
    write_iceberg(src, loc)

    delete_from(spark, loc, "n_nationkey < 5", mode="merge-on-read",
                branch="audit")
    update_iceberg(spark, loc, {"n_name": F.lit("fixed")},
                   where="n_nationkey = 10", branch="audit")
    upd = spark.createDataFrame([(24, "zz", 1)], src.schema)
    merge_into(spark, loc, upd, on="tgt.n_nationkey = src.n_nationkey",
               when_matched_update={"n_name": F.col("src.n_name")},
               when_not_matched_insert=True, branch="audit")

    # main untouched by all three
    assert iceberg_scan(spark, loc).count() == src.count()
    assert iceberg_scan(spark, loc).filter(
        "n_name IN ('fixed', 'zz')").count() == 0

    staged = iceberg_scan(spark, loc, ref="audit")
    assert staged.count() == src.count() - 5
    assert staged.filter("n_name = 'fixed'").count() == 1
    assert staged.filter("n_name = 'zz'").count() == 1  # matched update

    fast_forward(loc, "main", "audit")
    pub = iceberg_scan(spark, loc)
    assert pub.count() == src.count() - 5
    assert pub.filter("n_name = 'fixed'").count() == 1
