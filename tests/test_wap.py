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


def test_cherrypick_publishes_single_staged_snapshot(spark, sf_dir, tmp_path):
    """r13 cherrypick_snapshot: publish ONE staged (wap.id-tagged) append
    onto a main head that has already MOVED since the stage — the case
    fast_forward refuses (non-linear). The pick commits a NEW snapshot
    whose summary records source-snapshot-id and inherits wap.id."""
    from duckdb_iceberg_spark.sources.ddl import cherrypick_snapshot

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t_pick")
    write_iceberg(src.filter("n_nationkey < 10"), loc)

    # stage on a branch with a WAP id
    write_iceberg(src.filter("n_nationkey >= 20"), loc, branch="audit",
                  snapshot_properties={"wap.id": "job-42"})
    staged = load_table_metadata(loc).refs["audit"]["snapshot-id"]

    # main moves on independently — fast_forward is now impossible
    write_iceberg(src.filter("n_nationkey >= 10 AND n_nationkey < 20"), loc)
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward(loc, "main", "audit")

    tm = cherrypick_snapshot(loc, staged)
    picked = tm.current_snapshot()
    assert picked.summary["source-snapshot-id"] == str(staged)
    assert picked.summary["wap.id"] == "job-42"
    got = sorted(r.n_nationkey
                 for r in iceberg_scan(spark, loc).collect())
    assert got == sorted(r.n_nationkey for r in src.collect())

    # duplicate-WAP guard: picking the same staged snapshot again refuses
    with pytest.raises(ValueError, match="already published"):
        cherrypick_snapshot(loc, staged)


def test_cherrypick_refusals(spark, sf_dir, tmp_path):
    """Ancestor snapshots and non-append operations refuse, like
    Iceberg's CherrypickAncestorCommitException / operation guard."""
    from duckdb_iceberg_spark.sources.ddl import cherrypick_snapshot
    from duckdb_iceberg_spark.sources.dml import delete_from

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_pick_refuse")
    write_iceberg(src, loc)
    first = load_table_metadata(loc).current_snapshot().snapshot_id
    write_iceberg(src.limit(1), loc)

    with pytest.raises(ValueError, match="already an ancestor"):
        cherrypick_snapshot(loc, first)

    # a staged DELETE (overwrite/delete operation) cannot cherry-pick
    delete_from(spark, loc, "r_regionkey = 0", branch="fixup")
    staged = load_table_metadata(loc).refs["fixup"]["snapshot-id"]
    with pytest.raises(ValueError, match="only append"):
        cherrypick_snapshot(loc, staged)


def test_cherrypick_call_surface(spark, sf_dir, tmp_path):
    """CALL cherrypick_snapshot(...) routes through execute_sql."""
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_pick_sql")
    write_iceberg(src.filter("r_regionkey < 3"), loc)
    write_iceberg(src.filter("r_regionkey >= 3"), loc, branch="audit")
    staged = load_table_metadata(loc).refs["audit"]["snapshot-id"]
    write_iceberg(src.limit(0), loc)  # main moves (empty commit)

    register_table(spark, "picktab", loc)
    execute_sql(spark,
                f"CALL cherrypick_snapshot('picktab', {staged})")
    assert spark.sql("SELECT count(*) c FROM picktab").first().c == \
        src.count()


def test_cherrypick_partitioned_roundtrip(spark, sf_dir, tmp_path):
    """Cherry-picked DataFiles re-encode their PARTITION values through
    the manifest writer — a decode/encode mismatch would mis-bucket or
    crash; partition pruning must still work on the picked commit."""
    from duckdb_iceberg_spark.sources.ddl import cherrypick_snapshot

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t_pick_part")
    write_iceberg(src.filter("n_regionkey < 2"), loc,
                  partition_by=["n_regionkey"])
    write_iceberg(src.filter("n_regionkey BETWEEN 2 AND 3"), loc,
                  branch="audit")
    staged = load_table_metadata(loc).refs["audit"]["snapshot-id"]
    write_iceberg(src.filter("n_regionkey = 4"), loc)

    cherrypick_snapshot(loc, staged)
    got = sorted(r.n_nationkey for r in iceberg_scan(spark, loc).collect())
    assert got == sorted(r.n_nationkey for r in src.collect())
    # partition pruning reaches the picked files
    from duckdb_iceberg_spark.metadata.table_metadata import (
        load_table_metadata as _lt,
    )
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    tm = _lt(loc)
    plan = plan_scan(tm, tm.select_snapshot(), where="n_regionkey = 2")
    assert plan.tasks and all(
        t.data_file.partition.get("n_regionkey") == 2 for t in plan.tasks)
