"""The reference's pass/fail-shaped scalability benchmarks, built at
reference cardinality and asserted on plan shape, not just answers:

- benchmark/file_pruning_benchmarks/
  prune_positional_deletes_from_unread_partitions.benchmark:1-55 —
  365 day-partitions, merge-on-read delete leaves one positional delete
  file per partition; a single-day scan may read exactly ONE delete file.
- benchmark/metadata_late_materialization/four_partitions.benchmark:1-36 —
  256-manifest table, `partition_id BETWEEN 252 AND 255` parses only the
  four matching manifests.
- benchmark/file_pruning_benchmarks/prune_equality_deletes.benchmark —
  equality-delete files whose key bounds cannot satisfy the scan
  predicate are pruned from the plan.

These guard the "wrong-shaped even if right-answered" regression class:
a plan that opens all 365 delete files or all 256 manifests still returns
correct rows at test scale but collapses at 100 TB.
"""
from __future__ import annotations

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.scan_plan import plan_scan
from duckdb_iceberg_spark.sources.dml import delete_from


def test_prune_positional_deletes_from_unread_partitions(spark, tmp_path):
    """365 day-partitions x 10 rows; MoR DELETE id=0 writes one positional
    delete file per partition (365 total). Scanning one day plans exactly
    1 data file with exactly 1 delete file attached — the other 364 delete
    files are never opened (reference expects result 999 of 1000/partition;
    here 9 of 10)."""
    loc = str(tmp_path / "t")
    df = spark.range(3650).selectExpr(
        "id % 10 AS id",
        "concat('e', CAST(id AS STRING)) AS event",
        "date_add(DATE'2024-01-01', CAST(id / 10 AS INT)) AS event_date",
    )
    write_iceberg(df, loc, partition_by=["day(event_date)"], format_version=2)
    delete_from(spark, loc, "id = 0", mode="merge-on-read")

    tm = load_table_metadata(loc)
    # fixture shape: 365 data files, one per day; 365 per-file delete files
    full = plan_scan(tm, tm.select_snapshot(), None)
    all_deletes = {d.file_path for t in full.tasks for d in t.positional_deletes}
    assert len(full.tasks) == 365
    assert len(all_deletes) == 365
    assert all(len(t.positional_deletes) == 1 for t in full.tasks)

    # the timed query's shape: 1 data file, 1 delete file
    plan = plan_scan(tm, tm.select_snapshot(),
                     "event_date = DATE '2024-01-01'")
    assert len(plan.tasks) == 1
    day_deletes = {d.file_path for t in plan.tasks
                   for d in t.positional_deletes}
    assert len(day_deletes) == 1, (
        f"{len(day_deletes)} delete files planned for a single-day scan — "
        "positional deletes from unread partitions are not pruned")
    assert plan.stats["files_pruned"] + len(plan.tasks) == 365

    got = iceberg_scan(spark, loc,
                       where="event_date = DATE '2024-01-01'")
    assert got.count() == 9  # the reference's 999, at 10 rows/partition
    assert got.filter("id = 0").count() == 0


def test_metadata_late_materialization_four_of_256_manifests(spark, tmp_path):
    """256 manifests (one per identity partition); `partition_id BETWEEN
    252 AND 255` must PARSE only the 4 matching manifests — the other 252
    are pruned from the manifest-list field summaries before any Avro read
    (manifests_pruned counts manifests skipped pre-parse)."""
    from duckdb_iceberg_spark.sources.maintenance import rewrite_manifests

    loc = str(tmp_path / "t")
    df = spark.range(256 * 8).selectExpr(
        "CAST(id % 256 AS INT) AS partition_id",
        "id * 11 AS payload",
    )
    write_iceberg(df, loc, partition_by=["partition_id"])
    # explode the single append manifest into one manifest per entry:
    # each manifest's field summary then covers exactly one partition
    out = rewrite_manifests(loc, target_entries_per_manifest=1,
                            min_input_manifests=1)
    assert out["new_manifests"] == 256

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot(),
                     "partition_id BETWEEN 252 AND 255")
    assert plan.stats["manifests_total"] == 256
    assert plan.stats["manifests_pruned"] == 252, (
        f"only {plan.stats['manifests_pruned']} of 252 non-matching "
        "manifests were pruned before parsing")
    assert len(plan.tasks) == 4

    got = iceberg_scan(spark, loc,
                       where="partition_id BETWEEN 252 AND 255")
    expected = sum(i * 11 for i in range(256 * 8) if 252 <= i % 256 <= 255)
    assert got.agg({"payload": "sum"}).first()[0] == expected


def test_prune_equality_deletes_outside_scan_predicate(spark, tmp_path):
    """benchmark/file_pruning_benchmarks/prune_equality_deletes.benchmark:
    equality deletes on id IN (1,2,3,10,20); a scan WHERE id = 50 cannot
    select any row those deletes remove, so the delete file must be pruned
    from the plan (never opened); a scan inside the deleted range still
    applies it."""
    from duckdb_iceberg_spark.sources.dml import equality_delete

    loc = str(tmp_path / "t")
    df = spark.range(9000).selectExpr(
        "id % 1000 AS id", "concat('e', CAST(id AS STRING)) AS event")
    write_iceberg(df, loc)
    keys = spark.createDataFrame([(1,), (2,), (3,), (10,), (20,)], "id long")
    equality_delete(spark, loc, keys, ["id"])

    tm = load_table_metadata(loc)
    plan_out = plan_scan(tm, tm.select_snapshot(), "id = 50")
    assert all(not t.equality_deletes for t in plan_out.tasks), (
        "equality-delete file attached to a scan whose predicate cannot "
        "select any deleted row")
    plan_in = plan_scan(tm, tm.select_snapshot(), "id = 2")
    assert any(t.equality_deletes for t in plan_in.tasks)

    assert iceberg_scan(spark, loc, where="id = 50").count() == 9
    assert iceberg_scan(spark, loc, where="id = 2").count() == 0
    assert iceberg_scan(spark, loc).count() == 9000 - 5 * 9


def test_non_monotone_filter_does_not_prune(spark, tmp_path):
    """reads/filter_pushdown_non_monotone.test (duckdb/duckdb-iceberg#1052):
    a filter whose column side is not a direct column reference (pk % 8 = 2)
    must not be used for stats-based file pruning — folding the bounds
    [0, 49] through % 8 gives [0, 1], which would wrongly prune residues
    2..7. The predicate parser is conservative (unknown expressions parse
    to None → no pruning), pinned here."""
    from duckdb_iceberg_spark.plans.predicates import parse_where

    assert parse_where("pk % 8 = 2") is None

    loc = str(tmp_path / "nonmono")
    write_iceberg(spark.range(50).selectExpr("CAST(id AS INT) AS pk"), loc)
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot(), "pk % 8 = 2")
    assert len(plan.tasks) == len(plan_scan(tm, tm.select_snapshot(), None).tasks)
    assert iceberg_scan(spark, loc, where="pk % 8 = 2").count() == 6
    assert iceberg_scan(spark, loc, where="pk % 8 = 7").count() == 6
    assert iceberg_scan(spark, loc, where="pk % 8 = 0").count() == 7
    # direct-reference comparisons keep pruning soundly
    assert iceberg_scan(spark, loc, where="pk = 4").count() == 1


def test_prune_deletion_vectors_from_unread_partitions(spark, tmp_path):
    """The v3 analogue of the positional-delete pruning benchmark: the
    round-6 executor-side DV writer emits one Puffin file per affected
    data file, so a 365-partition MoR DELETE leaves 365 DV files — and a
    single-day scan may plan exactly ONE of them (file-level pruning plus
    referenced_data_file matching, never a whole-table DV read)."""
    loc = str(tmp_path / "t_dv")
    df = spark.range(3650).selectExpr(
        "id % 10 AS id",
        "concat('e', CAST(id AS STRING)) AS event",
        "date_add(DATE'2024-01-01', CAST(id / 10 AS INT)) AS event_date",
    )
    write_iceberg(df, loc, partition_by=["day(event_date)"], format_version=3)
    delete_from(spark, loc, "id = 0", mode="merge-on-read")

    tm = load_table_metadata(loc)
    full = plan_scan(tm, tm.select_snapshot(), None)
    dv_paths = {d.file_path for t in full.tasks for d in t.positional_deletes
                if (d.file_format or "").lower() == "puffin"}
    assert len(full.tasks) == 365
    assert len(dv_paths) == 365, "expected one Puffin DV per data file"
    assert all(len(t.positional_deletes) == 1 for t in full.tasks)

    plan = plan_scan(tm, tm.select_snapshot(),
                     "event_date = DATE '2024-01-01'")
    assert len(plan.tasks) == 1
    day_dvs = {d.file_path for t in plan.tasks for d in t.positional_deletes}
    assert len(day_dvs) == 1, (
        f"{len(day_dvs)} DV files planned for a single-day scan — deletion "
        "vectors from unread partitions are not pruned")
    assert plan.stats["files_pruned"] + len(plan.tasks) == 365

    got = iceberg_scan(spark, loc, where="event_date = DATE '2024-01-01'")
    assert got.count() == 9
    assert got.filter("id = 0").count() == 0


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE finalizes the join strategy
    return df._jdf.queryExecution().executedPlan().toString()


def test_delete_apply_join_is_broadcast_anti(spark, tmp_path):
    """Plan-shape pin for the MoR delete-apply path: with a manifest-small
    delete set the anti-join MUST stay a broadcast hash join (build side =
    deletes). A silent flip to sort-merge would triple the scan's exchanges
    and regress every ice_*_delete_scan without failing any row-level test
    — this assert makes the flip loud. The large-delete escape hatch
    (deletes above _DELETE_BROADCAST_MAX_ROWS shuffle instead, AQE choosing
    from real sizes) is pinned by the companion test below."""
    loc = str(tmp_path / "t_bc")
    write_iceberg(
        spark.range(2000).selectExpr("id", "id % 7 AS grp"), loc)
    delete_from(spark, loc, "id % 13 = 0", mode="merge-on-read")

    df = iceberg_scan(spark, loc)
    assert df.count() == 2000 - len([i for i in range(2000) if i % 13 == 0])
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, (
        "delete-apply anti-join fell back to sort-merge for a small delete "
        "set:\n" + plan)


def test_delete_apply_join_shuffles_above_broadcast_cap(spark, tmp_path, monkeypatch):
    """Escape-hatch pin: when the manifests report more delete rows than
    _DELETE_BROADCAST_MAX_ROWS, the broadcast hint must NOT be applied —
    at 100 TB a delete side can exceed executor memory and the join has to
    be free to shuffle. (Simulated by dropping the cap to zero; Spark may
    still pick broadcast from its own size estimate, so the assert is on
    the absence of OUR hint in the optimized plan, not the final strategy.)"""
    from duckdb_iceberg_spark.sources import scan as scan_mod

    loc = str(tmp_path / "t_smj")
    write_iceberg(
        spark.range(2000).selectExpr("id", "id % 7 AS grp"), loc)
    delete_from(spark, loc, "id % 13 = 0", mode="merge-on-read")

    monkeypatch.setattr(scan_mod, "_DELETE_BROADCAST_MAX_ROWS", 0)
    scan_mod.clear_scan_frame_memo()  # key doesn't cover module knobs
    df = iceberg_scan(spark, loc)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "UNBROADCASTABLE" not in logical  # smoke: plan stringifies
    # the hint would appear as a ResolvedHint/hints= marker pre-AQE; with
    # the cap at 0 it must be gone from the analyzed plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower(), analyzed
