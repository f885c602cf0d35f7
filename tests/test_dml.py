"""DML tests: DELETE / UPDATE / MERGE, CoW and MoR, + metadata tables."""

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.sources.dml import delete_from, merge_into, update_iceberg
from duckdb_iceberg_spark.sources import metadata_tables as mt

from .conftest import load


def test_delete_cow(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "orders")
    loc = str(tmp_path / "ord_del_cow")
    write_iceberg(src, loc)
    delete_from(spark, loc, "o_orderkey % 7 = 0", mode="copy-on-write")
    out = iceberg_scan(spark, loc)
    want = src.filter("o_orderkey % 7 != 0")
    assert out.count() == want.count()
    assert out.filter("o_orderkey % 7 = 0").count() == 0


def test_delete_mor_positional(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "orders")
    loc = str(tmp_path / "ord_del_mor")
    write_iceberg(src, loc)
    delete_from(spark, loc, "o_orderstatus = 'F'", mode="merge-on-read")
    out = iceberg_scan(spark, loc)
    want = src.filter("o_orderstatus != 'F'")
    assert out.count() == want.count()
    # delete files exist in metadata
    meta = mt.iceberg_metadata(spark, loc)
    assert meta.filter("content = 'POSITION_DELETES'").count() > 0
    # a second MoR delete stacks
    delete_from(spark, loc, "o_orderstatus = 'O'", mode="merge-on-read")
    out2 = iceberg_scan(spark, loc)
    assert out2.count() == src.filter("o_orderstatus NOT IN ('F','O')").count()


def test_delete_cow_drops_whole_files(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "lineitem").withColumn(
        "l_shipdate", F.col("l_shipdate").cast("date"))
    loc = str(tmp_path / "li_drop")
    write_iceberg(src, loc, partition_by=["l_returnflag"])
    tm0 = load_table_metadata(loc)
    n_files_before = mt.iceberg_metadata(spark, loc).count()
    # partition bounds prove every row in l_returnflag='R' files matches
    delete_from(spark, loc, "l_returnflag = 'R'", mode="copy-on-write")
    out = iceberg_scan(spark, loc)
    assert out.filter("l_returnflag = 'R'").count() == 0
    assert out.count() == src.filter("l_returnflag != 'R'").count()
    # whole-file drop: no rewritten data files added (delete-only snapshot)
    tm = load_table_metadata(loc)
    assert tm.current_snapshot().summary["operation"] == "delete"


def test_update_cow(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "customer")
    loc = str(tmp_path / "cust_upd")
    write_iceberg(src, loc)
    update_iceberg(spark, loc, {"c_acctbal": "c_acctbal + 100.0"},
                   "c_mktsegment = 'BUILDING'", mode="copy-on-write")
    out = iceberg_scan(spark, loc)
    want_sum = (
        src.withColumn("c_acctbal",
                       F.when(F.col("c_mktsegment") == "BUILDING",
                              F.col("c_acctbal") + 100.0).otherwise(F.col("c_acctbal")))
        .agg(F.sum("c_acctbal")).first()[0]
    )
    assert out.agg(F.sum("c_acctbal")).first()[0] == pytest.approx(want_sum)
    assert out.count() == src.count()


def test_update_mor(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "customer")
    loc = str(tmp_path / "cust_upd_mor")
    write_iceberg(src, loc)
    update_iceberg(spark, loc, {"c_name": "'REDACTED'"},
                   "c_nationkey = 3", mode="merge-on-read")
    out = iceberg_scan(spark, loc)
    assert out.count() == src.count()
    assert out.filter("c_nationkey = 3 AND c_name != 'REDACTED'").count() == 0
    assert out.filter("c_name = 'REDACTED'").count() == src.filter("c_nationkey = 3").count()


def test_merge_into(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "region_merge")
    write_iceberg(src, loc)
    updates = spark.createDataFrame(
        [(0, "ZERO-NEW"), (99, "NEW-REGION")], ["r_regionkey", "r_name"]
    )
    merge_into(
        spark, loc, updates, "tgt.r_regionkey = src.r_regionkey",
        when_matched_update={"r_name": "src.r_name"},
        when_not_matched_insert=True,
    )
    out = iceberg_scan(spark, loc)
    rows = {r.r_regionkey: r.r_name for r in out.collect()}
    assert rows[0] == "ZERO-NEW"
    assert rows[99] == "NEW-REGION"
    assert out.count() == src.count() + 1


def test_merge_delete(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "nation_merge_del")
    write_iceberg(src, loc)
    victims = spark.createDataFrame([(1,), (2,)], ["n_nationkey"])
    merge_into(spark, loc, victims, "tgt.n_nationkey = src.n_nationkey",
               when_matched_delete=True)
    out = iceberg_scan(spark, loc)
    assert out.count() == src.count() - 2
    assert out.filter("n_nationkey IN (1, 2)").count() == 0


def test_metadata_tables(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "supplier")
    loc = str(tmp_path / "supp_meta")
    write_iceberg(src, loc, partition_by=["s_nationkey"])
    write_iceberg(src, loc)

    snaps = mt.iceberg_snapshots(spark, loc)
    assert snaps.count() == 2
    assert {r.operation for r in snaps.collect()} == {"append"}

    meta = mt.iceberg_metadata(spark, loc)
    assert meta.count() > 0
    assert meta.filter("record_count <= 0").count() == 0

    cstats = mt.iceberg_column_stats(spark, loc)
    row = cstats.filter("column_name = 's_suppkey'").first()
    assert row.lower_bound is not None and int(row.lower_bound) >= 1

    pstats = mt.iceberg_partition_stats(spark, loc)
    prow = pstats.first()
    assert prow.partition_source_column == "s_nationkey"
    assert prow.transform == "identity"


def test_merge_into_merge_on_read_v3(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.dml import merge_into

    loc = str(tmp_path / "merge_mor")
    write_iceberg(
        spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "id: long, v: double"),
        loc, format_version=3)
    updates = spark.createDataFrame([(2, 200.0), (9, 900.0)], "id: long, v: double")
    merge_into(spark, loc, updates, "tgt.id = src.id",
               when_matched_update={"v": "src.v"},
               when_not_matched_insert=True,
               mode="merge-on-read")

    got = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert got == {1: 10.0, 2: 200.0, 3: 30.0, 9: 900.0}
    # matched rows were deleted via a deletion vector, not a file rewrite
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    assert any((d.file_format or "").lower() == "puffin"
               for t in plan.tasks for d in t.positional_deletes)


def test_merge_into_mor_delete_action(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.dml import merge_into

    loc = str(tmp_path / "merge_mor_del")
    write_iceberg(spark.range(10).selectExpr("id", "id * 1.0 AS v"), loc)
    merge_into(spark, loc,
               spark.createDataFrame([(3,), (7,)], "id: long"),
               "tgt.id = src.id",
               when_matched_delete=True,
               mode="merge-on-read")
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [0, 1, 2, 4, 5, 6, 8, 9]


def test_merge_into_mor_insert_only_preserves_matches(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.dml import merge_into

    loc = str(tmp_path / "merge_mor_ins")
    write_iceberg(spark.createDataFrame([(1, 1.0)], "id: long, v: double"), loc)
    merge_into(spark, loc,
               spark.createDataFrame([(1, 99.0), (2, 2.0)], "id: long, v: double"),
               "tgt.id = src.id",
               when_not_matched_insert=True,
               mode="merge-on-read")
    got = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert got == {1: 1.0, 2: 2.0}  # matched row untouched, no delete written


def test_dv_supersede_keeps_untouched_files_blobs(spark, tmp_path):
    """A Puffin file holds DVs for data files A and B; a later DELETE that
    touches only A must supersede only A's blob — B's previously deleted
    rows must NOT resurrect (supersession is per referenced_data_file, not
    per Puffin path)."""
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    loc = str(tmp_path / "dv_supersede")
    # two data files: A = ids 0..9, B = ids 10..19
    write_iceberg(spark.range(0, 10).selectExpr("id", "id * 1.0 AS v")
                  .coalesce(1), loc, format_version=3)
    write_iceberg(spark.range(10, 20).selectExpr("id", "id * 1.0 AS v")
                  .coalesce(1), loc)
    # one DELETE spanning both files → one Puffin, blobs for A and B
    delete_from(spark, loc, "id IN (1, 11)", mode="merge-on-read")
    assert sorted(r.id for r in iceberg_scan(spark, loc).collect()) == \
        sorted(set(range(20)) - {1, 11})
    # second DELETE touches only file A → A's blob is rewritten (merged),
    # B's blob in the old Puffin must stay live
    delete_from(spark, loc, "id = 2", mode="merge-on-read")
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == sorted(set(range(20)) - {1, 2, 11}), got
    # exactly one DV per data file, and they live in different Puffin files
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    dv_by_data = {}
    for t in plan.tasks:
        dvs = [d for d in t.positional_deletes
               if (d.file_format or "").lower() == "puffin"]
        assert len(dvs) <= 1, "two DVs for one data file = corrupt"
        if dvs:
            dv_by_data[t.data_file.file_path] = dvs[0].file_path
    assert len(dv_by_data) == 2
    assert len(set(dv_by_data.values())) == 2


def test_positional_delete_path_bounds_pruning(spark, sf_dir, tmp_path):
    """On an UNPARTITIONED MoR table, a positional-delete file whose
    file_path bounds reference only one data file is never assigned to the
    others (manifest path-bounds pruning) — and results stay correct."""
    from tests.conftest import load
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.dml import delete_from

    src = load(spark, sf_dir, "orders")
    loc = str(tmp_path / "t")
    write_iceberg(src.where("o_orderkey < 700").coalesce(1), loc)
    write_iceberg(src.where("o_orderkey >= 700").coalesce(1), loc)

    # delete rows that live only in the second file
    delete_from(spark, loc, "o_orderkey >= 1400", mode="merge-on-read")

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    counts = sorted(len(t.positional_deletes) for t in plan.tasks)
    assert counts == [0, 1], counts

    got = iceberg_scan(spark, loc).count()
    assert got == src.where("o_orderkey < 1400").count()


def test_merge_cardinality_violation(spark, tmp_path):
    """A target row matched by two source rows raises (SQL-standard MERGE
    cardinality violation) instead of silently duplicating it — CoW and MoR."""
    import pytest

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.dml import MergeCardinalityError, merge_into

    for mode in (None, "merge-on-read"):
        loc = str(tmp_path / f"card_{mode or 'cow'}")
        write_iceberg(
            spark.createDataFrame([(1, 1.0), (2, 2.0)], "id: long, v: double"), loc)
        dup_src = spark.createDataFrame(
            [(1, 10.0), (1, 11.0)], "id: long, v: double")
        with pytest.raises(MergeCardinalityError, match="matched 2 source rows"):
            merge_into(spark, loc, dup_src, "tgt.id = src.id",
                       when_matched_update={"v": "src.v"}, mode=mode)


def test_merge_cow_broadcasts_source(spark, tmp_path):
    """The CoW phase-1 semi-join ships the delta-sized source to the target's
    executors (BroadcastHashJoin), never shuffling the full target."""
    import pyspark.sql.functions as F

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.scan import scan_to_dataframe

    loc = str(tmp_path / "t")
    write_iceberg(spark.range(1000).selectExpr("id", "id * 2 AS v"), loc)
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    target = scan_to_dataframe(spark, plan, with_file_info=True).alias("tgt")
    src = F.broadcast(spark.createDataFrame([(5,)], "id: long").alias("src"))
    semi = target.join(src, F.expr("tgt.id = src.id"), "left_semi")
    phys = semi._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys and "SortMergeJoin" not in phys


def test_snapshot_summary_delete_metrics(spark, tmp_path):
    """Delete snapshots carry the reference's summary metrics
    (test_snapshot_summary_delete_metrics.test): added/total delete-file
    counts and position-delete row counts."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "delmetrics")
    write_iceberg(spark.createDataFrame(
        [(i, chr(96 + i)) for i in range(1, 6)], "id int, data string")
        .coalesce(1), loc)
    delete_from(spark, loc, "id IN (2, 4)", mode="merge-on-read")

    tm = load_table_metadata(loc)
    snaps = {s.operation: s.summary for s in tm.snapshots}
    assert snaps["append"]["total-delete-files"] == "0"
    d = snaps["delete"]
    assert d["total-data-files"] == "1"
    assert d["added-delete-files"] == "1"
    assert d["total-delete-files"] == "1"
    assert d["added-position-delete-files"] == "1"
    assert d["added-position-deletes"] == "2"
    assert d["total-position-deletes"] == "2"


def test_no_match_dml_creates_no_snapshot(spark, tmp_path):
    """UPDATE/DELETE matching zero rows must not commit a snapshot
    (reference: update/test_no_update_no_new_snapshot.test — 'no update,
    no new snapshot'): table history stays clean under no-op DML."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.dml import delete_from, update_iceberg

    loc = str(tmp_path / "t_noop")
    write_iceberg(spark.sql("SELECT id AS k, id*10 AS v FROM range(5)"), loc)
    n0 = len(load_table_metadata(loc).snapshots)
    update_iceberg(spark, loc, {"v": "v + 1"}, "k = 999")
    assert len(load_table_metadata(loc).snapshots) == n0
    delete_from(spark, loc, "k = 999")
    assert len(load_table_metadata(loc).snapshots) == n0
    delete_from(spark, loc, "k = 999", mode="merge-on-read")
    assert len(load_table_metadata(loc).snapshots) == n0


def test_cardinality_estimate_reflects_deletes(spark, tmp_path):
    """Metadata-only cardinality estimate survives deletes (reference:
    iceberg_scans/iceberg_cardinality_estimates.test — DuckDB's EXPLAIN
    shows ~record_count minus delete cardinality, 60175 for the
    lineitem_001_deletes fixture): exact_row_count goes None once deletes
    apply, but estimated_row_count keeps the live count so join sizing can
    still plan from metadata. Repeated add+delete rounds (the
    many_adds_deletes analogue) stay exact for positional deletes."""
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    loc = str(tmp_path / "card_est")
    write_iceberg(spark.range(1000).selectExpr("id", "id % 10 AS k"), loc)
    delete_from(spark, loc, "k = 3", mode="merge-on-read")

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot(), None)
    assert plan.exact_row_count() is None        # deletes apply
    assert plan.estimated_row_count() == 900
    assert plan.stats["estimated_rows"] == 900
    assert iceberg_scan(spark, loc).count() == 900

    # many_adds_deletes analogue: stacking rounds stays exact
    write_iceberg(spark.range(1000, 2000).selectExpr("id", "id % 10 AS k"), loc)
    delete_from(spark, loc, "k IN (4, 5)", mode="merge-on-read")
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot(), None)
    live = iceberg_scan(spark, loc).count()
    assert plan.estimated_row_count() == live == 1500


def test_cardinality_estimate_with_pruned_delete_targets(spark, tmp_path):
    """A positional-delete file shared across data files must subtract at
    most the rows of the KEPT files it applies to: with most of its
    targets pruned by the predicate, the estimate stays in [0, kept_rows]
    instead of going negative-then-floored below zero."""
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    loc = str(tmp_path / "card_pruned")
    write_iceberg(spark.range(1000).selectExpr("id", "id AS v").coalesce(1), loc)
    write_iceberg(
        spark.range(1000, 2000).selectExpr("id", "id AS v").coalesce(1), loc)
    # one MoR delete touching BOTH files
    delete_from(spark, loc, "id % 2 = 0", mode="merge-on-read")

    tm = load_table_metadata(loc)
    full = plan_scan(tm, tm.select_snapshot(), None)
    assert full.estimated_row_count() == 1000  # no pruning: exact

    pruned = plan_scan(tm, tm.select_snapshot(), "id < 1000")
    assert pruned.stats["files_pruned"] == 1
    kept = sum(t.data_file.record_count for t in pruned.tasks)
    assert 0 <= pruned.estimated_row_count() <= kept
