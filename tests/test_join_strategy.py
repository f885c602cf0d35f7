"""Statistics-driven join planning (r15 — VERDICT r14 task 4): the
engine's own manifest byte/row counts (ScanPlan) size DML join sides
instead of Spark's static estimate — the r13 five-query mis-broadcast
class, prevented by data instead of hand hints."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.plans.join_strategy import (
    PLAN_ATTR,
    apply_side_hint,
    broadcast_threshold_bytes,
    decide_broadcast,
    frame_size_bytes,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_frames_carry_plan_and_size_from_manifests(spark, tmp_path):
    loc = str(tmp_path / "t_js")
    write_iceberg(spark.range(0, 5000).selectExpr("id as k", "id * 2 as v"),
                  loc)
    df = iceberg_scan(spark, loc)
    assert getattr(df, PLAN_ATTR, None) is not None
    size, prov = frame_size_bytes(df)
    assert prov == "scan-plan" and size > 0
    # the threshold knob is Spark's own autoBroadcastJoinThreshold
    assert broadcast_threshold_bytes(spark) > 0

    # decision flips exactly at the statistic, not at Spark's guess
    assert decide_broadcast(df, spark, threshold_bytes=size) is True
    assert decide_broadcast(df, spark, threshold_bytes=size - 1) is False


def test_mor_deletes_shrink_the_estimate(spark, tmp_path):
    """estimated_row_count subtracts delete cardinality — a mostly
    deleted table sizes near its live rows, not its raw file bytes."""
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t_js_mor")
    write_iceberg(spark.range(0, 4000).selectExpr("id as k"), loc)
    full_size, _ = frame_size_bytes(iceberg_scan(spark, loc))
    delete_from(spark, loc, "k % 4 != 0", mode="merge-on-read")
    live_size, prov = frame_size_bytes(iceberg_scan(spark, loc))
    assert prov == "scan-plan"
    assert live_size < full_size * 0.5  # ~25% live


def test_side_hint_materializes_in_the_plan(spark, tmp_path):
    loc = str(tmp_path / "t_js_join")
    write_iceberg(spark.range(0, 2000).selectExpr("id as k", "id as v"),
                  loc)
    src = iceberg_scan(spark, loc)
    tgt = spark.range(0, 2000).selectExpr("id as k", "id as w")
    b = _executed(tgt.join(apply_side_hint(src, True), "k"))
    assert "BroadcastHashJoin" in b
    m = _executed(tgt.join(apply_side_hint(src, False), "k"))
    assert "SortMergeJoin" in m and "BroadcastHashJoin" not in m


def test_merge_flips_at_threshold_and_stays_correct(spark, tmp_path):
    """End-to-end: the SAME MoR MERGE broadcasts its source under the
    default threshold and merge-joins it when the threshold drops below
    the source's manifest-derived size — results identical either way."""
    from duckdb_iceberg_spark.sources.dml import merge_into

    src_loc = str(tmp_path / "t_js_src")
    write_iceberg(
        spark.range(0, 3000).selectExpr("id as k", "id * 10 as v"),
        src_loc)
    source = iceberg_scan(spark, src_loc)
    size, prov = frame_size_bytes(source)
    assert prov == "scan-plan"

    def run(name):
        loc = str(tmp_path / name)
        write_iceberg(
            spark.range(0, 3000).selectExpr("id as k", "id as v"), loc)
        merge_into(spark, loc, source, "tgt.k = src.k",
                   when_matched_update={"v": F.col("src.v")},
                   mode="merge-on-read")
        return sorted((r.k, r.v) for r in
                      iceberg_scan(spark, loc).collect())

    want = [(i, i * 10) for i in range(3000)]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        assert decide_broadcast(source, spark) is True  # default 10MB
        assert run("t_js_tgt_b") == want

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(max(1, size // 2)))
        assert decide_broadcast(source, spark) is False  # flipped
        assert run("t_js_tgt_m") == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unknown_size_decides_conservatively(spark):
    # a frame whose optimizer estimate is genuine (literal range): known
    known = spark.range(0, 10)
    assert decide_broadcast(known, spark) is True
    # forcing an absurdly small threshold refuses even the known frame
    assert decide_broadcast(known, spark, threshold_bytes=0) is False
