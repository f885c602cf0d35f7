"""Property fuzzing for the r12 delete-maintenance path: random MoR
delete stacks (+ optional equality deletes and compaction) against a
dict model — rewrite_position_delete_files must preserve the visible
rows in every configuration (merge, dangling-drop, v3 DV conversion,
equality materialization) and leave at most one positional delete file
per data file."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.scan_plan import plan_scan
from duckdb_iceberg_spark.sources.dml import delete_from, upsert_equality
from duckdb_iceberg_spark.sources.maintenance import (
    rewrite_data_files,
    rewrite_position_delete_files,
)


@st.composite
def _program(draw):
    fmt = draw(st.sampled_from([2, 3]))
    preds = draw(st.lists(
        st.sampled_from(["id % 7 = 3", "id < 20", "id >= 85",
                         "id % 13 = 1", "id % 2 = 0 AND id < 40"]),
        min_size=1, max_size=3, unique=True))
    eq_keys = draw(st.lists(st.integers(0, 99), max_size=4, unique=True))
    compact_first = draw(st.booleans())
    convert = draw(st.booleans())
    return fmt, preds, eq_keys, compact_first, convert


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(_program())
def test_delete_compaction_preserves_scan(spark, prog):
    fmt, preds, eq_keys, compact_first, convert = prog
    loc = tempfile.mkdtemp(prefix="prop_posdel")
    shutil.rmtree(loc, ignore_errors=True)
    try:
        df = spark.range(0, 100).selectExpr("id", "id % 5 AS k")
        write_iceberg(df, loc, format_version=fmt)
        alive = set(range(100))
        for p in preds:
            delete_from(spark, loc, p, mode="merge-on-read")
            alive -= {i for i in range(100) if _matches(p, i)}
        if eq_keys and fmt == 2:
            upsert = (spark.createDataFrame([(k, k % 5) for k in eq_keys],
                                            "id: long, k: long"))
            upsert_equality(spark, loc, upsert, key_columns=["id"])
            alive |= set(eq_keys)  # upsert re-adds the keys as new rows
        if compact_first:
            rewrite_data_files(spark, loc, rewrite_all=True)

        before = sorted(r.id for r in iceberg_scan(spark, loc).collect())
        assert sorted(alive) == before, "fixture model out of sync"

        rewrite_position_delete_files(
            spark, loc, rewrite_all=True, convert_equality=convert)
        after = sorted(r.id for r in iceberg_scan(spark, loc).collect())
        assert after == before

        tm = load_table_metadata(loc)
        plan = plan_scan(tm, tm.select_snapshot())
        for t in plan.tasks:
            assert len(t.positional_deletes) <= 1
            if convert:
                assert not t.equality_deletes
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def _matches(pred: str, i: int) -> bool:
    if pred == "id % 7 = 3":
        return i % 7 == 3
    if pred == "id < 20":
        return i < 20
    if pred == "id >= 85":
        return i >= 85
    if pred == "id % 13 = 1":
        return i % 13 == 1
    if pred == "id % 2 = 0 AND id < 40":
        return i % 2 == 0 and i < 40
    raise AssertionError(pred)
