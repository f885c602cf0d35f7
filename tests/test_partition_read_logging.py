"""Per-partition read-log assertions — the analogue of the reference's
logging suite (test/sql/local/catalog_test_config_setup/catalog_agnostic/
logging/test_partition_read_logging.test): a partition-filtered scan must
(1) LOG every data file it skips, with the partition/transform/filter
vocabulary the reference's regex asserts on, and (2) never OPEN a pruned
partition's data file — asserted at the actual file-open choke point, not
just on planner stats."""

import logging

import pytest

from duckdb_iceberg_spark import io as fio
from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.io import arrow_data
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.scan_plan import plan_scan


@pytest.fixture()
def mock_fs():
    from pyarrow import fs as pafs

    mock = pafs._MockFileSystem()
    fio.register_io("mock", fio.ArrowFileIO("mock", mock, shippable=False))
    return mock


def _month_partitioned(spark, loc):
    df = spark.sql(
        "SELECT CAST(id AS INT) AS id, "
        "date_add(DATE'2025-01-01', CAST(id % 6 AS INT) * 31) AS dt "
        "FROM range(600)")
    write_iceberg(df, loc, partition_by=["month(dt)"])


def test_skipped_data_files_are_logged(spark, tmp_path, caplog):
    """The reference enables the 'Iceberg' log channel and matches
    'skipped ... data_file ... partition column ... with transform ...
    does not match filter ... dt=2025-06-05'; our channel is the
    duckdb_iceberg_spark.scan logger at DEBUG."""
    loc = str(tmp_path / "t_log")
    _month_partitioned(spark, loc)

    tm = load_table_metadata(loc)
    with caplog.at_level(logging.DEBUG, logger="duckdb_iceberg_spark.scan"):
        plan = plan_scan(tm, tm.select_snapshot(), "dt = DATE '2025-06-05'")
    assert len(plan.tasks) >= 1
    assert plan.stats["files_pruned"] >= 1

    skips = [r.getMessage() for r in caplog.records
             if "skipped data_file" in r.getMessage()]
    # one skip line per pruned file, with the reference's vocabulary
    assert len(skips) == plan.stats["files_pruned"]
    for msg in skips:
        assert "partition column" in msg and "transform" in msg \
            and "does not match filter" in msg
    # the files actually planned must NOT be logged as skipped
    kept = {t.data_file.file_path for t in plan.tasks}
    assert not any(k in m for k in kept for m in skips)


def test_pruned_partition_files_never_opened(spark, mock_fs, monkeypatch):
    """Request-level pin: executing a partition-filtered scan opens exactly
    the matching partition's data files — a pruned partition's parquet is
    never touched. Instrumented at arrow_data._read_one, the single
    file-open choke point for object-store reads."""
    loc = "mock://bucket/t_readlog"
    _month_partitioned(spark, loc)

    tm = load_table_metadata(loc)
    full = plan_scan(tm, tm.select_snapshot(), None)
    plan = plan_scan(tm, tm.select_snapshot(), "dt = DATE '2025-06-05'")
    kept = {t.data_file.file_path for t in plan.tasks}
    pruned = {t.data_file.file_path for t in full.tasks} - kept
    assert kept and pruned, "fixture must have matching AND pruned files"

    opened: list[str] = []
    orig = arrow_data._read_one

    def spy(io, path, target, *a, **kw):
        opened.append(path)
        return orig(io, path, target, *a, **kw)

    monkeypatch.setattr(arrow_data, "_read_one", spy)
    out = iceberg_scan(spark, loc, where="dt = DATE '2025-06-05'")
    assert out.count() == 100
    data_opened = {p for p in opened if ".parquet" in p}
    assert data_opened, "expected driver-side opens through _read_one"
    assert data_opened <= kept, (
        f"scan opened files outside the planned set: {data_opened - kept}")
    assert not (data_opened & pruned), (
        f"scan opened pruned partition files: {data_opened & pruned}")
