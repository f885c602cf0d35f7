"""The r11 driver red, pinned (VERDICT r11 task 1): ``ice_time_scan`` must
run end-to-end in a session WITHOUT ``spark.sql.timeType.enabled`` — the
driver's own environment, which the local harness never exercised because
every test session goes through ``session.get_spark`` (sets the flag,
session.py). Three invariants:

1. the scan path rewrites ``TIME'…'`` residual literals to exact µs BIGINT
   values whenever the active session degrades ``time`` columns to the
   tagged-Long mapping (sources/scan.py ``_residual_filter``) — the r11
   failure was DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES (BIGINT vs TIME(6));
2. the fixture builder writes a tagged-Long table in flag-less mode
   (``make_time`` itself throws UNSUPPORTED_TIME_TYPE without the flag), as
   its OWN fixture variant so cross-mode cache reads never mix physical
   parquet types;
3. the driver-facing output is mode-independent: exact µs BIGINT min/max in
   BOTH modes, hash-equal to the static duckdb oracle.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR


class _flag_off:
    """Toggle spark.sql.timeType.enabled off for the block, restore after."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.timeType.enabled")
        self.spark.conf.set("spark.sql.timeType.enabled", "false")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.timeType.enabled", self.old)


def _oracle_rows():
    con = duckdb.connect()
    try:
        path = os.path.join(SF_DIR, "documents.parquet").replace("'", "''")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
        return con.execute(entry.oracle_sql()["ice_time_scan"]).fetchall()
    finally:
        con.close()


def test_residual_time_literal_rewritten_when_flag_off(spark):
    """Unit: _residual_filter turns TIME'hh:mm:ss[.ffffff]' into its µs
    BIGINT against a tagged-Long column, flag-less only."""
    from duckdb_iceberg_spark.sources.scan import _residual_filter

    df = spark.createDataFrame(
        [(43_199_999_999,), (43_200_000_000,), (47_107_123_456,)], "t: long")
    with _flag_off(spark):
        got = _residual_filter(df, "t >= TIME'12:00:00'").collect()
        assert sorted(r.t for r in got) == [43_200_000_000, 47_107_123_456]
        # sub-second literal, exact µs
        got = _residual_filter(df, "t = TIME'13:05:07.123456'").collect()
        assert [r.t for r in got] == [47_107_123_456]
        # an unparsable literal passes through for Spark's own error
        with pytest.raises(Exception):
            _residual_filter(df, "t >= TIME'nonsense'").collect()


def test_residual_time_inside_string_literal_untouched(spark):
    """ADVICE r12: a "TIME '…'" spelled INSIDE a string constant is part of
    the string's value, not a literal to rewrite — the rewriter must
    tokenize quoted regions first. Real TIME literals in the same residual
    still rewrite."""
    from duckdb_iceberg_spark.sources.scan import _residual_filter

    df = spark.createDataFrame(
        [("TIME '12:00'", 1), ("other", 2)], "s: string, t: long")
    with _flag_off(spark):
        # string constant containing TIME '…' (doubled-quote escaping):
        # must compare by VALUE, so exactly one row matches
        got = _residual_filter(df, "s = 'TIME ''12:00'''").collect()
        assert [(r.s, r.t) for r in got] == [("TIME '12:00'", 1)]
        # mixed: a real TIME literal next to a string constant that
        # mentions TIME — the former rewrites, the latter survives verbatim
        got = _residual_filter(
            df, "s = 'TIME ''12:00''' AND t < TIME'00:00:01'").collect()
        assert [r.t for r in got] == [1]


def test_ice_time_scan_end_to_end_flagless(spark):
    """The exact driver scenario: build + scan + TIME-literal filter +
    aggregate in a flag-less session, hash-equal to the duckdb oracle."""
    with _flag_off(spark):
        df = entry.ice_time_scan(spark, SF_DIR)
        assert dict(df.dtypes) == {
            "event_hour": "int", "n": "bigint",
            "min_t": "bigint", "max_t": "bigint"}
        got = [(r.event_hour, r.n, r.min_t, r.max_t) for r in df.collect()]
    assert got == _oracle_rows()


def test_ice_time_scan_mode_independent(spark):
    """Flag-on output (TimeType internally, µs BIGINT projected) is
    row-identical to the flag-less output and the oracle."""
    assert spark.conf.get("spark.sql.timeType.enabled") == "true"
    df = entry.ice_time_scan(spark, SF_DIR)
    assert dict(df.dtypes) == {
        "event_hour": "int", "n": "bigint",
        "min_t": "bigint", "max_t": "bigint"}
    got = [(r.event_hour, r.n, r.min_t, r.max_t) for r in df.collect()]
    assert got == _oracle_rows()
