"""Column comments (doc), ALTER COLUMN SET/DROP DEFAULT, CASCADE refusal,
IF [NOT] EXISTS modifiers, DESCRIBE.

Reference behavior: alter/alter_column_comment.test (COMMENT ON COLUMN sets
and IS NULL clears the schema doc, surfaced via duckdb_columns().comment),
test_column_doc_comment.test, alter/alter_default.test (SET DEFAULT changes
write-default only — existing rows untouched; DROP DEFAULT falls back to
initial-default on insert, the documented spec quirk; non-foldable defaults
refused), test_cascade.test (DROP … CASCADE → explicit Not implemented),
alter/add_column/alter_add_column_if_not_exists.test.
"""

import os

import pytest

from tests.conftest import load


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import write_iceberg

    loc = os.path.join(str(tmp_path), "docs_tbl")
    write_iceberg(load(spark, sf_dir, "region"), loc)
    return loc


def _register(spark, loc, name):
    from duckdb_iceberg_spark.sources.sql import register_table

    register_table(spark, name, loc)
    return name


def test_set_and_clear_column_doc(spark, table):
    from duckdb_iceberg_spark.sources import ddl
    from duckdb_iceberg_spark.sources.metadata_tables import describe_table

    ddl.set_column_doc(table, "r_regionkey", "Primary identifier")
    rows = {r.column_name: r for r in describe_table(spark, table).collect()}
    assert rows["r_regionkey"].comment == "Primary identifier"
    assert rows["r_name"].comment is None

    ddl.set_column_doc(table, "r_regionkey", None)
    rows = {r.column_name: r for r in describe_table(spark, table).collect()}
    assert rows["r_regionkey"].comment is None


def test_comment_on_column_sql(spark, table):
    from duckdb_iceberg_spark.sources.metadata_tables import describe_table
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, table, "cmt_tbl")
    res = execute_sql(
        spark, "COMMENT ON COLUMN cmt_tbl.r_name IS 'region''s name'")
    assert res.first().operation == "COMMENT ON COLUMN"
    rows = {r.column_name: r for r in describe_table(spark, table).collect()}
    assert rows["r_name"].comment == "region's name"

    execute_sql(spark, "COMMENT ON COLUMN cmt_tbl.r_name IS NULL")
    rows = {r.column_name: r for r in describe_table(spark, table).collect()}
    assert rows["r_name"].comment is None


def test_describe_sql_route(spark, table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, table, "desc_tbl")
    df = execute_sql(spark, "DESCRIBE desc_tbl")
    names = [r.column_name for r in df.collect()]
    assert names == ["r_regionkey", "r_name"]


def test_nested_column_doc(spark, tmp_path):
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources import ddl
    from duckdb_iceberg_spark.sources.metadata_tables import describe_table

    loc = os.path.join(str(tmp_path), "nested_doc")
    df = spark.createDataFrame(
        [(1, ("a", 10))], "id int, payload struct<city:string, zip:int>")
    write_iceberg(df, loc)
    ddl.set_column_doc(loc, "payload.zip", "postal code")
    rows = {r.column_name: r for r in describe_table(spark, loc).collect()}
    assert rows["payload.zip"].comment == "postal code"
    assert rows["payload"].comment is None


def test_set_default_affects_inserts_only(spark, table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, table, "dflt_tbl")
    execute_sql(spark,
                "ALTER TABLE dflt_tbl ALTER COLUMN r_name SET DEFAULT 'n/a'")
    execute_sql(spark,
                "INSERT INTO dflt_tbl (r_regionkey) VALUES (99)")
    rows = {r.r_regionkey: r.r_name
            for r in spark.sql("SELECT * FROM dflt_tbl").collect()}
    assert rows[99] == "n/a"
    # existing rows untouched (write-default is not retroactive)
    assert all(v != "n/a" for k, v in rows.items() if k != 99)


def test_drop_default_falls_back_to_initial(spark, tmp_path):
    """The alter_default.test quirk: write-default has no explicit null, so
    after DROP DEFAULT inserts resolve the creation (initial) default."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources import ddl
    from duckdb_iceberg_spark.sources.sql import execute_sql

    loc = os.path.join(str(tmp_path), "drop_dflt")
    write_iceberg(spark.createDataFrame([("hello world",)], "a string"), loc)
    ddl.add_column(loc, "b", "boolean", default=False)
    _register(spark, loc, "drop_dflt")
    execute_sql(spark, "ALTER TABLE drop_dflt ALTER COLUMN b SET DEFAULT TRUE")
    execute_sql(spark, "INSERT INTO drop_dflt (a) VALUES ('test')")
    execute_sql(spark, "ALTER TABLE drop_dflt ALTER COLUMN b DROP DEFAULT")
    execute_sql(spark, "INSERT INTO drop_dflt (a) VALUES ('not null')")
    got = {r.a: r.b for r in spark.sql("SELECT * FROM drop_dflt").collect()}
    assert got == {"hello world": False, "test": True, "not null": False}


def test_non_foldable_default_refused(spark, table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, table, "bad_dflt")
    with pytest.raises(NotImplementedError, match="foldable"):
        execute_sql(
            spark, "ALTER TABLE bad_dflt ALTER COLUMN r_name SET DEFAULT uuid()")


def test_cascade_refused(spark, table):
    """CASCADE refusal (reference: test_cascade.test) fires only for
    Iceberg-registered targets; non-Iceberg statements pass through."""
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, table, "casc_tbl")
    with pytest.raises(NotImplementedError, match="CASCADE is not supported"):
        execute_sql(spark, "DROP TABLE casc_tbl CASCADE")
    # quoting can't bypass the gate
    with pytest.raises(NotImplementedError, match="CASCADE is not supported"):
        execute_sql(spark, "DROP TABLE `casc_tbl` CASCADE")
    with pytest.raises(NotImplementedError, match="Iceberg schemas"):
        execute_sql(spark, "DROP SCHEMA casc_tbl CASCADE")


def test_cascade_passthrough_non_iceberg(spark, table):
    """DROP ... CASCADE on a plain Spark schema is NOT refused — it reaches
    spark.sql and actually drops (the round-5 ADVICE medium)."""
    from duckdb_iceberg_spark.sources.sql import execute_sql

    spark.sql("CREATE DATABASE IF NOT EXISTS casc_passthrough_db")
    execute_sql(spark, "DROP SCHEMA casc_passthrough_db CASCADE")
    names = [d.namespace for d in spark.sql("SHOW DATABASES").collect()]
    assert "casc_passthrough_db" not in names


def test_add_column_if_not_exists(spark, table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, table, "ine_tbl")
    execute_sql(spark, "ALTER TABLE ine_tbl ADD COLUMN extra INT")
    # duplicate without the modifier: error
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(spark, "ALTER TABLE ine_tbl ADD COLUMN extra INT")
    # with the modifier: no-op
    execute_sql(spark, "ALTER TABLE ine_tbl ADD COLUMN IF NOT EXISTS extra INT")
    execute_sql(spark, "ALTER TABLE ine_tbl DROP COLUMN IF EXISTS nope")
    with pytest.raises(KeyError):
        execute_sql(spark, "ALTER TABLE ine_tbl DROP COLUMN nope")
