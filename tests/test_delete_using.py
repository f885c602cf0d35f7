"""DELETE ... USING <rel> WHERE <cond> — join deletes.

Reference behavior: delete/delete_join.test — 1000-row table, a temp
relation holding the even ids, ``DELETE FROM test USING deleted_rows WHERE
id=deleted_rows.delete_id`` removes 500 rows and leaves the odd ids.
"""

import os

import pytest
from pyspark.sql import functions as F


def _make(spark, tmp_path, name, mode_props=None):
    from duckdb_iceberg_spark import write_iceberg

    loc = os.path.join(str(tmp_path), name)
    df = spark.range(1000).selectExpr("CAST(id AS INT) AS id",
                                      "concat('v', id) AS val")
    write_iceberg(df, loc, properties=mode_props)
    return loc


def test_delete_using_cow(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.sources.dml import delete_using

    loc = _make(spark, tmp_path, "del_using_cow")
    evens = spark.range(0, 1000, 2).selectExpr("CAST(id AS INT) AS delete_id")
    delete_using(spark, loc, evens, "tgt.id = src.delete_id")
    out = iceberg_scan(spark, loc)
    assert out.count() == 500
    assert out.filter(F.col("id") % 2 == 0).count() == 0
    # survivors keep their payload
    assert out.filter("id = 3 AND val = 'v3'").count() == 1


def test_delete_using_mor(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.dml import delete_using

    loc = _make(spark, tmp_path, "del_using_mor",
                {"write.delete.mode": "merge-on-read"})
    evens = spark.range(0, 1000, 2).selectExpr("CAST(id AS INT) AS delete_id")
    delete_using(spark, loc, evens, "tgt.id = src.delete_id")
    tm = load_table_metadata(loc)
    # merge-on-read: data files untouched, a delete snapshot on top
    assert tm.current_snapshot().operation == "delete"
    out = iceberg_scan(spark, loc)
    assert out.count() == 500
    assert out.filter(F.col("id") % 2 == 0).count() == 0


def test_delete_using_no_match_is_noop(spark, tmp_path):
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.dml import delete_using

    loc = _make(spark, tmp_path, "del_using_noop")
    before = load_table_metadata(loc).current_snapshot().snapshot_id
    misses = spark.createDataFrame([(5000,), (6000,)], "delete_id int")
    delete_using(spark, loc, misses, "tgt.id = src.delete_id")
    assert load_table_metadata(loc).current_snapshot().snapshot_id == before


def test_sql_delete_using(spark, tmp_path):
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = _make(spark, tmp_path, "del_using_sql")
    register_table(spark, "dj_test", loc)
    spark.range(0, 1000, 2).selectExpr("CAST(id AS INT) AS delete_id") \
        .createOrReplaceTempView("deleted_rows")
    res = execute_sql(
        spark,
        "DELETE FROM dj_test USING deleted_rows "
        "WHERE id = deleted_rows.delete_id")
    assert res.first().operation == "DELETE"
    got = spark.sql("SELECT count(*) c FROM dj_test").first()
    assert got.c == 500
    assert spark.sql(
        "SELECT count(*) c FROM dj_test WHERE id % 2 = 0").first().c == 0


def test_sql_delete_using_subquery(spark, tmp_path):
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = _make(spark, tmp_path, "del_using_subq")
    register_table(spark, "dj_subq", loc)
    execute_sql(
        spark,
        "DELETE FROM dj_subq t USING (SELECT CAST(id AS INT) AS did "
        "FROM range(0, 10)) d WHERE t.id = d.did")
    assert spark.sql("SELECT count(*) c FROM dj_subq").first().c == 990
    assert spark.sql("SELECT min(id) m FROM dj_subq").first().m == 10
