"""SQL surface of the reference's scalar functions, mirrored against its
own goldens (test_iceberg_bucket.test / test_iceberg_truncate.test): the
reference registers ``iceberg_bucket``/``iceberg_truncate`` at extension
load (src/function/iceberg_functions.cpp:11-39); here
``register_sql_functions`` (auto-invoked by register_table/execute_sql)
registers them on the SparkSession. Spark SQL UDFs carry one fixed return
type, so the truncate overload set splits: ``iceberg_truncate`` is the
integer overload (loud error otherwise) plus ``iceberg_truncate_string``
/ ``iceberg_truncate_binary``."""

import pytest

from duckdb_iceberg_spark.functions import register_sql_functions


@pytest.fixture(autouse=True)
def _reg(spark):
    register_sql_functions(spark)


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_bucket_null_and_spec_vectors(spark):
    # NULL in -> NULL out (spec rule)
    assert one(spark, "iceberg_bucket(16, CAST(NULL AS BIGINT))") is None
    # spec vectors (test_iceberg_bucket.test): hash(0L)=1669671676
    assert one(spark, "iceberg_bucket(16, 0)") == 12
    assert one(spark, "iceberg_bucket(100, 0)") == 76
    # hash("iceberg") = 1210000089 -> % 100 = 89
    assert one(spark, "iceberg_bucket(100, 'iceberg')") == 89
    # hash(date 2017-11-16) = hash(17486L) = -653330422 -> % 100 = 26
    assert one(spark, "iceberg_bucket(100, DATE'2017-11-16')") == 26


def test_bucket_matches_column_api_on_table(spark, sf_dir):
    from pyspark.sql import functions as F

    from duckdb_iceberg_spark.functions import iceberg_bucket

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .select("p_partkey").limit(200))
    part.createOrReplaceTempView("p_bucket_src")
    via_sql = {r.k: r.b for r in spark.sql(
        "SELECT p_partkey AS k, iceberg_bucket(16, p_partkey) AS b "
        "FROM p_bucket_src").collect()}
    via_col = {r.k: r.b for r in part.select(
        F.col("p_partkey").alias("k"),
        iceberg_bucket(16, "p_partkey", "long").alias("b")).collect()}
    assert via_sql == via_col and len(via_sql) == 200


def test_truncate_integer_goldens(spark):
    # test_iceberg_truncate.test integer block
    for w, v, expect in [(10, 0, 0), (10, 1, 0), (10, 9, 0), (10, 10, 10),
                         (10, 11, 10), (10, -1, -10), (10, -10, -10),
                         (10, -11, -20)]:
        assert one(spark, f"iceberg_truncate({w}, {v})") == expect
    assert one(spark, "iceberg_truncate(10, CAST(NULL AS BIGINT))") is None
    # result is always a multiple of W (reference bool_and sweep)
    rows = spark.sql(
        "SELECT bool_and(iceberg_truncate(7, id - 100) % 7 = 0) AS ok "
        "FROM range(0, 200)").collect()
    assert rows[0].ok is True


def test_truncate_string_and_binary_goldens(spark):
    assert one(spark, "iceberg_truncate_string(3, 'iceberg')") == "ice"
    assert one(spark, "iceberg_truncate_string(7, 'iceberg')") == "iceberg"
    assert one(spark, "iceberg_truncate_string(10, 'iceberg')") == "iceberg"
    assert one(spark, "iceberg_truncate_string(5, '')") == ""
    assert one(spark,
               "iceberg_truncate_binary(2, X'01020304')") == b"\x01\x02"
    assert one(spark, "iceberg_truncate_binary(10, X'0102')") == b"\x01\x02"


def test_truncate_width_must_be_positive(spark):
    # reference: "width must be a positive integer" (statement error)
    for expr in ("iceberg_truncate(0, 1)",
                 "iceberg_truncate_string(0, 'iceberg')",
                 "iceberg_truncate_binary(0, X'0102')"):
        with pytest.raises(Exception, match="width must be a positive"):
            spark.sql(f"SELECT {expr}").collect()
    from duckdb_iceberg_spark.functions import iceberg_truncate

    with pytest.raises(ValueError, match="width must be a positive"):
        iceberg_truncate(0, "x")


def test_truncate_integer_overload_rejects_strings_loudly(spark):
    with pytest.raises(Exception, match="integer overload"):
        spark.sql("SELECT iceberg_truncate(3, 'hello')").collect()


def test_functions_in_scope_through_execute_sql(spark, tmp_path):
    """A reference user's SQL — scalar function over an attached table —
    runs through execute_sql unchanged."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "t_fn")
    write_iceberg(
        spark.createDataFrame([(i,) for i in range(20)], "id bigint"), loc)
    register_table(spark, "t_fn", loc)
    rows = execute_sql(
        spark,
        "SELECT iceberg_bucket(4, id) AS b, count(*) AS n "
        "FROM t_fn GROUP BY b ORDER BY b").collect()
    assert sum(r.n for r in rows) == 20
    assert all(0 <= r.b < 4 for r in rows)


def test_bucket_and_truncate_on_nullable_integer_column(spark):
    """ADVICE r10: an int64 batch containing ANY null reaches the pandas
    UDF as float64 (Arrow's nullable-int rendering), which used to raise
    'unsupported value type' / the misleading 'integer overload' error.
    Mixed null/non-null integer batches must work and agree with the
    all-non-null results."""
    df = spark.createDataFrame(
        [(0,), (None,), (34,), (None,), (1,)], "v bigint")
    df.createOrReplaceTempView("nullable_ints")
    rows = spark.sql(
        "SELECT v, iceberg_bucket(16, v) AS b, iceberg_truncate(10, v) AS t "
        "FROM nullable_ints ORDER BY v NULLS FIRST").collect()
    got = {r.v: (r.b, r.t) for r in rows}
    # spec vector: hash(0L)=1669671676 -> %16 = 12; hash(34L)=2017239379 -> %16 = 3
    assert got[None] == (None, None)
    assert got[0] == (one(spark, "iceberg_bucket(16, 0)"), 0)
    assert got[34] == (one(spark, "iceberg_bucket(16, 34)"), 30)
    assert got[1] == (one(spark, "iceberg_bucket(16, 1)"), 0)


def test_bucket_rejects_fractional_doubles_loudly(spark):
    """A genuinely fractional DOUBLE column is NOT a nullable-int artifact
    and has no overload (the reference has none either)."""
    spark.createDataFrame([(1.5,), (None,)], "v double") \
        .createOrReplaceTempView("frac_doubles")
    with pytest.raises(Exception, match="double overload"):
        spark.sql("SELECT iceberg_bucket(16, v) FROM frac_doubles").collect()
    with pytest.raises(Exception, match="integer overload|double overload"):
        spark.sql("SELECT iceberg_truncate(10, v) FROM frac_doubles").collect()


def test_metadata_table_functions_udtf(spark, sf_dir, tmp_path):
    """r12: the reference's metadata TABLE functions work verbatim in SQL
    — SELECT * FROM iceberg_snapshots('path') / iceberg_metadata /
    iceberg_refs — via Spark 4 Python UDTFs, matching the DataFrame
    metadata tables row for row."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.functions import register_sql_functions
    from duckdb_iceberg_spark.sources.dml import delete_from
    from duckdb_iceberg_spark.sources.ddl import create_tag
    from duckdb_iceberg_spark.sources import metadata_tables as mt

    from .conftest import load

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_udtf")
    write_iceberg(src, loc)
    delete_from(spark, loc, "r_regionkey = 0", mode="merge-on-read")
    create_tag(loc, "v1")
    register_sql_functions(spark)

    esc = loc.replace("'", "''")
    snaps = spark.sql(
        f"SELECT * FROM iceberg_snapshots('{esc}') ORDER BY sequence_number"
    ).collect()
    want = mt.iceberg_snapshots(spark, loc).orderBy("sequence_number").collect()
    assert [(r.snapshot_id, r.operation) for r in snaps] == \
        [(r.snapshot_id, r.operation) for r in want]
    assert len(snaps) == 2 and snaps[-1].operation == "delete"

    meta = spark.sql(
        f"SELECT content, count(*) AS n FROM iceberg_metadata('{esc}') "
        "GROUP BY content ORDER BY content").collect()
    got = {r.content: r.n for r in meta}
    assert got.get("DATA", 0) >= 1 and got.get("POSITION_DELETES", 0) >= 1

    refs = spark.sql(
        f"SELECT * FROM iceberg_refs('{esc}') ORDER BY name").collect()
    assert [(r.name, r.type) for r in refs] == \
        [("main", "branch"), ("v1", "tag")]

    # composes with plain SQL (join the snapshots list against itself)
    n = spark.sql(
        f"SELECT count(*) FROM iceberg_snapshots('{esc}') a "
        f"JOIN iceberg_refs('{esc}') b ON a.snapshot_id = b.snapshot_id"
    ).first()[0]
    assert n == 2  # main + v1 point at the delete snapshot
