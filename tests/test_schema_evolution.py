"""Schema evolution with column defaults: ``initial-default`` must surface
for pre-existing files while post-add files keep their written values
(reference: iceberg_column_definition.cpp:26-75; missing-column handling
iceberg_multi_file_reader.cpp:100-115)."""

import datetime

import pytest

from pyspark.sql import functions as F

from tests.conftest import load


def test_initial_default_on_old_files(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import add_column

    loc = str(tmp_path / "t")
    write_iceberg(load(spark, sf_dir, "region"), loc)
    add_column(loc, "score", "int", default=7)

    got = iceberg_scan(spark, loc)
    assert got.schema["score"].dataType.typeName() == "integer"
    assert [r.score for r in got.collect()] == [7] * got.count()


def test_initial_default_mixed_old_and_new_files(spark, sf_dir, tmp_path):
    """Old files surface the default; files written after the add keep
    their values — including explicit NULLs."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import add_column

    loc = str(tmp_path / "t")
    old = load(spark, sf_dir, "nation").where("n_nationkey < 10")
    write_iceberg(old, loc)
    add_column(loc, "score", "long", default=42)

    new = (load(spark, sf_dir, "nation").where("n_nationkey >= 10")
           .withColumn("score",
                       F.when(F.col("n_nationkey") % 2 == 0, F.col("n_nationkey"))
                       .cast("long")))
    write_iceberg(new, loc)

    rows = {r.n_nationkey: r.score
            for r in iceberg_scan(spark, loc).collect()}
    for k, v in rows.items():
        if k < 10:
            assert v == 42, (k, v)
        elif k % 2 == 0:
            assert v == k, (k, v)
        else:
            assert v is None, (k, v)


def test_required_add_with_default_and_date_type(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.ddl import add_column

    loc = str(tmp_path / "t")
    write_iceberg(load(spark, sf_dir, "region"), loc)
    add_column(loc, "valid_from", "date", required=True, default="2020-01-01")

    tm = load_table_metadata(loc)
    f = [x for x in tm.schema_json()["fields"] if x["name"] == "valid_from"][0]
    assert f["required"] is True
    assert f["initial-default"] == "2020-01-01"
    got = iceberg_scan(spark, loc).select("valid_from").distinct().collect()
    assert [r.valid_from for r in got] == [datetime.date(2020, 1, 1)]


def test_add_column_default_must_cast_at_ddl_time(spark, sf_dir, tmp_path):
    """Reference parity (alter_add_column_default_type_error.test /
    alter_default.test): a DEFAULT that doesn't cast to the column type
    fails the ALTER itself ('Failed to cast value: Could not convert …'),
    never a later read; duplicate names fail like
    alter_add_column_same_name_error.test."""
    import pytest

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.ddl import add_column, set_column_default

    loc = str(tmp_path / "t")
    write_iceberg(load(spark, sf_dir, "region"), loc)
    with pytest.raises(ValueError, match="Could not convert"):
        add_column(loc, "b", "int",
                   default="this is a string, not an int")
    with pytest.raises(ValueError, match="Could not convert"):
        add_column(loc, "b", "int", default=2**40)  # out of INT32 range
    with pytest.raises(ValueError, match="Could not convert"):
        add_column(loc, "d", "date", default="not-a-date")
    # the failed ALTERs committed nothing
    from duckdb_iceberg_spark.metadata.table_metadata import (
        load_table_metadata,
    )
    names = {f["name"] for f in load_table_metadata(loc)
             .schema_json()["fields"]}
    assert "b" not in names and "d" not in names
    # valid casts still work, incl. numeric strings (DuckDB casts those)
    add_column(loc, "b", "int", default="42")
    # plain decimal cast semantics (ADVICE r10): leading zeros are a
    # legitimate decimal string; hex/binary forms are NOT a decimal cast
    add_column(loc, "lz", "int", default="042")
    with pytest.raises(ValueError, match="Could not convert"):
        add_column(loc, "hx", "int", default="0x2a")
    with pytest.raises(ValueError, match="already exists"):
        add_column(loc, "b", "int")
    with pytest.raises(ValueError, match="Could not convert"):
        set_column_default(loc, "b", "nope")


def test_required_add_without_default_still_rejected(spark, sf_dir, tmp_path):
    import pytest

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.ddl import add_column

    loc = str(tmp_path / "t")
    write_iceberg(load(spark, sf_dir, "region"), loc)
    with pytest.raises(ValueError, match="default"):
        add_column(loc, "x", "int", required=True)


def test_nested_initial_default_on_old_files(spark, tmp_path):
    """A member added inside a struct (dotted add_column — beyond the
    reference, which rejects nested adds) surfaces its initial-default for
    pre-add files; a NULL parent struct stays NULL."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import add_column

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("s", T.StructType([
            T.StructField("x", T.IntegerType(), True),
            T.StructField("y", T.StringType(), True),
        ]), True),
    ])
    df = spark.createDataFrame(
        [(1, Row(x=10, y="a")), (2, Row(x=None, y="b")), (3, None)], schema)
    loc = str(tmp_path / "t")
    write_iceberg(df, loc)
    add_column(loc, "s.z", "int", default=5)

    got = {r.id: r.s for r in iceberg_scan(spark, loc).collect()}
    assert got[1].z == 5 and got[1].x == 10 and got[1].y == "a"
    assert got[2].z == 5 and got[2].x is None
    assert got[3] is None


def test_nested_rename_and_drop(spark, tmp_path):
    """Renaming and dropping struct members via dotted paths: field-ids are
    preserved on rename so old files keep resolving BY_FIELD_ID."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import drop_column, rename_column

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("s", T.StructType([
            T.StructField("x", T.IntegerType(), True),
            T.StructField("y", T.StringType(), True),
        ]), True),
    ])
    df = spark.createDataFrame([(1, Row(x=10, y="a")), (2, Row(x=20, y="b"))], schema)
    loc = str(tmp_path / "t")
    write_iceberg(df, loc)

    rename_column(loc, "s.x", "ex")
    got = {r.id: r.s for r in iceberg_scan(spark, loc).collect()}
    assert got[1].ex == 10 and got[2].ex == 20  # old files resolve by id

    drop_column(loc, "s.y")
    row = iceberg_scan(spark, loc).where("id = 1").collect()[0]
    assert row.s.asDict() == {"ex": 10}


def test_widen_date_to_timestamp(spark, tmp_path):
    """date → timestamp promotion (reference: alter/alter_type.test,
    alter_type_v3.test): pre-promotion files read back at midnight, new
    files carry full timestamps; date→timestamp_ns is v3-gated; promotion
    refused when a partition field or sort order refers to the column."""
    import datetime as dt

    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources import ddl

    loc = str(tmp_path / "d2ts")
    write_iceberg(spark.sql("SELECT DATE'1934-11-05' AS d"), loc)
    ddl.widen_column(loc, "d", "timestamp")
    write_iceberg(spark.sql("SELECT TIMESTAMP'2013-11-23 19:53:12' AS d"), loc)
    got = sorted(r.d for r in iceberg_scan(spark, loc).collect())
    assert got == [dt.datetime(1934, 11, 5, 0, 0),
                   dt.datetime(2013, 11, 23, 19, 53, 12)]

    # v3 gate for timestamp_ns
    loc2 = str(tmp_path / "d2ns_v2")
    write_iceberg(spark.sql("SELECT DATE'2000-01-01' AS d"), loc2)
    with pytest.raises(ValueError, match="V3 feature"):
        ddl.widen_column(loc2, "d", "timestamp_ns")
    loc3 = str(tmp_path / "d2ns_v3")
    write_iceberg(spark.sql("SELECT DATE'2000-01-01' AS d"), loc3,
                  format_version=3)
    ddl.widen_column(loc3, "d", "timestamp_ns")

    # partition guard: hour(d)-partitioned column cannot be promoted
    loc4 = str(tmp_path / "d2ts_part")
    write_iceberg(spark.sql("SELECT DATE'2000-01-01' AS d, 1 AS x"), loc4,
                  partition_by=["d"])
    with pytest.raises(ValueError, match="partition field"):
        ddl.widen_column(loc4, "d", "timestamp")

    # sort-order guard: ANY type change on a sort column is refused
    loc5 = str(tmp_path / "sorted_int")
    write_iceberg(spark.range(5).selectExpr("CAST(id AS INT) AS k"), loc5,
                  sort_by=["k"])
    with pytest.raises(ValueError, match="sort order"):
        ddl.widen_column(loc5, "k", "long")


def test_partition_source_type_promotion(spark, tmp_path):
    """Widening the partition SOURCE column (reference:
    reads/test_read_partitioned_table_type_promotion.test): files written
    under the int schema keep int partition values in their manifests;
    after widen_column to long, both generations scan, prune, and filter
    correctly under the promoted type."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources import ddl

    loc = str(tmp_path / "t_promo")
    write_iceberg(spark.sql(
        "SELECT CAST(id AS INT) AS k, CAST(id*10 AS INT) AS v FROM range(6)"),
        loc, partition_by=["k"])
    ddl.widen_column(loc, "k", "long")
    write_iceberg(spark.sql(
        "SELECT CAST(id+100 AS BIGINT) AS k, CAST(id*10 AS INT) AS v "
        "FROM range(3)"), loc)

    got = iceberg_scan(spark, loc)
    assert got.count() == 9
    assert got.schema["k"].dataType.typeName() == "long"
    tm = load_table_metadata(loc)
    assert len(plan_scan(tm, tm.select_snapshot(), "k = 2").tasks) == 1
    assert got.where("k = 2").count() == 1
    assert got.where("k = 101").count() == 1


def test_struct_member_evolution_inside_list_and_map(spark, tmp_path):
    """Rename + widen of struct members nested inside list elements and
    map values (reference: schema_evolve_struct_in_list.test /
    schema_evolve_struct_in_map.test — Spark-evolved tables where
    'name'→'given_name' and age int→long inside list<struct>): DDL paths
    traverse the Iceberg container vocabulary (element/key/value), old
    int32 files read under the widened long schema, and renamed members
    resolve by field-id across both file generations."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources import ddl

    loc = str(tmp_path / "t_sil")
    write_iceberg(spark.sql(
        "SELECT id, array(named_struct('name', concat('p', id), "
        "'age', CAST(20+id AS INT))) AS people FROM range(3)"), loc)
    ddl.rename_column(loc, "people.element.name", "given_name")
    ddl.widen_column(loc, "people.element.age", "long")
    write_iceberg(spark.sql(
        "SELECT id+100 AS id, array(named_struct('given_name', "
        "concat('q', id), 'age', CAST(9223372036854775807 AS BIGINT))) "
        "AS people FROM range(2)"), loc)
    rows = iceberg_scan(spark, loc).orderBy("id").collect()
    assert [r.people[0].given_name for r in rows] == \
        ["p0", "p1", "p2", "q0", "q1"]
    assert rows[0].people[0].age == 20                      # pre-widen file
    assert rows[-1].people[0].age == 9223372036854775807    # needs long

    loc2 = str(tmp_path / "t_sim")
    write_iceberg(spark.sql(
        "SELECT id, map('k', named_struct('v', CAST(id AS INT))) AS m "
        "FROM range(2)"), loc2)
    ddl.widen_column(loc2, "m.value.v", "long")
    write_iceberg(spark.sql(
        "SELECT id+10 AS id, map('k', named_struct('v', "
        "CAST(2147483649 AS BIGINT))) AS m FROM range(1)"), loc2)
    got = {r.id: dict(r.m)["k"].v for r in iceberg_scan(spark, loc2).collect()}
    assert got == {0: 0, 1: 1, 10: 2147483649}

    # paths ending ON a container hop are rejected, not misapplied
    import pytest as _pytest

    with _pytest.raises(KeyError):
        ddl.rename_column(loc, "people.element", "nope")


def test_column_name_containing_dot(spark, tmp_path):
    """Iceberg field names may legally CONTAIN dots; an exact top-level
    match wins over dotted-path traversal, so a column literally named
    'a.b' stays addressable by every DDL entry point — even when a struct
    column 'a' with member 'b' ALSO exists (the exact name is the only
    unambiguous reading)."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources import ddl

    loc = str(tmp_path / "t_dotcol")
    write_iceberg(spark.sql(
        "SELECT CAST(id AS INT) AS `a.b`, "
        "named_struct('b', CAST(id*10 AS INT)) AS a FROM range(3)"), loc)

    ddl.widen_column(loc, "a.b", "long")          # exact name, not a.b path
    ddl.set_column_doc(loc, "a.b", "dotted name")
    got = iceberg_scan(spark, loc)
    assert got.schema["a.b"].dataType.typeName() == "long"
    assert got.schema["a"].dataType["b"].dataType.typeName() == "integer"

    # the struct member stays reachable once the dotted column is renamed
    ddl.rename_column(loc, "a.b", "ab")
    ddl.widen_column(loc, "a.b", "long")          # now traverses a -> b
    got2 = iceberg_scan(spark, loc)
    assert got2.schema["a"].dataType["b"].dataType.typeName() == "long"
    assert got2.selectExpr("sum(ab)").first()[0] == 3


def test_nested_member_name_containing_dot(spark, tmp_path):
    """The parquet-mr ColumnPath collision one level down: a struct member
    literally named 'b.c' beside a sibling struct b{c} flattens both
    leaves to path 'a.b.c'. The scan must route around Spark's native
    reader (which misresolves the collision) even though no TOP-LEVEL
    name carries a dot."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg

    loc = str(tmp_path / "t_nested_dot")
    write_iceberg(spark.sql(
        "SELECT id, named_struct('b.c', CAST(id AS INT), "
        "'b', named_struct('c', CAST(id*10 AS INT))) AS a FROM range(3)"),
        loc)
    rows = sorted((r.id, r.a["b.c"], r.a.b.c)
                  for r in iceberg_scan(spark, loc).collect())
    assert rows == [(0, 0, 0), (1, 1, 10), (2, 2, 20)]
