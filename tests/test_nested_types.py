"""Nested type round trips (struct / list / map) through write_iceberg →
metadata JSON → iceberg_scan (reference nested-type parsing:
src/core/metadata/schema/iceberg_column_definition.cpp:189-241; the
reference's nested-types sqllogictests are the model)."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _df(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("s", T.StructType([
            T.StructField("x", T.IntegerType(), True),
            T.StructField("y", T.StringType(), True),
        ]), True),
        T.StructField("arr", T.ArrayType(T.LongType()), True),
        T.StructField("m", T.MapType(T.StringType(), T.DoubleType()), True),
    ])
    rows = [
        (1, Row(x=10, y="a"), [1, 2, 3], {"k1": 1.5}),
        (2, Row(x=None, y="b"), [], {}),
        (3, None, None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_nested_round_trip(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    loc = str(tmp_path / "t")
    write_iceberg(_df(spark), loc)

    # metadata declares nested types with child ids
    tm = load_table_metadata(loc)
    by_name = {f["name"]: f for f in tm.schema_json()["fields"]}
    assert by_name["s"]["type"]["type"] == "struct"
    child_ids = [c["id"] for c in by_name["s"]["type"]["fields"]]
    assert len(set(child_ids)) == 2
    assert by_name["arr"]["type"]["type"] == "list"
    assert "element-id" in by_name["arr"]["type"]
    assert by_name["m"]["type"]["type"] == "map"

    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert got[1].s.x == 10 and got[1].s.y == "a"
    assert got[1].arr == [1, 2, 3]
    assert got[1].m == {"k1": 1.5}
    assert got[2].s.x is None and got[2].arr == [] and got[2].m == {}
    assert got[3].s is None and got[3].arr is None and got[3].m is None


def test_nested_struct_field_filter(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg

    loc = str(tmp_path / "t")
    write_iceberg(_df(spark), loc)
    out = iceberg_scan(spark, loc).filter(F.col("s.x") == 10).collect()
    assert [r.id for r in out] == [1]


def test_nested_after_append_and_delete(spark, tmp_path):
    """Nested columns survive the merge-on-read delete path (anti-join on
    _metadata position columns must not disturb complex columns)."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t")
    write_iceberg(_df(spark), loc)
    delete_from(spark, loc, "id = 2", mode="merge-on-read")
    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert set(got) == {1, 3}
    assert got[1].s.y == "a" and got[1].m == {"k1": 1.5}
