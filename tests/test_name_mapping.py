"""Name-mapping fallback: files written without parquet field-ids are
resolved via ``schema.name-mapping.default``
(reference: ApplyFieldMapping, iceberg_multi_file_reader.cpp:203-238;
load-bearing config note in SURVEY.md §1.2)."""

import json
import os

import pyarrow.parquet as pq
import pyarrow as pa

from tests.conftest import load


def _strip_field_ids(parquet_path: str, rename: dict[str, str] | None = None) -> None:
    """Rewrite a parquet file dropping field-id metadata (and optionally
    renaming columns) — simulates a legacy non-Iceberg writer."""
    t = pq.read_table(parquet_path)
    fields = []
    for f in t.schema:
        name = (rename or {}).get(f.name, f.name)
        fields.append(pa.field(name, f.type, f.nullable))  # metadata dropped
    clean = pa.Table.from_arrays(t.columns, schema=pa.schema(fields))
    pq.write_table(clean, parquet_path)
    # drop the Hadoop local-FS checksum sidecar the rewrite invalidated
    crc = os.path.join(os.path.dirname(parquet_path),
                       "." + os.path.basename(parquet_path) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def _data_files(loc: str) -> list[str]:
    out = []
    for root, _, names in os.walk(os.path.join(loc, "data")):
        out += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    return sorted(out)


def _name_mapping_for(loc: str) -> str:
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    tm = load_table_metadata(loc)
    return json.dumps([
        {"field-id": f["id"], "names": [f["name"]]}
        for f in tm.schema_json()["fields"]
    ])


def test_legacy_file_without_field_ids(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import set_table_properties

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t")
    write_iceberg(src, loc)
    mapping = _name_mapping_for(loc)
    for f in _data_files(loc):
        _strip_field_ids(f)

    set_table_properties(loc, {"schema.name-mapping.default": mapping})
    got = iceberg_scan(spark, loc).orderBy("r_regionkey").collect()
    want = src.orderBy("r_regionkey").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_name_mapping_with_renamed_column(spark, sf_dir, tmp_path):
    """Current schema renamed a column after the legacy file was written:
    the mapping's historical names list resolves the file column."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import rename_column, set_table_properties

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t")
    write_iceberg(src, loc)
    mapping = _name_mapping_for(loc)  # maps historical name r_name
    for f in _data_files(loc):
        _strip_field_ids(f)
    rename_column(loc, "r_name", "region_name")

    # without the mapping, neither field-id nor by-name matching can
    # resolve the renamed column from the legacy file
    nulls = iceberg_scan(spark, loc).where("region_name IS NULL").count()
    assert nulls == src.count()

    set_table_properties(loc, {"schema.name-mapping.default": mapping})

    df = iceberg_scan(spark, loc)
    assert "region_name" in df.columns
    got = {r.r_regionkey: r.region_name for r in df.collect()}
    want = {r.r_regionkey: r.r_name for r in src.collect()}
    assert got == want


def test_mixed_legacy_and_field_id_files(spark, sf_dir, tmp_path):
    """One appended file keeps field-ids, the original is stripped: the scan
    unions the by-id read with the by-name read."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import set_table_properties

    src = load(spark, sf_dir, "nation")
    first = src.where("n_nationkey < 10")
    second = src.where("n_nationkey >= 10")
    loc = str(tmp_path / "t")
    write_iceberg(first, loc)
    mapping = _name_mapping_for(loc)
    legacy_files = _data_files(loc)
    for f in legacy_files:
        _strip_field_ids(f)
    write_iceberg(second, loc)
    set_table_properties(loc, {"schema.name-mapping.default": mapping})

    got = iceberg_scan(spark, loc).orderBy("n_nationkey").collect()
    want = src.orderBy("n_nationkey").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def _nested_df(spark):
    from pyspark.sql import Row
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("s", T.StructType([
            T.StructField("x", T.IntegerType(), True),
            T.StructField("y", T.StringType(), True),
        ]), True),
        T.StructField("arr", T.ArrayType(T.LongType()), True),
        T.StructField("m", T.MapType(T.StringType(), T.DoubleType(), False), True),
    ])
    rows = [
        (1, Row(x=10, y="a"), [1, 2, 3], {"k1": 1.5}),
        (2, Row(x=None, y="b"), [], {}),
        (3, None, None, None),
    ]
    return spark.createDataFrame(rows, schema)


def _nested_mapping_for(loc: str, x_names: list[str]) -> str:
    """Full name-mapping JSON incl. nested struct/list/map children; the
    struct member x lists the historical names in ``x_names``."""
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    by = {f["name"]: f for f in
          load_table_metadata(loc).schema_json()["fields"]}
    s_t, arr_t, m_t = by["s"]["type"], by["arr"]["type"], by["m"]["type"]
    s_kids = {c["name"]: c["id"] for c in s_t["fields"]}
    return json.dumps([
        {"field-id": by["id"]["id"], "names": ["id"]},
        {"field-id": by["s"]["id"], "names": ["s"], "fields": [
            {"field-id": s_kids["x"], "names": x_names},
            {"field-id": s_kids["y"], "names": ["y"]},
        ]},
        {"field-id": by["arr"]["id"], "names": ["arr"], "fields": [
            {"field-id": arr_t["element-id"], "names": ["element"]},
        ]},
        {"field-id": by["m"]["id"], "names": ["m"], "fields": [
            {"field-id": m_t["key-id"], "names": ["key"]},
            {"field-id": m_t["value-id"], "names": ["value"]},
        ]},
    ])


def _replace_data_file_with_legacy(spark, loc: str, legacy_df, tmp_dir: str) -> None:
    """Overwrite the table's single data file with a field-id-less rewrite
    of the same rows (simulates a legacy non-Iceberg writer)."""
    import shutil

    [target] = _data_files(loc)
    out = os.path.join(tmp_dir, "legacy_out")
    legacy_df.coalesce(1).write.mode("overwrite").parquet(out)
    [part] = [os.path.join(out, n) for n in os.listdir(out)
              if n.endswith(".parquet")]
    shutil.copyfile(part, target)
    crc = os.path.join(os.path.dirname(target),
                       "." + os.path.basename(target) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_nested_name_mapping_round_trip(spark, tmp_path):
    """Legacy file without field-ids: struct members, list elements, and map
    values all resolve through the mapping's nested ``fields`` entries."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import set_table_properties

    src = _nested_df(spark)
    loc = str(tmp_path / "t")
    write_iceberg(src.coalesce(1), loc)
    _replace_data_file_with_legacy(spark, loc, src, str(tmp_path))
    set_table_properties(
        loc, {"schema.name-mapping.default": _nested_mapping_for(loc, ["x"])})

    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert got[1].s.x == 10 and got[1].s.y == "a"
    assert got[1].arr == [1, 2, 3] and got[1].m == {"k1": 1.5}
    assert got[2].s.x is None and got[2].arr == [] and got[2].m == {}
    assert got[3].s is None and got[3].arr is None and got[3].m is None


def test_nested_name_mapping_renamed_member(spark, tmp_path):
    """The legacy file wrote the struct member as ``ex``; the mapping's
    historical-names list resolves it onto the current ``x``."""
    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.ddl import set_table_properties

    src = _nested_df(spark)
    loc = str(tmp_path / "t")
    write_iceberg(src.coalesce(1), loc)

    legacy_st = T.StructType([
        T.StructField("ex", T.IntegerType(), True),
        T.StructField("y", T.StringType(), True),
    ])
    legacy = src.withColumn(
        "s",
        F.when(F.col("s").isNotNull(),
               F.struct(F.col("s.x").alias("ex"), F.col("s.y").alias("y")))
        .otherwise(F.lit(None).cast(legacy_st)))
    _replace_data_file_with_legacy(spark, loc, legacy, str(tmp_path))
    set_table_properties(
        loc,
        {"schema.name-mapping.default": _nested_mapping_for(loc, ["ex", "x"])})

    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert got[1].s.x == 10 and got[1].s.y == "a"
    assert got[2].s.x is None and got[2].s.y == "b"
    assert got[3].s is None
