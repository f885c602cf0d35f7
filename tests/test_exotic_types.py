"""End-to-end coverage for the documented lossy/tagged type mappings
(SURVEY.md §1.2; reference type parsing:
src/core/metadata/schema/iceberg_column_definition.cpp:82-241):

- time      → LongType µs + iceberg.type tag
- uuid      → StringType canonical form
- fixed[16] → BinaryType
- geometry  → BinaryType (WKB)
- variant   → Spark VariantType (4.x) when available
"""

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_iceberg_spark.metadata.types import FIELD_ID_KEY, ICEBERG_TYPE_KEY


def _tagged_schema():
    def fld(name, dtype, fid, ice=None):
        md = {FIELD_ID_KEY: fid}
        if ice:
            md[ICEBERG_TYPE_KEY] = ice
        return T.StructField(name, dtype, True, metadata=md)

    return T.StructType([
        fld("id", T.LongType(), 1),
        fld("t_time", T.LongType(), 2, "time"),
        fld("t_uuid", T.StringType(), 3, "uuid"),
        fld("t_fixed", T.BinaryType(), 4, "fixed[16]"),
        fld("t_geom", T.BinaryType(), 5, "geometry"),
    ])


def test_tagged_types_round_trip(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    u = str(uuid.uuid4())
    wkb_point = bytes.fromhex(
        "0101000000000000000000f03f0000000000000040")  # POINT(1 2)
    rows = [
        (1, 12 * 3600 * 1_000_000, u, b"0123456789abcdef", wkb_point),
        (2, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, _tagged_schema())
    loc = str(tmp_path / "t")
    write_iceberg(df, loc)

    # metadata must declare the Iceberg types, not the Spark carrier types
    tm = load_table_metadata(loc)
    declared = {f["name"]: f["type"] for f in tm.schema_json()["fields"]}
    assert declared["t_time"] == "time"
    assert declared["t_uuid"] == "uuid"
    assert declared["t_fixed"] == "fixed[16]"
    assert declared["t_geom"] == "geometry"

    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert got[1].t_time == 12 * 3600 * 1_000_000
    assert got[1].t_uuid == u
    assert got[1].t_fixed == b"0123456789abcdef"
    assert got[1].t_geom == wkb_point
    assert got[2].t_time is None and got[2].t_uuid is None


def test_tagged_types_survive_filter_pushdown(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg

    df = spark.createDataFrame(
        [(i, i * 1000, str(uuid.UUID(int=i)), None, None) for i in range(100)],
        _tagged_schema())
    loc = str(tmp_path / "t")
    write_iceberg(df, loc)
    out = iceberg_scan(spark, loc, where="id >= 90").collect()
    assert len(out) == 10
    assert all(r.t_uuid == str(uuid.UUID(int=r.id)) for r in out)


def test_variant_type_mapping():
    """variant maps to Spark VariantType when the runtime has it
    (Spark 4.x), else a documented JSON-string fallback."""
    from duckdb_iceberg_spark.metadata.types import iceberg_to_spark

    t = iceberg_to_spark("variant")
    vt = getattr(T, "VariantType", None)
    if vt is not None:
        assert isinstance(t, vt)
    else:
        assert isinstance(t, T.StringType)


def test_variant_column_round_trip(spark, tmp_path):
    """Write a VariantType column through the full write/scan path."""
    vt = getattr(T, "VariantType", None)
    if vt is None:
        pytest.skip("Spark VariantType not available")
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg

    df = spark.range(3).select(
        F.col("id"),
        F.parse_json(
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("v"))
    loc = str(tmp_path / "t")
    try:
        write_iceberg(df, loc)
    except Exception as e:  # pragma: no cover - depends on Spark parquet support
        pytest.skip(f"variant parquet write unsupported here: {e}")
    got = iceberg_scan(spark, loc)
    assert got.schema["v"].dataType.typeName() == "variant"
    vals = sorted(
        json.loads(r.v)["k"]
        for r in got.select(F.to_json("v").alias("v"), "id").collect())
    assert vals == [0, 1, 2]
