"""Avro DATA files (r12 — the THIRD data-file format; the reference
refuses everything non-parquet, iceberg_multi_file_list.cpp:528-529):
read through the arrow plane's pure-Python Avro codec, by-field-id
resolution (renames keep reading old files), real row ordinals (so
positional deletes / MoR DML work), logical-type decode for
date/timestamp/decimal."""

import datetime as dt
import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_iceberg_spark import iceberg_count, iceberg_scan
from duckdb_iceberg_spark.metadata import manifest as mf
from duckdb_iceberg_spark.metadata.avro_io import write_avro_file
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.sources.writer import commit_snapshot, create_table


def _avro_table(tmp_path, spark, rows, avro_schema, spark_schema,
                name="t_avro"):
    """Author an Iceberg table whose single data file is Avro — the shape
    a Flink/Java writer with write.format.default=avro produces."""
    loc = str(tmp_path / name)
    tm = create_table(loc, spark_schema)
    data_dir = os.path.join(loc, "data")
    os.makedirs(data_dir, exist_ok=True)
    p = os.path.join(data_dir, "f0.avro")
    write_avro_file(p, avro_schema, rows)
    df = mf.DataFile(
        content=mf.CONTENT_DATA, file_path=p, file_format="AVRO",
        partition={}, record_count=len(rows),
        file_size_in_bytes=os.path.getsize(p))
    commit_snapshot(tm, operation="append", new_data_files=[df])
    return loc


_SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "id", "field-id": 1, "type": ["null", "long"]},
        {"name": "name", "field-id": 2, "type": ["null", "string"]},
        {"name": "d", "field-id": 3,
         "type": ["null", {"type": "int", "logicalType": "date"}]},
        {"name": "ts", "field-id": 4,
         "type": ["null", {"type": "long",
                           "logicalType": "timestamp-micros"}]},
        {"name": "amount", "field-id": 5,
         "type": ["null", {"type": "bytes", "logicalType": "decimal",
                           "precision": 10, "scale": 2}]},
    ]}

_SPARK_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("d", T.DateType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("amount", T.DecimalType(10, 2)),
])


def _rows(n=20):
    out = []
    for i in range(n):
        unscaled = (i * 125 + 1)  # amount = unscaled / 100
        out.append({
            "id": i,
            "name": f"row{i}" if i % 7 else None,
            "d": 19000 + i,            # days since epoch
            "ts": 1_700_000_000_000_000 + i * 1_000_000,  # µs
            "amount": int(unscaled).to_bytes(
                (unscaled.bit_length() + 8) // 8, "big", signed=True),
        })
    return out


def test_avro_scan_roundtrip_with_logical_types(spark, tmp_path):
    rows = _rows()
    loc = _avro_table(tmp_path, spark, rows, _SCHEMA, _SPARK_SCHEMA)
    got = iceberg_scan(spark, loc).orderBy("id").collect()
    assert len(got) == 20
    assert got[3].id == 3 and got[3].name == "row3"
    assert got[0].name is None  # i % 7 == 0 → NULL survives the union
    assert got[5].d == dt.date(1970, 1, 1) + dt.timedelta(days=19005)
    assert got[2].ts == dt.datetime(1970, 1, 1) + dt.timedelta(
        microseconds=1_700_000_000_000_000 + 2_000_000)
    assert got[4].amount == Decimal("5.01")
    # metadata-only count works off the manifest regardless of format
    assert iceberg_count(loc) == 20
    # predicate + projection through the arrow plane
    sel = iceberg_scan(spark, loc, where="id >= 15").select("id", "amount")
    assert sorted(r.id for r in sel.collect()) == list(range(15, 20))


def test_avro_rename_resolves_by_field_id(spark, tmp_path):
    from duckdb_iceberg_spark.sources.ddl import add_column, rename_column

    rows = _rows(10)
    loc = _avro_table(tmp_path, spark, rows, _SCHEMA, _SPARK_SCHEMA,
                      name="t_avro_ren")
    rename_column(loc, "name", "title")
    add_column(loc, "extra", "long")
    got = iceberg_scan(spark, loc).orderBy("id").collect()
    assert got[3].title == "row3", "field-id resolution must survive rename"
    assert all(r.extra is None for r in got)


def test_avro_mor_positional_delete_and_file_info(spark, tmp_path):
    from duckdb_iceberg_spark.sources.dml import delete_from

    rows = _rows(30)
    loc = _avro_table(tmp_path, spark, rows, _SCHEMA, _SPARK_SCHEMA,
                      name="t_avro_mor")
    fi = iceberg_scan(spark, loc, with_file_info=True).collect()
    assert sorted(r.file_row_number for r in fi) == list(range(30))

    delete_from(spark, loc, "id % 3 = 0", mode="merge-on-read")
    tm = load_table_metadata(loc)
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    plan = plan_scan(tm, tm.select_snapshot())
    assert {t.data_file.file_format for t in plan.tasks} == {"AVRO"}
    assert any(t.positional_deletes for t in plan.tasks)
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(30) if i % 3]


# field-ids match what create_table assigns the spark schema below
# (breadth-first: top-level 1-4, then s.x=5, s.label=6, xs.element=7,
# attrs key/value=8/9) — an Iceberg-Avro writer stamps the TABLE's ids
_NESTED_SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "id", "field-id": 1, "type": ["null", "long"]},
        {"name": "s", "field-id": 2, "type": ["null", {
            "type": "record", "name": "inner", "fields": [
                {"name": "x", "field-id": 5, "type": ["null", "long"]},
                {"name": "label", "field-id": 6,
                 "type": ["null", "string"]}]}]},
        {"name": "xs", "field-id": 3, "type": ["null", {
            "type": "array", "element-id": 7, "items": ["null", "long"]}]},
        {"name": "attrs", "field-id": 4, "type": ["null", {
            "type": "map", "key-id": 8, "value-id": 9,
            "values": ["null", "long"]}]},
    ]}


def _nested_spark_schema():
    return T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StructType([
            T.StructField("x", T.LongType()),
            T.StructField("label", T.StringType()),
        ])),
        T.StructField("xs", T.ArrayType(T.LongType())),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
    ])


def _nested_rows(n=12):
    out = []
    for i in range(n):
        out.append({
            "id": i,
            "s": None if i % 5 == 4 else {"x": i * 10, "label": f"L{i}"},
            "xs": None if i % 4 == 3 else [i, i + 1, None][: (i % 3) + 1],
            "attrs": None if i % 6 == 5 else {"a": i, "b": i * 2},
        })
    return out


def test_avro_nested_struct_list_map(spark, tmp_path):
    """r13 (VERDICT r12 task 4): nested types over Avro data files —
    struct / list / string-keyed map roundtrip with NULLs at every
    level (the foreign Flink/legacy-table shape; the reference reads no
    Avro data at all)."""
    rows = _nested_rows()
    loc = _avro_table(tmp_path, spark, rows, _NESTED_SCHEMA,
                      _nested_spark_schema(), name="t_avro_nested")
    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert len(got) == 12
    assert got[1].s.x == 10 and got[1].s.label == "L1"
    assert got[4].s is None and got[9].s is None
    assert got[3].xs is None and got[7].xs is None
    assert got[1].xs == [1, 2] and got[2].xs == [2, 3, None]
    assert got[0].xs == [0]
    assert got[5].attrs is None and got[11].attrs is None
    assert got[2].attrs == {"a": 2, "b": 4}


def test_avro_nested_member_rename_resolves_by_field_id(spark, tmp_path):
    """A renamed STRUCT MEMBER resolves by field-id against old Avro
    files (same contract as the parquet plane); a member the file never
    had null-fills."""
    from duckdb_iceberg_spark.sources.ddl import rename_column

    rows = _nested_rows(8)
    loc = _avro_table(tmp_path, spark, rows, _NESTED_SCHEMA,
                      _nested_spark_schema(), name="t_avro_nested_ren")
    rename_column(loc, "s.x", "x_renamed")
    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert got[2].s.x_renamed == 20, \
        "struct-member field-id resolution must survive rename"
    assert got[2].s.label == "L2"


def test_avro_array_encoded_map_non_string_keys(spark, tmp_path):
    """Iceberg's non-string-key map encoding over Avro: an array of
    {key, value} records with logicalType map decodes to a real map
    column."""
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "field-id": 1, "type": ["null", "long"]},
        {"name": "m", "field-id": 2, "type": ["null", {
            "type": "array", "logicalType": "map",
            "items": {"type": "record", "name": "k_v", "fields": [
                {"name": "key", "field-id": 3, "type": "long"},
                {"name": "value", "field-id": 4,
                 "type": ["null", "string"]}]}}]},
    ]}
    sp = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("m", T.MapType(T.LongType(), T.StringType()),
                      metadata={"parquet.field.id": 2}),
    ])
    rows = [
        {"id": 0, "m": [{"key": 7, "value": "seven"},
                        {"key": 9, "value": None}]},
        {"id": 1, "m": None},
        {"id": 2, "m": []},
    ]
    loc = _avro_table(tmp_path, spark, rows, schema, sp,
                      name="t_avro_kvmap")
    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert got[0].m == {7: "seven", 9: None}
    assert got[1].m is None
    assert got[2].m == {}


def test_avro_write_format_roundtrip(spark, sf_dir, tmp_path):
    """r13: write.format.default=avro writes REAL Avro data files through
    the pure-Python codec with in-pass stats; scans read them back
    by field-id and zone maps prune on the recorded bounds."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "lang", "n_chars"))
    loc = str(tmp_path / "t_avro_write")
    write_iceberg(docs.repartition(4), loc,
                  properties={"write.format.default": "avro"})

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    assert {t.data_file.file_format for t in plan.tasks} == {"AVRO"}
    assert all(t.data_file.file_path.endswith(".avro") for t in plan.tasks)
    # in-pass stats landed: bounds present, pruning works
    hi = docs.agg(F.max("doc_id")).first()[0]
    pruned = plan_scan(tm, tm.select_snapshot(),
                       where=f"doc_id > {int(hi) + 10}")
    assert len(pruned.tasks) == 0, "zone maps must prune on avro bounds"

    got = iceberg_scan(spark, loc)
    assert got.count() == docs.count()
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in docs.collect())
    assert a == b


def test_avro_write_then_mor_delete(spark, sf_dir, tmp_path):
    """Written Avro files carry real row ordinals: a MoR positional
    delete on top applies exactly."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t_avro_write_mor")
    write_iceberg(
        spark.range(0, 200).selectExpr("id", "cast(id % 5 as long) m"),
        loc, properties={"write.format.default": "avro"})
    delete_from(spark, loc, "m = 2", mode="merge-on-read")
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(200) if i % 5 != 2]


def test_avro_write_partitioned_and_decimal(spark, sf_dir, tmp_path):
    """Identity-partitioned Avro writes render the same hive dirs
    partitionBy does (manifest partition tuples + pruning work), and
    decimals roundtrip through the schema's fixed-size big-endian
    encoding with exact bounds."""
    from decimal import Decimal

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    df = spark.range(0, 100).selectExpr(
        "id", "cast(id % 4 as long) bucket",
        "cast(cast(id as decimal(12,2)) / 7 as decimal(12,2)) amt")
    loc = str(tmp_path / "t_avro_part")
    write_iceberg(df, loc, partition_by=["bucket"],
                  properties={"write.format.default": "avro"})

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    assert {t.data_file.partition.get("bucket") for t in plan.tasks} == \
        {0, 1, 2, 3}
    pruned = plan_scan(tm, tm.select_snapshot(), where="bucket = 2")
    assert pruned.tasks and all(
        t.data_file.partition["bucket"] == 2 for t in pruned.tasks)

    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert len(got) == 100
    assert got[70].amt == Decimal("10.00") and got[70].bucket == 2
    assert got[13].amt == Decimal("1.86")


def test_avro_write_transform_partitions(spark, sf_dir, tmp_path):
    """r14: transform partition sources route the parquet path's
    synthetic transform columns through the OCF encoder's directory
    layout — bucket dirs match iceberg_bucket, day dirs render ISO, and
    manifest partition tuples prune."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.plans.transforms import bucket_value

    df = spark.range(0, 120).selectExpr(
        "id",
        "timestamp_ntz'2024-03-01 00:00:00' + "
        "make_interval(0,0,0,cast(id % 3 as int)) ts")
    loc = str(tmp_path / "t_avro_bucket")
    write_iceberg(df, loc, partition_by=["bucket(4, id)", "day(ts)"],
                  properties={"write.format.default": "avro"})
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    assert {t.data_file.file_format for t in plan.tasks} == {"AVRO"}
    buckets = {t.data_file.partition["id_bucket"] for t in plan.tasks}
    assert buckets <= {0, 1, 2, 3} and len(buckets) > 1
    # pruning on the transform tuple: bucket(4, 70) only
    want_b = bucket_value(70, 4, "long")
    pruned = plan_scan(tm, tm.select_snapshot(), where="id = 70")
    assert pruned.tasks and all(
        t.data_file.partition["id_bucket"] == want_b for t in pruned.tasks)
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == list(range(120))
    # day partition survives the string-cast dir rendering roundtrip
    # (day() result type is int days-since-epoch, matching the parquet
    # path: 2024-03-01 = 19783)
    days = {t.data_file.partition["ts_day"] for t in plan.tasks}
    assert days == {19783, 19784, 19785}


def test_avro_write_nested_roundtrip(spark, sf_dir, tmp_path):
    """r14: nested struct/list/map schemas encode with field-ids at
    every level; a post-write struct-member rename still resolves, and
    temporal/decimal leaves inside the struct normalize correctly."""
    from decimal import Decimal

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.ddl import rename_column

    df = spark.sql("""
        SELECT id,
               named_struct('lang', CASE WHEN id % 4 = 0 THEN NULL
                                         ELSE concat('l', id % 3) END,
                            'n', id * 10,
                            'd', date'2020-01-01' + make_interval(0,0,0,cast(id % 5 as int)),
                            'amt', cast(id as decimal(10,2)) / 4) meta,
               CASE WHEN id % 7 = 3 THEN NULL
                    ELSE array(concat('t', id % 2), 'x') END tags,
               map('len', id * 2, 'mod', id % 6) props
        FROM range(40)
    """)
    loc = str(tmp_path / "t_avro_nested_w")
    write_iceberg(df.repartition(3), loc,
                  properties={"write.format.default": "avro"})
    rename_column(loc, "meta.lang", "language")
    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert len(got) == 40
    assert got[6].meta.language == "l0" and got[8].meta.language is None
    assert got[6].meta.n == 60
    import datetime as dt
    assert got[7].meta.d == dt.date(2020, 1, 3)
    assert got[9].meta.amt == Decimal("2.25")
    assert got[3].tags is None and got[4].tags == ["t0", "x"]
    assert got[5].props == {"len": 10, "mod": 5}


def test_avro_write_uuid_fixed_time_roundtrip(spark, tmp_path):
    """r15 (VERDICT r14 task 6): uuid/fixed/time encode at TOP level —
    the codec has decoded all three since r12 (uuid → fixed(16)+uuid
    logical type, fixed[L] → fixed(L), time → time-micros long), so the
    encode gate lifts; in-pass bounds land in order-preserving form and
    time bounds prune."""
    import datetime as dt
    import uuid as _u

    from pyspark.sql import types as T

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.types import (FIELD_ID_KEY,
                                                     ICEBERG_TYPE_KEY)
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    def fld(name, dtype, fid, ice=None):
        md = {FIELD_ID_KEY: fid}
        if ice:
            md[ICEBERG_TYPE_KEY] = ice
        return T.StructField(name, dtype, True, metadata=md)

    schema = T.StructType([
        fld("id", T.LongType(), 1),
        fld("t_time", T.LongType(), 2, "time"),
        fld("t_uuid", T.StringType(), 3, "uuid"),
        fld("t_fixed", T.BinaryType(), 4, "fixed[8]"),
    ])
    us = sorted(str(_u.uuid5(_u.NAMESPACE_DNS, f"n{i}")) for i in range(3))
    rows = [(i, (3 * 3600 + i) * 1_000_000 + 250_000, us[i],
             bytes([i + 1]) * 8) for i in range(3)]
    rows.append((3, None, None, None))
    df = spark.createDataFrame(rows, schema)
    loc = str(tmp_path / "t_avro_exotic")
    write_iceberg(df.coalesce(1), loc,
                  properties={"write.format.default": "avro"})
    # second file with a DISJOINT time range, for pruning
    rows_hi = [(10 + i, (20 * 3600 + i) * 1_000_000, us[i],
                bytes([9]) * 8) for i in range(3)]
    write_iceberg(spark.createDataFrame(rows_hi, schema).coalesce(1),
                  loc, mode="append")

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    assert {t.data_file.file_format for t in plan.tasks} == {"AVRO"}
    assert len(plan.tasks) == 2

    got = {r.id: r for r in iceberg_scan(spark, loc).collect()}
    assert got[1].t_uuid == us[1] and got[3].t_uuid is None
    assert got[2].t_fixed == bytes([3]) * 8 and got[3].t_fixed is None
    t1 = got[1].t_time
    if isinstance(t1, dt.time):  # TimeType session
        assert t1 == dt.time(3, 0, 1, 250_000)
    else:  # flag-off long mapping
        assert int(t1) == (3 * 3600 + 1) * 1_000_000 + 250_000
    assert got[3].t_time is None

    # time bounds revive and prune: only the low-range file plans in
    pruned = plan_scan(tm, tm.select_snapshot(),
                       where="t_time < '06:00:00'")
    assert len(pruned.tasks) == 1

    # declared iceberg types survive the roundtrip
    declared = {f["name"]: f["type"]
                for f in tm.schema_json()["fields"]}
    assert declared["t_uuid"] == "uuid"
    assert declared["t_fixed"] == "fixed[8]"
    assert declared["t_time"] == "time"

    # nested uuid still refuses (the arrow read plane can't resolve it;
    # schema inference can't even declare one from a Spark frame, so pin
    # the gate directly)
    from duckdb_iceberg_spark.sources.writer import _check_avro_writable

    _check_avro_writable("uuid", "u", top=True)  # top level: fine
    with pytest.raises(NotImplementedError, match="nested"):
        _check_avro_writable(
            {"type": "struct", "fields": [
                {"name": "u", "id": 3, "type": "uuid"}]}, "s", top=True)


def test_avro_write_refusals(spark, sf_dir, tmp_path):
    """Scope pin: variant leaves (at any depth) refuse loudly."""
    from duckdb_iceberg_spark import write_iceberg

    df = spark.range(0, 5).selectExpr(
        "id", "named_struct('v', parse_json('1')) s")
    with pytest.raises(NotImplementedError, match="leaves only"):
        write_iceberg(df, str(tmp_path / "t_refuse1"),
                      properties={"write.format.default": "avro"})


def test_avro_write_non_string_map_keys_roundtrip(spark, tmp_path):
    """r15: non-string-key maps WRITE via the spec's array-of-kv
    encoding (array<record{key,value}> + logicalType map — the shape
    the read plane has decoded since r12); NULL values inside, NULL and
    empty maps all survive."""
    from duckdb_iceberg_spark import write_iceberg

    df = spark.range(0, 40).selectExpr(
        "id",
        "CASE WHEN id % 7 = 3 THEN NULL "
        "WHEN id % 5 = 0 THEN map() "
        "ELSE map(id, concat('v', id), id + 1000, NULL) END AS m")
    loc = str(tmp_path / "t_avro_kvmap_w")
    write_iceberg(df.coalesce(2), loc,
                  properties={"write.format.default": "avro"})
    tm = load_table_metadata(loc)
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    plan = plan_scan(tm, tm.select_snapshot())
    assert {t.data_file.file_format for t in plan.tasks} == {"AVRO"}
    got = {r.id: r.m for r in iceberg_scan(spark, loc).collect()}
    assert len(got) == 40
    assert got[3] is None and got[0] == {}
    assert got[1] == {1: "v1", 1001: None}
    assert got[9] == {9: "v9", 1009: None}


def test_avro_write_roundtrip_fuzz(spark, tmp_path):
    """Deterministic-seed fuzz: random frames over every supported write
    type (nulls everywhere, negative ints, unicode, NaN-free doubles,
    dates, timestamps, decimals, binary) roundtrip write_iceberg(avro) →
    iceberg_scan exactly."""
    import datetime as _dt
    import random
    from decimal import Decimal

    from duckdb_iceberg_spark import write_iceberg

    for seed in range(4):
        rng = random.Random(seed)
        n = rng.randint(1, 120)

        def mk(i, gen):
            return None if rng.random() < 0.15 else gen(i)

        rows = [(
            i,
            mk(i, lambda i: rng.randint(-2**40, 2**40)),
            mk(i, lambda i: "".join(rng.choice("abγ字 d'e\"f\\n")
                                    for _ in range(rng.randint(0, 12)))),
            mk(i, lambda i: rng.uniform(-1e6, 1e6)),
            mk(i, lambda i: rng.random() < 0.5),
            mk(i, lambda i: _dt.date(2000, 1, 1)
               + _dt.timedelta(days=rng.randint(0, 10000))),
            mk(i, lambda i: _dt.datetime(2020, 1, 1)
               + _dt.timedelta(microseconds=rng.randint(0, 10**12))),
            mk(i, lambda i: Decimal(rng.randint(-10**10, 10**10))
               .scaleb(-2)),
            mk(i, lambda i: bytes(rng.randrange(256)
                                  for _ in range(rng.randint(0, 8)))),
        ) for i in range(n)]
        schema = ("id long, v long, s string, d double, b boolean, "
                  "dt date, ts timestamp_ntz, dec decimal(12,2), "
                  "raw binary")
        df = spark.createDataFrame(rows, schema)
        loc = str(tmp_path / f"t_avro_fuzz_{seed}")
        write_iceberg(df.repartition(3), loc,
                      properties={"write.format.default": "avro"})
        got = sorted((tuple(r) for r in
                      iceberg_scan(spark, loc).collect()))
        want = sorted((tuple(r) for r in df.collect()))
        assert got == want, f"seed {seed} mismatch"


def test_avro_delete_files_read_by_format(spark, sf_dir, tmp_path):
    """r13: delete FILES route by their recorded format — the spec lets
    positional/equality deletes be Avro independent of the data format
    (Flink's avro tables write avro deletes). Parquet data + a
    hand-authored AVRO equality delete and an AVRO positional delete
    must both apply."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    loc = str(tmp_path / "t_avro_deletes")
    write_iceberg(
        spark.createDataFrame([(i, f"n{i}") for i in range(30)],
                              "id long, name string").coalesce(1),
        loc)
    tm = load_table_metadata(loc)
    data_file = plan_scan(tm, tm.select_snapshot()).tasks[0] \
        .data_file.file_path

    ddir = os.path.join(loc, "data")
    # AVRO equality delete on id (field-id 1): drop ids 3, 7
    eq_path = os.path.join(ddir, "eqdel.avro")
    write_avro_file(eq_path, {
        "type": "record", "name": "d", "fields": [
            {"name": "id", "field-id": 1, "type": ["null", "long"]}]},
        [{"id": 3}, {"id": 7}])
    eq = mf.DataFile(
        content=mf.CONTENT_EQUALITY_DELETES, file_path=eq_path,
        file_format="AVRO", partition={}, record_count=2,
        file_size_in_bytes=os.path.getsize(eq_path), equality_ids=[1])
    commit_snapshot(load_table_metadata(loc), operation="delete",
                    new_delete_files=[eq])
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(30) if i not in (3, 7)]

    # AVRO positional delete: rows 0 and 10 of the (single) data file
    pos_path = os.path.join(ddir, "posdel.avro")
    write_avro_file(pos_path, {
        "type": "record", "name": "p", "fields": [
            {"name": "file_path", "field-id": 2147483546,
             "type": ["null", "string"]},
            {"name": "pos", "field-id": 2147483545,
             "type": ["null", "long"]}]},
        [{"file_path": data_file, "pos": 0},
         {"file_path": data_file, "pos": 10}])
    pd_ = mf.DataFile(
        content=mf.CONTENT_POSITION_DELETES, file_path=pos_path,
        file_format="AVRO", partition={}, record_count=2,
        file_size_in_bytes=os.path.getsize(pos_path))
    commit_snapshot(load_table_metadata(loc), operation="delete",
                    new_delete_files=[pd_])
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(30) if i not in (0, 3, 7, 10)]


def test_avro_write_nan_vs_null(spark, tmp_path):
    """ADVICE r13: numpy-backed pandas renders Spark NULL and NaN as the
    same NaN, so the write path must route on a Spark-side null mask — a
    genuine NaN double must be WRITTEN as NaN (not nulled), null_counts
    must count only real NULLs, and a NaN-bearing file records
    nan_value_counts with NO bounds (parquet-writer parity)."""
    import math

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    df = spark.createDataFrame(
        [(0, 1.5), (1, float("nan")), (2, None), (3, -2.5)],
        "id long, x double")
    loc = str(tmp_path / "t_avro_nan")
    write_iceberg(df.coalesce(1), loc,
                  properties={"write.format.default": "avro"})
    got = {r.id: r.x for r in iceberg_scan(spark, loc).collect()}
    assert got[2] is None, "real NULL stays NULL"
    assert got[0] == 1.5 and got[3] == -2.5
    assert isinstance(got[1], float) and math.isnan(got[1]), \
        "NaN data value must survive the write"

    tm = load_table_metadata(loc)
    [task] = plan_scan(tm, tm.select_snapshot()).tasks
    dfile = task.data_file
    fid_x = next(f["id"] for f in
                 tm.schema_json()["fields"] if f["name"] == "x")
    assert dfile.null_value_counts.get(fid_x) == 1, \
        "NaN must not inflate the null count"
    assert dfile.nan_value_counts.get(fid_x) == 1
    assert fid_x not in (dfile.lower_bounds or {}), \
        "NaN-bearing double column must advertise no bounds"
    # id column untouched by the mask plumbing: exact bounds
    fid_id = next(f["id"] for f in
                  tm.schema_json()["fields"] if f["name"] == "id")
    assert dfile.null_value_counts.get(fid_id) == 0


def test_avro_positional_delete_writes(spark, sf_dir, tmp_path):
    """r14: write.delete.format.default=avro writes positional DELETE
    files through the pure-Python OCF codec (reserved field-ids, sorted
    positions); the r13 format-routed read plane applies them, and
    rewrite_position_delete_files compacts across them."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.dml import delete_from
    from duckdb_iceberg_spark.sources.maintenance import (
        rewrite_position_delete_files,
    )

    loc = str(tmp_path / "t_avro_del")
    write_iceberg(
        spark.range(0, 300).selectExpr("id", "cast(id % 7 as long) m")
        .repartition(3),
        loc,
        properties={"write.delete.format.default": "avro"})
    delete_from(spark, loc, "m = 2", mode="merge-on-read")

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    dels = [d for t in plan.tasks for d in t.positional_deletes]
    assert dels, "expected positional delete files"
    assert {d.file_format for d in dels} == {"AVRO"}
    assert all(d.file_path.endswith(".avro") for d in dels)

    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(300) if i % 7 != 2]

    # second delete stacks; compaction then rewrites the avro deletes
    delete_from(spark, loc, "m = 5", mode="merge-on-read")
    out = rewrite_position_delete_files(spark, loc)
    assert out["rewritten_delete_files_count"] >= 2
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(300) if i % 7 not in (2, 5)]

    # unsupported delete format refuses loudly
    import pytest as _pytest

    loc2 = str(tmp_path / "t_orc_del")
    write_iceberg(
        spark.range(0, 50).selectExpr("id"), loc2,
        properties={"write.delete.format.default": "orc"})
    with _pytest.raises(NotImplementedError, match="parquet.*avro"):
        delete_from(spark, loc2, "id < 5", mode="merge-on-read")
