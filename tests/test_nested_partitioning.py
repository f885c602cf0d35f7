"""Partitioning and sorting by nested struct members.

Reference behavior: partitioning/hour/hour_struct_timestamp.test,
partitioning/identity/identity_struct_bool.test,
sorting/hour/hour_struct_timestamp.test — PARTITIONED BY / SORTED BY may
name a struct member; values round-trip and the layout is honored.
"""

import datetime as dt
import os

from pyspark.sql import functions as F


def test_partition_by_nested_hour(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    loc = os.path.join(str(tmp_path), "nested_hour")
    rows = [
        (i, (dt.datetime(2024, 1, 1, h, 30), f"e{i}"))
        for i, h in enumerate([0, 0, 1, 1, 2, 2, 3, 3])
    ]
    df = spark.createDataFrame(
        rows, "id int, payload struct<ts: timestamp, tag: string>")
    write_iceberg(df, loc, partition_by=["hour(payload.ts)"])

    tm = load_table_metadata(loc)
    spec = tm.default_spec()
    assert [f.name for f in spec.fields] == ["payload_ts_hour"]
    leaf = tm.field_path_by_id(spec.fields[0].source_id)
    assert leaf[0] == "payload.ts"

    out = iceberg_scan(spark, loc)
    assert out.count() == 8
    # nested values survive the partitioned write intact
    got = {r.id: r.payload.ts for r in out.collect()}
    assert got[0] == dt.datetime(2024, 1, 1, 0, 30)
    assert got[7] == dt.datetime(2024, 1, 1, 3, 30)
    # four hour-partitions → at least four files, each carrying the value
    files = {r.file_path for r in
             __import__("duckdb_iceberg_spark.sources.metadata_tables",
                        fromlist=["iceberg_metadata"])
             .iceberg_metadata(spark, loc).filter("content = 'DATA'")
             .collect()}
    assert len(files) >= 4


def test_partition_by_nested_identity(spark, tmp_path):
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    loc = os.path.join(str(tmp_path), "nested_identity")
    df = spark.createDataFrame(
        [(1, (True, "a")), (2, (False, "b")), (3, (True, "c"))],
        "id int, payload struct<flag: boolean, tag: string>")
    write_iceberg(df, loc, partition_by=["payload.flag"])

    tm = load_table_metadata(loc)
    pf = tm.default_spec().fields[0]
    assert pf.transform == "identity" and pf.name == "payload_flag"

    out = iceberg_scan(spark, loc)
    assert {(r.id, r.payload.flag) for r in out.collect()} == {
        (1, True), (2, False), (3, True)}
    # manifest partition values recorded per file
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    plan = plan_scan(tm, tm.select_snapshot(), None)
    vals = {t.data_file.partition.get("payload_flag") for t in plan.tasks}
    assert vals == {True, False}


def test_sort_by_nested_member(spark, tmp_path):
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata

    loc = os.path.join(str(tmp_path), "nested_sort")
    df = spark.createDataFrame(
        [(i, (100 - i, "x")) for i in range(10)],
        "id int, payload struct<rank: int, tag: string>")
    write_iceberg(df, loc, sort_by=["payload.rank"])
    tm = load_table_metadata(loc)
    order = tm.default_sort_order()
    assert len(order.fields) == 1
    assert tm.field_path_by_id(order.fields[0].source_id)[0] == "payload.rank"
    # written files are stamped with the sort order
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    plan = plan_scan(tm, tm.select_snapshot(), None)
    assert all(t.data_file.sort_order_id == order.order_id for t in plan.tasks)


def test_nested_partition_pruning(spark, tmp_path):
    """Predicates on a nested partition source prune at the file level —
    the planner keys partition stats by the dotted path the predicate
    parser emits."""
    import datetime as dt
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    loc = os.path.join(str(tmp_path), "nested_prune")
    rows = [
        (i, (dt.datetime(2024, 1, 1, h, 30),))
        for i, h in enumerate([0, 1, 2, 3])
    ]
    df = spark.createDataFrame(rows, "id int, payload struct<ts: timestamp>")
    write_iceberg(df, loc, partition_by=["hour(payload.ts)"])

    tm = load_table_metadata(loc)
    full = plan_scan(tm, tm.select_snapshot(), None)
    pruned = plan_scan(
        tm, tm.select_snapshot(),
        "payload.ts >= TIMESTAMP '2024-01-01 03:00:00'")
    assert len(full.tasks) == 4
    assert len(pruned.tasks) == 1


def test_hour_partition_on_nested_struct_field(spark, tmp_path):
    """Partition transforms over a nested struct member (reference:
    partitioning/hour/hour_nested_struct_timestamp.test): hour(s.ts)
    partitions on the struct member, prunes to a single file for an
    equality filter, and range filters stay exact."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    loc = str(tmp_path / "t_nested_hour")
    df = spark.sql(
        "SELECT id, named_struct('ts', timestamp'2024-01-01 00:00:00' "
        "+ make_interval(0,0,0,0,CAST(id AS INT),0,0), 'v', id*2) AS s "
        "FROM range(48)")
    write_iceberg(df, loc, partition_by=["hour(s.ts)"])

    tm = load_table_metadata(loc)
    assert len(plan_scan(tm, tm.select_snapshot()).tasks) == 48
    p = plan_scan(tm, tm.select_snapshot(),
                  "s.ts = TIMESTAMP '2024-01-01 05:00:00'")
    assert len(p.tasks) == 1
    assert iceberg_scan(
        spark, loc,
        where="s.ts >= TIMESTAMP '2024-01-02 00:00:00'").count() == 24
