"""Equality-delete WRITE path + CDC upsert tests (read path covered via
scan tests; reference: equality_delete_helpers.cpp, sequence semantics
iceberg_file_pruner.cpp:340-356)."""

import pytest

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.sources.dml import equality_delete, upsert_equality


def test_equality_delete_basic(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg(spark.range(100).selectExpr("id", "id % 5 AS k"), loc)
    keys = spark.createDataFrame([(1,), (3,)], "k: long")
    equality_delete(spark, loc, keys)
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(100) if i % 5 not in (1, 3)]


def test_equality_delete_only_hits_earlier_files(spark, tmp_path):
    loc = str(tmp_path / "t2")
    write_iceberg(spark.range(0, 50).selectExpr("id", "id AS k"), loc)
    equality_delete(spark, loc, spark.createDataFrame([(7,), (49,)], "k: long"))
    # rows appended AFTER the delete with the same keys must survive
    write_iceberg(spark.createDataFrame([(7, 7), (49, 49)], "id: long, k: long"), loc)
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == list(range(50))  # every id exactly once: old 7/49 gone, new ones live


def test_equality_delete_multi_column_and_nulls(spark, tmp_path):
    loc = str(tmp_path / "t3")
    rows = [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "a", 40)]
    write_iceberg(spark.createDataFrame(rows, "id: long, s: string, v: long"), loc)
    keys = spark.createDataFrame([("a", 10), (None, 30)], "s: string, v: long")
    equality_delete(spark, loc, keys, key_columns=["s", "v"])
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    # (1,'a',10) matches; (3,NULL,30) matches via null-safe equality;
    # (4,'a',40) survives (v differs)
    assert got == [2, 4]


def test_equality_delete_unknown_column(spark, tmp_path):
    loc = str(tmp_path / "t4")
    write_iceberg(spark.range(5), loc)
    with pytest.raises(ValueError, match="not in table schema"):
        equality_delete(spark, loc, spark.createDataFrame([(1,)], "nope: long"))


def test_upsert_updates_and_inserts(spark, tmp_path):
    loc = str(tmp_path / "t5")
    write_iceberg(
        spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "id: long, v: double"),
        loc)
    upsert_equality(
        spark, loc,
        spark.createDataFrame([(2, 200.0), (4, 400.0)], "id: long, v: double"),
        key_columns=["id"])
    got = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert got == {1: 10.0, 2: 200.0, 3: 30.0, 4: 400.0}


def test_upsert_twice_same_key(spark, tmp_path):
    loc = str(tmp_path / "t6")
    write_iceberg(spark.createDataFrame([(1, 1.0)], "id: long, v: double"), loc)
    upsert_equality(spark, loc,
                    spark.createDataFrame([(1, 2.0)], "id: long, v: double"), ["id"])
    upsert_equality(spark, loc,
                    spark.createDataFrame([(1, 3.0)], "id: long, v: double"), ["id"])
    rows = iceberg_scan(spark, loc).collect()
    assert len(rows) == 1 and rows[0].v == 3.0


def test_equality_delete_bounds_pruning(spark, sf_dir, tmp_path):
    """A delete file whose key range cannot overlap a data file's range is
    never assigned to that file (reference: equality-delete bounds pruning,
    iceberg_file_pruner.cpp:248-316) — and results stay correct."""
    from tests.conftest import load
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    src = load(spark, sf_dir, "orders")
    loc = str(tmp_path / "t")
    lo = src.where("o_orderkey < 700")
    hi = src.where("o_orderkey >= 700")
    write_iceberg(lo.coalesce(1), loc)
    write_iceberg(hi.coalesce(1), loc)

    keys = spark.createDataFrame(
        [(int(r.o_orderkey),) for r in hi.limit(5).collect()], "o_orderkey: long")
    equality_delete(spark, loc, keys)

    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    by_file = {}
    for t in plan.tasks:
        lo_rows = t.data_file.lower_bounds is not None
        by_file[t.data_file.file_path] = len(t.equality_deletes)
    counts = sorted(by_file.values())
    assert counts == [0, 1], counts  # low file pruned, high file assigned

    got = iceberg_scan(spark, loc).count()
    assert got == lo.count() + hi.count() - 5


def test_equality_delete_null_keys_not_bounds_pruned(spark, tmp_path):
    """A delete file mixing NULL and out-of-range keys must still apply:
    bounds exclude NULLs, so pruning must consult null_value_counts."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg

    loc = str(tmp_path / "t")
    df = spark.createDataFrame([("a", 1), (None, 2), ("b", 3)], "s: string, v: long")
    write_iceberg(df.coalesce(1), loc)
    keys = spark.createDataFrame([(None,), ("zzz",)], "s: string")
    equality_delete(spark, loc, keys, key_columns=["s"])

    got = sorted(r.v for r in iceberg_scan(spark, loc).collect())
    assert got == [1, 3]  # NULL-key row deleted despite disjoint bounds


def test_equality_delete_large_keyset_not_broadcast(spark, tmp_path, monkeypatch):
    """Above the manifest-record-count threshold the delete-key anti-join must
    NOT be broadcast-hinted (an accumulated CDC delete set can exceed executor
    memory; reference streams equality deletes,
    iceberg_multi_file_reader.cpp:525-558). Below it, it must be."""
    from duckdb_iceberg_spark.sources import scan as scan_mod

    loc = str(tmp_path / "t")
    write_iceberg(spark.range(200).selectExpr("id", "id % 7 AS k"), loc)
    equality_delete(spark, loc, spark.createDataFrame([(2,), (5,)], "k: long"))

    import re

    def anti_join_kinds():
        df = iceberg_scan(spark, loc)
        phys = df._jdf.queryExecution().executedPlan().toString()
        return [m.group(1) for m in
                re.finditer(r"(\w+Join)\b[^\n]*LeftAnti", phys)]

    # guard open (tiny delete set): broadcast anti-join
    assert anti_join_kinds() == ["BroadcastHashJoin"]

    # guard tripped: no broadcast on the anti-join — AQE/SMJ takes over
    monkeypatch.setattr(scan_mod, "_EQ_DELETE_BROADCAST_MAX_ROWS", 0)
    scan_mod.clear_scan_frame_memo()  # key doesn't cover module knobs
    kinds = anti_join_kinds()
    assert kinds and all(j != "BroadcastHashJoin" for j in kinds), kinds

    # and the scan is still correct without the hint
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(200) if i % 7 not in (2, 5)]


def test_equality_delete_large_keyset_multiple_files(spark, tmp_path, monkeypatch):
    """Key sets above _EQ_KEYS_PER_FILE range-partition into several delete
    files, each with tight (prunable) bounds — no single-task serialization."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata import manifest as mf
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources import dml

    monkeypatch.setattr(dml, "_EQ_KEYS_PER_FILE", 100)
    loc = str(tmp_path / "eq_many")
    write_iceberg(spark.range(1000).selectExpr("id", "id % 2 AS k"), loc)
    dml.equality_delete(
        spark, loc, spark.range(350).selectExpr("id"), ["id"])

    tm = load_table_metadata(loc)
    snap = tm.current_snapshot()
    eq_files = []
    for m in mf.read_manifest_list(snap.manifest_list):
        if m.content == mf.MANIFEST_DELETES:
            for e in mf.read_manifest(m.manifest_path):
                if e.data_file.content == mf.CONTENT_EQUALITY_DELETES:
                    eq_files.append(e.data_file)
    assert len(eq_files) >= 3  # 350 keys / 100 per file
    # disjoint, tight bounds per file (range partitioning)
    import struct
    fid = 1  # id column field id
    ranges = sorted(
        (struct.unpack("<q", f.lower_bounds[fid])[0],
         struct.unpack("<q", f.upper_bounds[fid])[0]) for f in eq_files)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == list(range(350, 1000))


def test_equality_delete_nested_struct_field(spark, tmp_path):
    """Equality deletes keyed on a deeply nested struct member (reference:
    equality_deletes/test_equality_delete_struct_field.test — equality_ids
    stores the DEEPEST field's id, rows with a null struct or null key
    survive, both rows with key=2 are removed)."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.dml import equality_delete
    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_metadata

    def payload(key, label):
        return (((((key, label),),),),)

    loc = str(tmp_path / "eq_nested")
    df = spark.createDataFrame(
        [
            (1, payload(1, "one"), "keep-1"),
            (2, payload(2, "two-a"), "delete-2a"),
            (3, payload(2, "two-b"), "delete-2b"),
            (4, payload(3, "three"), "keep-3"),
            (5, None, "keep-null-struct"),
            (6, payload(None, "null-key"), "keep-null-key"),
        ],
        "id int, payload struct<nested: struct<deeper: struct<even_deeper: "
        "struct<deepest: struct<key: int, label: string>>>>>, marker string",
    )
    write_iceberg(df, loc)
    keys = spark.createDataFrame([(2,)], "key int")
    equality_delete(
        spark, loc, keys,
        ["payload.nested.deeper.even_deeper.deepest.key"])

    tm = load_table_metadata(loc)
    md = iceberg_metadata(spark, loc)
    del_rows = md.filter("content = 'EQUALITY_DELETES'").collect()
    assert del_rows, "no equality-delete entry committed"

    # the manifest's equality id resolves back to the deepest leaf path
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    plan = plan_scan(tm, tm.select_snapshot(), None)
    eq_ids = {fid for t in plan.tasks for _seq, d in t.equality_deletes
              for fid in (d.equality_ids or [])}
    assert len(eq_ids) == 1
    path, leaf = tm.field_path_by_id(next(iter(eq_ids)))
    assert path == "payload.nested.deeper.even_deeper.deepest.key"
    assert leaf["name"] == "key"

    out = iceberg_scan(spark, loc).select("marker").collect()
    assert sorted(r.marker for r in out) == [
        "keep-1", "keep-3", "keep-null-key", "keep-null-struct"]


def test_equality_delete_sequencing_multiple_nested_signatures(spark, tmp_path):
    """Two nested-keyed equality deletes at different sequence numbers:
    each applies only to data files written BEFORE it (reference:
    equality_deletes/test_equality_delete_extra_columns_per_file.test —
    id=6 survives the earlier key=2 delete, id=7 survives both)."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.dml import equality_delete

    def payload(key, label):
        return (((((key, label),),),),)

    schema = ("id int, payload struct<nested: struct<deeper: struct<"
              "even_deeper: struct<deepest: struct<key: int, "
              "label: string>>>>>, marker string")
    key_path = "payload.nested.deeper.even_deeper.deepest.key"
    label_path = "payload.nested.deeper.even_deeper.deepest.label"

    loc = str(tmp_path / "eq_seq")
    write_iceberg(spark.createDataFrame([
        (1, payload(1, "one"), "keep-old"),
        (2, payload(2, "two"), "delete-by-key"),
        (3, payload(3, "shared"), "delete-old-by-label"),
    ], schema), loc)
    equality_delete(spark, loc,
                    spark.createDataFrame([(2,)], "key int"), [key_path])
    write_iceberg(spark.createDataFrame([
        (4, payload(4, "four"), "keep-newer"),
        (5, payload(5, "shared"), "delete-newer-by-label"),
        (6, payload(2, "six"), "key-delete-does-not-apply"),
    ], schema), loc)
    equality_delete(spark, loc,
                    spark.createDataFrame([("shared",)], "label string"),
                    [label_path])
    write_iceberg(spark.createDataFrame([
        (7, payload(2, "shared"), "both-deletes-do-not-apply"),
    ], schema), loc)

    got = {r.id: r.marker
           for r in iceberg_scan(spark, loc).select("id", "marker").collect()}
    assert got == {1: "keep-old", 4: "keep-newer",
                   6: "key-delete-does-not-apply",
                   7: "both-deletes-do-not-apply"}


def test_equality_delete_survives_type_widening(spark, tmp_path):
    """Equality deletes written before a column widening still apply, and
    4-byte bounds written under the old type decode under the promoted
    type (spec Appendix D reader requirement; reference:
    test_equality_delete_schema_evolution_integer_to_bigint.test /
    float_to_double.test)."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources import ddl
    from duckdb_iceberg_spark.sources.dml import equality_delete

    loc = str(tmp_path / "widen_int")
    write_iceberg(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"), loc)
    equality_delete(spark, loc,
                    spark.createDataFrame([(2,)], "id int"), ["id"])
    ddl.widen_column(loc, "id", "long")
    assert sorted(r.id for r in iceberg_scan(spark, loc).collect()) == [1, 3]

    loc2 = str(tmp_path / "widen_float")
    write_iceberg(spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "id int, x float"), loc2)
    equality_delete(spark, loc2,
                    spark.createDataFrame([(1,)], "id int"), ["id"])
    ddl.widen_column(loc2, "x", "double")
    out = iceberg_scan(spark, loc2).collect()
    assert [(r.id, r.x) for r in out] == [(2, 2.5)]


def test_equality_delete_avro_format(spark, tmp_path):
    """r14: write.delete.format.default=avro routes equality-delete KEY
    files through the OCF codec (the Flink avro-table shape); scans
    apply them, and a CDC upsert carries them in one snapshot."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import (
        load_table_metadata,
    )
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.dml import (
        equality_delete,
        upsert_equality,
    )

    loc = str(tmp_path / "t_eq_avro")
    write_iceberg(
        spark.range(0, 100).selectExpr("id", "concat('v', id) v"), loc,
        properties={"write.delete.format.default": "avro"})
    equality_delete(spark, loc,
                    spark.createDataFrame([(3,), (7,)], "id long"))
    tm = load_table_metadata(loc)
    plan = plan_scan(tm, tm.select_snapshot())
    eqs = [d for t in plan.tasks for _, d in t.equality_deletes]
    assert eqs and {d.file_format for d in eqs} == {"AVRO"}
    assert all(d.file_path.endswith(".avro") for d in eqs)
    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == [i for i in range(100) if i not in (3, 7)]

    # CDC upsert: avro equality-delete + new data files in one snapshot
    upsert_equality(
        spark, loc,
        spark.createDataFrame([(5, "NEW5"), (200, "NEW200")],
                              "id long, v string"), ["id"])
    rows = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert rows[5] == "NEW5" and rows[200] == "NEW200"
    assert 3 not in rows and len(rows) == 99
