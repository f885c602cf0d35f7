"""Z-order clustered rewrites (NEW r14): rewrite_data_files(sort_order=
'zorder(x, y)') interleaves per-column quantile ranks so per-file bounds
are tight on EVERY zorder column — scans prune on any dimension. The
reference's compaction bin-packs only
(iceberg_rewrite_data_files.cpp)."""

import os

import pytest

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.plans.scan_plan import plan_scan
from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files


def _files_matching(loc, where):
    tm = load_table_metadata(loc)
    return len(plan_scan(tm, tm.select_snapshot(), where=where).tasks)


def _mk_2d(spark, loc, n=20_000):
    # x and y independent uniform: row-order clustering on NEITHER
    df = spark.range(0, n).selectExpr(
        "id",
        "cast(hash(id) % 1000 as long) as x",
        "cast(hash(id + 7919) % 1000 as long) as y")
    write_iceberg(df.repartition(8), loc)
    return df


def test_zorder_rewrite_prunes_both_dimensions(spark, tmp_path):
    loc = str(tmp_path / "t_z")
    df = _mk_2d(spark, loc)
    before = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())

    out = rewrite_data_files(spark, loc, rewrite_all=True,
                             min_input_files=1,
                             target_file_size_bytes=40_000,
                             sort_order="zorder(x, y)")
    assert out["added_data_files_count"] >= 4
    total = _files_matching(loc, None)
    assert total >= 4

    # BOTH dimensions prune: an extreme slice on either axis plans in a
    # strict subset of files (a slice straddling the median hits both
    # halves of the z-curve by construction — not a pruning failure)
    x_hit = _files_matching(loc, "x >= 800")
    y_hit = _files_matching(loc, "y >= 800")
    assert x_hit < total, "x-slice must prune z-ordered files"
    assert y_hit < total, "y-slice must prune z-ordered files"

    # rows identical after the rewrite
    after = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())
    assert after == before


def test_linear_sort_rewrite_prunes_leading_dimension(spark, tmp_path):
    """Contrast shape: a linear 'x, y' sort gives tight x bounds but
    scattered y bounds — the trailing dimension cannot prune. (This is
    the why of zorder.)"""
    loc = str(tmp_path / "t_lin")
    _mk_2d(spark, loc)
    rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1,
                       target_file_size_bytes=40_000, sort_order="x, y")
    total = _files_matching(loc, None)
    assert total >= 4
    assert _files_matching(loc, "x >= 800") < total
    # y is uniform within every x-run: every file matches a y-slice
    assert _files_matching(loc, "y >= 800") == total


def test_zorder_refusals_and_parse(spark, tmp_path):
    from duckdb_iceberg_spark.operators.zorder import parse_zorder

    assert parse_zorder("zorder(a, b)") == ["a", "b"]
    assert parse_zorder("ZORDER( a )") == ["a"]
    assert parse_zorder("x, y") is None
    with pytest.raises(ValueError, match="at least one column"):
        parse_zorder("zorder()")

    # non-rankable types (arrays/maps/structs/bool) still refuse loudly
    loc2 = str(tmp_path / "t_zarr")
    write_iceberg(
        spark.range(0, 100).selectExpr("id", "array(id) a"),
        loc2)
    with pytest.raises(NotImplementedError, match="zorder supports"):
        rewrite_data_files(spark, loc2, rewrite_all=True,
                           min_input_files=1, sort_order="zorder(a)")

    # ADVICE r14: >= 64 columns -> 0 rank bits; must raise, not produce
    # a constant key
    from duckdb_iceberg_spark.operators.zorder import zorder_key
    wide = spark.range(0, 10).selectExpr(
        *[f"id + {i} as c{i}" for i in range(64)])
    with pytest.raises(ValueError, match="at least 1 rank bit"):
        zorder_key(wide, [f"c{i}" for i in range(64)])
    with pytest.raises(ValueError, match="at least 1 rank bit"):
        zorder_key(wide, ["c0", "c1"], bits=0)


def test_zorder_string_dimension_prunes(spark, tmp_path):
    """r15 (VERDICT r14 task 5): string zorder dimensions rank via the
    zero-padded 6-byte big-endian UTF-8 prefix — monotonic in Spark's
    binary collation — so per-file string bounds become tight and a
    string predicate prunes files, alongside a numeric co-dimension."""
    loc = str(tmp_path / "t_zstr")
    df = spark.range(0, 20_000).selectExpr(
        "id",
        "concat('w', lpad(cast(pmod(hash(id), 1000) as string), 4, '0')) "
        "as s",
        "cast(pmod(hash(id + 7919), 1000) as long) as y")
    write_iceberg(df.repartition(8), loc)
    before = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())

    rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1,
                       target_file_size_bytes=40_000,
                       sort_order="zorder(s, y)")
    total = _files_matching(loc, None)
    assert total >= 4
    assert _files_matching(loc, "s >= 'w0800'") < total, \
        "string slice must prune z-ordered files"
    assert _files_matching(loc, "y >= 800") < total, \
        "numeric co-dimension must prune too"

    after = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())
    assert after == before


def test_linear_sort_honors_modifiers_and_rejects_unknown(spark,
                                                          tmp_path):
    """ADVICE r14: 'x DESC' used to silently cluster ascending (only the
    first token was kept). Now ASC/DESC + NULLS FIRST/LAST are honored
    and anything else raises instead of clustering in a different order
    than asked."""
    from duckdb_iceberg_spark.sources.maintenance import _parse_linear_order

    # parse shapes
    exprs = _parse_linear_order("x DESC, y, z ASC NULLS LAST, "
                                "w nulls first")
    assert len(exprs) == 4
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unrecognized sort_order"):
        _parse_linear_order("x FOO")
    with _pytest.raises(ValueError, match="unrecognized sort_order"):
        _parse_linear_order("x NULLS SIDEWAYS")

    # a DESC rewrite clusters descending: the file holding x's max is
    # range-partition 0, and rows are identical before/after
    loc = str(tmp_path / "t_lindesc")
    df = _mk_2d(spark, loc, n=8_000)
    before = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())
    rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1,
                       target_file_size_bytes=16_000, sort_order="x DESC")
    total = _files_matching(loc, None)
    assert total >= 3
    assert _files_matching(loc, "x >= 800") < total  # bounds still tight
    after = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())
    assert after == before


def test_zorder_call_surface(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "t_zcall")
    _mk_2d(spark, loc, n=5_000)
    register_table(spark, "ztab", loc)
    row = execute_sql(
        spark, "CALL rewrite_data_files(table => 'ztab', "
               "rewrite_all => true, min_input_files => 1, "
               "sort_order => 'zorder(x, y)')").first()
    assert int(row.rewritten_data_files_count) >= 1
    assert iceberg_scan(spark, loc).count() == 5_000


def test_zorder_rewrite_partitioned_table(spark, tmp_path):
    """r14: zorder rewrites work on PARTITIONED tables — rewrite groups
    are per-partition, and the write keeps the group's range clustering
    (preserve_partitioning) instead of re-shuffling on the constant
    partition tuple. Both dimensions prune WITHIN a partition."""
    loc = str(tmp_path / "t_zpart2")
    df = spark.range(0, 20_000).selectExpr(
        "id", "cast(id % 2 as long) as p",
        "cast(hash(id) % 1000 as long) as x",
        "cast(hash(id + 7919) % 1000 as long) as y")
    write_iceberg(df.repartition(8), loc, partition_by=["p"])
    before = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())

    rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1,
                       target_file_size_bytes=20_000,
                       sort_order="zorder(x, y)")
    total = _files_matching(loc, None)
    p0 = _files_matching(loc, "p = 0")
    assert p0 < total, "partition pruning must survive the rewrite"
    assert p0 >= 3, "need several files per partition to observe pruning"
    assert _files_matching(loc, "p = 0 AND x >= 800") < p0
    assert _files_matching(loc, "p = 0 AND y >= 800") < p0

    after = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())
    assert after == before


def test_zorder_mixed_types_and_nulls_roundtrip(spark, tmp_path):
    """Seeded fuzz: zorder over date + timestamp + double dims with NULLs
    sprinkled in preserves the exact row multiset, and NULLs cluster
    (nulls-first rank 0) rather than erroring."""
    import datetime as dt
    import random

    for seed in range(2):
        rng = random.Random(seed)
        rows = []
        for i in range(8000):
            rows.append((
                i,
                None if rng.random() < 0.05 else dt.date(2020, 1, 1)
                + dt.timedelta(days=rng.randint(0, 1000)),
                None if rng.random() < 0.05 else dt.datetime(2021, 1, 1)
                + dt.timedelta(seconds=rng.randint(0, 10**7)),
                None if rng.random() < 0.05 else rng.uniform(-1e5, 1e5),
            ))
        df = spark.createDataFrame(
            rows, "id long, d date, ts timestamp_ntz, v double")
        loc = str(tmp_path / f"t_zmix_{seed}")
        write_iceberg(df.repartition(4), loc)
        before = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())
        rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1,
                           target_file_size_bytes=8_000,
                           sort_order="zorder(d, ts, v)")
        after = sorted(tuple(r) for r in iceberg_scan(spark, loc).collect())
        assert after == before, f"seed {seed}: rows changed"
        # an extreme date slice prunes (3-dim pruning power goes as
        # files^(1/3), so this needs a real file count + a narrow slice)
        total = _files_matching(loc, None)
        assert total >= 10
        assert _files_matching(loc, "d >= DATE '2022-09-15'") < total
