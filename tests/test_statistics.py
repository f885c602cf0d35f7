"""Theta-sketch NDV statistics (NEW r13): the spec's statistics-file
write/read side — compute_table_stats / table_ndv over Puffin
``apache-datasketches-theta-v1`` blobs (reference models the metadata
shape at rest_catalog/objects/statistics_file.cpp; it never writes
statistics)."""

import numpy as np
import pytest

from duckdb_iceberg_spark import write_iceberg
from duckdb_iceberg_spark.metadata import theta
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.sources.statistics import (
    THETA_BLOB_TYPE,
    compute_table_stats,
    table_ndv,
)

from .conftest import load


def test_murmur3_x64_128_known_vectors():
    """h1 of the reference MurmurHash3 x64_128 test vectors (seed 0)."""
    from duckdb_iceberg_spark.metadata.theta import murmur3_x64_128_h1

    assert murmur3_x64_128_h1(b"", 0) == 0
    assert murmur3_x64_128_h1(b"a", 0) == 0x85555565F6597889
    assert murmur3_x64_128_h1(b"hello", 0) == 0xCBD8A7B341BD9B02
    assert murmur3_x64_128_h1(
        b"The quick brown fox jumps over the lazy dog", 0) \
        == 0xE34BBC7BBC071B6C


def test_theta_sketch_modes_and_roundtrip():
    # exact mode: below k distincts the estimate IS the distinct count
    vals = [f"v{i}" for i in range(500)]
    sk = theta.ThetaSketch(theta.value_hashes(vals), k=4096)
    assert not sk.is_estimation and sk.estimate() == 500
    assert theta.ThetaSketch.deserialize(sk.serialize()).estimate() == 500

    # empty sketch
    empty = theta.ThetaSketch(np.empty(0, dtype=np.uint64))
    blob = empty.serialize()
    assert theta.ThetaSketch.deserialize(blob).estimate() == 0

    # estimation mode: deterministic, serialization-stable, within 10%
    vals = [f"user-{i}" for i in range(50_000)]
    sk = theta.ThetaSketch(theta.value_hashes(vals), k=4096)
    assert sk.is_estimation
    est = sk.estimate()
    assert abs(est - 50_000) / 50_000 < 0.10
    sk2 = theta.ThetaSketch.deserialize(sk.serialize())
    assert sk2.estimate() == est and sk2.theta == sk.theta


def test_distributed_build_equals_single_pass():
    """partition_candidates/merge_candidates (k+1-bounded) reproduce the
    single-pass sketch exactly — the 100 TB build shape."""
    vals = [f"user-{i}" for i in range(30_000)]
    single = theta.ThetaSketch(theta.value_hashes(vals))
    parts = [theta.partition_candidates(vals[i::9]) for i in range(9)]
    merged = theta.ThetaSketch(theta.merge_candidates(parts))
    assert merged.theta == single.theta
    assert merged.estimate() == single.estimate()
    assert np.array_equal(merged.hashes, single.hashes)


def test_compute_table_stats_roundtrip(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t_stats")
    write_iceberg(src, loc)

    ndv = compute_table_stats(spark, loc)
    n = src.count()
    # below-k columns are EXACT
    assert ndv["n_nationkey"] == n
    assert ndv["n_regionkey"] == 5
    assert ndv["n_name"] == n

    tm = load_table_metadata(loc)
    stats = tm.raw["statistics"]
    assert len(stats) == 1
    entry = stats[0]
    assert entry["snapshot-id"] == tm.current_snapshot_id
    assert entry["file-size-in-bytes"] > entry["file-footer-size-in-bytes"]
    types = {b["type"] for b in entry["blob-metadata"]}
    assert types == {THETA_BLOB_TYPE}
    # ndv property rides each blob, per the spec's blob metadata
    props = {b["fields"][0]: b["properties"]["ndv"]
             for b in entry["blob-metadata"]}
    assert props  # one per column

    # read-back re-estimates from the blobs themselves
    assert table_ndv(loc) == ndv

    # recompute for the SAME snapshot replaces, never stacks
    compute_table_stats(spark, loc, columns=["n_name"])
    tm = load_table_metadata(loc)
    assert len(tm.raw["statistics"]) == 1
    assert table_ndv(loc) == {"n_name": n}


def test_compute_table_stats_respects_mor_deletes(spark, sf_dir, tmp_path):
    """The sketch pass reads through iceberg_scan, so MoR-deleted rows
    don't count."""
    from duckdb_iceberg_spark.sources.dml import delete_from

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t_stats_mor")
    write_iceberg(src, loc)
    delete_from(spark, loc, "n_regionkey = 0", mode="merge-on-read")
    ndv = compute_table_stats(spark, loc, columns=["n_nationkey",
                                                   "n_regionkey"])
    assert ndv["n_regionkey"] == 4
    assert ndv["n_nationkey"] == src.filter("n_regionkey <> 0").count()


def test_compute_table_stats_estimation_mode(spark, tmp_path):
    """Above k distincts the estimate is within 15% (tiny k to force
    estimation cheaply) and the sketch records estimation mode."""
    loc = str(tmp_path / "t_stats_est")
    write_iceberg(spark.range(0, 20_000).selectExpr("id"), loc)
    ndv = compute_table_stats(spark, loc, columns=["id"], k=256)
    assert abs(ndv["id"] - 20_000) / 20_000 < 0.15
    assert table_ndv(loc)["id"] == ndv["id"]


def test_compute_table_stats_call_surface(spark, sf_dir, tmp_path):
    """CALL compute_table_stats(table => 'view', columns intentionally
    defaulted) routes through execute_sql and returns the ndv row."""
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_stats_sql")
    write_iceberg(src, loc)
    register_table(spark, "statstab", loc)
    row = execute_sql(
        spark, "CALL compute_table_stats('statstab')").first()
    assert int(row.r_regionkey) == 5
    assert int(row.r_name) == 5
    assert load_table_metadata(loc).raw["statistics"]


def test_unknown_column_refuses(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_stats_bad")
    write_iceberg(src, loc)
    with pytest.raises(ValueError, match="not top-level primitive"):
        compute_table_stats(spark, loc, columns=["nope"])


def test_compute_partition_stats_file(spark, sf_dir, tmp_path):
    """r13 partition-statistics file: per-partition aggregates from
    manifest entries (metadata-only), delete files counted once each,
    registered under partition-statistics and readable back."""
    from duckdb_iceberg_spark import (
        compute_partition_stats,
        read_partition_stats,
        write_iceberg,
    )
    from duckdb_iceberg_spark.sources.dml import delete_from
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang",
                                                   "n_chars")
    loc = str(tmp_path / "t_pstats")
    write_iceberg(docs.repartition(F.col("lang")), loc,
                  partition_by=["lang"])
    delete_from(spark, loc, "doc_id % 7 = 3", mode="merge-on-read")

    out = compute_partition_stats(loc)
    tm = load_table_metadata(loc)
    assert len(tm.raw["partition-statistics"]) == 1
    assert tm.raw["partition-statistics"][0]["statistics-path"] == \
        out["path"]

    df = read_partition_stats(spark, loc)
    rows = {r.partition.lang: r for r in df.collect()}
    want = {r.lang: r for r in docs.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("doc_id") % 7 == 3, 1).otherwise(0)).alias("d")
    ).collect()}
    assert set(rows) == set(want)
    for lang, r in rows.items():
        assert r.data_record_count == want[lang].n
        assert r.data_file_count == 1  # repartition(lang): 1 file/partition
        assert r.position_delete_record_count == want[lang].d
        assert r.position_delete_file_count == (1 if want[lang].d else 0)
        assert r.total_data_file_size_in_bytes > 0
        assert r.last_updated_snapshot_id == tm.current_snapshot_id

    # recompute replaces, never stacks
    compute_partition_stats(loc)
    assert len(load_table_metadata(loc).raw["partition-statistics"]) == 1


def test_compute_partition_stats_call(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t_pstats_sql")
    write_iceberg(src, loc, partition_by=["n_regionkey"])
    register_table(spark, "pstatstab", loc)
    row = execute_sql(
        spark, "CALL compute_partition_stats('pstatstab')").first()
    assert int(row.partitions) == 5


def test_theta_union():
    """Union = sketch of the concatenation (duplicate-insensitive)."""
    a = [f"a{i}" for i in range(30_000)]
    b = [f"b{i}" for i in range(20_000)] + a[:5_000]  # overlap
    sk_all = theta.ThetaSketch(theta.value_hashes(a + b))
    sk_u = theta.ThetaSketch.union([
        theta.ThetaSketch(theta.value_hashes(a)),
        theta.ThetaSketch(theta.value_hashes(b))])
    # union theta/retained need not match the single-pass sketch bit for
    # bit (different thetas truncate differently) but the estimates must
    # agree closely, and re-unioning the same sketch is a no-op
    assert abs(sk_u.estimate() - sk_all.estimate()) / sk_all.estimate() < 0.03
    again = theta.ThetaSketch.union([sk_u, sk_u])
    assert again.estimate() == sk_u.estimate()


def test_compute_table_stats_incremental(spark, sf_dir, tmp_path):
    """r13 incremental stats: appends since the base merge via theta
    union — exact below k; deletes since the base refuse; missing base
    refuses."""
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t_stats_inc")
    write_iceberg(spark.range(0, 300).selectExpr("id"), loc)
    with pytest.raises(ValueError, match="prior statistics"):
        compute_table_stats(spark, loc, incremental=True)

    full0 = compute_table_stats(spark, loc, columns=["id"])
    assert full0 == {"id": 300}

    write_iceberg(spark.range(200, 500).selectExpr("id"), loc)  # overlap
    inc = compute_table_stats(spark, loc, incremental=True)
    assert inc == {"id": 500}  # union is duplicate-insensitive
    tm = load_table_metadata(loc)
    assert len(tm.raw["statistics"]) == 2  # base + current snapshots
    assert table_ndv(loc) == {"id": 500}

    # compaction between stats is fine (rows identical)…
    from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files
    rewrite_data_files(spark, loc, rewrite_all=True)
    write_iceberg(spark.range(500, 600).selectExpr("id"), loc)
    assert compute_table_stats(spark, loc, incremental=True) == {"id": 600}

    # …a delete is not: unions can't retract
    delete_from(spark, loc, "id < 10", mode="merge-on-read")
    with pytest.raises(ValueError, match="non-append"):
        compute_table_stats(spark, loc, incremental=True)


def test_iceberg_table_stats_udtf(spark, sf_dir, tmp_path):
    """r13: SELECT * FROM iceberg_table_stats('path') surfaces the
    registered ndv statistics SQL-side."""
    from duckdb_iceberg_spark.functions import register_sql_functions

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_stats_udtf")
    write_iceberg(src, loc)
    compute_table_stats(spark, loc)
    register_sql_functions(spark)
    esc = loc.replace("'", "''")
    rows = {r.column_name: r.ndv for r in spark.sql(
        f"SELECT * FROM iceberg_table_stats('{esc}')").collect()}
    assert rows["r_regionkey"] == 5 and rows["r_name"] == 5


def test_theta_deserialize_validates_seed_and_lgk():
    """ADVICE r13: a blob serialized under a different seed must refuse
    (same values hash to different points — a silent union would be
    wrong NDV), and the blob's recorded lgK wins over the caller's k."""
    sk = theta.ThetaSketch(theta.value_hashes([f"v{i}" for i in range(50)]),
                           k=1024, seed=theta.DEFAULT_SEED)
    blob = sk.serialize()
    # default seed roundtrips; recorded lgK (1024) overrides caller's k
    rt = theta.ThetaSketch.deserialize(blob, k=4096)
    assert rt.k == 1024 and rt.estimate() == 50
    with pytest.raises(ValueError, match="seed mismatch"):
        theta.ThetaSketch.deserialize(blob, seed=12345)
    # a foreign-seed blob refuses under the default seed too
    foreign = theta.ThetaSketch(
        theta.value_hashes(["a"], seed=777), k=64, seed=777).serialize()
    with pytest.raises(ValueError, match="seed mismatch"):
        theta.ThetaSketch.deserialize(foreign)


def test_theta_deserialize_rejects_corrupt_blobs():
    """ADVICE r14: a zeroed seed-hash field must refuse (DataSketches
    seed hashes are never 0 — 0 means corrupt/foreign, and letting it
    through bypassed the seed check), and an out-of-range lgK byte must
    refuse before computing k (lgK=255 would mean k=2^255)."""
    blob = bytearray(theta.ThetaSketch(
        theta.value_hashes(["a", "b", "c"])).serialize())
    zeroed = bytes(blob[:6]) + b"\x00\x00" + bytes(blob[8:])
    with pytest.raises(ValueError, match="seed-hash 0"):
        theta.ThetaSketch.deserialize(zeroed)
    bad_lgk = bytes(blob[:3]) + b"\xff" + bytes(blob[4:])
    with pytest.raises(ValueError, match="lgK=255 out of the valid"):
        theta.ThetaSketch.deserialize(bad_lgk)
    bad_lgk_low = bytes(blob[:3]) + b"\x02" + bytes(blob[4:])
    with pytest.raises(ValueError, match="lgK=2 out of the valid"):
        theta.ThetaSketch.deserialize(bad_lgk_low)


def test_incremental_refuses_row_dropping_replace(spark, tmp_path):
    """ADVICE r13: a 'replace' snapshot that REMOVED rows (delete-applying
    compaction) must refuse incremental stats — theta unions cannot
    retract, so crossing it would silently over-count."""
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan
    from duckdb_iceberg_spark.sources.writer import commit_snapshot

    loc = str(tmp_path / "t_stats_rowdrop")
    write_iceberg(spark.range(0, 100).selectExpr("id").repartition(2), loc)
    compute_table_stats(spark, loc, columns=["id"])

    tm = load_table_metadata(loc)
    t0 = plan_scan(tm, tm.current_snapshot()).tasks[0]
    commit_snapshot(tm, operation="replace",
                    removed_data_paths={t0.data_file.file_path})
    with pytest.raises(ValueError, match="replace snapshot"):
        compute_table_stats(spark, loc, incremental=True)


def test_partition_stats_keeps_specs_separate(spark, tmp_path):
    """ADVICE r13: two specs can render the SAME unified partition tuple
    (a field absent from an older spec reads as None, indistinguishable
    from a genuine NULL value) — the stats file keys by
    (spec_id, partition), never merging across specs."""
    from duckdb_iceberg_spark import (
        compute_partition_stats,
        read_partition_stats,
    )
    from duckdb_iceberg_spark.sources.ddl import set_partitioned_by

    loc = str(tmp_path / "t_pstats_specs")
    # spec 0: unpartitioned → partition tuple renders as (a=None)
    write_iceberg(
        spark.createDataFrame([(1, "x")], "id long, a string"), loc)
    set_partitioned_by(loc, ["a"])
    # spec 1: identity(a) with a genuinely NULL value → also (a=None)
    write_iceberg(
        spark.createDataFrame([(2, None)], "id long, a string"), loc,
        mode="append")
    compute_partition_stats(loc)
    rows = read_partition_stats(spark, loc).collect()
    assert len(rows) == 2, "same tuple under two specs must stay separate"
    assert sorted(r.spec_id for r in rows) == [0, 1]
    assert all(r.data_record_count == 1 for r in rows)


def test_theta_serialized_layout_goldens():
    """r14 (VERDICT r13 task 6): BYTE-EXACT frozen goldens of the
    compact-theta layout. No independent DataSketches oracle exists in
    this container (probe dated in metadata/theta.py), so these pin the
    layout against drift: preamble longs / serVer 3 / family 3 / lgK /
    flags / seed-hash 0x93cc (murmur3_x64_128 of LE64(9001), low 16
    bits) and the exact little-endian hash payloads."""
    import numpy as np

    # empty: 1 preamble long, flags READ_ONLY|EMPTY|COMPACT|ORDERED=0x1e
    e = theta.ThetaSketch(np.empty(0, dtype=np.uint64), k=16).serialize()
    assert e.hex() == "01030304001ecc93"

    # exact mode (5 distinct < k=16): 2 preamble longs, flags 0x1a,
    # curCount=5, p=1.0, then 5 ordered hashes
    sk = theta.ThetaSketch(
        theta.value_hashes([f"v{i}" for i in range(5)]), k=16)
    assert sk.serialize().hex() == (
        "02030304001acc93050000000000803f"
        "08a06c56d6aba5159ad1a87cc67b3445"
        "f1d2083f5cf8fc52ad50444f08f3f163afbf58cae00fdd6f")

    # estimation mode (200 distinct > k=16): 3 preamble longs, theta
    # long at bytes 16-23, 16 retained hashes (152 bytes total)
    sk2 = theta.ThetaSketch(
        theta.value_hashes([f"user-{i}" for i in range(200)]), k=16)
    b2 = sk2.serialize()
    assert len(b2) == 152
    assert b2[:16].hex() == "03030304001acc93100000000000803f"
    assert int.from_bytes(b2[16:24], "little") == 848659493054884331
    assert theta.ThetaSketch.deserialize(b2).estimate() == sk2.estimate()
