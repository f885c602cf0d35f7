"""Foreign metadata fields (statistics, partition-statistics, future spec
keys) must survive our commits verbatim — committing through this engine
must not strip planner stats other engines rely on — and statistics
entries keyed by expired snapshots must go with them (Iceberg's own
expire_snapshots behavior). The reference models these fields in its REST
objects (src/rest_catalog/objects/statistics_file.cpp,
partition_statistics_file.cpp, table_metadata.cpp:516)."""

import json

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import (
    current_version_number, load_table_metadata)

from .conftest import load


def _inject(loc: str, extra: dict) -> None:
    tm = load_table_metadata(loc)
    path = tm.metadata_location
    j = json.load(open(path))
    j.update(extra)
    json.dump(j, open(path, "w"))


def _stats_entry(snapshot_id: int, n: int = 1) -> dict:
    return {
        "snapshot-id": snapshot_id,
        "statistics-path": f"s3://bucket/stats-{snapshot_id}.puffin",
        "file-size-in-bytes": 100 * n,
        "file-footer-size-in-bytes": 10,
        "blob-metadata": [{
            "type": "apache-datasketches-theta-v1",
            "snapshot-id": snapshot_id,
            "sequence-number": n,
            "fields": [1],
        }],
    }


def test_statistics_and_unknown_fields_survive_commit(spark, sf_dir,
                                                      tmp_path):
    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t")
    write_iceberg(src, loc)
    tm = load_table_metadata(loc)
    snap0 = tm.current_snapshot().snapshot_id
    _inject(loc, {
        "statistics": [_stats_entry(snap0)],
        "partition-statistics": [{
            "snapshot-id": snap0,
            "statistics-path": "s3://bucket/pstats.parquet",
            "file-size-in-bytes": 77,
        }],
        "future-spec-field": {"answer": 42},
    })

    # a second append commits new metadata through to_json
    write_iceberg(src, loc)
    tm2 = load_table_metadata(loc)
    assert tm2.raw["statistics"][0]["snapshot-id"] == snap0
    assert tm2.raw["statistics"][0]["blob-metadata"][0]["type"] \
        == "apache-datasketches-theta-v1"
    assert tm2.raw["partition-statistics"][0]["file-size-in-bytes"] == 77
    assert tm2.raw["future-spec-field"] == {"answer": 42}
    # the table itself still reads fine
    assert iceberg_scan(spark, loc).count() == 2 * src.count()


def test_expire_snapshots_drops_their_statistics(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark.sources.maintenance import expire_snapshots

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t2")
    write_iceberg(src, loc)
    snap0 = load_table_metadata(loc).current_snapshot().snapshot_id
    write_iceberg(src, loc)
    snap1 = load_table_metadata(loc).current_snapshot().snapshot_id
    _inject(loc, {"statistics": [_stats_entry(snap0, 1),
                                 _stats_entry(snap1, 2)],
                  "partition-statistics": [{
                      "snapshot-id": snap0,
                      "statistics-path": "s3://bucket/p0.parquet",
                      "file-size-in-bytes": 1}]})

    res = expire_snapshots(loc, retain_last=1, delete_files=False)
    assert res["expired"] == 1
    tm = load_table_metadata(loc)
    kept = [s["snapshot-id"] for s in tm.raw["statistics"]]
    assert kept == [snap1]
    assert tm.raw["partition-statistics"] == []


def test_v1_legacy_schema_key_not_reemitted(spark, sf_dir, tmp_path):
    """A v1 metadata file carrying the legacy single `schema` /
    `partition-spec` keys must NOT have them passed through after we
    rewrite with the list forms — a stale single-schema copy would
    shadow later evolution."""
    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t3")
    write_iceberg(src, loc)
    tm = load_table_metadata(loc)
    j = json.load(open(tm.metadata_location))
    j["schema"] = dict(j["schemas"][0])
    j["partition-spec"] = []
    json.dump(j, open(tm.metadata_location, "w"))

    write_iceberg(src, loc)
    tm2 = load_table_metadata(loc)
    latest = json.load(open(tm2.metadata_location))
    assert "schema" not in latest
    assert "partition-spec" not in latest
    assert current_version_number(loc) >= 3
