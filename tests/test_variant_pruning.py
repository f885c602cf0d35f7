"""Variant-extract pruning: parquet-variant bounds codec + file pruning on
variant_get() comparisons.

Reference truth source:
- bounds layout: src/storage/statistics/iceberg_variant_statistics.cpp
  (object keyed by "$['field']" JSON path, metadata || value concatenated)
- pruning: src/planning/pruning/iceberg_predicate.cpp IsVariantReference /
  MatchTransformedBounds
- scenario: reads/filtering/test_pruning_on_variant_col.test (two files of
  ages 20-60 and 70-110; age > 60 must skip the first file)
"""

import datetime as dt
from decimal import Decimal

import pytest

from duckdb_iceberg_spark.metadata import manifest as mf
from duckdb_iceberg_spark.metadata import variant as V
from duckdb_iceberg_spark.plans import predicates as P
from duckdb_iceberg_spark.plans.scan_plan import _file_matches
from duckdb_iceberg_spark.metadata.table_metadata import PartitionSpec


# --- codec -----------------------------------------------------------------

@pytest.mark.parametrize("value", [
    None, True, False, 0, -7, 127, 128, -32769, 1 << 40, 3.5, "x", "",
    "long-string " * 10, b"\x00\xff", Decimal("12.345"),
    dt.date(2024, 5, 17), dt.datetime(2021, 1, 2, 3, 4, 5, 123456),
    dt.datetime(2021, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc),
    {"a": 1, "b": "two"}, [1, "two", None], {"o": {"i": [1, 2]}},
])
def test_variant_round_trip(value):
    got = V.decode_variant(V.encode_variant(value))
    if isinstance(value, float):
        assert got == pytest.approx(value)
    else:
        assert got == value


def test_decode_bounds_shape():
    blob = V.encode_variant({"$['age']": 20, "$['name']": "Alice"})
    assert V.decode_bounds(blob) == {"$['age']": 20, "$['name']": "Alice"}
    assert V.decode_bounds(V.encode_variant(42)) == {}  # non-object: empty


# --- parser ----------------------------------------------------------------

def test_parse_variant_get_forms():
    p = P.parse_where("variant_get(v, '$.person.age', 'int') > 60")
    assert isinstance(p, P.Comparison)
    assert p.column == P.VariantRef("v", "$['person']['age']")
    p2 = P.parse_where("try_variant_get(v, '$[''age'']') = 5")
    assert p2.column == P.VariantRef("v", "$['age']")
    # array indexing is not a stats path: whole parse degrades to no-pruning
    assert P.parse_where("variant_get(v, '$.tags[0]') = 'x'") is None


# --- file pruning ----------------------------------------------------------

SCHEMA_JSON = {
    "type": "struct",
    "fields": [
        {"id": 1, "name": "id", "type": "long", "required": False},
        {"id": 2, "name": "v", "type": "variant", "required": False},
    ],
}


def _entry(lo: dict, hi: dict) -> mf.ManifestEntry:
    return mf.ManifestEntry(
        status=mf.STATUS_ADDED, snapshot_id=1, sequence_number=1,
        file_sequence_number=1,
        data_file=mf.DataFile(
            content=mf.CONTENT_DATA, file_path="f.parquet",
            file_format="PARQUET", partition={}, record_count=5,
            file_size_in_bytes=1,
            lower_bounds={2: V.encode_variant(lo)},
            upper_bounds={2: V.encode_variant(hi)},
        ),
    )


class _TM:  # minimal TableMetadata stand-in for _file_matches
    def field_by_id(self, _):
        return None


SPEC = PartitionSpec(0, [])
FILE_A = _entry({"$['age']": 20, "$['name']": "Alice"},
                {"$['age']": 60, "$['name']": "Eric"})
FILE_B = _entry({"$['age']": 70, "$['name']": "Frank"},
                {"$['age']": 110, "$['name']": "Jill"})


def _matches(entry, where: str) -> bool:
    return _file_matches(entry, SPEC, _TM(), P.parse_where(where), SCHEMA_JSON)


def test_variant_pruning_reference_scenario():
    # the reference test's expectation: age > 60 skips the 20-60 file
    assert not _matches(FILE_A, "variant_get(v, '$.age', 'int') > 60")
    assert _matches(FILE_B, "variant_get(v, '$.age', 'int') > 60")


@pytest.mark.parametrize("where,a,b", [
    ("variant_get(v, '$.age', 'int') = 25", True, False),
    ("variant_get(v, '$.age', 'int') = 65", False, False),
    ("variant_get(v, '$.age', 'int') < 20", False, False),
    ("variant_get(v, '$.age', 'int') <= 20", True, False),
    ("variant_get(v, '$.age', 'int') >= 110", False, True),
    ("variant_get(v, '$.name', 'string') = 'Bob'", True, False),
    ("variant_get(v, '$.name', 'string') > 'Gail'", False, True),
    # missing path: no stats -> conservative keep
    ("variant_get(v, '$.zip', 'int') = 1", True, True),
    # conjunction with a typed column still prunes independently
    ("variant_get(v, '$.age', 'int') > 60 AND id = 1", False, True),
])
def test_variant_pruning_truth_table(where, a, b):
    assert _matches(FILE_A, where) is a
    assert _matches(FILE_B, where) is b


def test_variant_pruning_conservative_cases():
    # undecodable bounds blob -> keep
    bad = _entry({}, {})
    bad.data_file.lower_bounds = {2: b"\x99\x99"}
    bad.data_file.upper_bounds = {2: b"\x99\x99"}
    assert _matches(bad, "variant_get(v, '$.age', 'int') > 60")
    # IS NULL / IS NOT NULL on a variant path: stats say nothing -> keep
    assert _matches(FILE_A, "variant_get(v, '$.age') IS NULL")
    assert _matches(FILE_A, "variant_get(v, '$.age') IS NOT NULL")
    # non-variant column behind variant_get -> keep
    assert _matches(FILE_A, "variant_get(id, '$.age', 'int') > 60")
