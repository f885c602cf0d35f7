"""Regression tests for the local correctness mirror's value renderer
(tools/check_oracle.py) — VERDICT r10 task 2.

The pre-r11 renderer round-tripped Decimal through float(), erasing
exactly the scale / trailing-digit / repr differences a driver-side
harness can hash. That is how three rounds of locally-bit-identical
results coexisted with driver hash-reds on the only two DECIMAL-output
window queries. These tests pin the fixed behavior: Decimal renders
exactly and scale-sensitively, and the raw-repr mode exposes the cursor
type itself.
"""

import datetime as dt
from decimal import Decimal

import tools.check_oracle as co


def _hash_pair(a, b):
    return (co.value_hash([(a,)], ["v"]), co.value_hash([(b,)], ["v"]))


def test_decimal_scale_mismatch_now_fails():
    """The class the driver saw and the old renderer could not: same
    numeric value, different Decimal scale. The old float() round-trip
    rendered both '1.5'; the exact renderer must distinguish them."""
    co.RAW_REPR = False
    h1, h2 = _hash_pair(Decimal("1.50"), Decimal("1.5"))
    assert h1 != h2


def test_decimal_vs_float_same_value_collapses_canonically():
    """Canonical mode deliberately collapses a DECIMAL and a DOUBLE of
    equal 6dp value (cross-engine cursors legitimately differ in column
    type for the same result); the scale axis (test above) and raw-repr
    mode (test below) are where type/scale divergence must surface."""
    co.RAW_REPR = False
    h1, h2 = _hash_pair(Decimal("258.481054"), 258.481054)
    assert h1 == h2


def test_equal_scale_decimals_still_match():
    co.RAW_REPR = False
    h1, h2 = _hash_pair(Decimal("3.401067"), Decimal("3.401067"))
    assert h1 == h2


def test_bigint_rendering_is_type_stable():
    """The micro-unit BIGINT representation (the r11 fix for the two red
    queries) has exactly one canonical rendering — int vs int always
    matches, and there is no scale axis to diverge on."""
    co.RAW_REPR = False
    h1, h2 = _hash_pair(258481054, 258481054)
    assert h1 == h2
    assert co._render(258481054) == "258481054"


def test_raw_repr_mode_exposes_cursor_type():
    """--raw-repr hashes what the cursor literally returned: Decimal vs
    int of equal value must differ, and so must datetimes that the
    canonical mode truncates to seconds."""
    try:
        co.RAW_REPR = True
        h1, h2 = _hash_pair(Decimal("42"), 42)
        assert h1 != h2
        t1 = dt.datetime(2026, 1, 1, 0, 0, 0, 1)
        t2 = dt.datetime(2026, 1, 1, 0, 0, 0, 2)
        h1, h2 = _hash_pair(t1, t2)
        assert h1 != h2
    finally:
        co.RAW_REPR = False


def test_canonical_mode_unchanged_for_floats_dates_null():
    co.RAW_REPR = False
    assert co._render(None) == "NULL"
    assert co._render(1.5) == "1.5"
    assert co._render(True) == "true"
    assert co._render(dt.date(2026, 8, 15)) == "2026-08-15"
