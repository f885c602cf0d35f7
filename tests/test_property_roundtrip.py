"""Property-based write→scan round-trip: hypothesis generates random
schemas, values (incl. nulls, unicode, empty tables), partitioning, and
predicates; the invariants are

1. iceberg_scan(write_iceberg(df)) == df exactly, and
2. iceberg_scan(where=p) == df.filter(p) — file pruning must never drop
   a matching row, whatever the partition layout.

This is the fuzzing layer on top of the example-based suites — the
reference relies on generated-data sweeps for the same purpose
(test/sql/local/iceberg_scan_generated_data_0_01_remote.test_slow);
here the generator is in-process and the oracle is Spark itself on the
pre-write DataFrame.

Examples are deliberately few (Spark write+read is ~1-2s each); the
value is the WIDTH of the generated space, not example count.
derandomize keeps CI deterministic."""

import datetime as dt
import shutil
import tempfile
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_iceberg_spark import iceberg_scan, write_iceberg

# (spark type ddl, value strategy)
_COL_POOL = [
    ("int", st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    ("bigint", st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    ("double", st.floats(allow_nan=False, allow_infinity=False, width=64)),
    ("boolean", st.booleans()),
    ("string", st.text(
        alphabet=st.characters(
            codec="utf-8",
            categories=("L", "N", "P", "Zs"),
        ),
        max_size=24,
    )),
    ("date", st.dates(min_value=dt.date(1900, 1, 1),
                      max_value=dt.date(2100, 12, 31))),
    ("decimal(9,2)", st.decimals(
        min_value=Decimal("-9999999.99"), max_value=Decimal("9999999.99"),
        places=2, allow_nan=False, allow_infinity=False)),
]


@st.composite
def _table_case(draw):
    n_cols = draw(st.integers(min_value=1, max_value=4))
    idxs = draw(st.lists(st.integers(0, len(_COL_POOL) - 1),
                         min_size=n_cols, max_size=n_cols))
    cols = [(f"c{i}",) + _COL_POOL[idx] for i, idx in enumerate(idxs)]
    n_rows = draw(st.integers(min_value=0, max_value=25))
    rows = []
    for rid in range(n_rows):
        vals = [draw(st.none() | strat) for _, _, strat in cols]
        rows.append((rid, *vals))
    # partition: none | bucket on id | identity on the first column
    part = draw(st.sampled_from(["none", "bucket", "identity"]))
    if part == "bucket":
        partition_by = ["bucket(4, id)"]
    elif part == "identity":
        partition_by = [cols[0][0]]
    else:
        partition_by = None
    return cols, rows, partition_by


def _ddl(cols):
    return "id bigint, " + ", ".join(f"{n} {t}" for n, t, _ in cols)


def _collect(df):
    rows = [tuple(r) for r in df.orderBy("id").collect()]
    # double NaN never generated; -0.0 == 0.0 compares fine via ==
    return rows


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=_table_case())
def test_roundtrip_random_tables(spark, case):
    cols, rows, partition_by = case
    src = spark.createDataFrame(rows, _ddl(cols))
    loc = tempfile.mkdtemp(prefix="prop_rt_")
    try:
        shutil.rmtree(loc, ignore_errors=True)
        write_iceberg(src, loc, partition_by=partition_by)
        out = iceberg_scan(spark, loc).select(*src.columns)
        # the scan schema carries parquet.field.id metadata by design —
        # compare names/types/nullability, not metadata
        assert [(f.name, f.dataType, f.nullable) for f in out.schema] == \
            [(f.name, f.dataType, f.nullable) for f in src.schema]
        assert _collect(out) == _collect(src)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


@st.composite
def _predicate_case(draw):
    cols, rows, partition_by = draw(_table_case())
    # predicate over id (always present, never null) or the first column
    target = draw(st.sampled_from(["id", cols[0][0]]))
    if target == "id":
        lit = str(draw(st.integers(min_value=-1, max_value=30)))
        op = draw(st.sampled_from(["<", "<=", "=", ">=", ">", "<>"]))
        pred = f"id {op} {lit}"
    else:
        name, typ, strat = cols[0]
        if typ in ("string",):
            v = draw(strat).replace("'", "")
            pred = draw(st.sampled_from(
                [f"{name} = '{v}'", f"{name} IS NULL", f"{name} IS NOT NULL"]))
        elif typ == "date":
            v = draw(strat)
            op = draw(st.sampled_from(["<", ">=", "="]))
            pred = f"{name} {op} DATE '{v.isoformat()}'"
        elif typ == "boolean":
            pred = draw(st.sampled_from(
                [f"{name} = true", f"{name} IS NULL"]))
        else:
            v = draw(strat)
            op = draw(st.sampled_from(["<", "<=", "=", ">=", ">"]))
            pred = f"{name} {op} {v}"
    return cols, rows, partition_by, pred


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=_predicate_case())
def test_predicate_pruning_never_loses_rows(spark, case):
    cols, rows, partition_by, pred = case
    src = spark.createDataFrame(rows, _ddl(cols))
    loc = tempfile.mkdtemp(prefix="prop_pred_")
    try:
        shutil.rmtree(loc, ignore_errors=True)
        write_iceberg(src, loc, partition_by=partition_by)
        got = iceberg_scan(spark, loc, where=pred).select(*src.columns)
        want = src.filter(pred)
        assert _collect(got) == _collect(want)
    finally:
        shutil.rmtree(loc, ignore_errors=True)
