"""Property-based schema-evolution fuzzing: random interleavings of
INSERT / ADD COLUMN (with and without initial-default) / DROP / RENAME /
widen against a Python row model. The invariant: the final scan equals
the model under the FINAL schema — field-id resolution must route every
historical file's columns to the right output column (renames keep
values, drops hide them, adds backfill NULL or the initial-default,
widened columns read old narrow files) no matter which schema wrote
which file.

This fuzzes the cross products the example suites (test_schema_evolution,
interop goldens) pin individually. derandomize keeps CI deterministic."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.sources.ddl import (
    add_column,
    drop_column,
    rename_column,
    widen_column,
)

_ADD_TYPES = [
    ("int", st.integers(-1000, 1000), "int"),
    ("long", st.integers(-10**12, 10**12), "bigint"),
    ("double", st.sampled_from([0.5, -3.25, 99.0]), "double"),
    ("string", st.sampled_from(["x", "yy", ""]), "string"),
]


@st.composite
def _evolution_program(draw):
    ops = []
    n = draw(st.integers(2, 7))
    for _ in range(n):
        kind = draw(st.sampled_from(
            ["insert", "insert", "add", "add_default", "drop", "rename",
             "widen"]))
        if kind == "insert":
            ops.append(("insert", draw(st.integers(1, 8))))
        elif kind == "add":
            ops.append(("add", draw(st.integers(0, len(_ADD_TYPES) - 1))))
        elif kind == "add_default":
            ti = draw(st.integers(0, len(_ADD_TYPES) - 1))
            ops.append(("add_default", ti, draw(_ADD_TYPES[ti][1])))
        elif kind == "drop":
            ops.append(("drop", draw(st.integers(0, 10))))
        elif kind == "rename":
            ops.append(("rename", draw(st.integers(0, 10))))
        else:
            ops.append(("widen", draw(st.integers(0, 10))))
    return ops


def _run_program(spark, program, loc):
    try:
        # live schema: list of (col_name, ice_type, value_strategy_index,
        # default) — id is implicit and always kept
        cols: list[tuple[str, str, int, object]] = [("c0", "int", 0, None)]
        next_col = 1
        next_id = 0
        rows: list[dict] = []  # model: dict col_name -> value (+ "id")
        wrote = False

        def spark_type(ice):
            return {"int": "int", "long": "bigint", "double": "double",
                    "string": "string"}[ice]

        for op in program:
            if op[0] == "insert":
                batch = []
                for _ in range(op[1]):
                    row = {"id": next_id}
                    next_id += 1
                    for cname, ice, ti, _d in cols:
                        row[cname] = {
                            "int": (next_id * 13) % 997 - 400,
                            "long": next_id * 10**9,
                            "double": next_id * 0.5,
                            "string": f"s{next_id}",
                        }[ice]
                    batch.append(row)
                ddl = "id bigint, " + ", ".join(
                    f"{c} {spark_type(t)}" for c, t, _i, _d in cols)
                df = spark.createDataFrame(
                    [tuple(r[k] for k in ["id"] + [c for c, *_ in cols])
                     for r in batch], ddl)
                write_iceberg(df, loc)
                rows.extend(batch)
                wrote = True
            elif not wrote:
                continue  # DDL needs an existing table
            elif op[0] in ("add", "add_default"):
                ti = op[1]
                ice = _ADD_TYPES[ti][0]
                default = op[2] if op[0] == "add_default" else None
                cname = f"c{next_col}"
                next_col += 1
                add_column(loc, cname, ice, default=default)
                cols.append((cname, ice, ti, default))
                for r in rows:
                    r[cname] = default
            elif op[0] == "drop":
                if len(cols) <= 1:
                    continue
                idx = op[1] % len(cols)
                cname = cols[idx][0]
                drop_column(loc, cname)
                cols.pop(idx)
                for r in rows:
                    r.pop(cname, None)
            elif op[0] == "rename":
                idx = op[1] % len(cols)
                old = cols[idx][0]
                new = f"c{next_col}"
                next_col += 1
                rename_column(loc, old, new)
                cols[idx] = (new, *cols[idx][1:])
                for r in rows:
                    r[new] = r.pop(old)
            elif op[0] == "widen":
                widened = {"int": "long", "double": None, "long": None,
                           "string": None}
                candidates = [i for i, (_c, t, _i, _d) in enumerate(cols)
                              if widened.get(t)]
                if not candidates:
                    continue
                idx = candidates[op[1] % len(candidates)]
                cname, t, ti, d = cols[idx]
                widen_column(loc, cname, "long")
                cols[idx] = (cname, "long", ti, d)

        if not wrote:
            return
        names = ["id"] + [c for c, *_ in cols]
        got = sorted(tuple(r[k] for k in names)
                     for r in iceberg_scan(spark, loc).select(*names)
                     .collect())
        want = sorted(tuple(r.get(k) for k in names) for r in rows)
        assert got == want
    finally:
        if "://" not in loc:
            shutil.rmtree(loc, ignore_errors=True)


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(program=_evolution_program())
def test_evolution_sequences_match_model(spark, program):
    loc = tempfile.mkdtemp(prefix="prop_evo_")
    shutil.rmtree(loc, ignore_errors=True)
    _run_program(spark, program, loc)


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(program=_evolution_program())
def test_evolution_sequences_match_model_object_store(spark, program):
    """Same invariant through the ARROW read path (non-native scheme):
    the field-id aligner — not Spark's parquet reader — must route every
    historical file's columns (renames keep values, drops hide, adds
    null-fill/default, widens upcast) to the final schema."""
    import uuid

    from pyarrow import fs as pafs

    from duckdb_iceberg_spark import io as fio

    fio.register_io("mock", fio.ArrowFileIO(
        "mock", pafs._MockFileSystem(), shippable=False))
    _run_program(spark, program, f"mock://bucket/prop_evo_{uuid.uuid4().hex}")
