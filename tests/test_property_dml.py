"""Property-based DML fuzzing: hypothesis generates random sequences of
INSERT / DELETE (CoW + MoR) / UPDATE (CoW + MoR) / compaction against a
table, tracked twice — once through the engine, once in a plain Python
dict model. Invariants:

1. the final scan equals the model exactly, whatever delete format the
   sequence produced (positional parquet deletes, v3 deletion vectors,
   CoW rewrites, post-compaction REPLACE snapshots), and
2. EVERY intermediate snapshot time-travels back to the model state it
   committed — sequence-number semantics (deletes applying to older
   data files only) cannot silently leak forward or backward.

This fuzzes the interactions the example-based DML suites pin one at a
time: MoR deletes over compacted files, updates over files carrying
older deletes, v2 vs v3 delete encodings, empty-matching no-op DML.
Examples are few and small (each runs ~10 Spark jobs); derandomize
keeps CI deterministic."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.sources.dml import delete_from, update_iceberg
from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files

_MODES = ["copy-on-write", "merge-on-read"]


@st.composite
def _dml_program(draw):
    fmt = draw(st.sampled_from([2, 3]))
    n_ops = draw(st.integers(min_value=2, max_value=6))
    ops = [("insert", draw(st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from([0.5, 1.25, -2.0, 7.5])),
        min_size=1, max_size=20)))]
    for _ in range(n_ops):
        kind = draw(st.sampled_from(
            ["insert", "delete_k", "delete_range", "update", "compact"]))
        if kind == "insert":
            ops.append(("insert", draw(st.lists(
                st.tuples(st.integers(0, 3),
                          st.sampled_from([0.5, 1.25, -2.0, 7.5])),
                min_size=1, max_size=20))))
        elif kind == "delete_k":
            ops.append(("delete_k", draw(st.integers(0, 4)),
                        draw(st.sampled_from(_MODES))))
        elif kind == "delete_range":
            lo = draw(st.integers(0, 40))
            ops.append(("delete_range", lo, lo + draw(st.integers(0, 15)),
                        draw(st.sampled_from(_MODES))))
        elif kind == "update":
            ops.append(("update", draw(st.integers(0, 4)),
                        draw(st.sampled_from([1.5, -0.25])),
                        draw(st.sampled_from(_MODES))))
        else:
            ops.append(("compact",))
    return fmt, ops


def _rows(df):
    return sorted((r["id"], r["k"], r["v"]) for r in df.collect())


def _model_rows(model):
    return sorted((i, k, v) for i, (k, v) in model.items())


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(program=_dml_program())
def test_dml_sequences_match_model(spark, program):
    fmt, ops = program
    loc = tempfile.mkdtemp(prefix="prop_dml_")
    shutil.rmtree(loc, ignore_errors=True)
    try:
        model: dict[int, tuple[int, float]] = {}
        next_id = 0
        history = []  # (snapshot_id, model copy)
        tm = None
        for op in ops:
            if op[0] == "insert":
                batch = [(next_id + j, k, v) for j, (k, v) in enumerate(op[1])]
                next_id += len(op[1])
                df = spark.createDataFrame(
                    batch, "id long, k int, v double")
                tm = write_iceberg(df, loc, format_version=fmt)
                for i, k, v in batch:
                    model[i] = (k, v)
            elif op[0] == "delete_k":
                tm = delete_from(spark, loc, f"k = {op[1]}", mode=op[2])
                model = {i: kv for i, kv in model.items() if kv[0] != op[1]}
            elif op[0] == "delete_range":
                tm = delete_from(
                    spark, loc, f"id >= {op[1]} AND id <= {op[2]}",
                    mode=op[3])
                model = {i: kv for i, kv in model.items()
                         if not (op[1] <= i <= op[2])}
            elif op[0] == "update":
                tm = update_iceberg(
                    spark, loc, {"v": f"v + {op[2]!r}"}, f"k = {op[1]}",
                    mode=op[3])
                model = {i: (k, v + op[2]) if k == op[1] else (k, v)
                         for i, (k, v) in model.items()}
            else:
                rewrite_data_files(spark, loc, rewrite_all=True,
                                   min_input_files=1)
                from duckdb_iceberg_spark.metadata.table_metadata import (
                    load_table_metadata)
                tm = load_table_metadata(loc)
            sid = tm.current_snapshot_id
            if sid is not None and (not history or history[-1][0] != sid):
                history.append((sid, dict(model)))

        got = _rows(iceberg_scan(spark, loc).select("id", "k", "v"))
        assert got == _model_rows(model)
        # every snapshot time-travels to its committed state
        for sid, state in history:
            tt = _rows(iceberg_scan(spark, loc, snapshot_id=sid)
                       .select("id", "k", "v"))
            assert tt == _model_rows(state), f"snapshot {sid} drifted"
        # changelog reconciliation: for a snapshot range [A, B], applying
        # the emitted net changes (inserts − deletes, as multisets: an
        # UPDATE is delete+insert) to A's state must yield exactly B's —
        # over the full history (A = empty) and the last recorded pair
        ranges = [(None, {}, history[-1])]
        if len(history) >= 2:
            ranges.append((history[-2][0], history[-2][1], history[-1]))
        for from_sid, from_state, (to_sid, to_state) in ranges:
            _assert_changelog_reconciles(
                spark, loc, from_sid, from_state, to_sid, to_state)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def _assert_changelog_reconciles(spark, loc, from_sid, from_state,
                                 to_sid, to_state):
    from collections import Counter

    from duckdb_iceberg_spark.streaming.changelog import changelog_scan

    cl = changelog_scan(spark, loc, from_snapshot_id=from_sid,
                        to_snapshot_id=to_sid).collect()
    state = Counter((i, k, v) for i, (k, v) in from_state.items())
    for r in cl:
        row = (r["id"], r["k"], r["v"])
        if r["_change_type"] == "insert":
            state[row] += 1
        else:
            assert state[row] > 0, (
                f"changelog deletes {row} absent from state "
                f"({from_sid}→{to_sid})")
            state[row] -= 1
    want = Counter((i, k, v) for i, (k, v) in to_state.items())
    assert +state == want, (
        f"changelog {from_sid}→{to_sid} does not reconcile")
