"""Property-based MERGE INTO fuzzing: random ordered clause lists
(conditional matched update/delete/nothing, not-matched insert,
not-matched-by-source update/delete) in both copy-on-write and
merge-on-read modes, checked against a Python first-match-wins model.

The conditional-clause engine landed this round — example tests pin the
reference's documented cases; this fuzzes clause ORDER and condition
interactions (a row skipping a false-conditioned DELETE into a later
UPDATE, insert conditions filtering source rows, BY SOURCE clauses
running against the unmatched target side)."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_iceberg_spark import iceberg_scan, write_iceberg
from duckdb_iceberg_spark.sources.dml import MergeClause, merge_into

# (python predicate on (tgt_row, src_row), spark condition string)
_MATCHED_CONDS = [
    (None, None),
    (lambda t, s: t[1] == 1, "tgt.k = 1"),
    (lambda t, s: s[2] > 3.0, "src.v > 3.0"),
]
_NM_CONDS = [
    (None, None),
    (lambda s: s[2] > 3.0, "src.v > 3.0"),
]
_NMBS_CONDS = [
    (None, None),
    (lambda t: t[1] == 2, "tgt.k = 2"),
]


@st.composite
def _merge_program(draw):
    mode = draw(st.sampled_from(["copy-on-write", "merge-on-read"]))
    target = [(i, i % 3, float(draw(st.sampled_from([1.0, 2.5, 4.0]))))
              for i in range(draw(st.integers(3, 10)))]
    src_ids = draw(st.lists(st.integers(0, 14), min_size=1, max_size=8,
                            unique=True))
    source = [(i, i % 3 + 1, float(draw(st.sampled_from([0.5, 3.5, 9.0]))))
              for i in src_ids]
    clauses = []
    for _ in range(draw(st.integers(1, 4))):
        kind = draw(st.sampled_from(
            ["m_upd", "m_del", "m_nop", "nm_ins", "nmbs_upd", "nmbs_del"]))
        if kind == "m_upd":
            clauses.append(("m_upd", draw(st.integers(0, 2))))
        elif kind == "m_del":
            clauses.append(("m_del", draw(st.integers(0, 2))))
        elif kind == "m_nop":
            clauses.append(("m_nop", draw(st.integers(0, 2))))
        elif kind == "nm_ins":
            clauses.append(("nm_ins", draw(st.integers(0, 1))))
        elif kind == "nmbs_upd":
            clauses.append(("nmbs_upd", draw(st.integers(0, 1))))
        else:
            clauses.append(("nmbs_del", draw(st.integers(0, 1))))
    return mode, target, source, clauses


def _model_merge(target, source, clauses):
    src_by_id = {s[0]: s for s in source}
    out = []
    for t in target:
        s = src_by_id.get(t[0])
        fired = False
        for kind, ci in clauses:
            if s is not None and kind.startswith("m_"):
                pred = _MATCHED_CONDS[ci][0]
                if pred is None or pred(t, s):
                    if kind == "m_upd":
                        out.append((t[0], t[1], s[2]))      # v = src.v
                    elif kind == "m_nop":
                        out.append(t)
                    fired = True
                    break
            elif s is None and kind.startswith("nmbs_"):
                pred = _NMBS_CONDS[ci][0]
                if pred is None or pred(t):
                    if kind == "nmbs_upd":
                        out.append((t[0], t[1], t[2] + 100.0))
                    fired = True
                    break
        if not fired:
            out.append(t)
    tgt_ids = {t[0] for t in target}
    for s in source:
        if s[0] in tgt_ids:
            continue
        for kind, ci in clauses:
            if kind == "nm_ins":
                pred = _NM_CONDS[ci][0]
                if pred is None or pred(s):
                    out.append(s)
                    break  # first MATCHING clause wins
                # condition false: fall through to the next clause
    return sorted(out)


def _spark_clauses(clauses):
    out = []
    for kind, ci in clauses:
        if kind == "m_upd":
            out.append(MergeClause("matched", "update",
                                   condition=_MATCHED_CONDS[ci][1],
                                   assignments={"v": "src.v"}))
        elif kind == "m_del":
            out.append(MergeClause("matched", "delete",
                                   condition=_MATCHED_CONDS[ci][1]))
        elif kind == "m_nop":
            out.append(MergeClause("matched", "nothing",
                                   condition=_MATCHED_CONDS[ci][1]))
        elif kind == "nm_ins":
            out.append(MergeClause("not_matched", "insert",
                                   condition=_NM_CONDS[ci][1],
                                   assignments=True))
        elif kind == "nmbs_upd":
            out.append(MergeClause("not_matched_by_source", "update",
                                   condition=_NMBS_CONDS[ci][1],
                                   assignments={"v": "tgt.v + 100.0"}))
        else:
            out.append(MergeClause("not_matched_by_source", "delete",
                                   condition=_NMBS_CONDS[ci][1]))
    return out


@settings(max_examples=16, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(program=_merge_program())
def test_merge_clause_programs_match_model(spark, program):
    mode, target, source, clauses = program
    loc = tempfile.mkdtemp(prefix="prop_merge_")
    shutil.rmtree(loc, ignore_errors=True)
    try:
        write_iceberg(
            spark.createDataFrame(target, "id long, k int, v double"), loc)
        src = spark.createDataFrame(source, "id long, k int, v double")
        merge_into(spark, loc, src, "tgt.id = src.id",
                   clauses=_spark_clauses(clauses), mode=mode)
        got = sorted(tuple(r) for r in
                     iceberg_scan(spark, loc).select("id", "k", "v")
                     .collect())
        assert got == _model_merge(target, source, clauses)
    finally:
        shutil.rmtree(loc, ignore_errors=True)
