"""operators.retrieval — BM25 lexical top-k (integer-exact scoring)."""

from decimal import Decimal

import pytest

from duckdb_iceberg_spark.operators.retrieval import bm25_idf6, bm25_topk

DOCS = [
    (1, "merge sort merge join merge"),          # tf(merge)=3, dl=5
    (2, "vector scan vector"),                   # tf(vector)=2, dl=3
    (3, "merge vector window"),                  # all three, dl=3
    (4, "filter scan table order group"),        # no hits, dl=5
    (5, "window window window window"),          # tf(window)=4, dl=4
    (6, ""),                                     # empty
]
TERMS = ["merge", "vector", "window"]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, text string")


def _py_bm25():
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    tt = sum(len(v) for v in toks.values())
    dfs = {w: sum(1 for v in toks.values() if w in v) for w in TERMS}
    idf_u = {w: int(bm25_idf6(n, dfs[w]) * 1_000_000) for w in TERMS}
    out = {}
    for i, ts in toks.items():
        dl = len(ts)
        score = 0
        matched = 0
        for w in TERMS:
            tf = ts.count(w)
            if tf == 0:
                continue
            matched += 1
            dlr = (2 * dl * n * 1_000_000 + tt) // (2 * tt)
            d = 20_000_000 * tf + 6_000_000 + 18 * dlr
            score += (2 * idf_u[w] * 44_000_000 * tf + d) // (2 * d)
        if matched:
            out[i] = (matched, score)
    return out


def test_matches_pure_python_replica(spark):
    got = {r.doc_id: (r.n_matched, r.score_micro)
           for r in bm25_topk(_df(spark), TERMS, k=10).collect()}
    assert got == _py_bm25()


def test_ranking_and_k(spark):
    rows = bm25_topk(_df(spark), TERMS, k=2).collect()
    want = sorted(_py_bm25().items(), key=lambda kv: (-kv[1][1], kv[0]))[:2]
    assert [(r.doc_id, r.score_micro) for r in rows] \
        == [(i, s) for i, (_, s) in want]
    # descending scores, deterministic ties by id
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_no_hit_docs_absent(spark):
    ids = {r.doc_id for r in bm25_topk(_df(spark), TERMS, k=10).collect()}
    assert 4 not in ids and 6 not in ids


def test_idf_nonnegative_and_monotone():
    n = 1000
    vals = [bm25_idf6(n, d) for d in (0, 1, 10, 500, 999, 1000)]
    assert all(v >= 0 for v in vals)
    assert vals == sorted(vals, reverse=True)
    assert all(v == v.quantize(Decimal("0.000001")) for v in vals)


def test_terms_case_normalized_and_deduped(spark):
    a = sorted(map(tuple, bm25_topk(_df(spark), TERMS, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(
        _df(spark), ["MERGE", "merge", "Vector", "WINDOW"], k=10).collect()))
    assert a == b


def test_empty_terms_rejected(spark):
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), [])


def test_null_text(spark):
    df = spark.createDataFrame(
        [(1, "merge merge"), (2, None)], "doc_id long, text string")
    rows = bm25_topk(df, ["merge"], k=5).collect()
    assert [r.doc_id for r in rows] == [1]
