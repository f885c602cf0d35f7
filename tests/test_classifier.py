"""operators.classify — seed-trained NB quality classifier (fastText-style
quality-filter analogue; closed-form, cross-engine-exact)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark.operators.classify import (nb_quality_fit,
                                                     nb_quality_score)
from duckdb_iceberg_spark.operators.text import laplace_lp6

DOCS = [
    (1, "good clean prose with words", True),
    (2, "good words and clean prose here", True),
    (3, "spam spam buy now buy", False),
    (4, "buy now spam click click now", False),
    (5, "clean prose but also buy now", False),
    (6, "", False),          # empty → prior-only score
    (7, "   \t  ", True),    # whitespace-only → prior-only score
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string")


def _cond():
    pos_ids = [i for i, _, p in DOCS if p]
    return f"doc_id in ({', '.join(map(str, pos_ids))})"


def _py_replica(vocab_size=64):
    """Pure-Python NB fit+score over DOCS — the oracle-independent truth."""
    toks = {i: t.lower().split() for i, t, _ in DOCS}
    labels = {i: p for i, _, p in DOCS}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for w in ts:
            counts[w] = counts.get(w, 0) + 1
    vocab = [w for w, _ in sorted(counts.items(),
                                  key=lambda kv: (-kv[1], kv[0]))][:vocab_size]
    vset = set(vocab)
    cp: dict[str, int] = {}
    cn: dict[str, int] = {}
    for i, ts in toks.items():
        tgt = cp if labels[i] else cn
        for w in ts:
            m = w if w in vset else "<unk>"
            tgt[m] = tgt.get(m, 0) + 1
    n_pos, n_neg = sum(cp.values()), sum(cn.values())
    v = len(vocab) + 1
    weights = {w: laplace_lp6(cp.get(w, 0), n_pos, v)
               - laplace_lp6(cn.get(w, 0), n_neg, v)
               for w in vocab + ["<unk>"]}
    npd = sum(labels.values())
    prior = (laplace_lp6(npd, len(DOCS), 2)
             - laplace_lp6(len(DOCS) - npd, len(DOCS), 2))
    out = {}
    for i, ts in toks.items():
        s = sum((weights[w if w in vset else "<unk>"] for w in ts),
                Decimal(0))
        out[i] = (len(ts), int((prior + s) * 1000000))
    return out


def test_matches_pure_python_replica(spark):
    got = {
        r.doc_id: (r.n_tokens, r.logit_micro, r.pred_hq)
        for r in nb_quality_score(
            _df(spark), positive_cond=_cond(), vocab_size=64).collect()
    }
    want = _py_replica()
    assert set(got) == set(want)
    for i, (n, logit) in want.items():
        assert got[i] == (n, logit, logit > 0), f"doc {i}"


def test_positive_seed_scores_higher(spark):
    got = {r.doc_id: r.logit_micro for r in nb_quality_score(
        _df(spark), positive_cond=_cond(), vocab_size=64).collect()}
    # every real positive outscores every real negative on this corpus
    pos = [got[i] for i, t, p in DOCS if p and t.strip()]
    neg = [got[i] for i, t, p in DOCS if not p and t.strip()]
    assert min(pos) > max(neg)


def test_empty_docs_score_prior_only(spark):
    got = {r.doc_id: (r.n_tokens, r.logit_micro) for r in nb_quality_score(
        _df(spark), positive_cond=_cond(), vocab_size=64).collect()}
    assert got[6][0] == 0 and got[7][0] == 0
    assert got[6][1] == got[7][1]  # both carry exactly the prior


def test_deterministic_across_runs(spark):
    a = sorted(map(tuple, nb_quality_score(
        _df(spark), positive_cond=_cond(), vocab_size=8).collect()))
    b = sorted(map(tuple, nb_quality_score(
        _df(spark), positive_cond=_cond(), vocab_size=8).collect()))
    assert a == b


def test_fit_shapes_bounded(spark):
    base, vocab, weights, prior6, ((npd, nnd), (npt, nnt)) = nb_quality_fit(
        _df(spark), "text", "doc_id", _cond(), vocab_size=4)
    assert len(vocab) == 4
    assert set(weights) == set(vocab) | {"<unk>"}
    assert npd == 3 and nnd == 4
    assert npt + nnt == sum(len(t.split()) for _, t, _ in DOCS)
    assert isinstance(prior6, Decimal)
    # 6dp decimals throughout — micro-unit conversion is exact
    assert all(w == w.quantize(Decimal("0.000001")) for w in weights.values())


def test_fused_count_action_one_sided_classes(spark):
    # r15: the per-class token counts and per-class doc counts collect in
    # ONE unioned action — a class with zero docs simply has no doc-count
    # row, and the fit must report 0 for it (not crash or miscount)
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string")
    _, _, _, _, ((npd, nnd), (npt, nnt)) = nb_quality_fit(
        df, "text", "doc_id", "doc_id > 0", vocab_size=8)
    assert (npd, nnd) == (2, 0)
    assert npt == 4 and nnt == 0


def test_null_text_and_null_cond(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string")
    out = {r.doc_id: r.n_tokens for r in nb_quality_score(
        df, positive_cond="doc_id = 1", vocab_size=8).collect()}
    assert out[2] == 0  # NULL text → zero tokens, prior-only, no crash
