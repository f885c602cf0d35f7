"""Property-based fuzz of the r11 text-filter family (Gopher composite,
C4 clean, NB classifier scoring) against pure-Python replicas on
arbitrary corpora — pins that every Spark Column expression implements
exactly the documented integer/string rule, including whitespace runs,
empty lines, NULL-ish inputs, and rule-boundary counts."""

import re
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_iceberg_spark.operators.classify import nb_quality_score
from duckdb_iceberg_spark.operators.text import (GOPHER_REQUIRED_WORDS,
                                                 c4_clean,
                                                 gopher_document_filter,
                                                 laplace_lp6)

_WORDS = ["the", "fox", "and", "run", "#tag", "a1", "...", "lorem",
          "javascript", "zz"]
_line = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join)
_doc = st.lists(_line, min_size=0, max_size=5).map("\n".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)

_SETTINGS = settings(max_examples=12, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


def _toks(t):
    return [w for w in re.split(r"\s+", (t or "").strip().lower()) if w]


def _py_gopher(t, min_words, min_required):
    toks = _toks(t)
    c = t or ""
    lines = [ln.strip() for ln in c.split("\n") if ln.strip()]
    w = len(toks)
    wchars = sum(len(x) for x in toks)
    sym = (c.count("#") + c.count("…")
           + (len(c) - len(c.replace("...", ""))) // 3)
    bullet = sum(1 for ln in lines if ln[:1] in ("•", "‣", "▪", "-", "*"))
    ell = sum(1 for ln in lines
              if ln.endswith("...") or ln.endswith("…"))
    alpha = sum(1 for x in toks if re.search("[a-z]", x))
    req = len(set(toks) & set(GOPHER_REQUIRED_WORDS))
    rules = [
        ("n_words", min_words <= w <= 100_000),
        ("mean_word_len", 3 * w <= wchars <= 10 * w),
        ("symbol_ratio", sym * 10 <= w),
        ("bullet_lines", bullet * 10 <= len(lines) * 9),
        ("ellipsis_lines", ell * 10 <= len(lines) * 3),
        ("alpha_words", alpha * 5 >= 4 * w),
        ("required_words", req >= min_required),
    ]
    reason = next((n for n, ok in rules if not ok), None)
    return (w, len(lines), sym, bullet, ell, alpha, req,
            reason is None, reason)


@given(_corpus)
@_SETTINGS
def test_gopher_matches_replica(spark, corpus):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_lines, r.n_symbols, r.n_bullet_lines,
                      r.n_ellipsis_lines, r.n_alpha_words,
                      r.n_required_words, r.keep, r.fail_reason)
           for r in gopher_document_filter(df, min_words=2,
                                           min_required=1).collect()}
    for i, t in enumerate(corpus):
        assert got[i] == _py_gopher(t, 2, 1), f"doc {i}: {t!r}"


def _py_c4(t, min_wpl=2, min_kept=1):
    c = t or ""
    lines = [ln.strip() for ln in c.split("\n") if ln.strip()]
    kept = [ln for ln in lines
            if len([w for w in re.split(r"\s+", ln) if w]) >= min_wpl
            and not re.search(r"\bjavascript\b", ln.lower())]
    low = c.lower()
    rules = [("kept_lines", len(kept) >= min_kept),
             ("curly_brace", "{" not in low),
             ("banned", "lorem ipsum" not in low)]
    reason = next((n for n, ok in rules if not ok), None)
    keep = reason is None
    return ("\n".join(kept) if keep else None, len(lines), len(kept),
            keep, reason)


@given(_corpus)
@_SETTINGS
def test_c4_matches_replica(spark, corpus):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string")
    got = {r.doc_id: (r.text_clean, r.n_lines, r.n_lines_kept, r.keep,
                      r.fail_reason)
           for r in c4_clean(df, min_words_per_line=2, min_kept_lines=1,
                             require_terminal_punct=False).collect()}
    for i, t in enumerate(corpus):
        assert got[i] == _py_c4(t), f"doc {i}: {t!r}"


def _py_nb(corpus, pos_ids, vocab_size):
    toks = {i: _toks(t) for i, t in enumerate(corpus)}
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
        tgt = cp if i in pos_ids else cn
        for w in ts:
            m = w if w in vset else "<unk>"
            tgt[m] = tgt.get(m, 0) + 1
    np_, nn = sum(cp.values()), sum(cn.values())
    v = len(vocab) + 1
    weights = {w: laplace_lp6(cp.get(w, 0), np_, v)
               - laplace_lp6(cn.get(w, 0), nn, v)
               for w in vocab + ["<unk>"]}
    n = len(corpus)
    prior = (laplace_lp6(len(pos_ids), n, 2)
             - laplace_lp6(n - len(pos_ids), n, 2))
    out = {}
    for i, ts in toks.items():
        s = sum((weights[w if w in vset else "<unk>"] for w in ts),
                Decimal(0))
        out[i] = (len(ts), int((prior + s) * 1_000_000))
    return out


@given(_corpus, st.sets(st.integers(0, 5), min_size=1))
@_SETTINGS
def test_classifier_matches_replica(spark, corpus, pos_raw):
    pos_ids = {i for i in pos_raw if i < len(corpus)}
    if not pos_ids or pos_ids == set(range(len(corpus))):
        pos_ids = {0}
    if len(corpus) == 1:
        return  # one class only — prior undefined territory, skip
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string")
    cond = f"doc_id in ({', '.join(map(str, sorted(pos_ids)))})"
    got = {r.doc_id: (r.n_tokens, r.logit_micro)
           for r in nb_quality_score(df, positive_cond=cond,
                                     vocab_size=8).collect()}
    assert got == _py_nb(corpus, pos_ids, 8)
