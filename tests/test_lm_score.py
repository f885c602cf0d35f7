"""CCNet-style bigram LM scoring, replayed against a pure-Python model."""

import math
from collections import Counter
from decimal import Decimal

from duckdb_iceberg_spark.operators.text import ngram_lm_score

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the cat sat on the cat", "en"),
    (3, "a dog runs fast", "en"),
    (4, "zzz qqq xxx zzz qqq", "xx"),       # out-of-reference junk
    (5, "the", "en"),                        # single token: no bigrams
    (6, "", "en"),                           # empty
]


def _python_lm(ref_texts, vocab_size):
    toks = [t.lower().split() for t in ref_texts]
    uni = Counter(w for ts in toks for w in ts)
    vocab = set(
        w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
        [:vocab_size])
    v_total = len(vocab) + 1

    def m(ts):
        return [w if w in vocab else "<unk>" for w in ts]

    bi = Counter()
    for ts in toks:
        ms = m(ts)
        for a, b in zip(ms, ms[1:]):
            bi[(a, b)] += 1
    ctx = Counter()
    for (a, _), c in bi.items():
        ctx[a] += c

    def score(text):
        ms = m(text.lower().split())
        nll = Decimal(0)
        n = 0
        for a, b in zip(ms, ms[1:]):
            p = (bi.get((a, b), 0) + 1) / (ctx.get(a, 0) + v_total)
            nll -= Decimal(str(round(math.log(p), 6)))
            n += 1
        return n, nll

    return score


def test_lm_score_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in ngram_lm_score(
            df, reference_cond="lang = 'en'", vocab_size=8).collect()
    }
    score = _python_lm(
        [t for _, t, lang in DOCS if lang == "en" and t], 8)
    for doc_id, text, _ in DOCS:
        n, nll = score(text)
        r = out[doc_id]
        assert r["n_bigrams"] == n, doc_id
        assert r["nll_sum"] == nll.quantize(Decimal("0.000001")), doc_id
        if n == 0:
            assert r["avg_nll"] is None
        else:
            assert r["avg_nll"] == round(float(nll) / n, 6)


def test_lm_score_junk_ranks_worse(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["avg_nll"]
        for r in ngram_lm_score(
            df, reference_cond="lang = 'en'", vocab_size=8).collect()
    }
    # in-model text scores strictly better (lower nll) than junk
    assert out[1] < out[4]


def test_lm_perplexity_buckets(spark):
    from duckdb_iceberg_spark.operators.text import lm_perplexity_buckets

    docs = DOCS + [
        (7, "the cat sat on the mat again and again", "en"),
        (8, "dog runs fast and the cat sat", "en"),
        (9, "qqq zzz vvv www", "xx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in lm_perplexity_buckets(
        df, reference_cond="lang = 'en'", vocab_size=8).collect()}
    # per-language terciles: within each lang, head <= middle <= tail by
    # avg_nll; unscored docs get a NULL bucket
    assert out[6]["bucket"] is None and out[5]["bucket"] is None
    import math

    def q(vals, p):  # linear interpolation, the percentile/quantile_cont def
        pos = p * (len(vals) - 1)
        lo = math.floor(pos)
        hi = min(lo + 1, len(vals) - 1)
        return round(vals[lo] + (vals[hi] - vals[lo]) * (pos - lo), 6)

    for lang in ("en", "xx"):
        rows = [r for r in out.values()
                if r["lang"] == lang and r["avg_nll"] is not None]
        vals = sorted(r["avg_nll"] for r in rows)
        t1 = q(vals, 1.0 / 3)
        t2 = q(vals, 2.0 / 3)
        for r in rows:
            want = ("head" if r["avg_nll"] <= t1
                    else "middle" if r["avg_nll"] <= t2 else "tail")
            assert r["bucket"] == want, (lang, r)
