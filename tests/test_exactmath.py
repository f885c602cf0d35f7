"""Platform-independent literal generators (operators.exactmath) and the
r10 stage-bisect probes.

The pinned digits below are CORRECT BY CONSTRUCTION on every platform:
``decimal`` ln is correctly rounded by specification, so these constants
are not golden values captured from one machine's libm — they are the
unique right answers, and a platform where they differ is a bug in that
platform, not in the test."""

import math
from decimal import Decimal

from duckdb_iceberg_spark.operators.exactmath import dec_ln, dec_ln_int, q6
from duckdb_iceberg_spark.operators.sampling import (
    dsir_gumbel6,
    dsir_log_ratios,
    dsir_probe,
)
from duckdb_iceberg_spark.operators.text import laplace_lp6, lm_probe


def test_dec_ln_tracks_libm_within_float_ulp():
    for x in (0.5, 2.0, 3.0 / 1030, 1e-9, 0.9999999999, 12345.678):
        assert abs(float(dec_ln(x)) - math.log(x)) <= 1e-12 * max(
            1.0, abs(math.log(x)))


def test_dec_ln_int_cached_and_exactly_equal():
    assert dec_ln_int(7) == dec_ln(7)
    assert dec_ln_int(7) is dec_ln_int(7)  # lru_cache hit


def test_laplace_lp6_pinned():
    # round6(ln(1/1025)) and round6(ln(4/16)) — unique correct digits
    assert laplace_lp6(0, 0, 1025) == Decimal("-6.932448")
    assert laplace_lp6(3, 7, 9) == Decimal("-1.386294")


def test_dsir_gumbel6_pinned():
    assert dsir_gumbel6(1) == Decimal("-1.882790")
    assert dsir_gumbel6("x", "salty") == Decimal("-1.400575")


def test_dsir_log_ratios_pinned():
    # ct={0:5}, cr={0:3,1:2}, buckets=2:
    # b0: ln(6/7) - ln(4/7) = ln(6/4) = 0.405465; b1: ln(1/7) - ln(3/7)
    assert dsir_log_ratios({0: 5}, {0: 3, 1: 2}, 2) == [
        (0, Decimal("0.405465")),
        (1, Decimal("-1.098612")),
    ]


def test_q6_half_up():
    assert q6(Decimal("0.0000005")) == Decimal("0.000001")
    assert q6(Decimal("-0.0000005")) == Decimal("-0.000001")


def test_temperature_weights_limits_and_exactness():
    from duckdb_iceberg_spark.operators.sampling import temperature_weights

    counts = {"a": 8000, "b": 1000, "c": 1000}
    # alpha=1: natural proportions
    w1 = temperature_weights(counts, 1.0)
    assert w1["a"] == Decimal("0.8")
    assert w1["b"] == w1["c"] == Decimal("0.1")
    # alpha=0: uniform
    w0 = temperature_weights(counts, 0.0)
    assert set(w0.values()) == {Decimal("0.333333333333")}
    # alpha=0.5: sqrt-proportional — 8000^.5 : 1000^.5 : 1000^.5
    wh = temperature_weights(counts, 0.5)
    assert wh["b"] == wh["c"]
    # sqrt(8000)/ (sqrt(8000)+2*sqrt(1000)) = 0.585786...
    assert wh["a"] == Decimal("0.585786437627")
    assert abs(sum(wh.values()) - 1) <= Decimal("3e-12")
    # low-resource upweighted relative to natural share
    assert wh["b"] > w1["b"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(counts, -1)


def test_resample_temperature_matches_python_replay(spark):
    import hashlib

    from duckdb_iceberg_spark.operators.sampling import (
        floor_threshold_hex,
        mixture_fractions,
        resample_temperature,
        temperature_weights,
    )

    rows = [(i, "big" if i < 160 else "small") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = resample_temperature(df, "src", 0.5, "doc_id", salt="s1")
    got = sorted(r.doc_id for r in out.collect())
    counts = {"big": 160, "small": 40}
    weights = {g: float(w)
               for g, w in temperature_weights(counts, 0.5).items()}
    fr = mixture_fractions(counts, weights)
    thr = {g: floor_threshold_hex(f) for g, f in fr.items()}
    expect = sorted(
        i for i, g in rows
        if hashlib.md5(f"{i}s1".encode()).hexdigest()[:6] < thr[g])
    assert got == expect and expect  # nonempty


DOCS = [
    (1, "the cat sat", "en"),
    (2, "the cat", "en"),
    (3, "zz qq", "xx"),
    (4, None, "en"),
    (5, "", "en"),
]


def test_lm_probe_metrics(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    rows = lm_probe(df, reference_cond="lang = 'en'", vocab_size=8).collect()
    by = {}
    for r in rows:
        by.setdefault(r["metric"], {})[r["k"]] = r["v"]
    assert by["doc_toks"] == {"1": 3, "2": 2, "3": 2, "4": None, "5": 0}
    # reference slice = docs 1,2: counts the->2, cat->2, sat->1
    assert by["vocab"] == {"the": 2, "cat": 2, "sat": 1}
    assert by["bigram"] == {"the cat": 2, "cat sat": 1}
    assert by["ctx"] == {"the": 2, "cat": 1}


def test_dsir_probe_metrics(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    rows = dsir_probe(df, "lang = 'en'", buckets=8).collect()
    by = {}
    for r in rows:
        by.setdefault(r["metric"], {})[r["k"]] = r["v"]
    # every doc gets a u32 row, including NULL/empty text
    assert set(by["doc_u32"]) == {"1", "2", "3", "4", "5"}
    assert all(v is not None and 0 <= v < 2**32
               for v in by["doc_u32"].values())
    # raw grams: docs 1,2,3 contribute unigrams+bigrams; target = en only
    assert sum(by["bucket_cr"].values()) == 5 + 3 + 3  # doc1=5, doc2=3, doc3=3
    assert sum(by["bucket_ct"].values()) == 5 + 3
    # target counts are a subset of raw counts bucket-by-bucket
    for b, c in by["bucket_ct"].items():
        assert c <= by["bucket_cr"][b]
