"""operators.text.gopher_document_filter — the complete Rae et al. 2021
A1.1 rule set, integer-exact boundaries."""

from duckdb_iceberg_spark.operators.text import gopher_document_filter

GOOD = ("the quick brown fox jumps over the lazy dog and runs off to be "
        "with the other foxes that have made peace with dogs everywhere")


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in
            gopher_document_filter(df, min_words=5, **kw).collect()}


def test_good_doc_kept(spark):
    out = _run(spark, [(1, GOOD)])
    assert out[1].keep and out[1].fail_reason is None


def test_word_count_bounds(spark):
    out = _run(spark, [(1, "too few words here"), (2, GOOD)])
    assert not out[1].keep and out[1].fail_reason == "n_words"
    assert out[2].keep


def test_mean_word_length(spark):
    # 6 one-char words -> mean 1 < 3
    out = _run(spark, [(1, "a b c d e f and the of")])
    assert not out[1].keep and out[1].fail_reason == "mean_word_len"


def test_symbol_ratio_hash_and_ellipsis(spark):
    hashy = GOOD + " " + "#tag " * 10
    out = _run(spark, [(1, hashy)])
    assert not out[1].keep and out[1].fail_reason == "symbol_ratio"
    dotty = GOOD.replace("fox", "fox...")
    out2 = _run(spark, [(1, dotty + " ... ... ... ...")])
    assert out2[1].n_symbols >= 5


def test_bullet_lines(spark):
    bullets = "\n".join(f"- {GOOD}" for _ in range(10))
    out = _run(spark, [(1, bullets)])
    assert not out[1].keep and out[1].fail_reason == "bullet_lines"
    assert out[1].n_bullet_lines == 10 and out[1].n_lines == 10


def test_ellipsis_lines(spark):
    mix = "\n".join([GOOD + " ..."] * 4 + [GOOD] * 6)
    out = _run(spark, [(1, mix)])
    assert not out[1].keep and out[1].fail_reason == "ellipsis_lines"
    ok = "\n".join([GOOD + " ..."] * 3 + [GOOD] * 7)  # exactly 30%
    assert _run(spark, [(1, ok)])[1].keep


def test_alpha_words(spark):
    numeric = GOOD + " " + "123 456 789 101 112 131 415 161 718 192"
    out = _run(spark, [(1, numeric)])
    assert not out[1].keep and out[1].fail_reason == "alpha_words"


def test_required_words(spark):
    # long alpha text but only one required word ('the' absent etc.)
    text = " ".join(["zebra"] * 30) + " the"
    out = _run(spark, [(1, text)])
    assert not out[1].keep and out[1].fail_reason == "required_words"
    assert out[1].n_required_words == 1


def test_null_and_empty_text(spark):
    out = _run(spark, [(1, None), (2, ""), (3, "   \n  ")])
    for i in (1, 2, 3):
        assert not out[i].keep and out[i].fail_reason == "n_words"
        assert out[i].n_words == 0


def test_first_failed_rule_wins(spark):
    # fails n_words AND required_words -> reason is the FIRST in order
    out = _run(spark, [(1, "zebra zebra")])
    assert out[1].fail_reason == "n_words"


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = gopher_document_filter(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
