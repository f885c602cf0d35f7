"""operators.text.c4_clean — the C4 line/doc cleaning rules."""

from duckdb_iceberg_spark.operators.text import c4_clean

L = "the quick brown fox jumps over the lazy dog."


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in c4_clean(df, **kw).collect()}


def test_line_rules_and_rewrite(spark):
    text = "\n".join([
        L,                          # kept
        "too short.",               # <5 words
        "enable javascript to view this page.",  # banned word
        "no terminal punctuation here at all",   # no terminal punct
        L + "!",                    # kept (bang)
        'he said "stop there."',    # kept? ends with " -> actually '."'
        L,                          # kept
    ])
    out = _run(spark, [(1, text)])
    r = out[1]
    assert r.keep
    kept = r.text_clean.split("\n")
    assert L in kept and (L + "!") in kept
    assert all("javascript" not in k for k in kept)
    assert all(len(k.split()) >= 5 for k in kept)
    assert r.n_lines == 7 and r.n_lines_kept == len(kept)


def test_doc_rules(spark):
    out = _run(spark, [
        (1, "\n".join([L] * 3)),                       # kept
        (2, "\n".join([L] * 2)),                       # <3 kept lines
        (3, "\n".join([L] * 3) + "\nif (x) { y(); }"),  # curly brace
        (4, "\n".join([L] * 3) + "\nLorem Ipsum dolor sit amet."),
    ])
    assert out[1].keep and out[1].fail_reason is None
    assert not out[2].keep and out[2].fail_reason == "kept_lines"
    assert not out[3].keep and out[3].fail_reason == "curly_brace"
    assert not out[4].keep and out[4].fail_reason == "banned"
    # dropped docs carry NULL text_clean but keep their counts
    assert out[2].text_clean is None and out[2].n_lines_kept == 2


def test_terminal_punct_toggle(spark):
    bare = "five words but no punctuation here"
    strict = _run(spark, [(1, "\n".join([bare] * 3))])
    assert strict[1].n_lines_kept == 0
    lax = _run(spark, [(1, "\n".join([bare] * 3))],
               require_terminal_punct=False)
    assert lax[1].n_lines_kept == 3 and lax[1].keep


def test_javascript_word_boundary(spark):
    # 'javascripted' is NOT the word 'javascript'
    line = "the javascripted page loads fine and renders quickly."
    out = _run(spark, [(1, "\n".join([line] * 3))])
    assert out[1].n_lines_kept == 3


def test_null_and_empty(spark):
    out = _run(spark, [(1, None), (2, "")])
    for i in (1, 2):
        assert not out[i].keep
        assert out[i].fail_reason == "kept_lines"
        assert out[i].n_lines == 0


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, L)], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
