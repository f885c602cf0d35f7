"""Cross-engine tokenize precondition guard.

Every text-family oracle splits on the regex ``\\s+`` in BOTH engines,
and the two regex dialects disagree on exactly one ASCII character:
Java/Python ``\\s`` includes vertical tab (\\x0B), DuckDB's RE2 does NOT
(probed r10: ``string_split_regex('a'||chr(11)||'b', '\\s+')`` keeps one
token, Java splits two). Neither dialect splits on Unicode spaces
(NBSP, EN/EM space, ideographic space) without flags, so those are safe
as long as both sides agree — but a corpus containing \\x0B would turn
every tokenize-derived driver row red at once.

This guard pins the precondition on the actual test corpora: if the
driver's generated documents ever include \\x0B (or \\x0C and \\r, which
both dialects DO split — included here to snapshot the full charset
assumption), this fails locally with an exact diagnosis, and the
in-window stage-bisect probes (docs_lm_probe's ``doc_toks``) localize it
at the driver in the same round.
"""

import os

import duckdb
import pytest

SFS = [s for s in ("sf0.001", "sf0.01", "sf0.1")
       if os.path.exists(f"/root/testdata/{s}/documents.parquet")]


@pytest.mark.parametrize("sf", SFS)
def test_corpus_has_no_regex_dialect_sensitive_whitespace(sf):
    path = f"/root/testdata/{sf}/documents.parquet"
    n = duckdb.sql(
        "SELECT count(*) FROM read_parquet(?) "
        "WHERE regexp_matches(text, '\\x0b')", params=[path]).fetchone()[0]
    assert n == 0, (
        f"{n} documents in {sf} contain vertical tab (\\x0B) — Java \\s "
        "splits on it, DuckDB RE2 \\s does not, so every tokenize-based "
        "oracle would hash-diverge; switch both engines' split regex to "
        "an explicit character class before trusting text-family rows")
    # snapshot the rest of the whitespace charset: only ' ' and '\n' and
    # '\t' appear today — a new whitespace character entering the
    # generator is worth noticing even when both dialects agree on it
    exotic = duckdb.sql(
        "SELECT count(*) FROM read_parquet(?) WHERE "
        "regexp_matches(text, '[\\x0c\\r\\x{00a0}\\x{2003}\\x{3000}]')",
        params=[path]).fetchone()[0]
    assert exotic == 0, (
        f"{exotic} documents in {sf} carry whitespace beyond space/tab/"
        "newline — re-verify both engines' tokenize before trusting "
        "text-family driver rows")
