"""Driver-contract invariants: the correctness harness checks only the
FIRST 50 queries() entries (documented in __spark_entry__.queries), so dict
ordering is load-bearing — these tests freeze the window's composition and
the oracle coverage so an innocent-looking insertion can't silently drop a
query class out of hard-checking."""

import __spark_entry__ as entry

#: rows-only by design: murmur3 spec vectors (no SQL twin) and
#: approximate-by-construction results
ROWS_ONLY = {"ice_bucket_fn", "emb_ivf_topk"}


def test_window_holds_every_iceberg_and_pipeline_query():
    keys = list(entry.queries())
    window = set(keys[:50])
    outside = [k for k in keys
               if k.startswith(("ice_", "docs_", "emb_", "stream_", "mm_"))
               and k not in window]
    assert not outside, (
        f"{outside} fell past the driver's 50-row correctness window — "
        "reorder queries() (displace a long-green TPC-H/q_* extra instead)")


def test_window_keeps_tpch_canaries():
    window = set(list(entry.queries())[:50])
    canaries = {"q01_pricing_summary", "q01_mor_pricing_summary",
                "q02_min_cost_supplier", "q09_product_profit",
                "q18_large_volume", "q21_waiting_supplier"}
    assert canaries <= window


def test_every_query_has_oracle_or_is_documented_rows_only():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [k for k in qs if k not in osql and k not in ROWS_ONLY]
    assert not missing, (
        f"{missing} have neither an oracle_sql() entry nor a documented "
        "rows-only justification")
    stale = [k for k in osql if k not in qs]
    assert not stale, f"oracle_sql() has entries for unknown queries: {stale}"
