"""Driver-contract invariants: the correctness harness checks only the
FIRST 50 queries() entries (documented in __spark_entry__.queries), so dict
ordering is load-bearing — these tests freeze the window's composition and
the oracle coverage so an innocent-looking insertion can't silently drop a
query class out of hard-checking."""

import __spark_entry__ as entry

#: rows-only by design — EMPTY since r9: the k-means/SemDeDup fits became
#: order-independent (micro-unit integer centroid sums, left-to-right
#: assignment dots), so even the last two iterative operators now carry
#: full literal-replay oracles. History of departures: emb_knn_join_bucketed
#: r6 (probe math deterministic given the SRP planes); ice_bucket_fn r7
#: (literal-VALUES oracle from an independent murmur3); emb_pq_topk +
#: emb_ivf_topk r8 (bounded deterministic driver fits replayed as literal
#: SQL); emb_kmeans + emb_semantic_dedup r9 (full fit replay). Deleting any
#: of those oracles must fail the guard below.
ROWS_ONLY: set = set()


def test_window_holds_reference_surface_and_rotation():
    """Round-14 rotation (queries() docstring, VERDICT r13 task 1):
    code-changed entries hold slots 1-5 (q21 single-pass rewrite,
    NDV-consuming runtime filter, catalog-handle changelog, the
    ADVICE-hardened statistics pair); the three never-driver-checked
    entries get their first rows (slots 6-8); the full every-third-round
    cohort last green r11 rotates in (17 TPC-H + q_interval_join, the
    r11 ice DML/scan core, ice_docs_curation, probes, streaming
    windows); four r12-cohort family representatives fill the tail. The
    r12/r13 window cohorts park (due r15/r16). An entry may leave the
    window only via a documented rotation, never via an accidental
    insertion above it."""
    keys = list(entry.queries())
    window = set(keys[:50])
    assert keys[0] == "q21_waiting_supplier", (
        "the single-pass q21 rewrite must hold slot 1 (priority (a))")
    code_changed = {
        "q21_waiting_supplier", "ice_dynamic_prune_join",
        "stream_changelog", "ice_ndv_stats", "ice_partition_stats_file",
    }
    assert set(keys[:5]) == code_changed, (
        "slots 1-5 are the priority-(a) code-changed entries")
    never_checked = {
        "docs_dup_keep_best", "ice_avro_write_scan",
        "ice_avro_write_part_scan", "ice_zorder_scan",
    }
    assert set(keys[5:9]) == never_checked, (
        f"{sorted(never_checked - window)} (never driver-checked) must "
        "sit right after the code-changed block")
    due_r11 = {
        "q01_pricing_summary", "q01_mor_pricing_summary",
        "q02_min_cost_supplier", "q06_revenue_forecast",
        "q07_volume_shipping", "q08_market_share", "q09_product_profit",
        "q11_important_stock", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_cnt",
        "q17_small_quantity", "q18_large_volume", "q19_disjunctive",
        "q20_excess_shippers", "q22_sales_opportunity", "q_interval_join",
        "ice_delete_using_scan", "ice_sql_merge", "ice_update_scan",
        "ice_upsert_scan", "ice_merge_scan", "ice_merge_conditional",
        "ice_schema_evolution", "ice_spec_evolution_scan",
        "ice_compaction_scan", "ice_bucket_pruned_scan",
        "ice_variant_extract", "ice_docs_curation", "docs_lm_score",
        "docs_lm_buckets", "docs_dsir_probe", "docs_lm_probe",
        "docs_temperature_sample", "docs_incremental_minhash",
        "stream_session_events", "stream_sliding_events",
    }
    assert len(due_r11) == 38
    assert due_r11 <= window, (
        f"{sorted(due_r11 - window)} (last driver-green r11 or older, "
        "every-third-round deadline) fell past the window")
    family_spread = {
        "ice_orc_mor_scan", "emb_pq_topk", "docs_pipeline_curation",
    }
    assert family_spread <= window, (
        f"{sorted(family_spread - window)} (r12-cohort family spread) "
        "fell past the window")
    # first past the boundary: ice_add_files_scan (yielded its slot to
    # ice_zorder_scan), the r14 sweep-debut ice_avro_delete_scan (due a
    # driver row r15 under never-checked priority), then the r13 cohort
    assert keys[50] == "ice_add_files_scan"
    assert keys[51] == "ice_avro_delete_scan"
    assert keys[52] == "docs_dup_weights"
    assert keys[53] == "ice_time_scan"
    assert len(keys) >= 50 and len(window) == 50


def test_fixture_cache_lifecycle(tmp_path, monkeypatch):
    """_build_once is crash-, staleness- and concurrency-safe: a completed
    build is reused; a partial build (no _BUILD_DONE) is wiped and rebuilt;
    a sentinel written by different builder code (stale fingerprint — the r5
    ice_docs_curation flake class) forces a rebuild; and concurrent builders
    serialize under the flock instead of interleaving rmtree/write."""
    import os
    import threading

    monkeypatch.setattr(entry, "_CACHE_ROOT", str(tmp_path))
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    builds = []

    def builder(loc):
        os.makedirs(loc)
        builds.append(loc)
        with open(os.path.join(loc, "data"), "w") as fh:
            fh.write("x")

    loc = entry._build_once(sf, "t", builder)
    assert len(builds) == 1 and os.path.exists(os.path.join(loc, "data"))
    entry._build_once(sf, "t", builder)
    assert len(builds) == 1, "completed build was not reused"

    # partial build (crash before sentinel) → wiped and rebuilt
    os.remove(os.path.join(loc, "_BUILD_DONE"))
    entry._build_once(sf, "t", builder)
    assert len(builds) == 2

    # sentinel from different builder code → invalidated
    with open(os.path.join(loc, "_BUILD_DONE"), "w") as fh:
        fh.write("some-other-code-version")
    entry._build_once(sf, "t", builder)
    assert len(builds) == 3
    with open(os.path.join(loc, "_BUILD_DONE")) as fh:
        assert fh.read() == entry._CODE_FINGERPRINT

    # concurrent builders: exactly one runs, none interleave
    import shutil
    shutil.rmtree(loc)
    running = threading.Semaphore(1)

    def slow_builder(loc):
        assert running.acquire(blocking=False), "two builders interleaved"
        try:
            builder(loc)
        finally:
            running.release()

    threads = [threading.Thread(target=entry._build_once,
                                args=(sf, "t", slow_builder))
               for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 4, "concurrent builders must build exactly once"


DATA_ORACLES = {
    "emb_pq_topk", "emb_ivf_topk", "emb_kmeans", "emb_semantic_dedup",
    "docs_dsir_sample", "docs_lm_score", "docs_lm_buckets", "docs_tfidf",
}


def test_data_oracles_degrade_without_corpus(monkeypatch):
    """The literal-replay oracles are data-dependent builders. When the
    corpus parquet is unreadable they must drop out (rows-only degradation
    for exactly that group) WITHOUT killing the 100+ static oracles."""
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/nonexistent/sf")
    entry._ANN_ORACLE_CACHE.clear()
    try:
        osql = entry.oracle_sql()
        assert not DATA_ORACLES & set(osql)
        assert "q01_pricing_summary" in osql and len(osql) > 100
    finally:
        entry._ANN_ORACLE_CACHE.clear()


def test_data_oracle_builder_bugs_raise(monkeypatch):
    """ADVICE r8: only the unreadable-corpus class may degrade the data
    oracles to rows-only — a genuine builder bug (numpy/logic error) must
    fail loudly, not silently park the hash coverage the rotations claim."""
    import pytest

    monkeypatch.setattr(entry, "_pq_topk_sql",
                        lambda *a, **k: (_ for _ in ()).throw(
                            ValueError("builder bug")))
    entry._ANN_ORACLE_CACHE.clear()
    try:
        with pytest.raises(ValueError):
            entry.oracle_sql()
    finally:
        entry._ANN_ORACLE_CACHE.clear()


def test_every_query_has_oracle_or_is_documented_rows_only():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [k for k in qs if k not in osql and k not in ROWS_ONLY]
    assert not missing, (
        f"{missing} have neither an oracle_sql() entry nor a documented "
        "rows-only justification")
    stale = [k for k in osql if k not in qs]
    assert not stale, f"oracle_sql() has entries for unknown queries: {stale}"
