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
    """Round-13 rotation (queries() docstring): the residual-filter +
    _localize representatives hold slots 1-2 (priority (a) — both code
    paths changed this round); every never-driver-checked entry gets its
    first row (priority (b): docs_token_count, the five r12 newcomers,
    the two NEW r13 entries); the five TPC-H queries whose plans changed
    (merge hints) re-earn rows (priority (a)); the full r10 window
    cohort rotates in (every-third-round deadline, priority (c)); seven
    longest-parked r10/r11 greens fill the tail. The r12 window cohort,
    the r11 ice core, and the unchanged TPC-H block park. An entry may
    leave the window only via a documented rotation, never via an
    accidental insertion above it."""
    keys = list(entry.queries())
    window = set(keys[:50])
    assert keys[0] == "ice_time_scan" and keys[1] == "ice_mor_delete_scan", (
        "the priority-(a) residual/_localize representatives must hold "
        "slots 1-2")
    never_checked = {
        "docs_token_count", "emb_sq_topk", "docs_bpe_tokens",
        "ice_wap_scan", "stream_upsert_sink", "ice_avro_scan",
        "ice_retention_scan", "ice_avro_nested_scan",
        "ice_cherrypick_scan", "ice_ndv_stats",
        "ice_partition_stats_file",
    }
    assert never_checked <= window, (
        f"{sorted(never_checked - window)} (never driver-checked) fell "
        "past the driver's 50-row correctness window")
    plans_changed = {
        "q03_shipping_priority", "q04_order_priority", "q05_region_revenue",
        "q10_returned_items", "q12_late_lines",
    }
    assert plans_changed <= window, (
        f"{sorted(plans_changed - window)} (merge-hint plan changes this "
        "round) must re-earn driver rows")
    r10_cohort = {
        "ice_custom_paths_scan", "docs_bloom_dedup", "docs_quality",
        "docs_fingerprint", "docs_incremental_dedup", "docs_lang_scores",
        "docs_winnow", "q_distinct_parts", "q_rollup", "q_setop_nations",
        "q_topk_orders", "q_anti_join", "docs_minhash_dedup",
        "docs_decontaminate", "docs_ngram_dedup", "docs_simhash",
        "docs_exact_dedup", "stream_incremental", "stream_sink_roundtrip",
        "stream_tumbling_events", "mm_image_features", "mm_audio_features",
        "mm_frame_sample", "docs_source_cap", "docs_substr_dedup",
        "q_window_top_order", "q_events_hourly", "q_asof_join",
    }
    assert len(r10_cohort) == 28
    assert r10_cohort <= window, (
        f"{sorted(r10_cohort - window)} (r10 cohort, every-third-round "
        "deadline) fell past the window")
    family_spread = {
        "ice_dup_cluster_curation",
        "ice_dv_delete_scan", "ice_time_travel",
        "docs_dsir_sample",
    }
    assert family_spread <= window, (
        f"{sorted(family_spread - window)} (longest-parked family spread) "
        "fell past the window")
    # the r13 sweep-debuts (docs_dup_keep_best, ice_avro_write_scan),
    # then ice_docs_curation (family covered by its in-window pair),
    # then the r12 window cohort park first past the boundary
    assert keys[50] == "docs_dup_keep_best"
    assert keys[51] == "ice_avro_write_scan"
    assert keys[52] == "ice_docs_curation" and keys[53] == "ice_orc_scan"
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
