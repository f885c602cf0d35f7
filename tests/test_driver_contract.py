"""Driver-contract invariants: the correctness harness checks only the
FIRST 50 queries() entries (documented in __spark_entry__.queries), so dict
ordering is load-bearing — these tests freeze the window's composition and
the oracle coverage so an innocent-looking insertion can't silently drop a
query class out of hard-checking."""

import __spark_entry__ as entry

#: rows-only by design: DISTRIBUTED iterative float reductions (k-means /
#: SemDeDup) whose centroids no SQL replay can reproduce.
#: emb_knn_join_bucketed left this set in r6 (probe math deterministic
#: given the SRP planes); ice_bucket_fn left in r7 (literal-VALUES oracle
#: from an independent murmur3); emb_pq_topk AND emb_ivf_topk left in r8 —
#: their codebooks/centroids are bounded deterministic driver fits, so the
#: oracles re-derive them and replay the distributed half as literal SQL.
#: Deleting any of those oracles must fail the guard below.
ROWS_ONLY = {
    "emb_kmeans", "emb_semantic_dedup",
}


def test_window_holds_reference_surface_and_rotation():
    """Round-8 rotation (queries() docstring): the 16-entry ice_* DML/scan
    core plus the new ice_dup_cluster_curation stay in-window; the rotating
    slots hold the full TPC-H suite (VERDICT r7 task 1, longest-parked) and
    the 10 r7 operators that had never earned a driver row. The 9
    metadata/function ice_* entries (driver-green r4-r7, code untouched)
    park at 51+ with everything else. An entry may leave the window only
    via a documented rotation, never via an accidental insertion above
    it."""
    keys = list(entry.queries())
    window = set(keys[:50])
    ice_core = {
        "ice_mor_delete_scan", "ice_delete_using_scan", "ice_dv_delete_scan",
        "ice_update_scan", "ice_upsert_scan", "ice_merge_scan",
        "ice_sql_merge", "ice_merge_conditional", "ice_time_travel",
        "ice_schema_evolution", "ice_spec_evolution_scan",
        "ice_compaction_scan", "ice_bucket_pruned_scan",
        "ice_dynamic_prune_join", "ice_variant_extract", "ice_docs_curation",
        "ice_dup_cluster_curation",
    }
    assert ice_core <= window, (
        f"{sorted(ice_core - window)} (reference DML/scan core) fell past "
        "the driver's 50-row correctness window")
    tpch = {
        "q01_pricing_summary", "q01_mor_pricing_summary",
        "q02_min_cost_supplier", "q03_shipping_priority",
        "q04_order_priority", "q05_region_revenue", "q06_revenue_forecast",
        "q07_volume_shipping", "q08_market_share", "q09_product_profit",
        "q10_returned_items", "q11_important_stock", "q12_late_lines",
        "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
        "q16_supplier_cnt", "q17_small_quantity", "q18_large_volume",
        "q19_disjunctive", "q20_excess_shippers", "q21_waiting_supplier",
        "q22_sales_opportunity",
    }
    r7_first_rows = {
        "mm_video_meta", "docs_dsir_sample", "docs_dup_components",
        "docs_lm_score", "docs_lm_buckets", "mm_image_dedup",
        "mm_audio_dedup", "mm_video_dedup", "stream_minhash_curation",
        "emb_pq_topk",
    }
    assert tpch <= window, (
        f"{sorted(tpch - window)} (TPC-H, r8 rotation) fell past the window")
    assert r7_first_rows <= window, (
        f"{sorted(r7_first_rows - window)} (r7 first-driver-row set) fell "
        "past the window")
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


def test_ann_oracles_degrade_without_corpus(monkeypatch):
    """The PQ/IVF oracles are data-dependent builders. When the corpus
    parquet is unreadable they must drop out (rows-only degradation for
    exactly those two queries) WITHOUT killing the 100+ static oracles."""
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/nonexistent/sf")
    entry._ANN_ORACLE_CACHE.clear()
    try:
        osql = entry.oracle_sql()
        assert "emb_pq_topk" not in osql and "emb_ivf_topk" not in osql
        assert "q01_pricing_summary" in osql and len(osql) > 100
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
