"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": <total query sec>, "unit": "sec",
 "queries": {name: sec}, "sf": <dir>, ...}

Fixture construction (Iceberg table builds from the parquet testdata) is
timed separately as fixture_build_sec — the reference's benchmarks likewise
exclude data loading from per-query timings (BASELINE.md: timed runs are the
queries, the persistent dataset is pre-built).

Timing: every query runs N_RUNS (3) times and reports the MEDIAN — the
single-run timings of rounds 1-4 kept manufacturing phantom regressions on
this shared 32-core box (r3: q_rollup "+70%", r4: q01 "+63%", none
reproducible on an idle box; see BENCH history). The median kills
scheduler/page-cache outliers at ~2 min/round cost; "value" is the sum of
per-query medians, comparable round-over-round. The first run of a query
additionally absorbs any lazy fixture build — another reason run-1 is not
representative and the median is.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # full TPC-H-shaped suite (the reference benchmarks Q1-Q22 over Iceberg,
    # BASELINE.md; same coverage here, adapted shapes per __spark_entry__)
    "q01_pricing_summary",
    # q01 over ~5% MoR-deleted lineitem (reference dm=5 suite): the delta
    # vs plain q01 is the delete-anti-join cost at relational scale
    "q01_mor_pricing_summary",
    "q02_min_cost_supplier",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_region_revenue",
    "q06_revenue_forecast",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_late_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_disjunctive",
    "q20_excess_shippers",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    "q_rollup",
    "q_window_top_order",
    "q_events_hourly",
    "q_asof_join",
    "q_interval_join",
    "ice_mor_delete_scan",
    "ice_dv_delete_scan",
    "ice_update_scan",
    "ice_upsert_scan",
    "ice_spec_evolution_scan",
    "ice_topk_scan",
    "ice_count_star_metadata",
    "ice_sql_merge",
    "ice_merge_conditional",
    "ice_dynamic_prune_join",
    "ice_objectstore_scan",
    "ice_delete_using_scan",
    "ice_docs_curation",
    "ice_dup_cluster_curation",
    "docs_exact_dedup",
    "docs_simhash",
    "docs_lang_scores",
    "docs_minhash_dedup",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_kmeans",
    "emb_semantic_dedup",
    "docs_stratified_sample",
    "docs_pack_sequences",
    "docs_repetition",
    "docs_decontaminate",
    "docs_line_dedup",
    "docs_incremental_minhash",
    "docs_redact_pii",
    "docs_vocab",
    "docs_tfidf",
    "docs_source_cap",
    "docs_substr_dedup",
    "stream_tumbling_events",
    "stream_changelog",
    "stream_curation",
    "stream_dedup_ttl",
    "mm_frame_sample",
    "mm_video_meta",
    "docs_dsir_sample",
    "docs_dup_components",
    "docs_lm_score",
    "mm_image_dedup",
    "mm_audio_dedup",
    "mm_video_dedup",
    "stream_minhash_curation",
    "emb_pq_topk",
    # r10: TIME type end-to-end (write + partition-pruned scan + agg)
    "ice_time_scan",
    # r10: temperature-α mixture (count agg + stateless threshold filter)
    "docs_temperature_sample",
    # r11: ORC write → pruned scan → equality-delete MoR merge → agg
    "ice_orc_scan",
    # r11: NB quality classifier (two bounded training aggs + broadcast
    # scoring — the fastText-filter analogue)
    "docs_quality_classifier",
    # r11: BM25 lexical top-k (|terms|-bounded hit stream, TakeOrdered)
    "docs_bm25_topk",
    # r11: complete Gopher A1.1 rule set (map-side only, zero shuffles)
    "docs_gopher_filter",
    # r11: filter -> classify -> dedup composed pipeline
    "docs_pipeline_curation",
    # r11: C4 line-level cleaning (map-side rewrite, zero shuffles)
    "docs_c4_clean",
    # r12: positional MoR deletes over ORC (arrow-plane row ordinals,
    # parquet delete files anti-joined against ORC data reads)
    "ice_orc_mor_scan",
    # r12: rewrite_position_delete_files (stacked MoR deletes merged to
    # one delete file per data file, dedup, dangling-drop) -> pruned scan
    "ice_delete_compaction_scan",
    # r12: add_files metadata-only import + post-import evolution scan
    "ice_add_files_scan",
    # r12: scalar-quantized ANN (integer codes + integer dot top-k)
    "emb_sq_topk",
    # r12: mini-BPE tokenizer prep (bounded driver fit + pandas-UDF apply)
    "docs_bpe_tokens",
    # r12: Write-Audit-Publish (branch stage -> fast_forward publish)
    "ice_wap_scan",
    # r12: streaming CDC-upsert sink (keep-last per key, exactly-once)
    "stream_upsert_sink",
    # r12: Avro data files (pure-Python decode, arrow plane, MoR deletes)
    "ice_avro_scan",
    # r13: ref-retention-aware expire -> retained-branch scan
    "ice_retention_scan",
    # r13: nested Avro (struct/list/map by field-id, member rename)
    "ice_avro_nested_scan",
    # r13: cherrypick publish onto a diverged main head (wap.id dedup)
    "ice_cherrypick_scan",
    # r13: theta-sketch NDV statistics (one bounded-candidate pass)
    "ice_ndv_stats",
    # r13: partition-statistics file (metadata-only aggregation)
    "ice_partition_stats_file",
    # r13: keep-best-per-duplicate-cluster curation (FineWeb rule)
    "docs_dup_keep_best",
    # r13: the Avro WRITE path (pure-Python codec, in-pass stats, MoR)
    "ice_avro_write_scan",
    # r14: partitioned (day+bucket transforms) NESTED Avro write
    "ice_avro_write_part_scan",
    # r14: z-order clustered rewrite (2-dim file pruning)
    "ice_zorder_scan",
    # r14: avro-format positional + equality DELETE files
    "ice_avro_delete_scan",
    # r14: soft-dedup loss weights (cluster-size micro-weights)
    "docs_dup_weights",
    # r15: z-order with a string dimension (prefix-rank sketch)
    "ice_zorder_string_scan",
    # r15: uuid/fixed/time leaves through the Avro write path
    "ice_avro_types_scan",
    # r15: cluster-weighted temperature sampling (consumes cluster_size)
    "docs_cluster_sample",
]


#: sf1 scale-rehearsal canaries: relational joins/aggs that stress AQE +
#: shuffle sizing, the dedup pipeline, and a MoR delete-anti-join scan
SF1_CANARIES = [
    "q01_pricing_summary", "q03_shipping_priority", "q05_region_revenue",
    "q06_revenue_forecast", "q09_product_profit", "q13_customer_distribution",
    "q18_large_volume", "q21_waiting_supplier",
    "docs_minhash_dedup", "ice_mor_delete_scan",
    # r6 operators under 10× duplication mass: the vocabulary shuffle and
    # the duplicated-span marking both scale with the repeated corpus
    "docs_vocab", "docs_substr_dedup",
    # r7: DSIR fit+score are two linear passes — the ratio should track
    # corpus size, not explode
    "docs_dsir_sample",
    # r7: connected components under 10× duplication mass — the exact-dup
    # star edges grow 10×, the star rounds must stay flat
    "docs_dup_components",
    # r9: the ANN / iterative-fit family under 10× vectors — IVF probes
    # sqrt(N) lists (sublinear), the k-means fit is two bounded-collect
    # iterations, and the LM scorer is a broadcast-model linear scan
    "emb_ivf_topk", "emb_kmeans", "docs_lm_score",
    # r11: classifier training is two linear aggs over the token stream,
    # BM25's scored stream is |terms|-bounded — both should track corpus
    # size under 10× duplication mass
    "docs_quality_classifier", "docs_bm25_topk",
    # r11: the ORC write path's distributed stats aggregate + pruned
    # MoR scan under 10× rows
    "ice_orc_scan",
    # r12: positional MoR over ORC (arrow-plane reads + delete anti-join)
    # and the single-shuffle DSIR shape's stablemate BPE apply under 10×
    "ice_orc_mor_scan", "docs_bpe_tokens",
    # r12: SQ ANN under 10x vectors (0-exchange linear scan + TakeOrdered)
    "emb_sq_topk",
    # r13: the three other merge-hinted queries (q03/q05 are canaries
    # already) — the static lineitem broadcast they carried was exactly
    # the shape only the 10x block could expose
    "q04_order_priority", "q10_returned_items", "q12_late_lines",
    # r14: write-path representatives at 10x — the z-order clustering
    # rewrite (sketch pass + range shuffle) and the Avro OCF write+MoR
    "ice_zorder_scan", "ice_avro_write_scan",
]

_SF1_GEN_VERSION = "v2"  # v2: embeddings scaled too (ANN canaries)


def _ensure_sf1(spark, src_dir: str) -> str:
    """Synthesize an sf1-scale dataset (10× sf0.1) into /tmp, cached across
    runs. Key spaces shift per copy so referential joins stay consistent
    (copy i's orders reference copy i's customers, etc.); nation/region
    stay as-is. Document text is NOT perturbed — 10 byte-identical copies
    of the corpus is realistic web-dup shape and exercises minhash_dedup's
    exact-collapse pre-pass at volume."""
    import shutil

    from pyspark.sql import functions as F

    # same slow-/tmp consideration as session._scratch_dir / the fixture
    # cache: this is bulk parquet WRITING, keep it off throttled mounts
    sf1_root = os.environ.get("SPARK_GRAFT_SF1_DIR")
    if not sf1_root:
        home = os.path.expanduser("~")
        try:
            os.makedirs(os.path.join(home, ".spark_graft_sf1"), exist_ok=True)
            sf1_root = os.path.join(home, ".spark_graft_sf1")
        except OSError:
            sf1_root = "/tmp/spark_graft_sf1"
    out = os.path.join(sf1_root,
                       f"{os.path.basename(os.path.normpath(src_dir))}-x10-{_SF1_GEN_VERSION}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    # same flock discipline as __spark_entry__._build_once: two concurrent
    # bench runs must serialize the check/rmtree/build/sentinel sequence or
    # they interleave writes into the same directory and later runs trust a
    # corrupt cached fixture
    import fcntl

    os.makedirs(os.path.dirname(out), exist_ok=True)
    lock_path = out + ".lock"
    lk = open(lock_path, "w")
    fcntl.flock(lk, fcntl.LOCK_EX)
    try:
        if os.path.exists(done):  # built while we waited for the lock
            return out
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        _build_sf1(spark, src_dir, out)
        with open(done, "w") as fh:
            fh.write(_SF1_GEN_VERSION)
        return out
    finally:
        fcntl.flock(lk, fcntl.LOCK_UN)
        lk.close()


def _build_sf1(spark, src_dir: str, out: str) -> None:
    from pyspark.sql import functions as F

    def rd(name):
        return spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))

    for name in ("nation", "region"):
        rd(name).write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    shifts = {}  # key column -> stride (max+1 of the base table's key)
    for tbl, key in (("customer", "c_custkey"), ("orders", "o_orderkey"),
                     ("part", "p_partkey"), ("supplier", "s_suppkey"),
                     ("documents", "doc_id"), ("embeddings", "vec_id")):
        shifts[key] = rd(tbl).agg(F.max(key)).first()[0] + 1

    scaled_cols = {
        "customer": {"c_custkey": "c_custkey"},
        "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
        "supplier": {"s_suppkey": "s_suppkey"},
        "part": {"p_partkey": "p_partkey"},
        "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                     "l_suppkey": "s_suppkey"},
        "documents": {"doc_id": "doc_id"},
        # byte-identical embedding copies under shifted ids: ANN top-k
        # then sees each neighbor 10×, k-means gets 10× members per
        # cluster — the degenerate-duplication shape dedup corpora have
        "embeddings": {"vec_id": "vec_id"},
    }
    for tbl, colmap in scaled_cols.items():
        base = rd(tbl)
        copies = []
        for i in range(10):
            c = base
            for col, keyspace in colmap.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * shifts[keyspace]))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        (df.repartition(32)
         .write.mode("overwrite").parquet(os.path.join(out, f"{tbl}.parquet")))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from duckdb_iceberg_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # JVM/codegen warmup so the first timed query doesn't absorb session
    # startup (the reference's benchmark runner likewise excludes load)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet")).select("r_regionkey")
    warm.join(warm.limit(1), ["r_regionkey"], "left").groupBy("r_regionkey").count().collect()
    # spin up the Python UDF worker pool (pandas import per worker) so the
    # first pandas-UDF query measures steady-state, not interpreter startup
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm_udf(s):
        return s

    spark.range(32 * 1024).repartition(32).select(_warm_udf("id")).count()

    # build fixtures (cached across runs) outside per-query timing
    t0 = time.time()
    for fn in (entry._ice_lineitem, entry._ice_lineitem_mor,
               entry._ice_orders_mor, entry._ice_customer_upd,
               entry._ice_orders_dv, entry._ice_supplier_upsert,
               # r9: the rest of the HEADLINE fixtures — their builds were
               # landing inside first timed runs (ice_sql_merge raw
               # [2.36, 0.19, 0.24] in the r9 record), which the median
               # absorbs but the raw-run artifact should not show
               entry._ice_supplier_sqlmerge, entry._ice_customer_condmerge,
               entry._ice_orders_bucketed, entry._ice_orders_del_using,
               entry._ice_documents_mor, entry._ice_customer_specevo,
               entry._ice_objectstore,
               # streaming fixtures: their builds replay micro-batches
               # (stream_dedup_ttl even sleeps past a TTL) — pay that once
               # here, not inside the first timed run
               entry._ice_stream_curated, entry._stream_dedup_ttl_out,
               entry._ice_stream_minhash, entry._ice_documents_times,
               # r13/r14 HEADLINE newcomers: avro write (+MoR delete),
               # partitioned nested avro write, z-order rewrite, and the
               # r13 commit-plane/statistics fixtures
               entry._ice_documents_avro_write,
               entry._ice_documents_avro_part, entry._ice_orders_zorder,
               entry._ice_documents_avro_nested,
               entry._ice_documents_pstats, entry._ice_documents_ndv,
               entry._ice_documents_cherrypick,
               entry._ice_documents_retention,
               entry._ice_documents_avro_deletes,
               # r15 newcomers: string-dim z-order + avro exotic leaves
               entry._ice_orders_zorder_str, entry._ice_docs_avro_types):
        fn(spark, sf_dir)
    build_s = time.time() - t0

    # drop every trace of the fixture-build phase before the first timed
    # run: cached plans/blocks plus a forced full GC so build-phase heap
    # garbage can't land its collection pauses inside the timed block
    # (VERDICT r9 task 2's prime suspect — the sf1 block already did the
    # clearCache half and showed no regression)
    spark.catalog.clearCache()
    import gc as _gc

    _gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass

    N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    results: dict[str, float] = {}
    results_min: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    load_after: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        times = []
        for _ in range(N_RUNS):
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            times.append(time.time() - t0)
            assert rows is not None
        results[name] = round(sorted(times)[len(times) // 2], 3)
        # min-of-N alongside the median: on a shared box (r9's "+41%
        # regression" was external load — untouched TPC-H swung 26s↔43s
        # between two identical back-to-back runs) the min is the
        # least-contaminated sample, same rationale as the sf1 block
        results_min[name] = round(min(times), 3)
        # raw per-run times go to the file artifact: a phantom median
        # (one process-local spike repeated across a query's runs) is
        # indistinguishable from a regression without them
        raw_runs[name] = [round(t, 3) for t in times]
        # 1-min loadavg after each query: correlates a slow sample with
        # external box load instead of leaving it to next round's theory
        try:
            load_after[name] = round(os.getloadavg()[0], 2)
        except OSError:
            pass
        # operators that persist intermediates (dedup/verify caches) would
        # otherwise accumulate blocks across 59 queries × N runs and slow
        # LATER queries via block-manager/GC pressure (measured: emb_*
        # regressing 3-5× when run after the dedup family)
        spark.catalog.clearCache()
    total = round(sum(results.values()), 3)

    out = {
        "metric": "headline query wall-clock (iceberg roundtrips + relational + LLM ops)",
        "value": total,
        "unit": "sec",
        "queries": results,
        "value_min": round(sum(results_min.values()), 3),
        "queries_min": results_min,
        "sf": sf_dir,
        "fixture_build_sec": round(build_s, 3),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "all"),
    }
    try:
        out["loadavg"] = [round(v, 2) for v in os.getloadavg()]
    except OSError:
        pass

    # sf1 scale rehearsal (10× the bench SF): surfaces AQE/skew/
    # shuffle-sizing behavior the small SF can't. ratio_vs_bench_sf is
    # sf1_min / SAME-SESSION bench-SF min (measured adjacent in time,
    # r14) — ≤10 means at-or-better than linear scaling (32 cores are
    # underutilized at sf0.1, so well-shaped queries land far below 10).
    # Disable: SPARK_GRAFT_SF1=0.
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        t0 = time.time()
        sf1_dir = _ensure_sf1(spark, sf_dir)
        sf1_gen_s = time.time() - t0
        t0 = time.time()
        # fixtures the canaries scan: build OUTSIDE per-query timing, like
        # the bench-SF block (the TPC-H canaries read the Iceberg lineitem)
        entry._ice_lineitem(spark, sf1_dir)
        entry._ice_orders_mor(spark, sf1_dir)
        entry._ice_documents_orc(spark, sf1_dir)
        entry._ice_orders_zorder(spark, sf1_dir)
        entry._ice_documents_avro_write(spark, sf1_dir)
        sf1_build_s = time.time() - t0
        # min over >=2 runs per canary: the single-run r7 record carried a
        # phantom 5x q21 "regression" that was cold-cache + box load, not
        # code (VERDICT r7) — the sf0.1 block learned the same lesson in
        # r5. min (not median) because the question here is scaling shape,
        # and the best observed time is the least-contaminated sample.
        n_sf1 = max(2, int(os.environ.get("SPARK_GRAFT_SF1_RUNS", "2")))
        # drop fixture-build caches before timing: a fresh in-process
        # rebuild (code-fingerprint change) leaves block-manager/GC
        # pressure that lands on whichever canary runs first
        spark.catalog.clearCache()
        sf1_times: dict[str, float] = {}
        sf1_denom: dict[str, float] = {}
        sf1_ratio: dict[str, float] = {}
        sf1_ratio_block: dict[str, float] = {}
        sf1_raw: dict[str, list[float]] = {}
        sf1_denom_raw: dict[str, list[float]] = {}
        for name in SF1_CANARIES:
            # same-session denominator (VERDICT r13 task 2): the ratio's
            # bench-SF side is re-measured HERE, adjacent in time to the
            # canary's sf1 runs, instead of reusing the headline median
            # from ~90 queries earlier in the process — three rounds
            # running, that cross-block denominator manufactured phantom
            # >3 ratios (q03 r12; substr/q13/q21 r13) out of page-cache
            # and box-load skew, each costing a round of re-probing.
            dtimes = []
            for _ in range(n_sf1):
                t0 = time.time()
                rows = qs[name](spark, sf_dir).collect()
                assert rows is not None
                dtimes.append(time.time() - t0)
            times = []
            for _ in range(n_sf1):
                t0 = time.time()
                rows = qs[name](spark, sf1_dir).collect()
                assert rows is not None
                times.append(time.time() - t0)
            spark.catalog.clearCache()
            sf1_times[name] = round(min(times), 3)
            sf1_denom[name] = round(min(dtimes), 3)
            sf1_raw[name] = [round(t, 3) for t in times]
            sf1_denom_raw[name] = [round(t, 3) for t in dtimes]
            if sf1_denom[name] > 0:
                sf1_ratio[name] = round(sf1_times[name] / sf1_denom[name], 2)
            # the old cross-block ratio stays in the artifact for
            # continuity with r7-r13 records (headline-median denominator)
            if results.get(name):
                sf1_ratio_block[name] = round(
                    sf1_times[name] / results[name], 2)
        out["sf1"] = {
            "sf": sf1_dir,
            "runs_per_query": n_sf1,
            "queries": sf1_times,
            "bench_sf_same_session": sf1_denom,
            "ratio_vs_bench_sf": sf1_ratio,
            "ratio_vs_headline_median": sf1_ratio_block,
            "value": round(sum(sf1_times.values()), 3),
            "gen_sec": round(sf1_gen_s, 3),
            "fixture_build_sec": round(sf1_build_s, 3),
        }
        out["sf1"]["query_runs"] = sf1_raw
        out["sf1"]["bench_sf_runs"] = sf1_denom_raw

    # metadata-plane stress block (r13, VERDICT r12 task 7): planner
    # wall-clock + peak memory at 1e5 manifest entries, metadata only —
    # regression bound for the driver-side planning constants. Runs
    # in-process (no Spark jobs); invariants inside run() assert the
    # selective plan parsed exactly 1 of 200 manifests.
    if os.environ.get("SPARK_GRAFT_META_BENCH", "1") != "0":
        try:
            from tools import bench_metadata

            out["metadata_plane"] = bench_metadata.run()
        except Exception as e:  # never sink the whole artifact
            out["metadata_plane"] = {"error": str(e)[:200]}
        # r15 (VERDICT r14 task 2): the 1e6-entry block — distributed
        # LEAN task emission bounds the driver's task-list memory (the
        # last 100 TB ceiling); invariants inside run_large() assert
        # 1e6 tasks, 1-of-1000 selective parse, peak < budget
        try:
            out["metadata_plane_1e6"] = bench_metadata.run_large(spark)
        except Exception as e:
            out["metadata_plane_1e6"] = {"error": str(e)[:200]}

    # min-of-N discipline for MOVED queries (VERDICT r8 task 5): any query
    # whose median shifted >1.3x vs the PREVIOUS bench artifact ships its
    # raw per-run times in stdout too, so the driver's BENCH_r{N}.json is
    # self-diagnosing — a phantom (one spike poisoning a median) is
    # distinguishable from a real regression without the file artifact
    prev_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LOCAL.json")
    try:
        with open(prev_path) as fh:
            prev = json.load(fh)
        # only comparable when the previous artifact ran the same SF
        prev_q = prev.get("queries", {}) if prev.get("sf") == sf_dir else {}
    except (OSError, ValueError):
        prev_q = {}
    flagged = {
        name: raw_runs[name]
        for name, t in results.items()
        if prev_q.get(name) and t > 0
        and (t / prev_q[name] > 1.3 or prev_q[name] / t > 1.3)
    }
    if flagged:
        out["flagged_query_runs"] = flagged

    # file artifact alongside stdout: the driver's BENCH record keeps only
    # a truncated tail of stdout ("parsed": null in r6/r7) — the JSON must
    # survive somewhere parseable
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LOCAL.json"), "w") as fh:
            json.dump({**out, "query_runs": raw_runs,
                       "loadavg_after_query": load_after}, fh)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the record
    print(json.dumps(out))


if __name__ == "__main__":
    main()
