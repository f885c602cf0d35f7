"""Generate PLANS.md: physical-plan evidence that the engine's queries are
shaped right at scale — parquet pushdown (PushedFilters/ReadSchema), join
strategies (broadcast vs shuffle), whole-stage codegen spans, and
driver-side file-pruning stats. Usage: python tools/explain_audit.py [sf_dir]"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_revenue_forecast",
    "q08_market_share",
    "q02_min_cost_supplier",
    "q11_important_stock",
    "q21_waiting_supplier",
    "q18_large_volume",
    "q01_mor_pricing_summary",
    "ice_dv_delete_scan",
    "ice_topk_scan",
    "ice_spec_evolution_scan",
    "docs_exact_dedup",
    "docs_minhash_dedup",
    "docs_ngram_dedup",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "emb_knn_join_bucketed",
    "ice_merge_conditional",
    "ice_delete_using_scan",
    "docs_stratified_sample",
    "docs_pack_sequences",
    "docs_incremental_dedup",
    "docs_repetition",
    "docs_decontaminate",
    "docs_resample_mixture",
    "q_asof_join",
    "q_interval_join",
    "docs_incremental_minhash",
    "docs_corpus_report",
    "docs_vocab",
    "docs_tfidf",
    "docs_source_cap",
    "docs_substr_dedup",
    "stream_changelog",
    "stream_session_events",
    "stream_sliding_events",
    "stream_dedup_ttl",
    "ice_mor_delete_scan",
    "mm_video_meta",
    "docs_dsir_sample",
    "docs_dup_components",
    "docs_lm_score",
    "docs_lm_buckets",
    "mm_image_dedup",
    "mm_audio_dedup",
    "mm_video_dedup",
    "stream_minhash_curation",
    # r8 additions: PQ/IVF ANN (now hash-checked), cluster-level curation
    # composed with the Iceberg scan path, variant write roundtrip
    "emb_pq_topk",
    "emb_ivf_topk",
    "ice_dup_cluster_curation",
    "ice_variant_write_scan",
    # r9 window rotation: newly hash-checked iterative fits, the rest of
    # the recompute-float audit cohort, the parked r7 text ops, and the
    # metadata/function ice_* entries (driver-side metadata frames —
    # their "plans" pin that NO table data is scanned)
    "emb_kmeans",
    "emb_semantic_dedup",
    "emb_knn_join",
    "docs_token_count",
    "docs_chunk",
    "docs_normalize",
    "docs_redact_pii",
    "stream_curation",
    "ice_count_star_metadata",
    "ice_objectstore_scan",
    "ice_snapshot_history",
    "ice_partition_stats",
    "ice_column_stats",
    "ice_metadata_files",
    "ice_truncate_fn",
    "ice_bucket_fn",
    # NEW in r9 (parked, r10 rotation): custom write paths + bloom dedup
    "ice_custom_paths_scan",
    "docs_bloom_dedup",
    # r10: complete coverage of the r10 driver window (VERDICT r9 task 8)
    # — the remaining ice core, the stage-bisect probes, and the r7/r6
    # rotation cohorts that lacked a PLANS entry
    "ice_update_scan",
    "ice_upsert_scan",
    "ice_merge_scan",
    "ice_sql_merge",
    "ice_time_travel",
    "ice_schema_evolution",
    "ice_compaction_scan",
    "ice_bucket_pruned_scan",
    "ice_dynamic_prune_join",
    "ice_variant_extract",
    "ice_docs_curation",
    "docs_dsir_probe",
    "docs_lm_probe",
    "docs_quality",
    "docs_fingerprint",
    "docs_lang_scores",
    "docs_winnow",
    "q_distinct_parts",
    "q_rollup",
    "q_setop_nations",
    "q_topk_orders",
    "q_anti_join",
    "docs_simhash",
    "stream_incremental",
    "stream_sink_roundtrip",
    "stream_tumbling_events",
    "mm_image_features",
    "mm_audio_features",
    "mm_frame_sample",
    "q_window_top_order",
    "q_events_hourly",
    # NEW in r10 (parked, r11 rotation): TimeType scan + temperature mix
    "ice_time_scan",
    "docs_temperature_sample",
    # r11: the rest of TPC-H — the full r11 driver window now has a PLANS
    # entry (VERDICT r10 task 8)
    "q04_order_priority",
    "q07_volume_shipping",
    "q09_product_profit",
    "q10_returned_items",
    "q12_late_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity",
    "q19_disjunctive",
    "q20_excess_shippers",
    "q22_sales_opportunity",
    # NEW in r11 (parked, r12 rotation): ORC roundtrip, NB quality
    # classifier, BM25 lexical top-k
    "ice_orc_scan",
    "docs_quality_classifier",
    "docs_bm25_topk",
    "docs_gopher_filter",
    "docs_pipeline_curation",
    "docs_c4_clean",
    # NEW in r12: positional MoR deletes over ORC (arrow-plane ordinals)
    "ice_orc_mor_scan",
    "ice_delete_compaction_scan",
    "ice_add_files_scan",
    "emb_sq_topk",
    "docs_bpe_tokens",
    "ice_wap_scan",
    "stream_upsert_sink",
    "ice_avro_scan",
    # r13: retention-expired branch scan; nested Avro struct/list/map decode
    "ice_retention_scan",
    "ice_avro_nested_scan",
    "ice_cherrypick_scan",
    "ice_ndv_stats",
    "ice_partition_stats_file",
    "docs_dup_keep_best",
    "ice_avro_write_scan",
    # r14: partitioned (day+bucket) NESTED Avro write roundtrip
    "ice_avro_write_part_scan",
    # r14: z-order clustered rewrite (2-dim pruning; the scan's plan
    # pins that the 2-dim predicate is pushed to the parquet reader)
    "ice_zorder_scan",
    # r14: avro-format delete files (both flavors) applied at scan
    "ice_avro_delete_scan",
    # r14: soft-dedup loss weights (components + one size groupBy)
    "docs_dup_weights",
    # r15: string-dim z-order (string + numeric predicates pushed)
    "ice_zorder_string_scan",
    # r15: uuid/fixed/time avro scan (TIME predicate pruned via bounds)
    "ice_avro_types_scan",
    # r15: cluster-weighted sampling (components + broadcast thresholds,
    # decision map-side)
    "docs_cluster_sample",
]


def summarize(plan: str) -> list[str]:
    """Counts come from explain('formatted'), where every physical node
    carries a unique id — a cached or reused subtree contributes each node
    ONCE no matter how many operators reference it (raw toString repeats
    the whole cached plan at every InMemoryTableScan, overstating shuffle
    counts by an order of magnitude on cache-heavy pipelines)."""
    out = []
    # an executed AdaptiveSparkPlan prints BOTH its final and initial plans
    # with distinct node ids — drop the superseded initial-plan nodes
    init_ids: set[str] = set()
    in_init = False
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            in_init = True
            continue
        if "== Final Plan ==" in line or re.match(r"\(\d+\) ", line.strip()):
            in_init = False
        if in_init:
            init_ids.update(m.group(1) for m in re.finditer(r"\((\d+)\)", line))

    def ids(kind: str) -> set[str]:
        found = {m.group(1) for m in re.finditer(rf"\((\d+)\) {kind}\b", plan)}
        return found - init_ids

    join_ids = {kind: ids(kind)
                for kind in ("BroadcastHashJoin", "SortMergeJoin",
                             "ShuffledHashJoin", "BroadcastNestedLoopJoin")}
    out.append(f"- shuffles (Exchange): {len(ids('Exchange'))}")
    joins = {k: len(v) for k, v in join_ids.items() if v}
    if joins:
        out.append(f"- joins: {joins}")
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        flt = m.group(1)
        if flt.strip():
            out.append(f"- PushedFilters: [{flt[:140]}]")
            break
    m = re.search(r"ReadSchema: (struct<.*)", plan)
    if m:
        # bracket-balanced cut: [^>]* stopped at the first '>' inside
        # nested types (array<float> etc), hiding schema regressions past
        # that point
        s, depth = m.group(1), 0
        for i, ch in enumerate(s):
            depth += ch == "<"
            depth -= ch == ">"
            if depth == 0 and ch == ">":
                s = s[:i + 1]
                break
        out.append(f"- ReadSchema: {s[:220]}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from duckdb_iceberg_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    lines = [
        "# PLANS — physical-plan audit",
        "",
        f"Generated by `tools/explain_audit.py` at `{sf_dir}`. For each flagship",
        "query: shuffle count, join strategies, and the parquet pushdown",
        "evidence (`PushedFilters` / pruned `ReadSchema`). Counts are distinct",
        "node ids from `explain('formatted')` — a cached/reused subtree counts",
        "once, matching what actually executes (the raw `toString` used before",
        "round 6 repeated cached subplans at every reference).",
        "Driver-side file pruning shows up separately in `ScanPlan.stats`",
        "(asserted in tests); Spark-side evidence here.",
        "",
    ]
    import contextlib
    import io

    def frame_for(name):
        if name == "docs_dsir_sample":
            # the driver entry materializes its bounded k-row result
            # eagerly (to release the internal tokenize cache), so its
            # own plan is a literal scan — audit the DISTRIBUTED weights
            # stage, where the broadcast-vs-shuffle question lives
            from pyspark.sql import functions as F

            from duckdb_iceberg_spark.operators.sampling import (
                dsir_importance_weights,
            )

            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet"))
            return dsir_importance_weights(
                docs, target_cond=F.col("lang") == "en")
        return qs[name](spark, sf_dir)

    for name in AUDIT:
        df = frame_for(name)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        lines.append(f"## {name}")
        if name == "docs_dsir_sample":
            lines.append("- (distributed weights stage — the driver "
                         "entry's own plan is a literal k-row scan)")
        lines.extend(summarize(buf.getvalue()))
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
