"""Interleaved same-session A/B (r16, VERDICT r15 task 2): does skipping
the cross-band distinct() in duplicate_components' candidate pairs
(dedup=False, r15) still win at sf1 — 10x byte-identical duplication, the
exact corpus shape where true near-dups collide in many bands and the
non-distinct pair set inflates the wide shingle-array verify join?

A = HEAD (dedup=False)   B = dedup=True forced via monkeypatch
Warmup block first (JIT), then alternating runs, clearCache between.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_dedup_distinct.py [n_pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import bench
    from duckdb_iceberg_spark.operators import dedup
    from duckdb_iceberg_spark.session import get_spark

    spark = get_spark(app_name="ab-dedup-distinct")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = bench._ensure_sf1(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    docs = spark.read.parquet(os.path.join(sf1, "documents.parquet"))

    orig = dedup.lsh_candidate_pairs

    def forced_distinct(signatures, id_col="doc_id", bands=16,
                        pairing="min", dedup=True):
        return orig(signatures, id_col, bands, pairing, dedup=True)

    def run(tag: str) -> float:
        spark.sparkContext.setJobDescription(f"ab-dedup-distinct {tag}")
        t0 = time.time()
        out = dedup.duplicate_components(docs, num_hashes=32, bands=8)
        out.write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        spark.catalog.clearCache()
        return round(el, 3)

    # pair-count sanity: how much does dedup=False inflate the verify set?
    sigs_probe = None
    try:
        comb = dedup._sig_shingle_frame(docs, "text", "doc_id", 32, 5)
        sigs = comb.select("doc_id", "signature")
        n_no = orig(sigs, "doc_id", 8, dedup=False).count()
        n_yes = orig(sigs, "doc_id", 8, dedup=True).count()
        sigs_probe = {"pairs_dedup_false": n_no, "pairs_dedup_true": n_yes,
                      "inflation": round(n_no / max(n_yes, 1), 2)}
        print(json.dumps(sigs_probe), flush=True)
        spark.catalog.clearCache()
    except Exception as e:
        print(f"probe failed: {e}", flush=True)

    print(json.dumps({"warmup_A": run("warmup-A"),
                      "warmup_B_patched": None}), flush=True)
    a_times, b_times = [], []
    for i in range(n_pairs):
        dedup.lsh_candidate_pairs = forced_distinct
        b_times.append(run(f"B-distinct-{i}"))
        dedup.lsh_candidate_pairs = orig
        a_times.append(run(f"A-nodistinct-{i}"))
        print(json.dumps({"pair": i, "B_distinct": b_times[-1],
                          "A_nodistinct": a_times[-1],
                          "loadavg": round(os.getloadavg()[0], 2)}),
              flush=True)
    print(json.dumps({
        "sf": sf1, "pairs": n_pairs,
        "A_nodistinct": a_times, "B_distinct": b_times,
        "A_min": min(a_times), "B_min": min(b_times),
        "A_median": sorted(a_times)[len(a_times) // 2],
        "B_median": sorted(b_times)[len(b_times) // 2],
        "probe": sigs_probe,
    }))


if __name__ == "__main__":
    main()
