"""Interleaved c8/c32 scaling blocks at sf1 (r16, VERDICT r15 tasks 5/7):
the r15 scaling comparison ran its 8-core block on a much quieter box
than the 32-core one, flattening every ratio. This runner alternates
core counts block-by-block (c32-A, c8-A, c32-B, c8-B), records loadavg
before/after each block, and reports per-query min-of-block-mins so the
ratio column is load-comparable.

One block = one fresh session at that core count, 2 runs per query,
clearCache between runs. Queries: the scan/shuffle-heavy sf1 canaries
where parallelism should show (VERDICT: "expect >=2 for the scan-heavy
queries at sf1").

Usage: python tools/scaling_interleaved.py   (spawns its own children)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q01_pricing_summary", "q05_region_revenue", "q09_product_profit",
    "q18_large_volume", "docs_substr_dedup", "docs_lm_score",
    "ice_orc_scan", "emb_kmeans",
]

_CHILD = "__child__"


def child(cpus: str) -> None:
    import time

    import bench
    import __spark_entry__ as entry
    from duckdb_iceberg_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = bench._ensure_sf1(spark, "/root/testdata/sf0.1")
    qs = entry.queries()
    # fixtures the canaries scan, outside timing (bench.py's list)
    entry._ice_lineitem(spark, sf1)
    entry._ice_documents_orc(spark, sf1)
    out: dict = {"cpus": cpus, "load_start": round(os.getloadavg()[0], 2)}
    res = {}
    for name in QUERIES:
        qs[name](spark, sf1).collect()  # warm (fixture/JIT)
        spark.catalog.clearCache()
        times = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf1).collect()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        res[name] = times
    out["queries"] = res
    out["load_end"] = round(os.getloadavg()[0], 2)
    print("SCALING " + json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == _CHILD:
        child(os.environ["SPARK_GRAFT_CPUS"])
        return
    blocks = []
    for rep in ("A", "B"):
        for cpus in ("32", "8"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), _CHILD],
                env=env, capture_output=True, text=True, timeout=3600)
            for line in p.stdout.splitlines():
                if line.startswith("SCALING "):
                    blocks.append(json.loads(line[len("SCALING "):]))
                    blocks[-1]["block"] = f"c{cpus}-{rep}"
                    print(json.dumps(blocks[-1]), flush=True)
    # min across the two blocks per core count
    summary: dict = {}
    for name in QUERIES:
        m = {}
        for cpus in ("32", "8"):
            vals = [min(b["queries"][name]) for b in blocks
                    if b["cpus"] == cpus and name in b.get("queries", {})]
            if vals:
                m[f"c{cpus}_min"] = min(vals)
        if "c32_min" in m and "c8_min" in m and m["c32_min"] > 0:
            m["ratio_c8_over_c32"] = round(m["c8_min"] / m["c32_min"], 2)
        summary[name] = m
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
