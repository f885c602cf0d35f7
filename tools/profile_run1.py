"""Run-1 inflation breakdown (r16, VERDICT r15 task 8): why does a
query's first run cost 2-4x its warm runs even after bench.py's session
warmup?

Method: in one session (after the bench's own warmup recipe), run each
probe query 3x, capturing per-run wall plus the executor-side task-time
sum and GC time deltas from the status tracker's executor metrics. The
gap between wall and (task time / cores) is driver/scheduling latency;
a run-1-only task-time excess is JIT/codegen warmup inside executors.
A final re-run of a LITERAL-PERTURBED variant of the first query (new
codegen class, warm JVM) splits plan-specific codegen compile from
shared JVM JIT.

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_run1.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from duckdb_iceberg_spark.session import get_spark

    spark = get_spark(app_name="profile-run1")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # bench.py's exact warmup recipe
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf, "region.parquet")).select("r_regionkey")
    warm.join(warm.limit(1), ["r_regionkey"], "left").groupBy("r_regionkey").count().collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm_udf(s):
        return s

    spark.range(32 * 1024).repartition(32).select(_warm_udf("id")).count()

    qs = entry.queries()

    def exec_metrics():
        # total task time + GC time across executors (local mode: one),
        # via the Java status API (the Python StatusTracker has no
        # executor summary)
        infos = sc._jsc.sc().statusStore().executorList(True)
        tt = gc = 0
        it = infos.iterator()
        while it.hasNext():
            e = it.next()
            tt += e.totalDuration()
            gc += e.totalGCTime()
        return tt, gc

    def run(fn, label):
        rows = []
        for i in range(3):
            tt0, gc0 = exec_metrics()
            t0 = time.time()
            fn().collect()
            wall = time.time() - t0
            tt1, gc1 = exec_metrics()
            rows.append({"run": i, "wall": round(wall, 3),
                         "task_sec": round((tt1 - tt0) / 1000.0, 2),
                         "gc_sec": round((gc1 - gc0) / 1000.0, 2)})
            spark.catalog.clearCache()
        print(json.dumps({label: rows}), flush=True)
        return rows

    # fixture prebuild so run 1 is not a fixture build
    entry._ice_lineitem(spark, sf)
    run(lambda: qs["q05_region_revenue"](spark, sf), "q05_region_revenue")
    run(lambda: qs["docs_minhash_dedup"](spark, sf), "docs_minhash_dedup")
    run(lambda: qs["docs_bm25_topk"](spark, sf), "docs_bm25_topk")

    # literal-perturbed q05 twin: same shape, new codegen classes, warm JVM
    def q05_variant():
        from duckdb_iceberg_spark import iceberg_scan

        loc = entry._ice_lineitem(spark, sf)
        li = iceberg_scan(spark, loc,
                          where="l_shipdate <= DATE '1998-09-01'")
        return (li.groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("l_quantity").alias("sq"),
                     F.avg("l_discount").alias("ad"),
                     F.count(F.lit(1)).alias("c"))
                .orderBy("l_returnflag", "l_linestatus"))

    run(q05_variant, "q05_literal_variant_first_ever_run")


if __name__ == "__main__":
    main()
