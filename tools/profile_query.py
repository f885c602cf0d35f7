"""Per-query optimization profiler (r15; r16: plan dir via
$SPARK_GRAFT_PLAN_DIR, default plans/r16): time a declared query in
isolation, count Spark jobs/stages (driver round-trips are serial even on a
1000-node cluster — each one is a scheduling latency floor), and dump
``explain('formatted')`` to plans/r15/<name>_<tag>.txt.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/profile_query.py <tag> <name> [name ...]
  (tag: "before" / "after" — the plans/<round> filename suffix)

Runs each query N times (SPARK_GRAFT_PROFILE_RUNS, default 3) in ONE
session, reports every run plus the job/stage counts of the final run,
clearing the cache between runs exactly like bench.py does.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))

    import __spark_entry__ as entry
    from duckdb_iceberg_spark.session import get_spark

    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    spark = get_spark(extra_conf=extra or None)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = entry.queries()
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "r16")
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", plan_dir), exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        times = []
        jobs_delta = stages_delta = 0
        for i in range(n_runs):
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, f"profile:{name} run {i}")
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            el = time.time() - t0
            times.append(round(el, 3))
            assert rows is not None
            new_jobs = tracker.getJobIdsForGroup(group)
            jobs_delta = len(new_jobs)
            stages_delta = 0
            for jid in new_jobs:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    stages_delta += len(info.stageIds)
            spark.catalog.clearCache()
        # plan dump (after the timed runs so fixture caches exist)
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
        except Exception as e:  # pragma: no cover
            plan = f"<explain failed: {e}>"
        with open(f"plans/{plan_dir}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        out[name] = {"runs": times, "last_run_jobs": jobs_delta,
                     "last_run_stages": stages_delta}
        print(json.dumps({name: out[name]}), flush=True)
        spark.catalog.clearCache()
    print(json.dumps({"tag": tag, "sf": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
