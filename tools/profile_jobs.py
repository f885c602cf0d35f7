"""Warm-run job breakdown for one declared query (r16, VERDICT r15
tasks 5/8): run the query warm, then list every Spark job of the final
run with its stages' names/task counts/durations — attributing the
dedup family's job cascade (which jobs are persist barriers, which are
AQE stage materializations, which are bounded collects).

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_jobs.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    warm_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import __spark_entry__ as entry
    from duckdb_iceberg_spark.session import get_spark

    spark = get_spark(app_name=f"profile-jobs-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = entry.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for i in range(warm_runs):
        t0 = time.time()
        qs[name](spark, sf).collect()
        print(f"warm run {i}: {time.time()-t0:.3f}s", flush=True)
        spark.catalog.clearCache()

    group = f"jobs-{name}"
    sc.setJobGroup(group, f"profile-jobs {name}")
    t0 = time.time()
    qs[name](spark, sf).collect()
    wall = time.time() - t0

    jobs = sorted(tracker.getJobIdsForGroup(group))
    rows = []
    for jid in jobs:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        stages = []
        for sid in sorted(info.stageIds):
            s = tracker.getStageInfo(sid)
            if s is None:
                continue
            stages.append({"id": sid, "name": s.name.split("(")[0].strip(),
                           "tasks": s.numTasks})
        rows.append({"job": jid, "stages": stages})
    print(json.dumps({"query": name, "final_wall": round(wall, 3),
                      "n_jobs": len(jobs)}))
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
