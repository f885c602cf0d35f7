"""Count py4j round-trips during a memo-MISS iceberg_scan construction
(r16, VERDICT r15 task 1): every ``send_command`` is one serial driver
round-trip; the goal metric is <150 on a cold construction.

Attributes each round-trip to the nearest repo frame (file:line histogram)
so the chatty construction phases are visible, and times the construction.

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_scan_rpc.py [sf_dir]
"""

from __future__ import annotations

import collections
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_counter = {"n": 0}
_sites: collections.Counter = collections.Counter()
_enabled = {"on": False}


def _install():
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    for cls in (cs.ClientServerConnection, jg.GatewayConnection):
        orig = cls.send_command

        def make(orig):
            def patched(self, *a, **k):
                if _enabled["on"]:
                    _counter["n"] += 1
                    # nearest TWO repo frames + the pyspark frame just above
                    # the boundary, so per-call chattiness is attributable
                    stack = traceback.extract_stack()[:-1]
                    repo_frames = []
                    pyspark_frame = ""
                    for f in reversed(stack):
                        if f.filename.startswith(REPO) and "/tools/" not in f.filename:
                            repo_frames.append(
                                f"{os.path.relpath(f.filename, REPO)}:{f.lineno}")
                            if len(repo_frames) == 2:
                                break
                        elif not repo_frames and "pyspark" in f.filename and not pyspark_frame:
                            pyspark_frame = f"[{os.path.basename(f.filename)}:{f.lineno} {f.name}]"
                    key = " <- ".join(repo_frames) or "<no-repo-frame>"
                    if pyspark_frame:
                        key = pyspark_frame + " " + key
                    _sites[key] += 1
                return orig(self, *a, **k)
            return patched

        cls.send_command = make(orig)


def measure(label: str, fn):
    from duckdb_iceberg_spark.sources import scan as scan_mod

    scan_mod.clear_scan_frame_memo()
    _counter["n"] = 0
    _sites.clear()
    _enabled["on"] = True
    t0 = time.time()
    fn()
    el = time.time() - t0
    _enabled["on"] = False
    print(f"\n=== {label}: {_counter['n']} round-trips, {el:.3f}s wall ===")
    for site, n in _sites.most_common(25):
        print(f"  {n:5d}  {site}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from duckdb_iceberg_spark.session import get_spark
    from duckdb_iceberg_spark.sources.scan import iceberg_scan

    spark = get_spark(app_name="profile-scan-rpc")
    spark.sparkContext.setLogLevel("ERROR")
    _install()

    plain = entry._ice_lineitem(spark, sf_dir)
    mor = entry._ice_lineitem_mor(spark, sf_dir)
    # warm both paths once (JIT, metadata caches) before counting
    iceberg_scan(spark, plain)
    iceberg_scan(spark, mor)
    iceberg_scan(spark, plain, where="l_shipdate >= DATE '1995-01-01'")

    measure("plain scan (no deletes)", lambda: iceberg_scan(spark, plain))
    measure("plain scan + residual",
            lambda: iceberg_scan(spark, plain,
                                 where="l_shipdate >= DATE '1995-01-01'"))
    measure("MoR scan (positional deletes)", lambda: iceberg_scan(spark, mor))


if __name__ == "__main__":
    main()
