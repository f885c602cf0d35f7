"""Local mirror of the driver's t2 correctness check: run every
queries() entry and its oracle_sql() twin, compare row-count + sorted-column
value hash. Usage: python tools/check_oracle.py [sf_dir] [name_filter]

Pass --raw-repr (or set SPARK_GRAFT_RAW_REPR=1) to hash each value's raw
cursor ``repr`` instead of the canonicalized rendering — the strictest
mode, reproducing any harness that hashes what the cursors literally
return (Decimal scale, float repr, datetime micros all visible)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


RAW_REPR = False  # --raw-repr / SPARK_GRAFT_RAW_REPR=1: hash raw cursor reprs


def value_hash(rows, cols) -> str:
    # order-insensitive: sort columns by name, then sort row tuples rendered
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted(
        "|".join(_render(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _render(v) -> str:
    import datetime as dt
    from decimal import Decimal

    if RAW_REPR:
        # strictest mode: whatever the cursor returned, verbatim — scale,
        # float repr, datetime micros, type tag all visible
        return repr(v)
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, Decimal):
        # EXACT, scale-preserving rendering. The pre-r11 float() round-trip
        # here erased scale / trailing-digit / repr differences, which is
        # why three rounds of "bit-identical locally" coexisted with driver
        # hash-reds on DECIMAL output columns (VERDICT r10 task 2): a
        # harness that renders Decimal('1.50') differently from
        # Decimal('1.5') or 1.5 was invisible to this mirror. str() keeps
        # the scale, so that class now reproduces locally.
        return str(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main() -> int:
    global RAW_REPR
    argv = [a for a in sys.argv[1:] if a != "--raw-repr"]
    RAW_REPR = (len(argv) != len(sys.argv) - 1
                or os.environ.get("SPARK_GRAFT_RAW_REPR") == "1")
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    name_filter = argv[1] if len(argv) > 1 else ""

    import __spark_entry__ as entry
    from duckdb_iceberg_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    # data-dependent oracle builders (emb_pq_topk re-trains its codebooks
    # from the corpus) must read the SAME sf this sweep runs at
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {el:.1f}s) [no oracle]")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [d[0] for d in ores.description]
            otypes_sql = [str(t).upper() for t in ores.types]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            failures += 1
            continue
        # HARD GUARD (r6 root cause): a DuckDB HUGEINT/UHUGEINT output column
        # (top-level uncast integer sum() widens) hash-mismatches at the
        # driver even though this mirror's _render canonicalizes ints
        # identically. Fail here so the class can never land again; the fix
        # is CAST(sum(...) AS BIGINT) in the oracle.
        widened = [
            (c, t) for c, t in zip(ocols, otypes_sql)
            if "HUGEINT" in t
        ]
        if widened:
            failures += 1
            print(
                f"FAIL {name}: oracle emits HUGEINT column(s) {widened} — "
                "the driver's renderer diverges on these; CAST the "
                "aggregate to BIGINT in oracle_sql()"
            )
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = value_hash(srows, scols) == value_hash(orows, ocols)
        # strict per-column python-type check: the driver's renderer is
        # stricter than _render's canonicalization (HUGEINT vs BIGINT,
        # Decimal vs float surface as dtype differences there even when the
        # rendered values agree) — name the offending column here
        type_mismatch = []
        if ok_cols and srows and orows:
            sidx = {c: i for i, c in enumerate(scols)}
            oidx = {c: i for i, c in enumerate(ocols)}
            for c in scols:
                stypes = {type(r[sidx[c]]).__name__ for r in srows[:100]
                          if r[sidx[c]] is not None}
                otypes = {type(r[oidx[c]]).__name__ for r in orows[:100]
                          if r[oidx[c]] is not None}
                if stypes and otypes and stypes != otypes:
                    type_mismatch.append((c, sorted(stypes), sorted(otypes)))
        if ok_rows and ok_cols and ok_hash:
            tag = "" if not type_mismatch else f"  TYPE-DRIFT {type_mismatch}"
            print(f"PASS {name} ({len(srows)} rows, {el:.1f}s){tag}")
        else:
            failures += 1
            print(f"FAIL {name}: rows {len(srows)}/{len(orows)} cols_ok={ok_cols} hash_ok={ok_hash}")
            if not ok_cols:
                print(f"     spark cols: {sorted(scols)}\n     oracle cols: {sorted(ocols)}")
            else:
                for i, (a, b) in enumerate(zip(sorted(srows), sorted(orows))):
                    if a != b:
                        print(f"     first diff row {i}:\n       spark : {a}\n       oracle: {b}")
                        break
    # environment stamp (VERDICT r8 task 2): a driver whose duckdb/libm
    # differs from the sweep's is diagnosable from artifacts
    import pyspark

    print(f"ENV: duckdb={duckdb.__version__} pyspark={pyspark.__version__} "
          f"sf_dir={sf_dir} render={'raw-repr' if RAW_REPR else 'canonical'}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
