"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: TPC-H-Q1-style pricing summary over an Iceberg
               roundtrip of lineitem (write → plan → scan → agg).
queries()    — one entry per implemented operator from SURVEY.md §2 plus the
               LLM-data-pipeline operators; each (spark, sf_dir) → DataFrame.
oracle_sql() — DuckDB-equivalent SQL on the raw parquet views. Iceberg
               variants (deletes/updates/merges/evolution) are derived from
               the same parquet, so oracles express the same derivation
               relationally.

Float aggregates are rounded (2dp for money sums, 6dp for ratios) in BOTH
engines so partial-aggregation order can't flip value hashes.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# default cache root lives under the user's home, not /tmp: on several
# container runtimes /tmp is a throttled or network-backed mount (measured
# here: 6 MB/s writes vs 446 MB/s on the home fs), and fixture builds are
# Iceberg table WRITES. SPARK_GRAFT_ICE_CACHE overrides; falls back to
# /tmp when home is not writable.
def _default_cache_root() -> str:
    home = os.path.expanduser("~")
    cand = os.path.join(home, ".spark_graft_ice_cache")
    try:
        os.makedirs(cand, exist_ok=True)
        return cand
    except OSError:
        return "/tmp/spark_graft_ice_cache"


_CACHE_ROOT = os.environ.get("SPARK_GRAFT_ICE_CACHE") or _default_cache_root()


# ---------------------------------------------------------------------------
# Iceberg fixture tables, built once per (sf_dir, variant) and cached
# ---------------------------------------------------------------------------

def _pq(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_CACHE_VERSION = "v4"  # bump when fixture derivations change
# v4: builds are lock-guarded + code-fingerprinted (_BUILD_DONE carries the
# builder-source hash, so a fixture built by mid-round code is rebuilt the
# moment the engine source changes — the r5 ice_docs_curation flake class)


def _code_fingerprint() -> str:
    """md5 over the engine package + this file — the code that derives the
    cached fixtures. Any source edit invalidates every cached fixture, so a
    driver run never reads a fixture built by different (mid-round) code."""
    here = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(here, "duckdb_iceberg_spark")
    files = [os.path.abspath(__file__)]
    for root, _dirs, names in os.walk(pkg):
        files.extend(os.path.join(root, n) for n in names if n.endswith(".py"))
    h = hashlib.md5()
    for path in sorted(files):
        h.update(path.encode())
        with open(path, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


_CODE_FINGERPRINT = _code_fingerprint()


def _variant_dir(sf_dir: str, variant: str) -> str:
    # the code fingerprint is part of the PATH, not just the sentinel: a
    # code edit makes new processes build a sibling directory instead of
    # wiping the old one in place, so a still-running process (bench,
    # driver) keeps scanning its own complete fixture. Stale siblings are
    # only ever bytes in /tmp; rmtree below touches solely this
    # fingerprint's (possibly partial) build.
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return os.path.join(
        _CACHE_ROOT,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{key}-{_CACHE_VERSION}",
        variant,
        _CODE_FINGERPRINT[:12],
    )


def _done_valid(done: str) -> bool:
    try:
        with open(done) as fh:
            return fh.read().strip() == _CODE_FINGERPRINT
    except OSError:
        return False


def _build_once(sf_dir: str, variant: str, builder) -> str:
    """Build a fixture table exactly once per (sf_dir, variant, code version).

    Concurrency- and crash-safe: builders take an exclusive flock per variant
    (two processes sharing the cache — e.g. bench + correctness — serialize
    instead of interleaving rmtree/write), a partial build (missing or stale
    _BUILD_DONE) is wiped under the lock before rebuilding, and the sentinel
    is written last so readers only ever see complete, current-code fixtures.
    """
    loc = _variant_dir(sf_dir, variant)
    done = os.path.join(loc, "_BUILD_DONE")
    if _done_valid(done):
        return loc
    import fcntl

    os.makedirs(os.path.dirname(loc), exist_ok=True)
    lock_path = os.path.join(os.path.dirname(loc), f".{variant}.lock")
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if _done_valid(done):  # another process built it while we waited
                return loc
            shutil.rmtree(loc, ignore_errors=True)
            builder(loc)
            with open(done, "w") as fh:
                fh.write(_CODE_FINGERPRINT)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    return loc


def _ice_lineitem(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        write_iceberg(_pq(spark, sf_dir, "lineitem"), loc,
                      partition_by=["month(l_shipdate)"])

    return _build_once(sf_dir, "lineitem_month", build)


def _ice_lineitem_mor(spark: SparkSession, sf_dir: str) -> str:
    """lineitem with ~5% merge-on-read deletes — the reference's dm=5 TPC-H
    benchmark dataset analogue (benchmark/tpch/sf=1/dm=5/tpch.benchmark.in):
    relational queries must pay the delete-anti-join at scan time."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        write_iceberg(_pq(spark, sf_dir, "lineitem"), loc,
                      partition_by=["month(l_shipdate)"])
        delete_from(spark, loc, "l_orderkey % 20 = 0", mode="merge-on-read")

    return _build_once(sf_dir, "lineitem_month_mor", build)


def _ice_orders_mor(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        write_iceberg(_pq(spark, sf_dir, "orders"), loc)
        delete_from(spark, loc, "o_orderkey % 7 = 0", mode="merge-on-read")

    return _build_once(sf_dir, "orders_mor_delete", build)


def _ice_orders_del_using(spark: SparkSession, sf_dir: str) -> str:
    """DELETE ... USING a join relation (reference: delete_join.test) —
    drop all orders of negative-balance customers via a semi-join delete."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_using

        write_iceberg(_pq(spark, sf_dir, "orders"), loc)
        debtors = (_pq(spark, sf_dir, "customer")
                   .filter("c_acctbal < 0").select("c_custkey"))
        delete_using(spark, loc, debtors, "tgt.o_custkey = src.c_custkey")

    return _build_once(sf_dir, "orders_delete_using", build)


def _ice_orders_dv(spark: SparkSession, sf_dir: str) -> str:
    """v3 table with Puffin deletion vectors: two MoR deletes so the second
    must merge into (and supersede) the first file-level DV."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        write_iceberg(_pq(spark, sf_dir, "orders"), loc, format_version=3)
        delete_from(spark, loc, "o_orderkey % 7 = 0", mode="merge-on-read")
        delete_from(spark, loc, "o_orderkey % 11 = 0", mode="merge-on-read")

    return _build_once(sf_dir, "orders_dv_delete", build)


def _ice_customer_upd(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import update_iceberg

        write_iceberg(_pq(spark, sf_dir, "customer"), loc)
        update_iceberg(spark, loc, {"c_acctbal": "c_acctbal + 100.0"},
                       "c_mktsegment = 'BUILDING'", mode="copy-on-write")

    return _build_once(sf_dir, "customer_update", build)


def _ice_region_merge(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import merge_into

        write_iceberg(_pq(spark, sf_dir, "region"), loc)
        updates = spark.createDataFrame(
            [(0, "MERGED-ZERO"), (99, "MERGED-NEW")], ["r_regionkey", "r_name"])
        merge_into(spark, loc, updates, "tgt.r_regionkey = src.r_regionkey",
                   when_matched_update={"r_name": "src.r_name"},
                   when_not_matched_insert=True)

    return _build_once(sf_dir, "region_merge", build)


def _ice_supplier_upsert(spark: SparkSession, sf_dir: str) -> str:
    """CDC-style equality-delete upsert: every 3rd supplier gets a new
    balance via one snapshot carrying equality deletes + new data files."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import upsert_equality

        sup = _pq(spark, sf_dir, "supplier")
        write_iceberg(sup, loc)
        changed = sup.filter("s_suppkey % 3 = 0").withColumn(
            "s_acctbal", F.col("s_acctbal") + 500.0)
        upsert_equality(spark, loc, changed, key_columns=["s_suppkey"])

    return _build_once(sf_dir, "supplier_upsert", build)


def _ice_nation_tt(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        tm = write_iceberg(_pq(spark, sf_dir, "nation"), loc)
        first = tm.current_snapshot_id
        write_iceberg(_pq(spark, sf_dir, "nation"), loc)
        with open(os.path.join(loc, "_SNAP1"), "w") as fh:
            fh.write(str(first))

    loc = _build_once(sf_dir, "nation_timetravel", build)
    with open(os.path.join(loc, "_SNAP1")) as fh:
        return loc, int(fh.read())


def _ice_part_evo(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.ddl import add_column

        part = _pq(spark, sf_dir, "part")
        write_iceberg(part.select("p_partkey", "p_name", "p_brand"), loc)
        add_column(loc, "p_retailprice", "double")
        write_iceberg(part.select("p_partkey", "p_name", "p_brand", "p_retailprice"), loc)

    return _build_once(sf_dir, "part_evolution", build)


def _ice_customer_specevo(spark: SparkSession, sf_dir: str) -> str:
    """Spec evolution mid-table: first append unpartitioned, then SET
    PARTITIONED BY c_mktsegment + SET SORTED BY c_custkey, second append
    partitioned — scans must plan pruning per-file by spec-id."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.ddl import set_partitioned_by, set_sorted_by

        cust = _pq(spark, sf_dir, "customer")
        write_iceberg(cust.where("c_custkey % 2 = 0"), loc)
        set_partitioned_by(loc, ["c_mktsegment"])
        set_sorted_by(loc, [("c_custkey", "asc")])
        write_iceberg(cust.where("c_custkey % 2 = 1"), loc)

    return _build_once(sf_dir, "customer_spec_evo", build)


def _ice_orders_bucketed(spark: SparkSession, sf_dir: str) -> str:
    """Orders bucketed by murmur3(o_orderkey) % 8 — equality filters prune
    to one bucket file; a wrong bucket hash would prune the WRONG file and
    fail the oracle (end-to-end spec-exactness check)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        write_iceberg(_pq(spark, sf_dir, "orders"), loc,
                      partition_by=["bucket(8, o_orderkey)"])

    return _build_once(sf_dir, "orders_bucket8", build)


def _ice_part_compacted(spark: SparkSession, sf_dir: str) -> str:
    """Three small appends then bin-pack compaction (REPLACE snapshot)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files

        part = _pq(spark, sf_dir, "part")
        for _ in range(3):
            write_iceberg(part.repartition(2), loc)
        rewrite_data_files(spark, loc, min_input_files=2)

    return _build_once(sf_dir, "part_compacted", build)


def _ice_supplier_hist(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        sup = _pq(spark, sf_dir, "supplier")
        write_iceberg(sup, loc)
        write_iceberg(sup, loc)
        delete_from(spark, loc, "s_suppkey % 5 = 0", mode="merge-on-read")

    return _build_once(sf_dir, "supplier_history", build)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Iceberg write→scan roundtrip + pricing-summary aggregation."""
    sf_dir = "/root/testdata/sf0.001"
    return queries()["q01_pricing_summary"](spark, sf_dir)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _scan_lineitem(spark: SparkSession, sf_dir: str, where: str | None = None) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    return iceberg_scan(spark, _ice_lineitem(spark, sf_dir), where=where)


def _dec_sum(expr, per_row_scale: int, out_scale: int = 2):
    """Cross-engine-stable money sum: per-row round to the product's exact
    decimal scale, sum as DECIMAL (exact), emit double rounded. Avoids the
    float partial-sum last-ulp flips that break value hashes."""
    return F.round(
        F.sum(F.round(expr, per_row_scale).cast(f"decimal(28,{per_row_scale})")).cast("double"),
        out_scale,
    )


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _scan_lineitem(spark, sf_dir, where="l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
    return _q01_agg(li)


def q01_mor_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q01 over lineitem with ~5% MoR deletes (reference dm=5 benchmark
    suite): pins the deletion-anti-join cost at relational-query scale, not
    just in delete-scan micro-queries."""
    from duckdb_iceberg_spark import iceberg_scan

    li = iceberg_scan(spark, _ice_lineitem_mor(spark, sf_dir),
                      where="l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
    return _q01_agg(li)


def _q01_agg(li: DataFrame) -> DataFrame:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _dec_sum(disc_price, 4).alias("sum_disc_price"),
            _dec_sum(charge, 6).alias("sum_charge"),
            F.round(
                F.sum(F.round("l_quantity", 2).cast("decimal(28,2)")).cast("double")
                / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round(
                F.sum(F.round("l_discount", 2).cast("decimal(28,2)")).cast("double")
                / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _scan_lineitem(spark, sf_dir)
    cust = _pq(spark, sf_dir, "customer")
    orders = _pq(spark, sf_dir, "orders")
    # merge hint on the lineitem join (r13): Spark's static size estimate
    # put the shipdate-filtered lineitem under the broadcast threshold and
    # built a multi-million-row hash relation at sf1 (the two-round max
    # sf1 canary, ratio 3.2-3.33 — measured 3.4s vs 1.15s hinted). A fact
    # table must never be the broadcast side; the SMJ shuffles BOTH sides
    # on the orderkey and the downstream groupBy(l_orderkey) reuses that
    # partitioning, so the shuffle count stays at two (orders-side small,
    # lineitem-side the one linear pass) + the customers broadcast.
    return (
        cust.filter("c_mktsegment = 'BUILDING'")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter("o_orderdate < TIMESTAMP '1995-03-15 00:00:00'")
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter("l_shipdate > TIMESTAMP '1995-03-15 00:00:00'")
        .groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _scan_lineitem(spark, sf_dir)
    return (
        _pq(spark, sf_dir, "region").filter("r_name = 'ASIA'")
        .join(_pq(spark, sf_dir, "nation"), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(_pq(spark, sf_dir, "customer"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(_pq(spark, sf_dir, "orders"), F.col("o_custkey") == F.col("c_custkey"))
        # merge hint (r13): statically mis-sized lineitem broadcast, same
        # class as q03 — the fact side must shuffle, never broadcast
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_pq(spark, sf_dir, "supplier"),
              (F.col("s_suppkey") == F.col("l_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _scan_lineitem(
        spark, sf_dir,
        where="l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'",
    )
    return li.filter("l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24").agg(
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue")
    )


def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS semi-join with non-equi condition); adapted to
    the testdata schema: late shipment = l_shipdate > o_orderdate + 60 days."""
    orders = _pq(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'")
    li = _scan_lineitem(spark, sf_dir)
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    # merge hint (r13): the static plan broadcast the un-filtered lineitem
    # as the semi-join build side — a fact-table broadcast. The SMJ semi
    # shuffles both sides on the orderkey instead (AQE still downgrades to
    # a broadcast at runtime if the observed side is genuinely small).
    return (
        orders.join(li.hint("merge"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def _cust_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pq(spark, sf_dir, "customer")
        .join(_pq(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(_pq(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"),
                F.col("r_name").alias("cust_region"))
    )


def _supp_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pq(spark, sf_dir, "supplier")
        .join(_pq(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(_pq(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"),
                F.col("r_name").alias("supp_region"))
    )


def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape; region pair ASIA<->EUROPE (testdata nations are
    synthetic, regions are real)."""
    li = _scan_lineitem(
        spark, sf_dir,
        where="l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'")
    orders = _pq(spark, sf_dir, "orders")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_cust_region(spark, sf_dir), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(_supp_region(spark, sf_dir)), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter("(supp_region = 'ASIA' AND cust_region = 'EUROPE') OR "
                "(supp_region = 'EUROPE' AND cust_region = 'ASIA')")
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_region", "cust_region", "l_year")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy("supp_region", "cust_region", "l_year")
    )


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: ASIA-supplier share of PROMO-part volume sold to ASIA
    customers, by order year. Conditional-aggregation ratio."""
    li = _scan_lineitem(spark, sf_dir)
    orders = _pq(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'")
    part = _pq(spark, sf_dir, "part").filter("p_type = 'PROMO'")
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_cust_region(spark, sf_dir), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(_supp_region(spark, sf_dir)), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter("cust_region = 'ASIA'")
    )
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast("decimal(28,4)")
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("supp_region") == "ASIA", vol).otherwise(F.lit(0).cast("decimal(28,4)"))).cast("double")
            / F.sum(vol).cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in testdata → profit = discounted price);
    LIKE filter + 4-way join + group by (nation, year)."""
    li = _scan_lineitem(spark, sf_dir)
    part = _pq(spark, sf_dir, "part").filter("p_name LIKE '%widget%'")
    supp_nation = (
        _pq(spark, sf_dir, "supplier")
        .join(_pq(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = _pq(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation", "o_year")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter."""
    li = _scan_lineitem(spark, sf_dir, where=None).filter("l_returnflag = 'R'")
    orders = _pq(spark, sf_dir, "orders").filter(
        "o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'")
    cust = _pq(spark, sf_dir, "customer")
    nation = _pq(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        # merge hint (r13): the returnflag filter mis-estimated lineitem
        # under the broadcast threshold — same fact-broadcast class as q03
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"),
                "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join with join-time predicate, two-level agg."""
    cust = _pq(spark, sf_dir, "customer")
    orders = _pq(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders,
                  (F.col("c_custkey") == F.col("o_custkey"))
                  & (F.col("o_orderpriority") != "5-LOW"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-aggregation percentage over one year."""
    li = _scan_lineitem(
        spark, sf_dir,
        where="l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'")
    part = _pq(spark, sf_dir, "part")
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast("decimal(28,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(28,4)"))).cast("double")
            / F.sum(vol).cast("double"), 6).alias("promo_revenue"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: scalar-max subquery over an aggregated view."""
    li = _scan_lineitem(
        spark, sf_dir,
        where="l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = _pq(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: count(distinct supplier) per part attribute group
    (partsupp replaced by lineitem's part-supplier pairs)."""
    part = _pq(spark, sf_dir, "part").filter(
        "p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25)")
    li = _scan_lineitem(spark, sf_dir)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated avg-quantity subquery per part, decorrelated to
    a per-part aggregate join. The threshold compare is done in exact integer
    arithmetic (5 * qty * cnt < sum_qty <=> qty < 0.2 * avg) so both engines
    agree bit-for-bit."""
    li = _scan_lineitem(spark, sf_dir)
    part = _pq(spark, sf_dir, "part").filter("p_brand = 'Brand#1'")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("agg_partkey"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("sq"))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("agg_partkey"))
        .filter(F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt") < F.col("sq"))
        .agg(F.round(
            F.sum(F.round("l_extendedprice", 2).cast("decimal(28,2)")).cast("double")
            / 7.0, 2).alias("avg_yearly"))
    )


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN-subquery on a grouped HAVING (orders with >150 total
    quantity), then re-aggregation."""
    li = _scan_lineitem(spark, sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter("sum_qty > 150")
        .select(F.col("l_orderkey").alias("big_orderkey"), "sum_qty")
    )
    orders = _pq(spark, sf_dir, "orders")
    cust = _pq(spark, sf_dir, "customer")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("string").alias("o_orderdate"),
                # raw double passthrough: both engines read the identical
                # parquet float64 — any rounding/decimal cast reintroduces
                # engine-specific rounding and breaks the value hash
                "o_totalprice",
                "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive join predicates — an
    optimizer stress case (predicate must still push the p join key)."""
    li = _scan_lineitem(spark, sf_dir)
    part = _pq(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 40))
    )
    return j.filter(cond).agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar avg subquery + anti-join, grouped by nation.
    Above-average compare in exact decimal (bal * cnt > sum)."""
    cust = _pq(spark, sf_dir, "customer").withColumn(
        "bal", F.col("c_acctbal").cast("decimal(18,2)"))
    pos = cust.filter("c_acctbal > 0.0")
    stats = pos.agg(F.count(F.lit(1)).alias("cnt"), F.sum("bal").alias("total"))
    urgent = _pq(spark, sf_dir, "orders").filter("o_orderpriority = '1-URGENT'")
    return (
        pos.crossJoin(F.broadcast(stats))
        .filter(F.col("bal") * F.col("cnt") > F.col("total"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum("bal").cast("double"), 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in testdata → unit cost from lineitem):
    correlated min-subquery rewritten as aggregate + join-back, 4-way
    dimension join, region filter, deterministic top-100."""
    li = _scan_lineitem(spark, sf_dir)
    part = _pq(spark, sf_dir, "part").filter("p_type = 'LARGE'")
    # the min is per part, so restricting to the filtered parts BEFORE the
    # aggregation is equivalent and prunes most of the shuffle input
    li = li.join(F.broadcast(part.select(F.col("p_partkey").alias("__pk"))),
                 F.col("l_partkey") == F.col("__pk"), "left_semi")
    partsup = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4)).alias("cost"))
    )
    minc = partsup.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    nation_region = (
        _pq(spark, sf_dir, "nation")
        .join(_pq(spark, sf_dir, "region").filter("r_name = 'EUROPE'"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", F.col("n_name").alias("nation"))
    )
    supp = _pq(spark, sf_dir, "supplier").join(
        F.broadcast(nation_region), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        partsup.join(minc, "l_partkey")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name", "cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers, HAVING
    against a scalar fraction-of-total subquery; compare in exact decimal."""
    li = _scan_lineitem(spark, sf_dir)
    supp = (
        _pq(spark, sf_dir, "supplier")
        .join(_pq(spark, sf_dir, "nation").filter("n_name = 'NATION_3'"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                   .cast("decimal(28,4)")).alias("val_dec"))
    )
    total = val.agg(F.sum("val_dec").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("val_dec") * 1000 > F.col("total"))
        .select("l_partkey", F.round(F.col("val_dec").cast("double"), 2).alias("val"))
        .orderBy(F.col("val").desc(), "l_partkey")
    )


def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode/receiptdate → returnflag as mode,
    late = shipped >60 days after order date): join + conditional
    two-priority-class aggregation."""
    li = _scan_lineitem(
        spark, sf_dir,
        where="l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'"
              " AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'")
    orders = _pq(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # merge hint (r13): the shipdate-filtered lineitem was statically
    # broadcast against full orders — both sides are facts; shuffle both
    return (
        li.hint("merge").join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("mode"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("mode")
    )


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp → shipped-quantity totals): doubly
    nested subquery — per-supplier qty over LIKE-filtered parts in a year,
    kept if above half the max across suppliers, then IN-subquery semi-join
    back to supplier."""
    li = _scan_lineitem(
        spark, sf_dir,
        where="l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
              " AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'")
    bolts = _pq(spark, sf_dir, "part").filter("p_name LIKE '%bolt%'").select("p_partkey")
    qty = (
        li.join(F.broadcast(bolts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,2)")).alias("qty"))
    )
    maxq = qty.agg(F.max("qty").alias("maxq"))
    excess = (
        qty.crossJoin(F.broadcast(maxq))
        .filter(F.col("qty") * 2 > F.col("maxq"))
        .select("l_suppkey")
    )
    return (
        _pq(spark, sf_dir, "supplier")
        .join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >60 days after order date):
    multi-supplier orders where only this supplier was late, top-100
    waiters. r14 single-pass rewrite (VERDICT r13 task 3): ONE
    li JOIN orders(F) pass, then a per-(orderkey, suppkey) late-row
    count and a per-orderkey rollup — both reuse the join's hash
    partitioning on l_orderkey (HashPartitioning(orderkey) satisfies
    ClusteredDistribution for both key sets), so the EXISTS/NOT-EXISTS
    semantics cost zero extra exchanges instead of the old three passes
    over the fact (semi + anti joins vs two .distinct() derivatives).
    An order qualifies for supplier s iff it has >1 distinct suppliers
    and exactly one distinct LATE supplier (necessarily s); numwait
    then counts s's late lineitem rows, matching the oracle's
    count(*) over qualifying l1 rows."""
    li = _scan_lineitem(spark, sf_dir).select("l_orderkey", "l_suppkey",
                                              "l_shipdate")
    orders = _pq(spark, sf_dir, "orders").filter("o_orderstatus = 'F'") \
        .select("o_orderkey", "o_orderdate")
    # orders(F) is un-aggregated and fact-sized: never a broadcast build
    # side at scale (the r13 static-estimate lesson) — merge-hint it and
    # let AQE downgrade when the runtime side is genuinely small
    joined = (
        li.join(orders.hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late",
                    F.col("l_shipdate") > F.col("o_orderdate")
                    + F.expr("INTERVAL 60 DAYS"))
    )
    per_supp = (
        joined.groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(F.col("is_late"), 1).otherwise(0))
             .alias("late_rows"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"),
             F.count(F.when(F.col("late_rows") > 0, 1))
             .alias("n_late_supp"),
             F.max(F.when(F.col("late_rows") > 0, F.col("l_suppkey")))
             .alias("late_supp"),
             F.sum(F.when(F.col("late_rows") > 0, F.col("late_rows"))
                   .otherwise(0)).alias("late_cnt"))
    )
    qual = per_order.filter("n_supp > 1 AND n_late_supp = 1")
    return (
        qual.join(F.broadcast(_pq(spark, sf_dir, "supplier")),
                  F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_cnt").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q_window_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = _pq(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_orderkey",
                F.round(F.col("o_totalprice"), 2).alias("top_price"))
        .orderBy("o_custkey")
        .limit(500)
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _scan_lineitem(spark, sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("l_quantity"), 2).alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _scan_lineitem(spark, sf_dir)
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pq(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


def q_setop_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _pq(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _pq(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _pq(spark, sf_dir, "customer")
    orders = _pq(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
    )


def _events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a Spark timestamp, whatever the parquet stores:
    TIMESTAMP(NANOS) surfaces as a raw long under nanosAsLong (floor ns→µs),
    µs/ms timestamps read natively. The fixture generator has shipped both."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _pq(spark, sf_dir, "events")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return ev


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_with_ts(spark, sf_dir)
    return (
        ev.withColumn("hour_start", F.date_trunc("hour", F.col("ts")).cast("string"))
        .groupBy("hour_start", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), _dec_sum(F.col("value"), 6).alias("sum_value"))
        .orderBy("hour_start", "event_type")
        .limit(500)
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click paired with the user's latest purchase at
    or before the click (window-carry implementation; DuckDB's native
    ASOF JOIN is the oracle). Purchases are pre-collapsed to one row per
    (user, ts) — max event_id — so ties are engine-independent."""
    from duckdb_iceberg_spark.operators.joins import asof_join

    ev = _events_with_ts(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("__m"))
        .select("user_id", "ts", F.col("__m.event_id").alias("event_id"),
                F.round(F.col("__m.value"), 6).alias("value"))
    )
    out = asof_join(clicks, purchases, "ts", ["user_id"],
                    ["event_id", "value"])
    return (
        out.select("click_id",
                   F.col("event_id_r").alias("purchase_id"),
                   F.col("value_r").alias("purchase_value"))
        .orderBy("click_id")
        .limit(2500)
    )


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 10 minutes AFTER each click by the
    same user (the stream-stream join shape, run in batch parity here)."""
    from duckdb_iceberg_spark.operators.joins import interval_join

    ev = _events_with_ts(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("event_id").alias("purchase_id"), "user_id", "ts",
                "value")
    j = interval_join(clicks, purchases, "ts", ["user_id"],
                      "0 seconds", "10 minutes")
    return (
        j.groupBy("click_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             _dec_sum(F.col("value"), 6).alias("sum_value"))
        .orderBy("click_id")
        .limit(2500)
    )


# -- Iceberg-layer queries ---------------------------------------------------

def ice_mor_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_orders_mor(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("o_totalprice"), 6).alias("sum_price"))
        .orderBy("o_orderstatus")
    )


def ice_delete_using_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_orders_del_using(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("o_totalprice"), 6).alias("sum_price"))
        .orderBy("o_orderpriority")
    )


def ice_dv_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_orders_dv(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("o_totalprice"), 6).alias("sum_price"))
        .orderBy("o_orderstatus")
    )


def ice_update_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_customer_upd(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("c_acctbal"), 6).alias("sum_bal"))
        .orderBy("c_mktsegment")
    )


def ice_upsert_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_supplier_upsert(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("s_acctbal"), 6).alias("sum_bal"))
        .orderBy("s_nationkey")
    )


def ice_merge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_region_merge(spark, sf_dir)
    return iceberg_scan(spark, loc).select("r_regionkey", "r_name").orderBy("r_regionkey")


def _ice_supplier_sqlmerge(spark: SparkSession, sf_dir: str) -> str:
    """Table mutated exclusively through the SQL DML surface: a MERGE
    (matched-update via alias-qualified refs) then a DELETE, both entered as
    SQL text and routed by sources.sql.execute_sql to the native DML paths
    (reference: catalog_agnostic merge/delete sqllogictests)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

        write_iceberg(_pq(spark, sf_dir, "supplier"), loc)
        register_table(spark, "sqlmerge_target", loc)
        (_pq(spark, sf_dir, "supplier").filter("s_suppkey % 4 = 0")
         .select("s_suppkey").createOrReplaceTempView("sqlmerge_src"))
        execute_sql(spark, """
            MERGE INTO sqlmerge_target t USING sqlmerge_src s
            ON t.s_suppkey = s.s_suppkey
            WHEN MATCHED THEN UPDATE SET s_acctbal = t.s_acctbal + 1000.0
        """)
        execute_sql(spark, "DELETE FROM sqlmerge_target WHERE s_suppkey % 10 = 1")

    return _build_once(sf_dir, "supplier_sqlmerge", build)


def ice_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_supplier_sqlmerge(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("s_acctbal"), 6).alias("sum_bal"))
        .orderBy("s_nationkey")
    )


def _ice_customer_condmerge(spark: SparkSession, sf_dir: str) -> str:
    """Conditional MERGE through the SQL surface (reference plans per-clause
    conditions: iceberg_merge_into.cpp:143; test shapes:
    merge_into_multiple_update_delete_actions.test:60-75,
    merge_partition.test:88): a conditional DELETE, a conditional UPDATE, a
    DO NOTHING fallback and a conditional INSERT share one target⋈source
    join, first matching clause wins per row."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

        cust = _pq(spark, sf_dir, "customer")
        write_iceberg(cust, loc)
        register_table(spark, "condmerge_target", loc)
        src = (
            cust.filter("c_custkey % 3 = 0")
            .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
            .unionByName(
                cust.filter("c_custkey % 5 = 0")
                .withColumn("c_custkey", F.col("c_custkey") + 1000000))
        )
        src.createOrReplaceTempView("condmerge_src")
        execute_sql(spark, """
            MERGE INTO condmerge_target t USING condmerge_src s
            ON t.c_custkey = s.c_custkey
            WHEN MATCHED AND t.c_mktsegment = 'BUILDING' THEN DELETE
            WHEN MATCHED AND s.c_acctbal > 5000.0
                THEN UPDATE SET c_acctbal = s.c_acctbal
            WHEN MATCHED THEN DO NOTHING
            WHEN NOT MATCHED AND s.c_acctbal > 0.0 THEN INSERT *
        """)

    return _build_once(sf_dir, "customer_condmerge", build)


def ice_merge_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_customer_condmerge(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("c_acctbal"), 6).alias("sum_bal"))
        .orderBy("c_mktsegment")
    )


def ice_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc, snap1 = _ice_nation_tt(spark, sf_dir)
    v1 = iceberg_scan(spark, loc, snapshot_id=snap1).agg(F.count(F.lit(1)).alias("cnt")) \
        .withColumn("version", F.lit("v1"))
    v2 = iceberg_scan(spark, loc).agg(F.count(F.lit(1)).alias("cnt")) \
        .withColumn("version", F.lit("v2"))
    return v1.unionByName(v2).select("version", "cnt").orderBy("version")


def ice_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_part_evo(spark, sf_dir)
    return iceberg_scan(spark, loc).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count("p_retailprice").alias("with_price"),
        _dec_sum(F.col("p_retailprice"), 6).alias("sum_price"),
    )


def ice_spec_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution: filter on the evolved partition column —
    post-evolution files prune by partition value, pre-evolution files are
    conservatively read and filtered by Spark."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_customer_specevo(spark, sf_dir)
    return (
        iceberg_scan(spark, loc, where="c_mktsegment = 'BUILDING'")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("c_acctbal"), 6).alias("sum_bal"))
        .orderBy("c_nationkey")
    )


def ice_compaction_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data survives bin-pack compaction byte-for-byte; the scan now reads
    the compacted (fewer-files) layout."""
    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.plans.scan_plan import plan_scan

    loc = _ice_part_compacted(spark, sf_dir)
    tm = load_table_metadata(loc)
    n_files = len(plan_scan(tm, tm.select_snapshot()).tasks)
    return (
        iceberg_scan(spark, loc)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("p_retailprice"), 6).alias("sum_price"))
        .withColumn("files_after_compaction", F.lit(n_files))
        .orderBy("p_brand")
    )


def ice_count_star_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_count

    n = iceberg_count(_ice_lineitem(spark, sf_dir))
    return spark.createDataFrame([(n,)], "cnt: bigint")


_MOCK_STORE_TABLES: dict[str, str] = {}


def _ice_docs_variant(spark: SparkSession, sf_dir: str) -> str:
    """documents with a VARIANT column: v = {'lang':…, 'source':…,
    'n_chars':…} (semi-structured ingestion shape; reference:
    catalog_agnostic/test_basic_variant.test)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        docs = _pq(spark, sf_dir, "documents")
        df = docs.select(
            "doc_id",
            F.parse_json(
                F.to_json(F.struct("lang", "source", "n_chars"))).alias("v"))
        write_iceberg(df, loc)

    return _build_once(sf_dir, "docs_variant", build)


def ice_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a VARIANT column and extract typed fields with variant_get —
    both in the WHERE (drives the variant pruning/residual path) and the
    projection. Oracle reads the same fields from the base columns."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_docs_variant(spark, sf_dir)
    df = iceberg_scan(spark, loc,
                      where="variant_get(v, '$.lang', 'string') = 'en'")
    return (
        df.select(
            "doc_id",
            F.expr("variant_get(v, '$.lang', 'string')").alias("lang"),
            F.expr("variant_get(v, '$.n_chars', 'long')").alias("n_chars"))
        .orderBy("doc_id")
    )


def _ice_objectstore(spark: SparkSession, sf_dir: str) -> str:
    """supplier homed entirely on an object store (pyarrow's in-memory mock
    FileSystem — the same FileSystem API as S3/GCS): metadata JSON, Avro
    manifests, Puffin DVs and parquet data all flow through the pluggable
    FileIO (reference deployment: REST catalog + MinIO,
    benchmark/tpch/sf=1/*.benchmark; credential plumbing
    iceberg_table_secret_provider.cpp). Built per process (the store is
    in-memory), including a MoR delete so the read path exercises
    object-store delete files too."""
    loc = _MOCK_STORE_TABLES.get(sf_dir)
    if loc:
        return loc
    from pyarrow import fs as pafs

    from duckdb_iceberg_spark import io as fio
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.dml import delete_from

    fio.register_io(
        "mock", fio.ArrowFileIO("mock", pafs._MockFileSystem(), shippable=False))
    loc = f"mock://bench/{os.path.basename(sf_dir.rstrip('/'))}/supplier"
    write_iceberg(_pq(spark, sf_dir, "supplier"), loc)
    delete_from(spark, loc, "s_suppkey % 10 = 0", mode="merge-on-read")
    _MOCK_STORE_TABLES[sf_dir] = loc
    return loc


def ice_objectstore_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_objectstore(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("s_acctbal"), 6).alias("sum_bal"))
        .orderBy("s_nationkey")
    )


def ice_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_snapshots

    loc = _ice_supplier_hist(spark, sf_dir)
    return (
        iceberg_snapshots(spark, loc)
        .select("sequence_number", "operation")
        .orderBy("sequence_number")
    )


def ice_partition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_partition_stats

    loc = _ice_lineitem(spark, sf_dir)
    return (
        iceberg_partition_stats(spark, loc)
        .agg(
            F.count(F.lit(1)).alias("n_summaries"),
            F.min(F.col("lower_bound").cast("int")).alias("min_month"),
            F.max(F.col("upper_bound").cast("int")).alias("max_month"),
        )
    )


def ice_column_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_column_stats

    loc = _ice_lineitem(spark, sf_dir)
    st = iceberg_column_stats(spark, loc)
    return (
        st.filter("column_name = 'l_orderkey'")
        .agg(
            F.min(F.col("lower_bound").cast("bigint")).alias("min_orderkey"),
            F.max(F.col("upper_bound").cast("bigint")).alias("max_orderkey"),
            F.sum("value_count").alias("total_values"),
        )
    )


def ice_bucket_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_orders_bucketed(spark, sf_dir)
    return (
        iceberg_scan(spark, loc,
                     where="o_orderkey IN (1, 7, 32, 129, 1000)")
        .select("o_orderkey", "o_orderstatus",
                F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


def ice_dynamic_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic file-list re-pruning (reference DynamicFilterPushdown,
    iceberg_multi_file_list.cpp:243-273): a selective dimension's keys
    re-plan the fact scan before the join, so only matching bucket files
    are read."""
    from duckdb_iceberg_spark import scan_with_runtime_filter

    loc = _ice_orders_bucketed(spark, sf_dir)
    dim = spark.createDataFrame(
        [(1, "a"), (7, "b"), (32, "c"), (129, "d"), (1000, "e")],
        "o_orderkey long, tag string")
    fact = scan_with_runtime_filter(spark, loc, dim, "o_orderkey")
    return (
        fact.join(F.broadcast(dim), "o_orderkey")
        .select("o_orderkey", "tag", "o_orderstatus",
                F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


def ice_metadata_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """iceberg_metadata() table function: manifest entries for the lineitem
    fixture; record counts must reconcile with the table row count."""
    from duckdb_iceberg_spark.sources.metadata_tables import iceberg_metadata

    loc = _ice_lineitem(spark, sf_dir)
    md = iceberg_metadata(spark, loc)
    return (
        md.filter("manifest_content = 'DATA' AND status <> 'DELETED'")
        .agg(F.sum("record_count").alias("total_records"))
    )


def ice_topk_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-level ORDER BY + LIMIT: file bounds order the scan and prune
    files that can't reach the top k (only the value column is output, so
    boundary ties hash identically in both engines)."""
    from duckdb_iceberg_spark.sources.scan import topk_scan

    loc = _ice_lineitem(spark, sf_dir)
    return topk_scan(spark, loc, "l_extendedprice", 25).select(
        F.round("l_extendedprice", 2).alias("l_extendedprice"))


def ice_truncate_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.functions import iceberg_truncate

    part = _pq(spark, sf_dir, "part")
    return (
        part.select(
            F.col("p_partkey"),
            iceberg_truncate(10, F.col("p_size").cast("int"), "int").alias("size_trunc10"),
            iceberg_truncate(4, F.col("p_type"), "string").alias("type_trunc4"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


def ice_bucket_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle: DuckDB can't recompute murmur3, but the input is the fixed
    # first-500 contiguous part keys, so the oracle is a literal VALUES
    # table (_BUCKET16_PARTKEY) generated from an independent scalar
    # murmur3; spec vectors also pinned in tests/test_metadata_core.py
    from duckdb_iceberg_spark.functions import iceberg_bucket

    part = _pq(spark, sf_dir, "part")
    return (
        part.select(
            F.col("p_partkey"),
            iceberg_bucket(16, F.col("p_partkey"), "long").alias("bucket16"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


# -- LLM-data-pipeline operators --------------------------------------------

def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.dedup import exact_dedup

    docs = _pq(spark, sf_dir, "documents")
    return (
        exact_dedup(docs, "text", "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("survivors"))
        .orderBy("lang")
    )


def docs_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.text import token_count

    docs = _pq(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", token_count("text").alias("n_tokens"))
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.text import quality_signals

    docs = _pq(spark, sf_dir, "documents").filter("length(text) > 0")
    s = quality_signals("text")
    return (
        docs.select(
            "doc_id",
            s["alpha_ratio"].alias("alpha_ratio"),
            s["digit_ratio"].alias("digit_ratio"),
            s["avg_token_len"].alias("avg_token_len"),
        )
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.text import doc_fingerprint

    docs = _pq(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", doc_fingerprint("text").alias("fingerprint"))
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: top-5 docs per source by quality score. The oracle
    replays the full quality formula (every input pre-rounded to 6dp, so
    IEEE arithmetic matches bit-for-bit across engines)."""
    from duckdb_iceberg_spark.operators.sampling import cap_per_source

    docs = _pq(spark, sf_dir, "documents")
    return (
        cap_per_source(docs, cap=5)
        .select("source", F.col("__rank").alias("rank"), "doc_id",
                F.col("__quality").alias("quality"))
        .orderBy("source", "rank")
    )


def docs_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-SPAN removal (the ExactSubstr pass at
    token-gram granularity): any 8-token window occurring twice in the
    corpus is trimmed from every doc but its first occurrence. The md5 of
    each rebuilt text hash-checks content without shipping full rows."""
    from duckdb_iceberg_spark.operators.dedup import exact_substring_dedup

    docs = _pq(spark, sf_dir, "documents")
    return (
        exact_substring_dedup(docs, min_len=8)
        .select("doc_id", F.md5("text").alias("text_md5"),
                "n_tokens_kept", "n_tokens_removed")
        .orderBy("doc_id")
        .limit(500)
    )


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling: md5-threshold keep decision,
    reproducible bit-for-bit in any engine with md5 (train/eval splits)."""
    from duckdb_iceberg_spark.operators.sampling import stratified_sample_by

    docs = _pq(spark, sf_dir, "documents")
    sampled = stratified_sample_by(
        docs, "doc_id", "lang",
        {"en": 0.25, "de": 0.5}, default_fraction=1.0, salt="r5")
    return (
        sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget sequence packing: shard by doc_id, exclusive
    cumulative token offset within the shard, bin = offset // budget."""
    from duckdb_iceberg_spark.operators.sampling import pack_sequences
    from duckdb_iceberg_spark.operators.text import token_count

    docs = _pq(spark, sf_dir, "documents") \
        .select("doc_id", token_count("text").alias("n_tokens"))
    packed = pack_sequences(docs, "n_tokens", budget=256, n_shards=16)
    return (
        packed.groupBy("shard", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("bin_tokens"))
        .orderBy("shard", "bin")
    )


def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter (word-bigram variant): the
    most frequent bigram's character share and the duplicated-bigram
    character share, per doc — the boilerplate-detection signals used to
    drop repetitive pages before LLM training."""
    from duckdb_iceberg_spark.operators.text import ngram_repetition_signals

    docs = _pq(spark, sf_dir, "documents")
    return (
        ngram_repetition_signals(docs, n=2)
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram decontamination: docs sharing any word 3-gram
    with the held-out "benchmark" slice (doc_id % 10 == 0) are flagged
    with their distinct-hit counts."""
    from duckdb_iceberg_spark.operators.dedup import ngram_contamination

    docs = _pq(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return (
        ngram_contamination(corpus, eval_set, n=3)
        .orderBy("doc_id")
        .limit(2000)
    )


def docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-line removal (CCNet/RefinedWeb paragraph
    dedup): boilerplate lines occurring across documents are dropped
    everywhere but their globally first occurrence. The word-soup corpus
    is single-line, so line breaks are synthesized deterministically
    (newline after every 8th word) — the tiny vocabulary then makes
    cross-document line collisions common, exercising the keep-first
    policy; the oracle replays the identical synthesis."""
    from duckdb_iceberg_spark.operators.dedup import line_dedup

    docs = _pq(spark, sf_dir, "documents")
    synth = F.regexp_replace(
        F.col("text"), r"((?:\S+\s+){7}\S+)\s+", "$1\n")
    out = line_dedup(
        docs.select("doc_id", synth.alias("text")), min_line_chars=2)
    return (
        out.select(
            "doc_id",
            F.md5(F.col("text")).alias("text_md5"),
            F.length("text").alias("text_len"),
            "n_lines_kept", "n_lines_removed")
        .orderBy("doc_id")
        .limit(2000)
    )


def docs_resample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: downsample src0/src1/src2 to a
    50/25/25 target mixture by deterministic md5 threshold (largest
    deletion-only corpus hitting the target proportions)."""
    from duckdb_iceberg_spark.operators.sampling import resample_mixture

    docs = _pq(spark, sf_dir, "documents") \
        .filter(F.col("source").isin("src0", "src1", "src2"))
    out = resample_mixture(
        docs, "source", {"src0": 0.5, "src1": 0.25, "src2": 0.25},
        "doc_id", salt="mix5")
    return (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def docs_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-α domain resampling (mT5/XLM-R α-sampling, α=0.5):
    target shares ∝ count^α upweight low-resource sources, realized by
    the deterministic md5-threshold deletion sampler. Hash-checked — the
    shares come from correctly-rounded decimal exp/ln (exactmath, no
    libm), and the oracle replays the resulting per-source threshold
    literals outright."""
    from duckdb_iceberg_spark.operators.sampling import resample_temperature

    docs = _pq(spark, sf_dir, "documents")
    out = resample_temperature(docs, "source", 0.5, "doc_id", salt="temp10")
    return (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means over the embeddings table; per-cluster
    membership summary. Hash-checked since r9: the fit is fully
    deterministic (hash-sampled init, left-to-right assignment dots,
    order-independent micro-unit integer centroid sums — clustering.py),
    so the oracle builder replays the whole fit driver-side
    (kmeans_replica) and re-runs the FINAL assignment in SQL from
    centroid literals, the IVF/PQ replay pattern."""
    from duckdb_iceberg_spark.operators.clustering import kmeans

    emb = _pq(spark, sf_dir, "embeddings")
    out, _ = kmeans(emb, n_clusters=8, iters=2)
    return (
        out.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.min("vec_id").alias("min_id"),
             F.sum("vec_id").alias("id_sum"))
        .orderBy("cluster_id")
    )


def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: cluster then drop within-cluster cosine
    near-dups (keep-min-id). Hash-checked since r9 against a full
    driver-side replay (semantic_dedup_replica): the deterministic
    kmeans fit plus the same greedy gram-matrix drop, cross-checked as
    a literal survivor set over the corpus table."""
    from duckdb_iceberg_spark.operators.clustering import semantic_dedup

    emb = _pq(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, threshold=0.99, n_clusters=8, iters=2)
    return out.agg(F.count(F.lit(1)).alias("survivors"),
                   F.min("vec_id").alias("min_id"),
                   F.sum("vec_id").alias("id_sum"))


def _ice_documents_mor(spark: SparkSession, sf_dir: str) -> str:
    """documents as an Iceberg table: identity-partitioned by lang, with a
    MoR delete removing source src19 — so curation queries exercise
    partition pruning + delete application before any operator runs."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        write_iceberg(_pq(spark, sf_dir, "documents"), loc,
                      partition_by=["lang"])
        delete_from(spark, loc, "source = 'src19'", mode="merge-on-read")

    return _build_once(sf_dir, "documents_lang_mor", build)


def _ice_documents_custom_paths(spark: SparkSession, sf_dir: str) -> str:
    """documents subset as an Iceberg table whose write.data.path /
    write.metadata.path point at sibling dirs INSIDE the cached fixture
    root (reference: test_custom_write_paths.test — custom roots parsed
    from properties): the insert, the MoR delete file, and the manifests
    all land at the custom roots, then every scan resolves through
    them."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        write_iceberg(
            _pq(spark, sf_dir, "documents").filter("doc_id % 2 = 0"), loc,
            properties={
                "write.data.path": os.path.join(loc, "custom_data"),
                "write.metadata.path": os.path.join(loc, "custom_meta"),
            })
        delete_from(spark, loc, "source = 'src7'", mode="merge-on-read")

    return _build_once(sf_dir, "documents_custom_paths", build)


def ice_custom_paths_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the custom-write-paths table (data files, MoR delete file,
    and manifests all under write.data.path / write.metadata.path roots):
    per-language counts + char sums. Hash-checked — the oracle replays
    the subset + delete predicate from the raw parquet, so a path
    mis-resolution (wrong root, spurious marker rewrite) changes counts
    and mismatches loudly."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_custom_paths(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


def ice_docs_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two halves of the engine composed: an Iceberg MoR scan with
    partition pruning (lang <> 'zh') feeds the curation operators —
    exact dedup, alpha-ratio quality gate, token counting — into a
    per-language summary. The oracle replays the same logic over the
    raw rows (minus the deleted source / pruned partition)."""
    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.operators.dedup import exact_dedup
    from duckdb_iceberg_spark.operators.text import (
        quality_signals, token_count)

    loc = _ice_documents_mor(spark, sf_dir)
    docs = iceberg_scan(spark, loc, where="lang <> 'zh'") \
        .filter(F.length("text") > 0)
    s = quality_signals("text")
    return (
        exact_dedup(docs)
        .filter(s["alpha_ratio"] >= 0.55)
        .select("lang", token_count("text").alias("__nt"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"),
             F.sum("__nt").alias("sum_tokens"))
        .orderBy("lang")
    )


def ice_dup_cluster_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level curation composed with the table-format layer: the
    pruned Iceberg MoR scan (lang <> 'zh', src19 MoR-deleted) feeds
    duplicate_components, and curation keeps exactly ONE document per
    duplicate cluster (the component-min), reporting per-language
    kept/dropped counts. ice_docs_curation proves the FILTER family
    composes with Iceberg scans; this proves the cluster artifact does —
    near-dup relations aren't transitive, so keep-one-per-component is
    the decision pairwise dedup can't make. Hash-checked: the oracle
    recomputes TRUE components (recursive CTE) over the same filtered
    rows and replays the keep-one rule."""
    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.operators.dedup import duplicate_components

    loc = _ice_documents_mor(spark, sf_dir)
    # persist the pruned MoR scan: the component pipeline and the final
    # curation join both consume it, and each re-execution would re-apply
    # the delete anti-join. (r9 profile: localCheckpoint instead was 4%
    # faster at sf0.1 by truncating lineage, but hides the scan's
    # PushedFilters from the plan audit and forfeits executor-loss
    # recompute; the query's 7.8s is ~54 sequential driver round-trips —
    # AQE materializations, broadcasts, CC rounds — whose per-job
    # executorRunTime sums to <2s, i.e. toy-scale scheduling latency that
    # amortizes at real data sizes, not a scale hazard. AQE off: 3x
    # worse. See PLANS.md / tools/explain_audit.py.)
    docs = iceberg_scan(spark, loc, where="lang <> 'zh'") \
        .filter(F.length("text") > 0).persist()
    comp = duplicate_components(docs, num_hashes=32, bands=8)
    return (
        docs.select("doc_id", "lang")
        .join(comp, "doc_id")
        .groupBy("lang")
        .agg(F.count(F.when(F.col("doc_id") == F.col("component_id"), 1))
             .alias("kept"),
             F.count(F.when(F.col("doc_id") != F.col("component_id"), 1))
             .alias("dropped"))
        .orderBy("lang")
    )


def _ice_documents_times(spark: SparkSession, sf_dir: str) -> str:
    """documents with a deterministic TIME column, identity-partitioned by
    its hour bucket: event_t = make_time(id%24, id%60, id%60 + id%1000 ms)
    — every component integer-derived, so the oracle reconstructs the
    exact same µs time-of-day with exact integer arithmetic.

    Session-mode aware (the r11 driver red): in a session WITHOUT
    ``spark.sql.timeType.enabled`` (the driver's own), ``make_time`` itself
    throws UNSUPPORTED_TIME_TYPE, so the flag-less build writes the column
    as tagged-Long µs (LongType + ``iceberg.type: time`` field metadata —
    the pre-4.1 mapping the scan path degrades to). The two modes write
    physically different parquet (TIME logical type vs raw INT64), so each
    gets its OWN fixture variant — a flag-on bench and a flag-less
    correctness run sharing the cache must not read each other's files
    with the wrong read schema."""
    from duckdb_iceberg_spark.metadata.types import time_type_available

    flag_on = time_type_available()

    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        docs = _pq(spark, sf_dir, "documents")
        if flag_on:
            df = docs.selectExpr(
                "doc_id",
                "lang",
                "make_time(CAST(doc_id % 24 AS INT), CAST(doc_id % 60 AS INT), "
                " CAST(doc_id % 60 AS DECIMAL(16,6))"
                " + CAST(doc_id % 1000 AS DECIMAL(16,6)) / 1000) AS event_t",
                "CAST(doc_id % 24 AS INT) AS event_hour")
        else:
            from duckdb_iceberg_spark.metadata.types import (
                FIELD_ID_KEY, ICEBERG_TYPE_KEY)

            df = docs.selectExpr(
                "doc_id",
                "lang",
                "(((doc_id % 24) * 3600 + (doc_id % 60) * 60 + (doc_id % 60))"
                " * 1000000 + (doc_id % 1000) * 1000) AS event_t",
                "CAST(doc_id % 24 AS INT) AS event_hour")
            # struct_to_schema honors ICEBERG_TYPE_KEY only when every field
            # carries a field-id (metadata/types.py:348-364)
            df = (df.withMetadata("doc_id", {FIELD_ID_KEY: 1})
                    .withMetadata("lang", {FIELD_ID_KEY: 2})
                    .withMetadata("event_t", {FIELD_ID_KEY: 3,
                                              ICEBERG_TYPE_KEY: "time"})
                    .withMetadata("event_hour", {FIELD_ID_KEY: 4}))
        write_iceberg(df, loc, partition_by=["event_hour"])

    variant = "documents_times" if flag_on else "documents_times_uslong"
    return _build_once(sf_dir, variant, build)


def ice_time_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg `time` as a first-class type through OUR write path (the
    SURVEY §1.2 gap lifted in r10): write a TimeType column, scan it back
    with a TIME'...' predicate (stats-bounds pruning — the hour-identity
    layout gives each file an event_t range, so files entirely below noon
    never plan), aggregate on time-of-day values.

    Mode-independent output (the r12 fix for the r11 driver red): the
    driver-facing min/max columns are exact µs-since-midnight BIGINTs in
    BOTH session modes — flag-on sessions convert the TimeType aggregate
    input via exact integer extraction, flag-less sessions already carry
    the tagged-Long µs column; the TIME'12:00:00' residual is rewritten
    to a µs long by the scan path (sources/scan.py _residual_filter)
    whenever the fallback is active. Hash-checked — the oracle rebuilds
    the identical µs values from doc_id with pure integer arithmetic."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_times(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="event_t >= TIME'12:00:00'")
    if dict(t.dtypes)["event_t"] == "bigint":
        us = F.col("event_t")
    else:
        # hour/minute are ints; extract(SECOND) is an exact DECIMAL(8,6)
        # of the µs-resolution seconds field — no float anywhere
        us = F.expr(
            "(hour(event_t) * 3600L + minute(event_t) * 60L) * 1000000"
            " + CAST(extract(SECOND FROM event_t) * 1000000 AS BIGINT)")
    return (
        t.groupBy("event_hour")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(us).alias("min_t"),
             F.max(us).alias("max_t"))
        .orderBy("event_hour")
    )


def docs_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete Gopher document-quality rule set (NEW r11; Rae et al.
    2021 §A1.1) as one composite keep/drop with the first failed rule
    named — word-count/mean-word-length bounds, symbol ratio, bullet and
    ellipsis line ratios, alphabetic-word fraction, required stop words.
    Every rule compares cross-multiplied INTEGERS (never a float ratio),
    so the decision replays bit-for-bit in the oracle. Pure map-side
    Column work: zero shuffles. min_words=20 fits the synthetic corpus'
    document lengths (the operator default is Gopher's 50)."""
    from duckdb_iceberg_spark.operators.text import gopher_document_filter

    docs = _pq(spark, sf_dir, "documents")
    return gopher_document_filter(docs, min_words=20).orderBy("doc_id")


def docs_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rule set (NEW r11; Raffel et al. 2020 §2.2) — the
    line-level REWRITING filter beside Gopher's doc-level one: lines with
    <5 words or the word 'javascript' drop, docs keeping <3 lines or
    containing '{' / 'lorem ipsum' drop entirely; kept lines re-join as
    text_clean. require_terminal_punct=False here — the synthetic corpus
    carries no sentence punctuation (C4's web default stays the operator
    default). Hash-checked: the oracle replays the identical string rules
    incl. the rewritten text."""
    from duckdb_iceberg_spark.operators.text import c4_clean

    docs = _pq(spark, sf_dir, "documents")
    return c4_clean(docs, require_terminal_punct=False).orderBy("doc_id")


def docs_pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r11 operator family COMPOSED into one curation pipeline (NEW
    r11): Gopher A1.1 rule filter → seed-trained NB quality classifier
    (trained on the FILTERED corpus, lang='en' positives, keep logit>0)
    → exact dedup keep-first over the selected set → per-language
    selected/kept/char-budget report. The modern pretraining recipe's
    filter→classify→dedup chain (Gopher / GPT-3 / DCLM) end-to-end over
    DataFrames. Hash-checked: the oracle replays the whole chain with
    classifier weights probed over the SAME filtered corpus — a drift in
    any stage (rule arithmetic, training slice, weight literal, dedup
    keep-rule) changes the report."""
    from duckdb_iceberg_spark.operators.classify import nb_quality_score
    from duckdb_iceberg_spark.operators.text import (doc_fingerprint,
                                                     gopher_document_filter)

    docs = _pq(spark, sf_dir, "documents")
    gk = (gopher_document_filter(docs, min_words=20,
                                 required_words=["the", "a"])
          .filter("keep").select("doc_id"))
    # persist the filtered corpus (r15, guide §5): three consumers read
    # it — the classifier fit's tokenize, the scoring pass, and the
    # final report's join left side — so the scan+rule chain executed
    # 3x per run. One cached computation replaces them (A/B at sf0.1:
    # 3.4-3.8s -> 2.6-2.9s warm); same pattern as ice_dup_cluster_
    # curation's persisted MoR scan. The bench clears cache per run.
    filtered = docs.join(gk, "doc_id").persist()
    sel_ids = (nb_quality_score(filtered, positive_cond="lang = 'en'",
                                vocab_size=1024)
               .filter("pred_hq").select("doc_id"))
    sel = filtered.join(sel_ids, "doc_id")
    # keep-first dedup as ONE window over the fingerprint (r14): the old
    # groupBy(__fp) + join-back shape recomputed the whole
    # filter→classify chain a second time for the keeper set and paid a
    # join; min(doc_id) OVER (PARTITION BY __fp) marks keepers in the
    # same pass the report aggregates — one shuffle on __fp, sel
    # computed once (warm sf0.1: 4.7s → ~3s).
    from pyspark.sql.window import Window

    sel2 = sel.select("doc_id", "lang", "n_chars",
                      doc_fingerprint("text").alias("__fp"))
    is_keeper = (F.min("doc_id").over(Window.partitionBy("__fp"))
                 == F.col("doc_id"))
    return (
        sel2.withColumn("__k", is_keeper.cast("int"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_selected"),
             F.sum("__k").cast("long").alias("n_kept"),
             F.coalesce(F.sum(F.when(F.col("__k") == 1, F.col("n_chars"))),
                        F.lit(0))
             .cast("long").alias("sum_chars_kept"))
        .orderBy("lang")
    )


#: BM25 driver-entry query terms (tokens of the synthetic corpus)
_BM25_TERMS = ["merge", "vector", "window"]


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval top-k (NEW r11) — the lexical sibling of
    the ANN family; the contamination-check / RAG workhorse (Robertson &
    Zaragoza 2009). Lucene-form non-negative idf as driver-side decimal-ln
    literals, k1=6/5 b=3/4 exact rationals, per-(doc,term) score reduced
    to one integer fraction — micro-unit BIGINT scores, deterministic
    (score desc, id asc) top-k via TakeOrdered. Hash-checked: the oracle
    replays the same integer arithmetic with idf literals from the same
    CPython function."""
    from duckdb_iceberg_spark.operators.retrieval import bm25_topk

    docs = _pq(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=100)


def _ice_documents_orc(spark: SparkSession, sf_dir: str) -> str:
    """documents written as ORC data files (write.format.default=orc,
    NEW r11 — beyond the reference, which refuses non-parquet data files:
    iceberg_multi_file_list.cpp:528-529), lang-identity-partitioned, then
    CDC-upserted via EQUALITY deletes (the delete flavor that needs no
    row positions, so it applies to ORC unchanged): every doc_id % 10 == 0
    row gets n_chars bumped by 1e6 in one merge-on-read snapshot."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import upsert_equality

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        write_iceberg(docs, loc, partition_by=["lang"],
                      properties={"write.format.default": "orc"})
        upd = docs.filter("doc_id % 10 = 0").withColumn(
            "n_chars", F.col("n_chars") + F.lit(1000000))
        upsert_equality(spark, loc, upd, key_columns=["doc_id"])

    return _build_once(sf_dir, "documents_orc", build)


def ice_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC data files end-to-end (NEW r11): write.format.default=orc
    write path → lang partition pruning (the 'zh' files never plan) →
    equality-delete MoR merge (upserted rows replace originals) →
    aggregate. Hash-checked: the oracle replays the upsert arithmetic
    from the raw documents rows, so a wrong merge, a missed partition
    constant, or an ORC value corrupted in the roundtrip all mismatch."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_orc(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="lang <> 'zh'")
    return (
        t.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("source")
    )


def _ice_documents_orc_mor(spark: SparkSession, sf_dir: str) -> str:
    """documents as ORC data files with POSITIONAL merge-on-read deletes
    (NEW r12 — the arrow data plane synthesizes exact per-file row
    ordinals, so MoR DELETE works over ORC; the reference refuses
    non-parquet data files entirely, iceberg_multi_file_list.cpp:528-529):
    source-identity-partitioned, then ONE merge-on-read DELETE removes
    every doc_id % 7 == 0 row — parquet positional-delete files pointing
    at ORC data files, data files never rewritten."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        write_iceberg(docs, loc, partition_by=["source"],
                      properties={"write.format.default": "orc"})
        delete_from(spark, loc, "doc_id % 7 = 0", mode="merge-on-read")

    return _build_once(sf_dir, "documents_orc_mor", build)


def ice_orc_mor_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional MoR deletes over ORC data files end-to-end (NEW r12,
    VERDICT r11 task 5): ORC write path → source partition pruning (the
    'src3' files never plan) → positional-delete anti-join with arrow-
    plane row ordinals → aggregate. Hash-checked: the oracle replays the
    delete predicate from the raw documents rows, so a wrong ordinal, a
    delete applied to the wrong file, or a missed partition constant all
    change the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_orc_mor(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="source <> 'src3'")
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_delete_compaction(spark: SparkSession, sf_dir: str) -> str:
    """documents with THREE stacked merge-on-read DELETEs (doc_id%9==0,
    n_chars>4500, doc_id%100==13 — overlapping predicates, so the stacked
    delete files carry duplicate positions) followed by
    rewrite_position_delete_files (NEW r12): the maintenance op merges
    each data file's delete stack into one parquet positional-delete file
    and dedups rows. The scan after compaction must see exactly the rows
    the three predicates leave."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from
        from duckdb_iceberg_spark.sources.maintenance import (
            rewrite_position_delete_files,
        )

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        write_iceberg(docs, loc, partition_by=["lang"])
        for pred in ("doc_id % 9 = 0", "n_chars > 4500",
                     "doc_id % 100 = 13"):
            delete_from(spark, loc, pred, mode="merge-on-read")
        out = rewrite_position_delete_files(spark, loc)
        assert out["added_delete_files_count"] >= 1

    return _build_once(sf_dir, "documents_delete_compaction", build)


def ice_delete_compaction_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_position_delete_files end-to-end (NEW r12 — delete
    maintenance beyond the reference, which has none): three stacked MoR
    DELETEs, then the compaction merges each data file's delete stack
    into ONE file (dedup across overlapping predicates), then a pruned
    scan aggregates the survivors. Hash-checked: the oracle replays the
    three delete predicates from the raw rows — a lost or resurrected
    position after the merge changes counts and sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_delete_compaction(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="lang <> 'de'")
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_imported(spark: SparkSession, sf_dir: str) -> str:
    """The raw testdata ``documents.parquet`` REGISTERED into an Iceberg
    table via add_files (NEW r12 — metadata-only import, no data copied;
    the Spark ``add_files``/``migrate`` procedure analogue, beyond the
    reference which has no import story), then schema-evolved AFTER the
    import (rename lang→language, add quality long) so the scan must
    resolve the field-id-less original file through
    ``schema.name-mapping.default`` and surface the added column as
    NULL."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark.sources.add_files import add_files
        from duckdb_iceberg_spark.sources.ddl import add_column, rename_column

        out = add_files(
            spark, loc, [os.path.join(sf_dir, "documents.parquet")])
        assert out["added_files_count"] >= 1
        rename_column(loc, "lang", "language")
        add_column(loc, "quality", "long")

    return _build_once(sf_dir, "documents_imported", build)


def ice_add_files_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_files import end-to-end (NEW r12): register the raw corpus
    parquet without rewriting a byte, evolve the schema after import,
    then scan with a zone-map-prunable predicate and aggregate. The
    import's footer stats feed the same pruning as written files; the
    renamed column resolves via name mapping; the added column is NULL
    everywhere. Hash-checked: the oracle reads the same raw rows, so a
    mis-mapped column, lost rows, or a NULL-default mistake all
    mismatch."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_imported(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="n_chars >= 200")
    return (
        t.groupBy("language")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.count("quality").alias("n_quality"))
        .orderBy("language")
    )


def _ice_documents_wap(spark: SparkSession, sf_dir: str) -> str:
    """Write-Audit-Publish over documents (NEW r12): base table on main,
    then an 'audit' branch stages (a) an append of doc_id+1000000 clones
    for lang='fr' and (b) nothing on main — main is verified untouched
    mid-flight — then fast_forward publishes the branch to main. The
    final scan must see base + staged rows; a leak of staged rows before
    publish or a lost branch commit changes the counts."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import iceberg_scan, write_iceberg
        from duckdb_iceberg_spark.sources.ddl import fast_forward

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        write_iceberg(docs, loc)
        staged = (docs.filter("lang = 'fr'")
                  .withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
        write_iceberg(staged, loc, branch="audit")
        # the audit gate: main must not see staged work pre-publish
        n_main = iceberg_scan(spark, loc).count()
        n_branch = iceberg_scan(spark, loc, ref="audit").count()
        assert n_branch > n_main, "staged rows must live on the branch only"
        fast_forward(loc, "main", "audit")

    return _build_once(sf_dir, "documents_wap", build)


def ice_wap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish end-to-end (NEW r12): branch-staged append →
    audit (main isolation asserted in the fixture) → fast_forward
    publish → aggregate over the published table. Hash-checked: the
    oracle replays base ∪ staged-clone arithmetic from the raw rows."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_wap(spark, sf_dir)
    t = iceberg_scan(spark, loc)
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_retention(spark: SparkSession, sf_dir: str) -> str:
    """Ref-retention-aware snapshot expiry (NEW r13, VERDICT task 6 —
    the spec's per-reference retention fields; the reference models them
    at rest_catalog/objects/snapshot_reference.cpp but has no expire
    procedure at all): four appends (doc_id % 4 == 0..3), a tag 'old' on
    snapshot 1 that is already past its max-ref-age-ms (so expiry DROPS
    it rather than letting it pin the snapshot forever), and a branch
    'audit' on snapshot 3 whose min-snapshots-to-keep=2 protects its
    2-ancestor chain (snapshots 2+3). expire_snapshots(retain_last=1)
    must then: drop the tag, expire exactly snapshot 1, and retain
    snapshots 2-4. All three outcomes are asserted here; the query scans
    the branch — content that exists only because retention held."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import iceberg_scan, write_iceberg
        from duckdb_iceberg_spark.metadata.table_metadata import (
            load_table_metadata,
        )
        from duckdb_iceberg_spark.sources.ddl import create_branch, create_tag
        from duckdb_iceberg_spark.sources.maintenance import expire_snapshots

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        for m in range(4):
            write_iceberg(docs.filter(F.col("doc_id") % 4 == m), loc)
        snaps = sorted(load_table_metadata(loc).snapshots,
                       key=lambda s: s.timestamp_ms)
        create_tag(loc, "old", snaps[0].snapshot_id, max_ref_age_ms=0)
        create_branch(loc, "audit", snaps[2].snapshot_id,
                      min_snapshots_to_keep=2)

        out = expire_snapshots(loc, retain_last=1)
        assert out["dropped_refs"] == ["old"], out
        assert out["expired"] == 1, out
        tm = load_table_metadata(loc)
        assert len(tm.snapshots) == 3 and "old" not in tm.refs
        # the branch's protected ancestor is still time-travelable
        assert iceberg_scan(
            spark, loc, snapshot_id=snaps[1].snapshot_id).count() > 0

    return _build_once(sf_dir, "documents_retention", build)


def ice_retention_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch/tag retention on expire_snapshots end-to-end (NEW r13):
    expire drops an aged-out tag, honors a branch's min-snapshots-to-keep,
    and expires exactly the unprotected snapshot (all asserted in the
    fixture) — then the scan reads the RETAINED branch, whose head
    (snapshot 3: doc_id % 4 < 3) survives only because it is a live ref.
    Hash-checked: the oracle replays the % 4 < 3 content from raw rows;
    over-expiry loses the branch (query errors), under-expiry cannot
    change the branch content but the fixture's exact-count asserts
    catch it."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_retention(spark, sf_dir)
    t = iceberg_scan(spark, loc, ref="audit")
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_avro(spark: SparkSession, sf_dir: str) -> str:
    """documents as AVRO data files (NEW r12 — the THIRD data-file format;
    the reference refuses everything non-parquet,
    iceberg_multi_file_list.cpp:528-529): the corpus lands in four Avro
    object-container files written by the package's own pure-Python codec
    (the shape a Flink writer with write.format.default=avro produces),
    then ONE merge-on-read DELETE removes every doc_id % 6 == 2 row —
    parquet positional-delete files anti-joined against arrow-plane Avro
    reads with exact row ordinals."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark.metadata import manifest as mf
        from duckdb_iceberg_spark.metadata.avro_io import write_avro_file
        from duckdb_iceberg_spark.sources.dml import delete_from
        from duckdb_iceberg_spark.sources.writer import (commit_snapshot,
                                                         create_table)

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        tm = create_table(loc, docs.schema)
        avro_schema = {
            "type": "record", "name": "r", "fields": [
                {"name": "doc_id", "field-id": 1, "type": ["null", "long"]},
                {"name": "lang", "field-id": 2, "type": ["null", "string"]},
                {"name": "n_chars", "field-id": 3,
                 "type": ["null", "long"]},
            ]}
        rows = [r.asDict() for r in docs.collect()]
        data_dir = os.path.join(loc, "data")
        os.makedirs(data_dir, exist_ok=True)
        files = []
        n_files = 4
        per = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            chunk = rows[i * per:(i + 1) * per]
            if not chunk:
                continue
            p = os.path.join(data_dir, f"f{i}.avro")
            write_avro_file(p, avro_schema, chunk)
            files.append(mf.DataFile(
                content=mf.CONTENT_DATA, file_path=p, file_format="AVRO",
                partition={}, record_count=len(chunk),
                file_size_in_bytes=os.path.getsize(p)))
        commit_snapshot(tm, operation="append", new_data_files=files)
        delete_from(spark, loc, "doc_id % 6 = 2", mode="merge-on-read")

    return _build_once(sf_dir, "documents_avro", build)


def ice_avro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro data files end-to-end (NEW r12): foreign-shaped Avro files →
    arrow-plane pure-Python decode with by-field-id resolution → MoR
    positional-delete anti-join on exact ordinals → aggregate.
    Hash-checked: the oracle replays the delete predicate from the raw
    rows, so a mis-decoded value, a wrong ordinal, or a lost row all
    change the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_avro(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="lang <> 'es'")
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_ndv(spark: SparkSession, sf_dir: str) -> str:
    """Theta-sketch NDV statistics fixture (NEW r13 —
    ``compute_table_stats`` writing the spec's Puffin statistics file;
    the reference only MODELS the metadata shape,
    rest_catalog/objects/statistics_file.cpp): documents projected to
    three bounded-cardinality columns (lang, source, doc_mod =
    doc_id % 50) so every sketch stays in EXACT mode (distincts << k) —
    the ndv values are then cross-engine hash-checkable against literal
    COUNT(DISTINCT …). The build also asserts the statistics entry
    registered for the current snapshot with theta blobs."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import compute_table_stats, write_iceberg
        from duckdb_iceberg_spark.metadata.table_metadata import (
            load_table_metadata,
        )
        from duckdb_iceberg_spark.sources.statistics import THETA_BLOB_TYPE

        docs = _pq(spark, sf_dir, "documents").select(
            "lang", "source", (F.col("doc_id") % 50).alias("doc_mod"))
        write_iceberg(docs, loc)
        compute_table_stats(spark, loc)
        entry_ = load_table_metadata(loc).raw["statistics"][0]
        assert {b["type"] for b in entry_["blob-metadata"]} == \
            {THETA_BLOB_TYPE}

    return _build_once(sf_dir, "documents_ndv", build)


def ice_ndv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compute_table_stats end-to-end (NEW r13): one distributed
    k+1-bounded-candidate pass → Puffin theta blobs → metadata
    statistics entry → table_ndv read-back. Hash-checked: every column
    is below the sketch's k, so the estimates are EXACT distinct counts
    the oracle replays literally — a hashing/merge/serialization bug
    shifts at least one ndv."""
    from duckdb_iceberg_spark import table_ndv

    loc = _ice_documents_ndv(spark, sf_dir)
    ndv = table_ndv(loc)
    rows = [(c, int(n)) for c, n in sorted(ndv.items())]
    return spark.createDataFrame(rows, "col_name: string, ndv: long")


def _ice_documents_pstats(spark: SparkSession, sf_dir: str) -> str:
    """Partition-statistics-file fixture (NEW r13 —
    ``compute_partition_stats`` writing the spec's per-partition
    aggregate parquet; the reference models only the metadata entry,
    rest_catalog/objects/partition_statistics_file.cpp): documents
    identity-partitioned by lang (repartitioned so each partition holds
    exactly ONE data file — the file count becomes oracle-replayable),
    one MoR positional delete stacked on top, then the stats file is
    computed from manifest entries alone (metadata-only)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import compute_partition_stats, write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        write_iceberg(docs.repartition(F.col("lang")), loc,
                      partition_by=["lang"])
        delete_from(spark, loc, "doc_id % 7 = 3", mode="merge-on-read")
        out = compute_partition_stats(loc)
        assert out["partitions"] > 0

    return _build_once(sf_dir, "documents_pstats", build)


def ice_partition_stats_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compute_partition_stats end-to-end (NEW r13): manifest-entry
    aggregation → spec partition-statistics parquet → metadata entry →
    read-back. Hash-checked: record counts, the one-file-per-partition
    layout, and the per-partition positional-delete row counts all
    replay literally from the raw corpus."""
    from duckdb_iceberg_spark import read_partition_stats

    loc = _ice_documents_pstats(spark, sf_dir)
    df = read_partition_stats(spark, loc)
    return (
        df.select(
            F.col("partition.lang").alias("lang"),
            F.col("data_record_count").alias("n_rows"),
            F.col("data_file_count").cast("long").alias("n_files"),
            F.col("position_delete_record_count").alias("n_pos_deletes"))
        .orderBy("lang")
    )


def _ice_documents_cherrypick(spark: SparkSession, sf_dir: str) -> str:
    """cherrypick_snapshot end-to-end (NEW r13 — the Spark
    ``system.cherrypick_snapshot`` procedure; the out-of-order half of
    Write-Audit-Publish): base (doc_id%3==0) on main, a wap.id-tagged
    staged append (doc_id%3==1) on an audit branch, then main MOVES
    independently (doc_id%3==2) so fast_forward is impossible — the
    staged snapshot publishes via cherry-pick as a NEW commit on the
    moved head. The fixture asserts the pick recorded
    source-snapshot-id + wap.id and that a second pick of the same
    wap.id refuses (the duplicate-WAP guard)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.metadata.table_metadata import (
            load_table_metadata,
        )
        from duckdb_iceberg_spark.sources.ddl import cherrypick_snapshot

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        write_iceberg(docs.filter(F.col("doc_id") % 3 == 0), loc)
        write_iceberg(docs.filter(F.col("doc_id") % 3 == 1), loc,
                      branch="audit",
                      snapshot_properties={"wap.id": "audit-job-1"})
        staged = load_table_metadata(loc).refs["audit"]["snapshot-id"]
        write_iceberg(docs.filter(F.col("doc_id") % 3 == 2), loc)

        tm = cherrypick_snapshot(loc, staged)
        snap = tm.current_snapshot()
        assert snap.summary["source-snapshot-id"] == str(staged)
        assert snap.summary["wap.id"] == "audit-job-1"
        try:
            cherrypick_snapshot(loc, staged)
        except ValueError as e:
            assert "already published" in str(e)
        else:  # pragma: no cover - fixture invariant
            raise AssertionError("duplicate wap.id pick must refuse")

    return _build_once(sf_dir, "documents_cherrypick", build)


def ice_cherrypick_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cherrypick_snapshot publish (NEW r13): staged wap.id append →
    main diverges → cherry-pick onto the moved head → aggregate over the
    published table. Hash-checked: the final content must be the WHOLE
    corpus — a lost pick drops the %3==1 third, a double-apply doubles
    it, either flips counts and sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_cherrypick(spark, sf_dir)
    t = iceberg_scan(spark, loc)
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_avro_nested(spark: SparkSession, sf_dir: str) -> str:
    """documents as NESTED Avro data files (NEW r13, VERDICT r12 task 4 —
    the foreign Flink/legacy-table shape; the reference reads no Avro
    data at all, iceberg_multi_file_list.cpp:528): each row nests the
    corpus columns into a struct, a tags list, and a props map, written
    by the package's pure-Python Avro codec with the TABLE's field-ids
    stamped per record field (what a real Iceberg-Avro writer emits).
    After the write the struct member lang is RENAMED to language, so
    the scan must resolve the member by field-id through the Avro
    plane. NULLs at every nesting level (absent tags lists, sparse map
    keys) exercise union decode."""
    def build(loc: str) -> None:
        from pyspark.sql import types as T

        from duckdb_iceberg_spark.metadata import manifest as mf
        from duckdb_iceberg_spark.metadata.avro_io import write_avro_file
        from duckdb_iceberg_spark.sources.ddl import rename_column
        from duckdb_iceberg_spark.sources.writer import (commit_snapshot,
                                                         create_table)

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        spark_schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("meta", T.StructType([
                T.StructField("lang", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ])),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("props", T.MapType(T.StringType(), T.LongType())),
        ])
        tm = create_table(loc, spark_schema)
        # field-ids = create_table's breadth-first assignment: top-level
        # 1-4, then meta.{lang,n_chars}=5,6, tags.element=7, props k/v=8,9
        avro_schema = {
            "type": "record", "name": "r", "fields": [
                {"name": "doc_id", "field-id": 1, "type": ["null", "long"]},
                {"name": "meta", "field-id": 2, "type": ["null", {
                    "type": "record", "name": "meta_r", "fields": [
                        {"name": "lang", "field-id": 5,
                         "type": ["null", "string"]},
                        {"name": "n_chars", "field-id": 6,
                         "type": ["null", "long"]}]}]},
                {"name": "tags", "field-id": 3, "type": ["null", {
                    "type": "array", "element-id": 7,
                    "items": ["null", "string"]}]},
                {"name": "props", "field-id": 4, "type": ["null", {
                    "type": "map", "key-id": 8, "value-id": 9,
                    "values": ["null", "long"]}]},
            ]}
        rows = []
        for r in docs.collect():
            i = int(r.doc_id)
            tags = None if i % 13 == 7 else (
                [r.source, r.lang] if i % 3 == 0 else [r.source])
            props = {"len": int(r.n_chars) % 100}
            if i % 5 == 0:
                props["mod"] = i % 7
            rows.append({"doc_id": i,
                         "meta": {"lang": r.lang, "n_chars": int(r.n_chars)},
                         "tags": tags, "props": props})
        data_dir = os.path.join(loc, "data")
        os.makedirs(data_dir, exist_ok=True)
        files = []
        n_files = 4
        per = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            chunk = rows[i * per:(i + 1) * per]
            if not chunk:
                continue
            p = os.path.join(data_dir, f"f{i}.avro")
            write_avro_file(p, avro_schema, chunk)
            files.append(mf.DataFile(
                content=mf.CONTENT_DATA, file_path=p, file_format="AVRO",
                partition={}, record_count=len(chunk),
                file_size_in_bytes=os.path.getsize(p)))
        commit_snapshot(tm, operation="append", new_data_files=files)
        rename_column(loc, "meta.lang", "language")

    return _build_once(sf_dir, "documents_avro_nested", build)


def ice_avro_nested_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested Avro data files end-to-end (NEW r13): struct/list/map
    columns decode through the arrow plane with by-field-id member
    resolution (the struct member was renamed post-write), NULLs at
    every level. Hash-checked: the oracle replays the nesting arithmetic
    from the raw rows — a mis-resolved member, lost list element, or
    dropped map key changes the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_avro_nested(spark, sf_dir)
    t = iceberg_scan(spark, loc)
    return (
        t.select(
            F.col("meta.language").alias("lang"),
            F.col("meta.n_chars").alias("nc"),
            F.size("tags").alias("ntags"),
            F.element_at("props", F.lit("len")).alias("plen"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("nc").cast("long").alias("sum_chars"),
             F.sum("ntags").cast("long").alias("n_tags"),
             F.sum("plen").cast("long").alias("sum_plen"))
        .orderBy("lang")
    )


def _ice_documents_avro_write(spark: SparkSession, sf_dir: str) -> str:
    """The Avro WRITE path end-to-end (NEW r13 — write.format.default=
    avro routes write_iceberg through the pure-Python codec with in-pass
    stats; the r12 read side already exceeded the reference's
    parquet-only scope): documents written as Avro OCF files by the
    ENGINE itself, then one MoR positional delete stacked on top — the
    scan must resolve engine-written field-ids, apply the delete against
    real ordinals, and prune on the in-pass bounds."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        write_iceberg(docs.repartition(4), loc,
                      properties={"write.format.default": "avro"})
        delete_from(spark, loc, "doc_id % 9 = 4", mode="merge-on-read")

    return _build_once(sf_dir, "documents_avro_write", build)


def ice_avro_write_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-written Avro data files (NEW r13): write_iceberg with
    write.format.default=avro → MoR delete → pruned scan → aggregate.
    Hash-checked: the oracle replays the delete predicate from the raw
    rows, so a mis-encoded value, wrong ordinal, or lost row all change
    the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_avro_write(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="n_chars >= 100")
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_avro_part(spark: SparkSession, sf_dir: str) -> str:
    """Partitioned NESTED Avro writes (NEW r14, VERDICT r13 task 4 —
    past flat+identity): documents with a struct column, written as Avro
    OCF files under day() + bucket() transform partition directories.
    The write path materializes the same synthetic transform columns the
    parquet path uses and routes them through the OCF encoder's hive
    layout; the nested struct encodes with field-ids at every level."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars")
        df = docs.select(
            "doc_id", "lang",
            F.expr("timestamp_ntz'2024-01-01 00:00:00' + "
                   "make_interval(0,0,0,cast(doc_id % 5 as int))")
            .alias("ts"),
            F.struct(F.col("source"),
                     F.col("n_chars").cast("long").alias("n_chars"))
            .alias("meta"))
        write_iceberg(df, loc,
                      partition_by=["day(ts)", "bucket(8, doc_id)"],
                      properties={"write.format.default": "avro"})

    return _build_once(sf_dir, "documents_avro_part", build)


def ice_avro_write_part_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-written PARTITIONED nested Avro (NEW r14): day()+bucket()
    transform dirs, nested struct with field-ids, day-pruned scan with a
    predicate into the struct member. Hash-checked: the oracle replays
    the ts derivation and the nested filter from the raw rows, so a
    mis-rendered partition dir (lost rows), a mis-encoded nested value,
    or broken day pruning all change the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_avro_part(spark, sf_dir)
    t = iceberg_scan(
        spark, loc,
        where="ts >= TIMESTAMP '2024-01-03 00:00:00'"
              " AND meta.n_chars >= 120")
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("meta.n_chars")).cast("long").alias("sum_chars"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_orders_zorder(spark: SparkSession, sf_dir: str) -> str:
    """Z-order clustered rewrite (NEW r14): a 2-dimensional table
    (deterministic x/y derived from o_orderkey so the oracle replays
    them) bin-packed-and-z-clustered by rewrite_data_files(sort_order=
    'zorder(x, y)') — per-file bounds end up tight on BOTH x and y, so a
    predicate on either dimension prunes files (the reference's
    compaction bin-packs only, iceberg_rewrite_data_files.cpp)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.maintenance import (
            rewrite_data_files,
        )

        o = _pq(spark, sf_dir, "orders").selectExpr(
            "o_orderkey",
            "(o_orderkey * 9973) % 1000 as x",
            "(o_orderkey * o_orderkey) % 1000 as y")
        write_iceberg(o.repartition(8), loc)
        rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1,
                           target_file_size_bytes=64_000,
                           sort_order="zorder(x, y)")

    return _build_once(sf_dir, "orders_zorder", build)


def ice_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the z-order-rewritten table with a two-dimensional
    predicate. Hash-checked: the oracle replays the x/y derivations and
    the filter from the raw orders rows, so a row lost or duplicated by
    the clustering rewrite, or a wrong bound excluding a matching file,
    changes the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_orders_zorder(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="x >= 800 AND y < 200")
    return (
        t.groupBy((F.col("x") % 7).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("o_orderkey").cast("long").alias("sum_key"),
             F.max("o_orderkey").alias("max_key"))
        .orderBy("g")
    )


def _ice_orders_zorder_str(spark: SparkSession, sf_dir: str) -> str:
    """Z-order rewrite with a STRING dimension (NEW r15 — VERDICT r14
    task 5): the string dim ranks via zero-padded 6-byte big-endian
    UTF-8 prefix quantiles (operators/zorder.py), so per-file string
    bounds become tight and a string predicate prunes — Iceberg's own
    zorder accepts strings; the r14 refusal lifts. Derivations stay
    deterministic from o_orderkey so the oracle replays them (the
    independent second dim uses k*k%m, not a second linear map)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.maintenance import (
            rewrite_data_files,
        )

        o = _pq(spark, sf_dir, "orders").selectExpr(
            "o_orderkey",
            "concat('w', lpad(cast((o_orderkey * 9973) % 1000 "
            "as string), 4, '0')) as s",
            "(o_orderkey * o_orderkey) % 1000 as y")
        write_iceberg(o.repartition(8), loc)
        rewrite_data_files(spark, loc, rewrite_all=True, min_input_files=1,
                           target_file_size_bytes=64_000,
                           sort_order="zorder(s, y)")

    return _build_once(sf_dir, "orders_zorder_str", build)


def ice_zorder_string_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the string-dimension z-order table with a string + numeric
    predicate. Hash-checked: the oracle replays the string derivation
    (concat/lpad — identical in DuckDB) and both filters from the raw
    orders rows, so a row lost by the clustering rewrite, a wrong string
    bound, or a prefix-rank collision mishandled in the rewrite changes
    the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_orders_zorder_str(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="s >= 'w0800' AND y < 200")
    return (
        t.groupBy(F.substring("s", 3, 1).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("o_orderkey").cast("long").alias("sum_key"),
             F.max("s").alias("max_s"))
        .orderBy("g")
    )


def _ice_documents_avro_deletes(spark: SparkSession, sf_dir: str) -> str:
    """Avro-format DELETE files (NEW r14 —
    write.delete.format.default=avro): one MoR positional delete and one
    equality delete, both written through the pure-Python OCF codec with
    the spec's reserved field-ids / equality_ids; the format-routed read
    plane applies them like parquet deletes (the reference refuses
    non-parquet deletes entirely, iceberg_delete_file_scanner.cpp:393,
    and writes no deletes in any format)."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import (
            delete_from,
            equality_delete,
        )

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        write_iceberg(docs.repartition(3), loc,
                      properties={"write.delete.format.default": "avro"})
        delete_from(spark, loc, "doc_id % 11 = 2", mode="merge-on-read")
        equality_delete(spark, loc,
                        spark.createDataFrame([("de",)], "lang string"))

    return _build_once(sf_dir, "documents_avro_deletes", build)


def _ice_docs_avro_types(spark: SparkSession, sf_dir: str) -> str:
    """Avro data files with uuid / fixed[4] / time columns (NEW r15 —
    VERDICT r14 task 6: the encode-side refusals lift; the codec has
    decoded these since r12). All three derive deterministically from
    doc_id (uuid/fixed from md5 hex — identical text in DuckDB; time as
    µs-of-day integer arithmetic) so the oracle replays them without
    touching Avro at all."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.metadata.types import (
            FIELD_ID_KEY,
            ICEBERG_TYPE_KEY,
        )

        d = _pq(spark, sf_dir, "documents").selectExpr(
            "doc_id",
            "concat(substr(md5(cast(doc_id as string)), 1, 8), '-', "
            "substr(md5(cast(doc_id as string)), 9, 4), '-', "
            "substr(md5(cast(doc_id as string)), 13, 4), '-', "
            "substr(md5(cast(doc_id as string)), 17, 4), '-', "
            "substr(md5(cast(doc_id as string)), 21, 12)) as t_uuid",
            "unhex(substr(md5(cast(doc_id as string)), 9, 8)) as t_fix",
            "(((doc_id * 7919) % 1440) * 60 + doc_id % 60) * 1000000 "
            "+ (doc_id % 997) * 1000 as event_t")
        d = (d.withMetadata("doc_id", {FIELD_ID_KEY: 1})
             .withMetadata("t_uuid", {FIELD_ID_KEY: 2,
                                      ICEBERG_TYPE_KEY: "uuid"})
             .withMetadata("t_fix", {FIELD_ID_KEY: 3,
                                     ICEBERG_TYPE_KEY: "fixed[4]"})
             .withMetadata("event_t", {FIELD_ID_KEY: 4,
                                       ICEBERG_TYPE_KEY: "time"}))
        write_iceberg(d.repartition(3), loc,
                      properties={"write.format.default": "avro"})

    return _build_once(sf_dir, "docs_avro_types", build)


def ice_avro_types_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the uuid/fixed/time Avro table with a TIME predicate
    (avro in-pass time bounds prune the afternoon files). Hash-checked:
    the oracle rebuilds uuid text, fixed hex and µs values from doc_id
    with md5/substr/integer arithmetic, so a value corrupted in the OCF
    encode, a wrong logical-type decode, or a mis-revived bound dropping
    rows changes the aggregates. Mode-independent output like
    ice_time_scan: min/max time render as µs BIGINTs in both session
    modes; fixed renders lower-hex."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_docs_avro_types(spark, sf_dir)
    t = iceberg_scan(spark, loc, where="event_t >= TIME'12:00:00'")
    if dict(t.dtypes)["event_t"] == "bigint":
        us = F.col("event_t")
    else:
        us = F.expr(
            "(hour(event_t) * 3600L + minute(event_t) * 60L) * 1000000"
            " + CAST(extract(SECOND FROM event_t) * 1000000 AS BIGINT)")
    return (
        t.groupBy((F.col("doc_id") % 5).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(us).alias("min_t"),
             F.max(us).alias("max_t"),
             F.min("t_uuid").alias("min_uuid"),
             F.max(F.lower(F.hex("t_fix"))).alias("max_fix"))
        .orderBy("g")
    )


def ice_avro_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with BOTH delete flavors recorded as AVRO files. Hash-checked:
    the oracle replays the positional predicate and the equality key from
    the raw rows, so a delete row lost in the OCF encode, a wrong
    ordinal, or a mis-applied equality key changes the sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_avro_deletes(spark, sf_dir)
    t = iceberg_scan(spark, loc)
    return (
        t.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def _ice_documents_variant(spark: SparkSession, sf_dir: str) -> str:
    """documents metadata as a VARIANT column written through the real
    write path (unblocked in this container in r8): each row carries
    parse_json(to_json(struct(lang, source, n_chars))) — quote-safe JSON
    built by Spark itself."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        docs = _pq(spark, sf_dir, "documents")
        df = docs.select(
            "doc_id",
            F.parse_json(F.to_json(F.struct(
                F.col("lang"), F.col("source"), F.col("n_chars"),
            ))).alias("meta"))
        write_iceberg(df, loc)

    return _build_once(sf_dir, "documents_variant", build)


def ice_variant_write_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end variant through OUR write path — the reference's
    end-to-end variant story (ice_variant_extract covers the read/prune
    side over an authored fixture; this writes VariantType with
    write_iceberg, scans it back, and runs typed variant_get extraction
    + filter + aggregation). Hash-checked: the oracle replays the same
    summary from the raw documents rows, so any value corrupted by the
    variant encode/decode roundtrip mismatches."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_documents_variant(spark, sf_dir)
    t = iceberg_scan(spark, loc)
    return (
        t.select(
            F.variant_get("meta", "$.source", "string").alias("src"),
            F.variant_get("meta", "$.lang", "string").alias("lang"),
            F.variant_get("meta", "$.n_chars", "long").alias("nc"))
        .filter("lang <> 'zh'")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("nc").alias("sum_chars"))
        .orderBy("src")
    )


def docs_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 16-token windows, 4-token
    overlap (stride 12) — the context-limit prep for training/embedding."""
    from duckdb_iceberg_spark.operators.text import chunk_documents

    docs = _pq(spark, sf_dir, "documents")
    return (
        chunk_documents(docs, budget=16, overlap=4)
        .orderBy("doc_id", "chunk_id")
        .limit(3000)
    )


def docs_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus card: doc counts, token mass, EXACT interpolated
    token percentiles (= ANSI quantile_cont), language diversity and the
    dominant language share."""
    from duckdb_iceberg_spark.operators.text import corpus_report

    docs = _pq(spark, sf_dir, "documents")
    return corpus_report(docs).orderBy("source")


def docs_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup of a new batch (doc_id >= 250) against the corpus
    (doc_id < 250): exact anti, within-batch LSH, then batch survivors
    verified against corpus reps sharing an LSH band."""
    from duckdb_iceberg_spark.operators.dedup import incremental_minhash_dedup

    docs = _pq(spark, sf_dir, "documents")
    mid = 250
    corpus = docs.filter(F.col("doc_id") < mid)
    new = docs.filter(F.col("doc_id") >= mid)
    out = incremental_minhash_dedup(new, corpus, num_hashes=32, bands=8)
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def docs_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails/IPv4/phones/SSN-like ids redacted with typed
    placeholders. The corpus is synthetic word-soup, so PII shapes are
    synthesized per row (deterministically from doc_id) to exercise every
    pattern on every row — the oracle replays the identical synthesis."""
    from duckdb_iceberg_spark.operators.text import redact_pii

    docs = _pq(spark, sf_dir, "documents")
    synth = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@ex.org from 10.0.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call +1 555 867 5309 ssn 123-45-6789"))
    return (
        docs.select("doc_id", redact_pii(synth).alias("redacted"))
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (NFC + lowercase + whitespace
    collapse); a decomposed-unicode prefix (E + combining acute) is
    prepended so the NFC step composes real work on every row."""
    from duckdb_iceberg_spark.operators.text import normalize_text

    docs = _pq(spark, sf_dir, "documents")
    synth = F.concat(F.lit("CAFE\u0301 "), F.substring("text", 1, 60))
    return (
        docs.select("doc_id", normalize_text(synth).alias("norm"))
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: the upper-half batch deduped against the
    lower-half corpus (one anti-join on DISTINCT corpus fingerprints)."""
    from duckdb_iceberg_spark.operators.dedup import incremental_exact_dedup

    docs = _pq(spark, sf_dir, "documents")
    mid = 250
    corpus = docs.filter(F.col("doc_id") < mid)
    new = docs.filter(F.col("doc_id") >= mid)
    out = incremental_exact_dedup(new, corpus)
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def docs_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-membership ingest dedup: the odd-id batch (plus exact copies
    of every 10th even doc under shifted ids, so the drop path provably
    fires) deduped against the even-id corpus via its Bloom sketch —
    O(m)-state batch-vs-corpus membership, the structure a 100 TB lake
    uses when the corpus fingerprint set is too big to anti-join per
    batch. Hash-checked: the oracle rebuilds the SAME m=2^16/k=4 filter
    from the same md5 bit positions, so even the (deterministic) false
    positives match bit for bit."""
    from duckdb_iceberg_spark.operators.dedup import bloom_dedup_incremental

    docs = _pq(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    copies = (corpus.filter("doc_id % 10 = 0")
              .withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
    batch = docs.filter("doc_id % 2 = 1").unionByName(copies)
    out = bloom_dedup_incremental(batch, corpus, m_bits=1 << 16, k=4)
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def docs_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.text import language_scores

    docs = _pq(spark, sf_dir, "documents")
    sc = language_scores("text")
    return (
        docs.select("doc_id", *[sc[l].cast("int").alias(f"score_{l}") for l in sorted(sc)])
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-checked: the whole LSH pipeline (collapse, shingles, minhash
    # family, banding, verify) is deterministic and replicated in DuckDB
    # (see _minhash_sql)
    from duckdb_iceberg_spark.operators.dedup import minhash_dedup

    docs = _pq(spark, sf_dir, "documents")
    return (
        minhash_dedup(docs, "text", "doc_id", num_hashes=32, bands=8)
        .agg(F.count(F.lit(1)).alias("survivors"))
    )


def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-checked: simhash64 is md5-based JVM Column math, so the DuckDB
    # oracle recomputes every bit (see _simhash_sql)
    from duckdb_iceberg_spark.operators.dedup import simhash64

    docs = _pq(spark, sf_dir, "documents")
    return simhash64(docs, "text", "doc_id").orderBy("doc_id").limit(500)


def docs_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-checked: the rolling-hash + window-min selection is replicated in
    # DuckDB via HUGEINT mod-2^64 arithmetic (see _winnow_sql)
    from duckdb_iceberg_spark.operators.text import winnow_fingerprint

    docs = _pq(spark, sf_dir, "documents")
    return (
        winnow_fingerprint(docs)
        .select("doc_id", F.size("fingerprints").alias("n_fingerprints"))
        .orderBy("doc_id")
        .limit(1000)
    )


def docs_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary: top unigrams+bigrams by global count with
    document frequency, deterministic ordering. Hash-checked — pure string
    ops + integer counts, replicated exactly in SQL."""
    from duckdb_iceberg_spark.operators.text import vocab_stats

    return vocab_stats(_pq(spark, sf_dir, "documents"), top_k=200)


def docs_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed-n-gram importance
    weights log p_target − p_raw with the English documents as the target
    corpus, then deterministic Gumbel-top-k selection. Hash-checked — each
    bucket's log-ratio and the Gumbel term round to 6dp and become
    DECIMAL(18,6) BEFORE summation, so the scores are exact decimal
    arithmetic in both engines (no float accumulation drift). Since r11
    the driver-facing columns are exact micro-unit BIGINTs
    (log_weight_micro/score_micro = value×1e6, exact — the internals are
    6dp decimals): the r10 bisect pinned the 3-round hash-red to the
    DECIMAL rendering layer (probes green, rows/schema matching, and the
    only DECIMAL-output window queries were exactly the two reds), so the
    driver-facing output uses the integer representation the probes
    proved renders identically everywhere (VERDICT r10 task 1)."""
    from duckdb_iceberg_spark.operators.sampling import dsir_resample

    docs = _pq(spark, sf_dir, "documents")
    return dsir_resample(docs, None, 200, target_cond="lang = 'en'",
                         micro_units=True)


def docs_dsir_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-bisect probe carried NEXT TO docs_dsir_sample in the r10
    driver window (VERDICT r9 task 1b): the resampler's integer inputs —
    per-bucket raw/target gram counts through the operator's own
    tokenize/bucket chain, and each doc's hex32(md5(id||salt)) Gumbel
    input computed JVM-side. Hash-checked; no floats anywhere, so a red
    row localizes the diverging stage while the sample query's own red
    (if it persists) is pinned to the literal/decimal layer."""
    from duckdb_iceberg_spark.operators.sampling import dsir_probe

    docs = _pq(spark, sf_dir, "documents")
    return dsir_probe(docs, "lang = 'en'")


def docs_lm_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-bisect probe carried NEXT TO docs_lm_score in the r10 driver
    window (VERDICT r9 task 1b): the scorer's integer/string
    intermediates — per-doc token counts, the counted vocabulary, the
    bigram model, the context counts — through the scorer's own fit code
    (operators.text._lm_fit). Hash-checked; no floats anywhere."""
    from duckdb_iceberg_spark.operators.text import lm_probe

    docs = _pq(spark, sf_dir, "documents")
    return lm_probe(docs, reference_cond="lang = 'en'", vocab_size=1024)


def docs_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters: exact + verified near-dup edges run
    through the alternating large-star/small-star connected-components
    algorithm; every doc labels with its cluster's min id. Hash-checked —
    the DuckDB oracle computes true components with a recursive CTE
    (min reachable id over the symmetrized edge set), so the distributed
    star algorithm must agree exactly, cluster by cluster."""
    from duckdb_iceberg_spark.operators.dedup import duplicate_components

    docs = _pq(spark, sf_dir, "documents")
    out = duplicate_components(docs, num_hashes=32, bands=8).orderBy("doc_id")
    return out


def docs_dup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup (NEW r14 — the SlimPajama loss-weighting rule): every
    doc keeps weight_micro = floor(1e6 / cluster_size) instead of being
    dropped. Hash-checked: the oracle recomputes TRUE components
    (recursive CTE), window-counts cluster sizes, and replays the exact
    integer weight arithmetic — a wrong cluster label or size changes
    the per-language effective-size sums."""
    from duckdb_iceberg_spark.operators.dedup import duplication_weights

    docs = _pq(spark, sf_dir, "documents")
    w = duplication_weights(docs, num_hashes=32, bands=8)
    return (
        w.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("weight_micro").cast("long").alias("eff_micro"),
             F.max("cluster_size").cast("long").alias("max_cluster"))
        .orderBy("lang")
    )


def docs_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-weighted temperature sampling (NEW r15 — VERDICT r14 task
    8): duplication_weights' cluster sizes drive a per-member keep
    probability s^(α-1) (expected surviving mass per cluster ∝ s^α — the
    D4/SemDeDup soft-selection step, consuming the weights r14 only
    produced), realized by the deterministic md5-threshold sampler.
    Hash-checked: the oracle recomputes TRUE components (recursive CTE),
    window-counts cluster sizes, and replays the per-size threshold
    literals computed by the SAME CPython decimal exp/ln chain — a wrong
    cluster size, threshold, or keep decision changes the per-language
    survivor sums."""
    from duckdb_iceberg_spark.operators.dedup import duplication_weights
    from duckdb_iceberg_spark.operators.sampling import (
        cluster_temperature_sample,
    )

    docs = _pq(spark, sf_dir, "documents")
    w = duplication_weights(docs, num_hashes=32, bands=8)
    labeled = docs.select("doc_id", "lang", "n_chars").join(w, "doc_id")
    kept = cluster_temperature_sample(labeled, alpha=0.5, salt="csamp15")
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"),
             F.sum("n_chars").cast("long").alias("kept_chars"),
             F.sum("weight_micro").cast("long").alias("kept_eff_micro"),
             F.max("cluster_size").cast("long").alias("max_cluster"))
        .orderBy("lang")
    )


def docs_dup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative curation (NEW r13 — the FineWeb keep-best
    rule): duplicate clusters via banded LSH + star components, then
    keep the LONGEST member of each cluster (ties: smaller doc_id) —
    unlike keep-component-min, this is the quality-aware decision
    production dedup actually ships. Hash-checked: the oracle recomputes
    TRUE components (recursive CTE) and replays the argmax-by-(n_chars,
    -doc_id) window, so a wrong component label, a lost singleton, or a
    tie broken the other way all change the kept set."""
    from duckdb_iceberg_spark.operators.dedup import keep_best_per_cluster

    docs = _pq(spark, sf_dir, "documents")
    kept = keep_best_per_cluster(docs, "n_chars", num_hashes=32, bands=8)
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"),
             F.sum("n_chars").cast("long").alias("kept_chars"),
             F.sum("cluster_size").cast("long").alias("covered_docs"))
        .orderBy("lang")
    )


def docs_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram LM scoring (KenLM-perplexity analogue): Laplace
    bigram model trained on the lang='en' slice, every doc scored by
    negative log-likelihood. Hash-checked — per-bigram log-probs are
    computed ONCE driver-side (laplace_lp6) and replayed into both
    engines as DECIMAL literals summed exactly (the r8 driver's DuckDB
    recomputed ln() with a different libm and flipped 6dp boundaries);
    avg_nll rounds half-up in exact micro-unit integer arithmetic. Since
    r11 the driver-facing score columns are exact micro-unit BIGINTs
    (nll_sum_micro/avg_nll_micro = value×1e6; the half-up quotient is an
    integer before the final divide, which this output simply skips):
    the r10 bisect pinned the 3-round hash-red to the DECIMAL rendering
    layer (VERDICT r10 task 1), and a BIGINT has exactly one rendering —
    the representation the green integer probes proved end-to-end."""
    from duckdb_iceberg_spark.operators.text import ngram_lm_score

    docs = _pq(spark, sf_dir, "documents")
    return ngram_lm_score(
        docs, reference_cond="lang = 'en'", vocab_size=1024,
        micro_units=True,
    ).orderBy("doc_id")


def docs_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split: per-language perplexity terciles of
    the bigram-LM NLL. Hash-checked — thresholds are exact percentiles
    (percentile == quantile_cont, the corpus_report pairing) rounded to
    6dp over 6dp-rounded scores."""
    from duckdb_iceberg_spark.operators.text import lm_perplexity_buckets

    docs = _pq(spark, sf_dir, "documents")
    return lm_perplexity_buckets(
        docs, reference_cond="lang = 'en'", vocab_size=1024
    ).orderBy("doc_id")


def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-trained quality classifier (NEW r11) — the fastText-style
    quality-filter stage of GPT-3/DCLM pipelines (Brown et al. 2020
    App. A; Li et al. 2024), as a closed-form multinomial Naive Bayes so
    training is two bounded aggregations and the per-doc logit replays
    bit-for-bit cross-engine. Positive seed = the lang='en' slice (the
    LM family's reference slice); output is the exact micro-unit BIGINT
    logit + the keep/drop boolean a filter thresholds on. Hash-checked —
    per-token log-odds are computed ONCE driver-side (laplace_lp6 diffs
    over realized per-class counts) and replayed into both engines as
    DECIMAL literals summed exactly (the LM-family contract; integer
    outputs per the r10 rendering lesson, VERDICT r10 task 1)."""
    from duckdb_iceberg_spark.operators.classify import nb_quality_score

    docs = _pq(spark, sf_dir, "documents")
    return nb_quality_score(
        docs, positive_cond="lang = 'en'", vocab_size=1024
    ).orderBy("doc_id")


def docs_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 tf-idf terms (smooth idf). Hash-checked — the oracle
    replays idf as per-df DOUBLE literals (CPython libm) instead of
    DuckDB-side ln(); residual is the documented ≤1-ulp JVM-F.log class
    on the Spark side, damped by round-then-rank ordering."""
    from duckdb_iceberg_spark.operators.text import tfidf_top_terms

    docs = _pq(spark, sf_dir, "documents")
    return (
        tfidf_top_terms(docs, top_n=3)
        .select("doc_id", "term", "tf", "score", "rank")
        .orderBy("doc_id", "rank")
    )


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-checked: _mm_docs blobs are UTF-8 text (never RIFF/WAVE), so the
    # default decoder deterministically takes its md5-fake path, which the
    # DuckDB oracle recomputes exactly; real WAV bytes would decode for
    # real (decode_wav) and need an oracle update. The mapInPandas
    # plumbing is the production path either way.
    from duckdb_iceberg_spark.operators.multimodal import extract_audio_features

    feats = extract_audio_features(_mm_docs(spark, sf_dir))
    return (
        feats.select("id", "n_bytes", "duration_ms", "sample_rate")
        .orderBy("id")
        .limit(500)
    )


def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.similarity import cosine_topk

    emb = _pq(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    return cosine_topk(emb.filter("vec_id != 0"), qvec, k=10).select("vec_id")


def emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k: probe only the query's sign bucket
    (~2^-b of the corpus scanned). Hash-checked — the DuckDB oracle
    replicates the hyperplane signs and bucket filter exactly."""
    from duckdb_iceberg_spark.operators.similarity import cosine_topk_lsh

    emb = _pq(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    return cosine_topk_lsh(emb.filter("vec_id != 0"), qvec, k=10,
                           n_planes=6).select("vec_id")


def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (Jegou et al. 2011): bounded-sample
    codebook fit, m-byte codes, ADC literal-table scoring (JVM-side
    codegen, no Python in the scan), TakeOrdered top-k. Hash-checked
    since r8: the fit is deterministic (seeded init, xxhash64-ordered
    sample), so the oracle builder re-trains the SAME codebooks
    driver-side (pure-Python xxhash64 replica + _pq_fit) and replays
    encode (left-to-right squared-distance chains, ties-to-lowest
    argmin) and ADC scoring as SQL literals — every distance is
    bit-identical IEEE double math in both engines."""
    from duckdb_iceberg_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = _pq(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    corpus = emb.filter("vec_id != 0")
    books = pq_train(corpus, m=4, k=16)
    codes = pq_encode(corpus, books)
    return pq_topk(codes, books, qvec, topk=10)


def emb_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8-style) ANN top-k (NEW r12 — the faiss
    ScalarQuantizer/QT_8bit analogue completing the ANN family beside
    brute/LSH/IVF/PQ): per-dimension min/max bounds from ONE distributed
    aggregate, 8-bit codes computed JVM-side, ranking by the INTEGER dot
    product of codes (monotone cosine surrogate on normalized
    embeddings), TakeOrdered. Hash-checked with no float in the output:
    the oracle re-derives the bounds independently in DuckDB, replays
    the identical binary64 quantization expression as literals, and the
    integer scores match exactly."""
    from duckdb_iceberg_spark.operators.similarity import (
        sq_encode,
        sq_quantize_query,
        sq_topk,
        sq_train,
    )

    emb = _pq(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    corpus = emb.filter("vec_id != 0")
    bounds = sq_train(corpus)
    codes = sq_encode(corpus, bounds)
    return sq_topk(codes, sq_quantize_query(qvec, bounds), topk=10)


def docs_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mini-BPE tokenizer prep (NEW r12 — the tokenizer-aware sibling of
    the whitespace/regex token counters): train 64 merges on a bounded
    deterministic xxhash64-ordered sample (driver-side, O(sample) at any
    corpus size — the PQ-codebook precedent), apply them distributed via
    an Arrow-batched pandas UDF (BPE's greedy merge loop is the textbook
    python-unavoidable case), aggregate subword-token stats per language.
    Hash-checked: operator and oracle builder execute the SAME CPython
    fit/apply functions, so every count is an exact engine-independent
    integer replayed as literals."""
    from duckdb_iceberg_spark.operators.bpe import bpe_token_counts, bpe_train

    docs = _pq(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=64, sample_size=1024)
    c = bpe_token_counts(docs, merges)
    return (
        c.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("bpe_tokens").alias("sum_tokens"),
             F.min("bpe_tokens").alias("min_tokens"),
             F.max("bpe_tokens").alias("max_tokens"))
        .orderBy("lang")
    )


def docs_ngram_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard dedup (documented quadratic — the within-bucket
    refinement path; minhash is the corpus-scale entry). Hash-checked
    against a DuckDB replica of the gram/Jaccard pipeline."""
    from duckdb_iceberg_spark.operators.dedup import ngram_jaccard_dedup

    docs = _pq(spark, sf_dir, "documents")
    return ngram_jaccard_dedup(docs, n=3, threshold=0.8).agg(
        F.count(F.lit(1)).alias("survivors"),
        F.sum("doc_id").cast("long").alias("id_sum"))


def emb_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only: multi-query knn join (window over crossJoin)
    from duckdb_iceberg_spark.operators.similarity import knn_join

    emb = _pq(spark, sf_dir, "embeddings")
    queries_df = (
        emb.filter("vec_id IN (0, 1, 2)")
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    return (
        knn_join(emb.filter("vec_id > 2"), queries_df, k=5)
        .select("q_id", "vec_id", "rank")
        .orderBy("q_id", "rank")
    )


def emb_knn_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SRP-bucket equi-join knn for query sets too large to broadcast — no
    # crossJoin in the plan (asserted in
    # tests/test_operators.py::test_knn_join_bucketed_no_cross_join).
    # Hash-checked since r6: the DuckDB oracle replays the deterministic
    # probe math (base bucket + least-confident bit flips) exactly.
    from duckdb_iceberg_spark.operators.similarity import knn_join_bucketed

    emb = _pq(spark, sf_dir, "embeddings")
    queries_df = (
        emb.filter("vec_id IN (0, 1, 2)")
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    return (
        knn_join_bucketed(emb.filter("vec_id > 2"), queries_df, k=5,
                          n_planes=6, nprobe=3)
        .select("q_id", "vec_id", "rank")
        .orderBy("q_id", "rank")
    )


def stream_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-incremental read: only the rows appended after snapshot 1
    of the two-append nation fixture."""
    from duckdb_iceberg_spark.streaming import incremental_scan

    loc, snap1 = _ice_nation_tt(spark, sf_dir)
    return (
        incremental_scan(spark, loc, from_snapshot_id=snap1)
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


def _ice_orders_changelog(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Changelog fixture: even-key orders, then append odd-key orders,
    then a MoR delete of key%7=0 — two change ordinals after snapshot 1."""
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        orders = _pq(spark, sf_dir, "orders")
        tm = write_iceberg(orders.filter("o_orderkey % 2 = 0"), loc)
        first = tm.current_snapshot_id
        write_iceberg(orders.filter("o_orderkey % 2 = 1"), loc)
        delete_from(spark, loc, "o_orderkey % 7 = 0", mode="merge-on-read")
        with open(os.path.join(loc, "_SNAP1"), "w") as fh:
            fh.write(str(first))

    loc = _build_once(sf_dir, "orders_changelog", build)
    with open(os.path.join(loc, "_SNAP1")) as fh:
        return loc, int(fh.read())


def stream_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC between snapshots: ordinal 0 inserts the odd-key
    append, ordinal 1 deletes the key%7=0 rows (MoR positional deletes
    diffed per touched file)."""
    from duckdb_iceberg_spark.streaming.changelog import changelog_scan

    loc, snap1 = _ice_orders_changelog(spark, sf_dir)
    ch = changelog_scan(spark, loc, from_snapshot_id=snap1)
    return (
        ch.groupBy("_change_ordinal", "_change_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("o_orderkey").alias("key_sum"))
        .orderBy("_change_ordinal", "_change_type")
    )


def stream_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window over the events table (unified helper —
    identical semantics on readStream inputs)."""
    from duckdb_iceberg_spark.streaming import tumbling_agg

    ev = _events_with_ts(spark, sf_dir)
    agg = tumbling_agg(
        ev, "ts", "1 hour",
        {"cnt": F.count(F.lit(1)), "sum_value": _dec_sum(F.col("value"), 6)},
        keys=["event_type"],
    )
    return (
        agg.select(F.col("window_start").cast("string").alias("window_start"),
                   "event_type", "cnt", "sum_value")
        .orderBy("window_start", "event_type")
        .limit(500)
    )


def stream_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per event_type — the stateful
    merge-on-overlap window Structured Streaming tracks with watermark
    state; identical semantics on this batch input. Oracle: gaps-and-islands
    in DuckDB (break when ts - prev_ts >= gap; session end = last + gap)."""
    from duckdb_iceberg_spark.streaming import session_agg

    ev = _events_with_ts(spark, sf_dir)
    agg = session_agg(
        ev, "ts", "10 minutes",
        {"cnt": F.count(F.lit(1)), "sum_value": _dec_sum(F.col("value"), 6)},
        keys=["event_type"],
    )
    return (
        agg.select(F.col("session_start").cast("string").alias("session_start"),
                   F.col("session_end").cast("string").alias("session_end"),
                   "event_type", "cnt", "sum_value")
        .orderBy("session_start", "event_type")
        .limit(500)
    )


def stream_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h wide, 30 min slide) per event_type —
    each event lands in exactly two windows. Oracle: unnest the two
    epoch-aligned candidate window starts per event in DuckDB."""
    from duckdb_iceberg_spark.streaming import sliding_agg

    ev = _events_with_ts(spark, sf_dir)
    agg = sliding_agg(
        ev, "ts", "1 hour", "30 minutes",
        {"cnt": F.count(F.lit(1)), "sum_value": _dec_sum(F.col("value"), 6)},
        keys=["event_type"],
    )
    return (
        agg.select(F.col("window_start").cast("string").alias("window_start"),
                   "event_type", "cnt", "sum_value")
        .orderBy("window_start", "event_type")
        .limit(500)
    )


def _ice_stream_sink(spark: SparkSession, sf_dir: str) -> str:
    """supplier streamed file-by-file into an Iceberg table via the
    foreachBatch sink (availableNow), checkpointed for exactly-once."""
    def build(loc: str) -> None:
        import tempfile

        from duckdb_iceberg_spark.streaming import iceberg_sink

        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "src")
            (_pq(spark, sf_dir, "supplier").repartition(4)
             .write.parquet(src, mode="overwrite"))
            schema = _pq(spark, sf_dir, "supplier").schema
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            q = (stream.writeStream
                 .foreachBatch(iceberg_sink(loc, query_id="bench-sink"))
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination(300)

    return _build_once(sf_dir, "supplier_stream_sink", build)


def stream_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows streamed through the exactly-once Iceberg sink must aggregate
    identically to the batch source table."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_stream_sink(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum(F.col("s_acctbal"), 6).alias("sum_bal"))
        .orderBy("s_nationkey")
    )


def _ice_stream_upserted(spark: SparkSession, sf_dir: str) -> str:
    """CDC micro-batches through the r12 UPSERT sink: batch 0 streams the
    whole corpus, batch 1 re-sends every doc_id % 5 == 0 key with
    n_chars+1000, batch 2 re-sends every doc_id % 10 == 0 key with
    n_chars+5000. Keep-LAST per key is forced by the sink's
    equality-delete semantics (later batch deletes earlier rows), so the
    final state is pure SQL: +5000 for %10 keys, else +1000 for %5 keys,
    else raw. File mtimes force the FileStreamSource batch order."""
    def build(loc: str) -> None:
        import tempfile
        import time as _time

        from duckdb_iceberg_spark.streaming import iceberg_upsert_sink

        docs = _pq(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        src_dir = tempfile.mkdtemp(prefix="stream_upsert_src")
        data_dir = os.path.join(src_dir, "data")
        batches = [
            docs,
            docs.filter("doc_id % 5 = 0")
                .withColumn("n_chars", F.col("n_chars") + F.lit(1000)),
            docs.filter("doc_id % 10 = 0")
                .withColumn("n_chars", F.col("n_chars") + F.lit(5000)),
        ]
        for i, b in enumerate(batches):
            p = os.path.join(data_dir, f"b{i}")
            b.coalesce(1).write.mode("overwrite").parquet(p)
            t = _time.time() - 300 + i * 60
            for root, _d, fs in os.walk(p):
                for f in fs:
                    os.utime(os.path.join(root, f), (t, t))
        stream = (spark.readStream
                  .schema("doc_id long, lang string, n_chars long")
                  .option("maxFilesPerTrigger", 1)
                  .option("latestFirst", "false")
                  .parquet(os.path.join(data_dir, "*")))
        q = (stream.writeStream
             .foreachBatch(iceberg_upsert_sink(loc, ["doc_id"],
                                               query_id="upsq"))
             .option("checkpointLocation",
                     os.path.join(src_dir, "_ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(300)

    return _build_once(sf_dir, "stream_upserted", build)


def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 streaming CDC-upsert sink end-to-end (the Flink upsert-sink
    pattern): three ordered micro-batches where later batches re-send
    keys with bumped values; equality-delete upserts keep the LAST
    version per key. Hash-checked: the oracle replays the keep-last
    arithmetic from the raw rows — a lost delete (stale duplicate kept)
    or a mis-ordered batch changes counts and sums."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_stream_upserted(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_chars").cast("long").alias("sum_chars"))
        .orderBy("lang")
    )


def _ice_stream_curated(spark: SparkSession, sf_dir: str) -> str:
    """The streaming-ingest curation pipeline: documents arrive in four
    ascending doc_id-range batches (file mtimes force the FileStreamSource
    order); each micro-batch is quality-filtered (alpha_ratio >= 0.55),
    exact-deduped within itself (min doc_id per fingerprint), anti-joined
    against the fingerprints already committed to the lake, and appended
    through the exactly-once Iceberg sink. Ascending ranges make
    first-seen == global-min-doc_id, so the final table is deterministic
    and SQL-expressible.

    The raw corpus has no exact duplicates below sf0.1, so the source
    re-appends a copy of every doc_id % 7 == 0 document at a shifted id —
    the copies land in later batches than their originals, so a broken
    cross-batch anti-join would append them and fail the oracle's counts
    (the oracle replays the identical synthesis)."""
    def build(loc: str) -> None:
        import tempfile
        import time as _time

        from duckdb_iceberg_spark import iceberg_scan
        from duckdb_iceberg_spark.operators.text import (doc_fingerprint,
                                                         quality_signals)
        from duckdb_iceberg_spark.streaming import iceberg_sink

        docs = _pq(spark, sf_dir, "documents")
        n_batches = 4
        hi = docs.agg(F.max("doc_id")).first()[0] + 1
        copies = (docs.filter(F.col("doc_id") % 7 == 0)
                  .withColumn("doc_id", (F.col("doc_id") + F.lit(hi))
                              .cast("long")))
        docs = docs.unionByName(copies)
        step = (2 * hi + n_batches - 1) // n_batches

        def curate(batch_df: DataFrame) -> DataFrame:
            s = quality_signals(F.col("text"))
            b = (batch_df.filter(s["alpha_ratio"] >= 0.55)
                 .withColumn("fingerprint", doc_fingerprint("text")))
            keep = b.groupBy("fingerprint").agg(
                F.min("doc_id").alias("doc_id"))
            b = b.join(keep, ["doc_id", "fingerprint"], "left_semi")
            if os.path.exists(os.path.join(loc, "metadata")):
                seen = iceberg_scan(spark, loc) \
                    .select("fingerprint").distinct()
                b = b.join(seen, "fingerprint", "left_anti")
            return b

        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "src")
            os.makedirs(src)
            now = _time.time()
            for i in range(n_batches):
                part = os.path.join(tmp, f"stage{i}")
                (docs.filter((F.col("doc_id") >= i * step)
                             & (F.col("doc_id") < (i + 1) * step))
                 .coalesce(1).write.parquet(part, mode="overwrite"))
                pq_file = next(f for f in os.listdir(part)
                               if f.endswith(".parquet"))
                dst = os.path.join(src, f"{i:04d}.parquet")
                shutil.copyfile(os.path.join(part, pq_file), dst)
                # ascending mtimes pin the FileStreamSource batch order
                os.utime(dst, (now - 400 + i * 100, now - 400 + i * 100))
            stream = (spark.readStream.schema(docs.schema)
                      .option("maxFilesPerTrigger", 1)
                      .option("latestFirst", "false").parquet(src))
            q = (stream.writeStream
                 .foreachBatch(iceberg_sink(loc, query_id="curation-sink",
                                            transform=curate))
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination(300)

    return _build_once(sf_dir, "documents_stream_curated_v2", build)


def _ice_stream_minhash(spark: SparkSession, sf_dir: str) -> str:
    """Streaming NEAR-dup curation: batch 0 seeds the lake with the raw
    doc_id < 250 half; batch 1 (the rest + synthesized near-copies:
    every doc_id % 11 == 0 document re-appended at a shifted id with a
    ' near dup tail' suffix) runs incremental_minhash_dedup against the
    COMMITTED corpus re-read from the lake, then appends exactly-once.
    Copies of corpus-half docs exercise the cross-corpus band verify;
    copies of batch-half docs exercise the within-batch LSH path. At
    100 TB the corpus signatures come from a precomputed side table
    (incremental_minhash_dedup's corpus_signatures argument) instead of
    the text re-scan this fixture-sized pipeline does."""
    def build(loc: str) -> None:
        import tempfile
        import time as _time

        from duckdb_iceberg_spark import iceberg_scan
        from duckdb_iceberg_spark.operators.dedup import (
            incremental_minhash_dedup,
        )
        from duckdb_iceberg_spark.streaming import iceberg_sink

        docs = _pq(spark, sf_dir, "documents").select("doc_id", "text", "lang")
        hi = docs.agg(F.max("doc_id")).first()[0] + 1
        near = (docs.filter(F.col("doc_id") % 11 == 0)
                .select((F.col("doc_id") + F.lit(hi)).cast("long")
                        .alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" near dup tail"))
                        .alias("text"),
                        "lang"))
        alld = docs.unionByName(near)
        split = 250

        def curate(batch_df: DataFrame) -> DataFrame:
            if not os.path.exists(os.path.join(loc, "metadata")):
                return batch_df  # seed batch: raw corpus half
            corpus = iceberg_scan(spark, loc).select("doc_id", "text")
            return incremental_minhash_dedup(
                batch_df, corpus, num_hashes=32, bands=8)

        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "src")
            os.makedirs(src)
            now = _time.time()
            for i, part_df in enumerate(
                    (alld.filter(F.col("doc_id") < split),
                     alld.filter(F.col("doc_id") >= split))):
                part = os.path.join(tmp, f"stage{i}")
                part_df.coalesce(1).write.parquet(part, mode="overwrite")
                pq_file = next(f for f in os.listdir(part)
                               if f.endswith(".parquet"))
                dst = os.path.join(src, f"{i:04d}.parquet")
                shutil.copyfile(os.path.join(part, pq_file), dst)
                os.utime(dst, (now - 400 + i * 100, now - 400 + i * 100))
            stream = (spark.readStream.schema(alld.schema)
                      .option("maxFilesPerTrigger", 1)
                      .option("latestFirst", "false").parquet(src))
            q = (stream.writeStream
                 .foreachBatch(iceberg_sink(loc, query_id="minhash-sink",
                                            transform=curate))
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination(300)
            spark.catalog.clearCache()

    return _build_once(sf_dir, "stream_minhash", build)


def stream_minhash_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the streaming near-dup ingest (incremental MinHash
    vs the committed lake + exactly-once sink): per-language survivor
    counts. Hash-checked — the oracle replays the seed half, the
    synthesized near-copies, and the full incremental LSH/verify chain."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_stream_minhash(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("survivors"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
        .orderBy("lang")
    )


def stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the streaming curation pipeline (quality filter +
    cross-batch exact dedup + exactly-once Iceberg sink): per-language
    survivor counts and character mass, equal to a batch curation of the
    whole corpus."""
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_stream_curated(spark, sf_dir)
    return (
        iceberg_scan(spark, loc)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("survivors"),
             F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


def _stream_dedup_ttl_out(spark: SparkSession, sf_dir: str) -> str:
    """Fixture for the TTL-bounded streaming key dedup
    (streaming/stateful.py:dedup_keys_ttl): two phases whose emitted rows
    are fully deterministic because every key appears at most once per
    micro-batch (one file per batch, maxFilesPerTrigger=1, mtime-pinned
    order) and the wall-clock sleeps strictly dominate/undershoot the TTL.

    Phase 1 (ttl = 10 min, two availableNow runs sharing a checkpoint —
    one appended Iceberg snapshot consumed per run):
      b0 = documents [0,200)            -> all first-seen, emitted
      b1 = the same 200 keys again      -> inside TTL, suppressed
           + documents [200,300)        -> new keys, emitted
    Phase 2 (ttl = 1.5 s, two runs sharing a checkpoint, 4 s apart):
      b2 = documents [300,400)          -> first-seen, emitted
      (sleep 4 s > ttl: markers expire and are GC'd via the re-armed
       ProcessingTimeTimeout)
      b3 = the same 100 keys again      -> past TTL, re-admitted by design

    The stream source is the package's own iceberg_inc data source (each
    batch appended as one Iceberg snapshot) rather than Spark's
    FileStreamSource: FlatMapGroupsWithStateExec.shouldRunAnotherBatch
    returns true whenever processing-time timeouts are registered, which
    makes availableNow over a file source loop empty micro-batches
    indefinitely; the Python-data-source availableNow wrapper stops at the
    captured end offset instead.

    Emitted rows land in plain parquet under <loc>/p1 and <loc>/p2; the
    batch tag travels IN the rows, so a suppression or re-admission bug
    changes the per-tag aggregate the oracle pins."""
    def build(loc: str) -> None:
        import tempfile
        import time as _time

        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.streaming import (dedup_keys_ttl,
                                                    register_stream_source)

        register_stream_source(spark)
        docs = _pq(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("key"), F.col("n_chars").cast("long"))

        def slice_tagged(lo: int, hi: int, tag: str) -> DataFrame:
            return (docs.filter((F.col("key") >= lo) & (F.col("key") < hi))
                    .select("key", F.lit(tag).alias("tag"), "n_chars"))

        def run(tbl: str, ckpt: str, out: str, ttl_ms: int) -> None:
            stream = (spark.readStream.format("iceberg_inc")
                      .option("path", tbl).option("starting", "earliest")
                      .option("max_snapshots_per_trigger", 1).load())
            q = (dedup_keys_ttl(stream, ["key"], ttl_ms=ttl_ms)
                 .writeStream.format("parquet").option("path", out)
                 .outputMode("append").option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)

        os.makedirs(loc, exist_ok=True)
        with tempfile.TemporaryDirectory() as tmp:
            # phase 1: suppression inside a generous TTL (two runs, well
            # inside the 10-minute window even on a loaded box)
            t1 = os.path.join(tmp, "t1")
            ckpt1 = os.path.join(tmp, "ckpt1")
            out1 = os.path.join(loc, "p1")
            write_iceberg(slice_tagged(0, 200, "b0"), t1)
            run(t1, ckpt1, out1, ttl_ms=600_000)
            write_iceberg(slice_tagged(0, 200, "b1").unionByName(
                slice_tagged(200, 300, "b1")), t1)
            run(t1, ckpt1, out1, ttl_ms=600_000)
            # phase 2: expiry + re-admission across a short TTL
            t2 = os.path.join(tmp, "t2")
            ckpt2 = os.path.join(tmp, "ckpt2")
            out2 = os.path.join(loc, "p2")
            write_iceberg(slice_tagged(300, 400, "b2"), t2)
            run(t2, ckpt2, out2, ttl_ms=1_500)
            _time.sleep(4.0)  # strictly past the 1.5 s TTL
            write_iceberg(slice_tagged(300, 400, "b3"), t2)
            run(t2, ckpt2, out2, ttl_ms=1_500)

    return _build_once(sf_dir, "stream_dedup_ttl_v1", build)


def stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch-tag aggregate of the TTL streaming dedup's emitted rows:
    b0 (200 first-seen) + b1 (100 new keys; 200 repeats suppressed) +
    b2 (100 first-seen) + b3 (the same 100, re-admitted past the TTL)."""
    p1 = spark.read.parquet(os.path.join(
        _stream_dedup_ttl_out(spark, sf_dir), "p1"))
    p2 = spark.read.parquet(os.path.join(
        _stream_dedup_ttl_out(spark, sf_dir), "p2"))
    return (
        p1.unionByName(p2)
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("key").alias("id_sum"),
             F.sum("n_chars").alias("chars_sum"))
        .orderBy("tag")
    )


def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-checked since r8: the hash-sampled centroids are deterministic,
    # so the oracle replays assignment + probe + cosine top-k from
    # centroid literals (see _ivf_topk_sql)
    from duckdb_iceberg_spark.operators.similarity import ivf_topk

    emb = _pq(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    return ivf_topk(emb.filter("vec_id != 0"), qvec, k=10,
                    n_centroids=16, nprobe=4).select("vec_id", "similarity")


def emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-checked: SRP buckets + pairwise cosine are deterministic float
    # math replicated promotion-for-promotion in DuckDB (see _neardup_sql)
    from duckdb_iceberg_spark.operators.dedup import embedding_neardup

    emb = _pq(spark, sf_dir, "embeddings")
    return embedding_neardup(emb, threshold=0.99).agg(
        F.count(F.lit(1)).alias("survivors"))


def _mm_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fixture derived from documents: the text bytes stand in
    for an opaque media blob; duration scales with length."""
    return (
        _pq(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").alias("id"),
            F.encode("text", "utf-8").alias("blob"),
            (F.col("n_chars").cast("long") * 10).alias("duration_ms"),
        )
    )


def mm_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dedup: dHash -> 16-bit-band LSH -> exact
    Hamming verify -> drop higher ids. The _mm_docs text blobs always take
    the md5-grid fake pixel path, so the DuckDB oracle recomputes every
    grid byte, every dHash bit, the band chunks, and bit_count(xor)
    verification — hash-checked end to end. Real BMP/PNG/JPEG pixels
    exercise the same operator in tests/test_operators.py."""
    from duckdb_iceberg_spark.operators.multimodal import (
        image_dhash,
        image_neardup,
    )

    docs = _mm_docs(spark, sf_dir)
    # testdata texts are all distinct, so synthesize byte-identical blob
    # copies (hamming 0) — the drop path must actually fire for the row
    # to mean anything; every +100000 copy must lose to its original
    dups = docs.filter("id < 50").select(
        (F.col("id") + 100000).alias("id"), "blob", "duration_ms")
    allb = docs.unionByName(dups)
    h = image_dhash(allb).persist()
    h.count()  # one decode pass serves the dedup AND the output join
    surv = image_neardup(allb, max_hamming=6, hashes=h)
    return surv.select("id").join(h, "id").orderBy("id")


def mm_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-audio-hash near-dedup (Haitsma-Kalker double-difference
    bits over a 9x9 spectral-energy grid): the text blobs take the
    md5-grid fake path, so the oracle replays every grid byte and bit;
    real WAV spectra exercise the same operator in tests. Synthesized
    byte-identical copies make the drop path fire."""
    from duckdb_iceberg_spark.operators.multimodal import (
        audio_fingerprint,
        audio_neardup,
    )

    docs = _mm_docs(spark, sf_dir)
    dups = docs.filter("id < 50").select(
        (F.col("id") + 100000).alias("id"), "blob", "duration_ms")
    allb = docs.unionByName(dups)
    h = audio_fingerprint(allb).persist()
    h.count()  # one decode pass serves the dedup AND the output join
    surv = audio_neardup(allb, max_hamming=6, hashes=h)
    return surv.select("id").join(h, "id").orderBy("id")


def mm_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dedup by frame-hash temporal voting: per-frame dHashes
    (md5-grid fake path — no codec in this container) joined on
    (frame_ts, fhash), pairs dropping when >= 80% of the longer video's
    frames match. Synthesized byte-identical copies fire the drop path;
    the oracle replays frames via range(), every grid byte, and the
    vote."""
    from duckdb_iceberg_spark.operators.multimodal import (
        video_frame_hashes,
        video_neardup,
    )

    docs = _mm_docs(spark, sf_dir)
    dups = docs.filter("id < 50").select(
        (F.col("id") + 100000).alias("id"), "blob", "duration_ms")
    allb = docs.unionByName(dups)
    surv = video_neardup(allb, every_ms=1000)
    counts = (video_frame_hashes(allb)
              .groupBy("id").agg(F.count(F.lit(1)).alias("n_frames")))
    return surv.select("id").join(counts, "id").orderBy("id")


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _mm_docs blobs are UTF-8 text, which can never satisfy the stdlib
    # BMP/PNG magic+header checks, so the default decoder deterministically
    # takes its md5-fake path here and the SQL oracle recomputes every
    # output. If this fixture ever carries REAL image bytes, the _MM_HASH
    # oracle must be updated to the real decoder's math. feat_sum256 =
    # sum(feature)*256: each element is k/256 with k in 0..255, exact in
    # float32 and double, so the scaled sum is an exact integer in both
    # engines.
    from duckdb_iceberg_spark.operators.multimodal import extract_image_features

    feats = extract_image_features(_mm_docs(spark, sf_dir))
    return (
        feats.select("id", "n_bytes", "width", "height",
                     (F.aggregate("feature", F.lit(0.0), lambda a, x: a + x)
                      * 256).cast("long").alias("feat_sum256"))
        .orderBy("id")
        .limit(500)
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.multimodal import frame_sample_plan

    plan = frame_sample_plan(_mm_docs(spark, sf_dir), every_ms=1000)
    return (
        plan.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_frames"),
             F.max("frame_ts_ms").alias("last_ts"))
        .orderBy("id")
        .limit(1000)
    )



def mm_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same fixture contract as mm_image_features: _mm_docs blobs are UTF-8
    # text, which can never carry the ISO-BMFF ftyp magic, so
    # extract_video_meta deterministically takes its md5-fake path and the
    # SQL oracle recomputes every output. Real MP4 bytes take the real
    # stdlib box parse (tests/test_operators.py::test_mp4_metadata_parse).
    from duckdb_iceberg_spark.operators.multimodal import extract_video_meta

    return (
        extract_video_meta(_mm_docs(spark, sf_dir))
        .select("id", "duration_ms", "width", "height", "n_tracks", "n_bytes")
        .orderBy("id")
        .limit(500)
    )


# bucket[16] of p_partkey 0..499 under the Iceberg long hash convention
# ((murmur3_32(little-endian 8 bytes) & 0x7FFFFFFF) % 16), generated once
# from a standalone scalar murmur3 validated against the spec vector
# murmur3(long 34) == 2017239379 (Iceberg spec Appendix B; reference
# src/storage/iceberg_hash.cpp). Part keys are contiguous from 0 in every
# testdata sf, so the first-500 scan always lands inside this table.
_BUCKET16_PARTKEY = [
    12, 4, 4, 3, 6, 7, 1, 3, 15, 7, 12, 7, 4, 13, 9, 8, 10, 3, 12, 6, 3, 9,
    13, 5, 4, 3, 10, 4, 1, 0, 11, 9, 9, 13, 3, 5, 14, 14, 10, 5, 11, 14, 14,
    0, 1, 9, 5, 5, 8, 15, 8, 3, 12, 9, 7, 5, 13, 6, 3, 3, 3, 0, 1, 15, 2, 1,
    4, 13, 6, 4, 1, 14, 3, 12, 1, 8, 6, 6, 9, 10, 14, 10, 6, 9, 15, 5, 3, 11,
    5, 0, 14, 11, 7, 1, 15, 7, 12, 6, 10, 9, 0, 4, 4, 3, 8, 12, 6, 5, 12, 14,
    2, 1, 7, 9, 12, 7, 8, 12, 15, 6, 10, 0, 0, 10, 11, 3, 10, 5, 2, 11, 2,
    0, 10, 10, 2, 4, 9, 8, 9, 10, 10, 7, 4, 14, 7, 7, 3, 13, 3, 6, 15, 1, 4,
    2, 3, 2, 12, 6, 5, 9, 11, 13, 15, 10, 1, 5, 3, 14, 13, 11, 3, 11, 12, 10,
    10, 4, 7, 15, 14, 8, 5, 13, 10, 14, 15, 12, 1, 14, 2, 2, 15, 14, 7, 10,
    12, 15, 15, 6, 2, 14, 7, 3, 6, 10, 6, 3, 5, 11, 10, 13, 2, 10, 15, 2, 10,
    6, 14, 5, 1, 15, 2, 7, 6, 12, 3, 5, 11, 2, 3, 2, 5, 0, 6, 2, 8, 11, 4,
    14, 15, 6, 2, 11, 8, 0, 7, 8, 15, 14, 2, 0, 1, 8, 3, 12, 8, 7, 10, 13,
    1, 2, 6, 3, 11, 11, 8, 9, 8, 6, 10, 5, 12, 12, 12, 1, 5, 0, 3, 6, 13, 4,
    2, 9, 1, 8, 10, 2, 4, 1, 10, 7, 7, 0, 14, 7, 11, 2, 13, 5, 2, 0, 6, 1,
    6, 15, 11, 10, 3, 7, 12, 9, 15, 2, 3, 15, 11, 9, 15, 11, 13, 6, 10, 10,
    4, 2, 8, 3, 9, 8, 14, 7, 4, 10, 4, 9, 2, 6, 12, 7, 13, 7, 3, 12, 4, 2,
    8, 6, 9, 14, 1, 7, 5, 0, 4, 8, 4, 3, 8, 0, 12, 4, 4, 8, 15, 10, 11, 13,
    15, 14, 15, 1, 2, 5, 13, 4, 1, 14, 15, 2, 8, 15, 13, 10, 4, 6, 15, 4, 12,
    5, 9, 0, 15, 14, 10, 15, 8, 12, 10, 4, 9, 2, 11, 11, 9, 12, 8, 6, 13, 9,
    1, 11, 0, 2, 12, 0, 8, 6, 4, 13, 11, 12, 11, 10, 11, 11, 1, 13, 0, 7, 15,
    9, 1, 7, 15, 0, 11, 4, 3, 8, 14, 4, 4, 10, 11, 0, 5, 11, 8, 3, 5, 9, 7,
    0, 6, 0, 3, 9, 1, 7, 9, 3, 10, 15, 7, 3, 7, 2, 3, 11, 2, 12, 6, 7, 3, 3,
    14, 1, 2, 0, 6, 9, 10, 8, 3, 10, 4, 10, 12, 0, 12, 3, 4, 3, 6, 4, 2, 9,
    13, 1, 14, 12,
]


def queries() -> dict[str, Callable[[SparkSession, str],
                      DataFrame]]:
    """DICT ORDER IS LOAD-BEARING. The driver's correctness harness checks
    only the FIRST 50 entries per round (CORRECTNESS_r*.json has exactly 50
    rows), so ordering decides which queries get hard cross-engine oracle
    rows. With 147 queries, a parked query re-earns a driver row at
    latest every third round; tools/check_oracle.py still covers ALL
    positions every session. Rotation priority: (a) operators whose code
    changed since their last driver row, (b) entries that have never had
    a driver row, (c) longest parked, (d) family coverage - plus the
    VERDICT r8 hard rule: a RED driver row never rotates out until it
    has a green one. Layout (round 15 rotation, per VERDICT r14 task 1):

      1-2    priority (b), the r14 sweep-debuts awaiting their first
             driver rows: docs_dup_weights (soft-dedup loss weights)
             and ice_avro_delete_scan (avro positional + equality
             delete files) - with these green, the union of r01-r15
             driver rows covers every query that existed at r14.
      3-5    priority (b), NEW r15 debuts: docs_cluster_sample
             (cluster-weighted temperature sampling - consumes the
             r14 weights), ice_zorder_string_scan (string-dimension
             z-order via prefix-rank sketches), ice_avro_types_scan
             (uuid/fixed/time leaves through the avro write path).
      6      priority (a), code changed this round: ice_merge_scan -
             MERGE's source side is now statistics-hinted
             (plans/join_strategy.py, VERDICT r14 task 4).
      7-50   priority (c), every-third-round deadline: the full r12
             window cohort (last driver-green r12, due r15) - the
             docs_* text/quality family, the emb_* ANN family, the
             metadata/function/format ice_* family, the mm_* family,
             and the stream curation/TTL pair.
      51+    parked: the r13 window cohort (driver-green r13, due r16),
             the r14 window cohort (driver-green r14, due r17), and the
             r15 pending-(a) pair - ice_dynamic_prune_join (exact-count
             NDV-skip guard) and ice_delete_using_scan (stats-hinted
             USING side), both driver-green r14 with this round's
             changes pinned by tests/test_runtime_filter.py and
             tests/test_join_strategy.py; they lead the r16 (a) block.
             Everything parked stays oracle-checked in every local
             sweep.

    r16 rotation plan: the pending-(a) pair above, then the r13 window
    cohort (docs_bloom_dedup, docs_bpe_tokens, docs_decontaminate,
    docs_dsir_sample, docs_exact_dedup, docs_fingerprint,
    docs_incremental_dedup, docs_lang_scores, docs_minhash_dedup,
    docs_ngram_dedup, docs_quality, docs_simhash, docs_source_cap,
    docs_substr_dedup, the ice_avro/ice_orc/wap/retention/cherrypick
    scans, ice_time_scan, ice_mor_delete_scan, emb_sq_topk, the
    q03/q04/q05/q10/q12 TPC-H block, q_rollup, q_window_top_order,
    q_events_hourly, q_asof_join, stream_tumbling_events,
    stream_upsert_sink, mm_frame_sample, docs_token_count,
    ice_dv_delete_scan) comes due; the r14 window cohort has until
    r17.
    """
    return {
        # 1-5 - priority (b), never driver-checked: the two r14
        # sweep-debuts lead (VERDICT r14 task 1), then the three
        # NEW r15 entries
        "docs_dup_weights": docs_dup_weights,
        "ice_avro_delete_scan": ice_avro_delete_scan,
        "docs_cluster_sample": docs_cluster_sample,
        "ice_zorder_string_scan": ice_zorder_string_scan,
        "ice_avro_types_scan": ice_avro_types_scan,
        # 6 - priority (a), code changed this round: MERGE's source
        # side is now statistics-hinted (plans/join_strategy.py)
        "ice_merge_scan": ice_merge_scan,
        # 7-50 - priority (c), every-third-round deadline: the full
        # r12 window cohort (last driver-green r12, due r15)
        "ice_add_files_scan": ice_add_files_scan,
        "ice_orc_scan": ice_orc_scan,
        "docs_quality_classifier": docs_quality_classifier,
        "docs_bm25_topk": docs_bm25_topk,
        "docs_gopher_filter": docs_gopher_filter,
        "docs_c4_clean": docs_c4_clean,
        "emb_neardup": emb_neardup,
        "docs_line_dedup": docs_line_dedup,
        "docs_repetition": docs_repetition,
        "mm_video_meta": mm_video_meta,
        "docs_dup_components": docs_dup_components,
        "mm_image_dedup": mm_image_dedup,
        "mm_audio_dedup": mm_audio_dedup,
        "mm_video_dedup": mm_video_dedup,
        "stream_minhash_curation": stream_minhash_curation,
        "ice_variant_write_scan": ice_variant_write_scan,
        "emb_kmeans": emb_kmeans,
        "emb_semantic_dedup": emb_semantic_dedup,
        "emb_ivf_topk": emb_ivf_topk,
        "emb_cosine_topk": emb_cosine_topk,
        "emb_lsh_topk": emb_lsh_topk,
        "emb_knn_join": emb_knn_join,
        "emb_knn_join_bucketed": emb_knn_join_bucketed,
        "docs_tfidf": docs_tfidf,
        "ice_count_star_metadata": ice_count_star_metadata,
        "ice_objectstore_scan": ice_objectstore_scan,
        "ice_snapshot_history": ice_snapshot_history,
        "ice_partition_stats": ice_partition_stats_q,
        "ice_column_stats": ice_column_stats_q,
        "ice_metadata_files": ice_metadata_files,
        "ice_topk_scan": ice_topk_scan,
        "ice_truncate_fn": ice_truncate_fn,
        "ice_bucket_fn": ice_bucket_fn,
        "stream_curation": stream_curation,
        "docs_vocab": docs_vocab,
        "docs_resample_mixture": docs_resample_mixture,
        "docs_stratified_sample": docs_stratified_sample,
        "docs_pack_sequences": docs_pack_sequences,
        "docs_corpus_report": docs_corpus_report,
        "stream_dedup_ttl": stream_dedup_ttl,
        "docs_redact_pii": docs_redact_pii,
        "docs_normalize": docs_normalize,
        "docs_chunk": docs_chunk,
        "ice_delete_compaction_scan": ice_delete_compaction_scan,
        # parked: the r13 window cohort (due r16), the r14 window
        # cohort (due r17), and the r15 pending-(a) pair - all
        # driver-green, all still in every local sweep
        "q21_waiting_supplier": q21_waiting_supplier,
        "ice_dynamic_prune_join": ice_dynamic_prune_join,
        "stream_changelog": stream_changelog,
        "ice_ndv_stats": ice_ndv_stats,
        "ice_partition_stats_file": ice_partition_stats_file,
        "docs_dup_keep_best": docs_dup_keep_best,
        "ice_avro_write_scan": ice_avro_write_scan,
        "ice_avro_write_part_scan": ice_avro_write_part_scan,
        "ice_zorder_scan": ice_zorder_scan,
        "q01_pricing_summary": q01_pricing_summary,
        "q01_mor_pricing_summary": q01_mor_pricing_summary,
        "q02_min_cost_supplier": q02_min_cost_supplier,
        "q06_revenue_forecast": q06_revenue_forecast,
        "q07_volume_shipping": q07_volume_shipping,
        "q08_market_share": q08_market_share,
        "q09_product_profit": q09_product_profit,
        "q11_important_stock": q11_important_stock,
        "q13_customer_distribution": q13_customer_distribution,
        "q14_promo_revenue": q14_promo_revenue,
        "q15_top_supplier": q15_top_supplier,
        "q16_supplier_cnt": q16_supplier_cnt,
        "q17_small_quantity": q17_small_quantity,
        "q18_large_volume": q18_large_volume,
        "q19_disjunctive": q19_disjunctive,
        "q20_excess_shippers": q20_excess_shippers,
        "q22_sales_opportunity": q22_sales_opportunity,
        "q_interval_join": q_interval_join,
        "ice_delete_using_scan": ice_delete_using_scan,
        "ice_sql_merge": ice_sql_merge,
        "ice_update_scan": ice_update_scan,
        "ice_upsert_scan": ice_upsert_scan,
        "ice_merge_conditional": ice_merge_conditional,
        "ice_schema_evolution": ice_schema_evolution,
        "ice_spec_evolution_scan": ice_spec_evolution_scan,
        "ice_compaction_scan": ice_compaction_scan,
        "ice_bucket_pruned_scan": ice_bucket_pruned_scan,
        "ice_variant_extract": ice_variant_extract,
        "ice_docs_curation": ice_docs_curation,
        "docs_lm_score": docs_lm_score,
        "docs_lm_buckets": docs_lm_buckets,
        "docs_dsir_probe": docs_dsir_probe,
        "docs_lm_probe": docs_lm_probe,
        "docs_temperature_sample": docs_temperature_sample,
        "docs_incremental_minhash": docs_incremental_minhash,
        "stream_session_events": stream_session_events,
        "stream_sliding_events": stream_sliding_events,
        "ice_orc_mor_scan": ice_orc_mor_scan,
        "emb_pq_topk": emb_pq_topk,
        "docs_pipeline_curation": docs_pipeline_curation,
        "ice_time_scan": ice_time_scan,
        "ice_mor_delete_scan": ice_mor_delete_scan,
        "docs_token_count": docs_token_count,
        "emb_sq_topk": emb_sq_topk,
        "docs_bpe_tokens": docs_bpe_tokens,
        "ice_wap_scan": ice_wap_scan,
        "stream_upsert_sink": stream_upsert_sink,
        "ice_avro_scan": ice_avro_scan,
        "ice_retention_scan": ice_retention_scan,
        "ice_avro_nested_scan": ice_avro_nested_scan,
        "ice_cherrypick_scan": ice_cherrypick_scan,
        "q03_shipping_priority": q03_shipping_priority,
        "q04_order_priority": q04_order_priority,
        "q05_region_revenue": q05_region_revenue,
        "q10_returned_items": q10_returned_items,
        "q12_late_lines": q12_late_lines,
        "ice_custom_paths_scan": ice_custom_paths_scan,
        "docs_bloom_dedup": docs_bloom_dedup,
        "docs_quality": docs_quality,
        "docs_fingerprint": docs_fingerprint,
        "docs_incremental_dedup": docs_incremental_dedup,
        "docs_lang_scores": docs_lang_scores,
        "docs_winnow": docs_winnow,
        "q_distinct_parts": q_distinct_parts,
        "q_rollup": q_rollup,
        "q_setop_nations": q_setop_nations,
        "q_topk_orders": q_topk_orders,
        "q_anti_join": q_anti_join,
        "docs_minhash_dedup": docs_minhash_dedup,
        "docs_decontaminate": docs_decontaminate,
        "docs_ngram_dedup": docs_ngram_dedup,
        "docs_simhash": docs_simhash,
        "docs_exact_dedup": docs_exact_dedup,
        "stream_incremental": stream_incremental,
        "stream_sink_roundtrip": stream_sink_roundtrip,
        "stream_tumbling_events": stream_tumbling_events,
        "mm_image_features": mm_image_features,
        "mm_audio_features": mm_audio_features,
        "mm_frame_sample": mm_frame_sample,
        "docs_source_cap": docs_source_cap,
        "docs_substr_dedup": docs_substr_dedup,
        "q_window_top_order": q_window_top_order,
        "q_events_hourly": q_events_hourly,
        "q_asof_join": q_asof_join,
        "ice_dup_cluster_curation": ice_dup_cluster_curation,
        "ice_dv_delete_scan": ice_dv_delete_scan,
        "ice_time_travel": ice_time_travel,
        "docs_dsir_sample": docs_dsir_sample,
    }


_FP_SQL = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


def _simhash_sql() -> str:
    """DuckDB replica of operators.dedup.simhash64: md5-derived token bits
    (60 from the first 15 hex chars, 4 from the 16th), ±1 votes per bit,
    sign-packed into a signed 64-bit value."""
    votes = ",\n                   ".join(
        "sum(CASE WHEN (({c} >> {s}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}".format(
            c="lo" if i < 60 else "hi", s=i if i < 60 else i - 60, i=i)
        for i in range(64))
    packs = "\n                 + ".join(
        f"(CASE WHEN v.v{i} > 0 THEN {1 << i if i < 63 else -(1 << 63)} ELSE 0 END)"
        for i in range(64))
    return f"""
            WITH t AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                        x -> x <> '')) AS tok
              FROM documents
            ), h AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS lo,
                     CAST('0x' || substr(md5(tok), 16, 1) AS BIGINT) AS hi
              FROM t
            ), v AS (
              SELECT doc_id,
                   {votes}
              FROM h GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST({packs} AS BIGINT) AS simhash
            FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
            ORDER BY d.doc_id LIMIT 500
    """


def _rolling_hash_cte(k: int, src: str = "documents") -> str:
    """Shared CTE chain replicating the package's k-byte polynomial rolling
    hash (operators.text._shingle_hashes_positional / operators.dedup.
    _shingle_hashes): uint64 wraparound arithmetic done exactly via HUGEINT
    mod 2**64. Exact for ASCII corpora (byte == codepoint; the synthetic
    documents table is ASCII). Yields hh(doc_id, p, h)."""
    p, powers = 1, []
    for _ in range(k):
        powers.append(p)
        p = (p * 1099511628211) % (1 << 64)
    terms = "\n                       + ".join(
        f"unicode(substr(nt, p + {j}, 1)) * CAST({powers[j]} AS HUGEINT)"
        for j in range(k))
    return f"""
            norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
              FROM {src}
            ), padded AS (
              SELECT doc_id,
                     CASE WHEN length(nt) < {k}
                          THEN nt || repeat('_', {k} - length(nt)) ELSE nt END AS nt
              FROM norm
            ), pos AS (
              SELECT doc_id, nt, unnest(generate_series(1, length(nt) - {k - 1})) AS p
              FROM padded
            ), hh AS (
              SELECT doc_id, p,
                     ({terms}) % 18446744073709551616 AS h
              FROM pos
            )"""


def _winnow_sql(k: int = 8, window: int = 4) -> str:
    """DuckDB replica of operators.text.winnow_fingerprint: rolling hashes,
    sliding-window min selection, distinct count of the low-63-bit values."""
    return f"""
            WITH {_rolling_hash_cte(k)}, win AS (
              SELECT doc_id, p, h,
                     min(h) OVER (PARTITION BY doc_id ORDER BY p
                                  ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS wmin,
                     count(*) OVER (PARTITION BY doc_id) AS nh
              FROM hh
            ), sel AS (
              SELECT doc_id, CASE WHEN nh >= {window} THEN wmin ELSE h END AS s
              FROM win WHERE nh < {window} OR p + {window - 1} <= nh
            )
            SELECT doc_id,
                   CAST(count(DISTINCT s % 9223372036854775808) AS INT) AS n_fingerprints
            FROM sel GROUP BY doc_id ORDER BY doc_id LIMIT 1000
    """


def _minhash_sql(num_hashes: int = 32, bands: int = 8, shingle_k: int = 5,
                 threshold: float = 0.7) -> str:
    """DuckDB replica of operators.dedup.minhash_dedup: exact-fingerprint
    collapse, k-byte shingle hashes (distinct), a*x+b minhash family with
    uint64 wraparound (constants from the package's seeded generator),
    band-slice grouping with bucket-min pairing, exact shingle-Jaccard
    verify, survivors count. One intentional difference: Spark buckets on
    murmur3(slice) while this groups on the slice VALUES — Spark's candidate
    set is a (collision) superset, but candidates only drop rows after the
    exact-Jaccard verify, so the survivor set is identical."""
    from duckdb_iceberg_spark.operators.dedup import _hash_params

    a, b = _hash_params(num_hashes)
    rpb = num_hashes // bands
    mins = ",\n                     ".join(
        f"min(((CAST({int(au)} AS HUGEINT) * h + {int(bu)})"
        f" % 18446744073709551616) // 2) AS s{i}"
        for i, (au, bu) in enumerate(zip(a, b)))
    banded = "\n              UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {cols} FROM sig".format(
            bi=bi, cols=", ".join(f"s{bi * rpb + j} AS k{j}" for j in range(rpb)))
        for bi in range(bands))
    keys = ", ".join(f"k{j}" for j in range(rpb))
    return f"""
            WITH reps AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (PARTITION BY {_FP_SQL}) AS m
                FROM documents) q WHERE doc_id = m
            ), {_rolling_hash_cte(shingle_k, 'reps')}, sh AS (
              SELECT DISTINCT doc_id, h FROM hh
            ), sig AS (
              SELECT doc_id,
                     {mins}
              FROM sh GROUP BY doc_id
            ), banded AS (
              {banded}
            ), cands AS (
              SELECT DISTINCT m AS id_a, doc_id AS id_b FROM (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY band, {keys}) AS m
                FROM banded) q WHERE doc_id <> m
            ), inter AS (
              SELECT c.id_a, c.id_b, count(*) AS i
              FROM cands c
              JOIN sh x ON x.doc_id = c.id_a
              JOIN sh y ON y.doc_id = c.id_b AND y.h = x.h
              GROUP BY c.id_a, c.id_b
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), losers AS (
              SELECT DISTINCT c.id_b FROM cands c
              JOIN sizes sa ON sa.doc_id = c.id_a
              JOIN sizes sb ON sb.doc_id = c.id_b
              LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
              WHERE round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                          / (sa.n + sb.n - COALESCE(i.i, 0)), 6) >= {threshold}
            )
            SELECT count(*) AS survivors FROM reps
            WHERE doc_id NOT IN (SELECT id_b FROM losers)
    """


def _dup_components_sql(num_hashes: int = 32, bands: int = 8,
                        shingle_k: int = 5, threshold: float = 0.7,
                        src: str = "documents",
                        tail: str | None = None) -> str:
    """DuckDB replica of operators.dedup.duplicate_components: the
    _minhash_sql pipeline up to VERIFIED pairs (not losers), plus the
    exact-dup star edges, then TRUE connected components via a recursive
    CTE (min id reachable over the symmetrized edges) — the distributed
    star algorithm must reproduce these labels exactly. ``src`` swaps the
    corpus (e.g. a filtered subquery mirroring an Iceberg scan); ``tail``
    swaps the final SELECT (may open with further CTEs over ``reach``)
    for consumers like cluster-level curation."""
    from duckdb_iceberg_spark.operators.dedup import _hash_params

    a, b = _hash_params(num_hashes)
    rpb = num_hashes // bands
    mins = ",\n                     ".join(
        f"min(((CAST({int(au)} AS HUGEINT) * h + {int(bu)})"
        f" % 18446744073709551616) // 2) AS s{i}"
        for i, (au, bu) in enumerate(zip(a, b)))
    banded = "\n              UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {cols} FROM sig".format(
            bi=bi, cols=", ".join(f"s{bi * rpb + j} AS k{j}" for j in range(rpb)))
        for bi in range(bands))
    keys = ", ".join(f"k{j}" for j in range(rpb))
    tail = tail or """
            SELECT id AS doc_id, min(r) AS component_id
            FROM reach GROUP BY id ORDER BY doc_id"""
    return f"""
            WITH RECURSIVE reps AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (PARTITION BY {_FP_SQL}) AS m
                FROM {src}) q WHERE doc_id = m
            ), {_rolling_hash_cte(shingle_k, 'reps')}, sh AS (
              SELECT DISTINCT doc_id, h FROM hh
            ), sig AS (
              SELECT doc_id,
                     {mins}
              FROM sh GROUP BY doc_id
            ), banded AS (
              {banded}
            ), cands AS (
              SELECT DISTINCT m AS id_a, doc_id AS id_b FROM (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY band, {keys}) AS m
                FROM banded) q WHERE doc_id <> m
            ), inter AS (
              SELECT c.id_a, c.id_b, count(*) AS i
              FROM cands c
              JOIN sh x ON x.doc_id = c.id_a
              JOIN sh y ON y.doc_id = c.id_b AND y.h = x.h
              GROUP BY c.id_a, c.id_b
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), verified AS (
              SELECT c.id_a, c.id_b FROM cands c
              JOIN sizes sa ON sa.doc_id = c.id_a
              JOIN sizes sb ON sb.doc_id = c.id_b
              LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
              WHERE round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                          / (sa.n + sb.n - COALESCE(i.i, 0)), 6) >= {threshold}
            ), exact_edges AS (
              SELECT doc_id AS u, m AS v FROM (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY {_FP_SQL}) AS m
                FROM {src}) q WHERE doc_id <> m
            ), edges AS (
              SELECT id_b AS u, id_a AS v FROM verified
              UNION SELECT u, v FROM exact_edges
            ), sym AS (
              SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM {src}
              UNION
              SELECT s.u AS id, reach.r FROM sym s JOIN reach ON s.v = reach.id
            )
            {tail}
    """


def _hamming_dedup_sql(n_bytes: int, md5_prefix: str,
                       bit_exprs: list[str], out_col: str,
                       max_hamming: int, bands: int) -> str:
    """Shared DuckDB skeleton for the md5-grid fake-path Hamming dedups
    (image dHash, audio fingerprint): grid bytes from chained
    md5(text || '<prefix><i>') digests, 64 bits packed with bit 63 as the
    int64 sign, 16-bit band chunks over the unsigned view, candidate
    pairs per (band, chunk), exact bit_count(xor) verify, survivors with
    their hashes. The synthesized +100000 copies make the drop path fire
    (testdata texts are all distinct)."""
    def byte(k: int) -> str:
        return (f"CAST('0x' || substr(md5(text || '{md5_prefix}{k // 16}'), "
                f"{2 * (k % 16) + 1}, 2) AS BIGINT)")

    gcols = ",\n                     ".join(
        f"{byte(k)} AS g{k}" for k in range(n_bytes))
    bit_terms = []
    for i, cond in enumerate(bit_exprs):
        if i == 63:
            bit_terms.append(
                f"(CASE WHEN {cond} THEN -9223372036854775808 ELSE 0 END)")
        else:
            bit_terms.append(
                f"(CASE WHEN {cond} THEN {1 << i} ELSE 0 END)")
    pack = "\n                     + ".join(bit_terms)
    banded = "\n              UNION ALL ".join(
        f"SELECT id, {j} AS band, (ud // {1 << (16 * j)}) % 65536 AS chunk"
        " FROM uh"
        for j in range(bands))
    return f"""
            WITH src AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
            ), g AS (
              SELECT doc_id AS id, text,
                     {gcols}
              FROM src
            ), dh AS (
              SELECT id,
                     CASE WHEN text IS NULL THEN NULL ELSE
                     {pack}
                     END AS {out_col}
              FROM g
            ), uh AS (
              SELECT id, CAST({out_col} AS HUGEINT)
                     + CASE WHEN {out_col} < 0
                            THEN CAST('18446744073709551616' AS HUGEINT)
                            ELSE CAST(0 AS HUGEINT) END AS ud
              FROM dh WHERE {out_col} IS NOT NULL
            ), banded AS (
              {banded}
            ), cands AS (
              SELECT DISTINCT l.id AS id_a, r.id AS id_b
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.chunk = r.chunk AND l.id < r.id
            ), losers AS (
              SELECT DISTINCT c.id_b
              FROM cands c
              JOIN dh a ON a.id = c.id_a
              JOIN dh b ON b.id = c.id_b
              WHERE bit_count(xor(a.{out_col}, b.{out_col})) <= {max_hamming}
            )
            SELECT d.id, d.{out_col}
            FROM dh d
            WHERE d.id NOT IN (SELECT id_b FROM losers)
            ORDER BY d.id
    """


def _image_dedup_sql(max_hamming: int = 6, bands: int = 4) -> str:
    """operators.multimodal.image_neardup fake path: 9x8 md5 grid, dHash
    bit (r, c) = g[r][c] > g[r][c+1]."""
    bit_exprs = []
    for i in range(64):
        r, c = divmod(i, 8)
        a, b = r * 9 + c, r * 9 + c + 1
        bit_exprs.append(f"g{a} > g{b}")
    return _hamming_dedup_sql(72, "p", bit_exprs, "dhash", max_hamming, bands)


def _video_dedup_sql(match_fraction: float = 0.8, every_ms: int = 1000) -> str:
    """operators.multimodal.video_neardup fake path: frames at
    range(0, duration, every_ms), per-frame 9x8 md5 grid keyed by
    (blob, ts), dHash bits, (frame_ts, fhash)-joined pairs, temporal
    vote >= match_fraction of the longer side's frame count."""
    def byte(k: int) -> str:
        return (f"CAST('0x' || substr(md5(text || 'f' || ts || 'p{k // 16}'),"
                f" {2 * (k % 16) + 1}, 2) AS BIGINT)")

    gcols = ",\n                     ".join(
        f"{byte(k)} AS g{k}" for k in range(72))
    bit_terms = []
    for i in range(64):
        r, c = divmod(i, 8)
        a, b = r * 9 + c, r * 9 + c + 1
        if i == 63:
            bit_terms.append(
                f"(CASE WHEN g{a} > g{b} THEN -9223372036854775808 "
                "ELSE 0 END)")
        else:
            bit_terms.append(
                f"(CASE WHEN g{a} > g{b} THEN {1 << i} ELSE 0 END)")
    pack = "\n                     + ".join(bit_terms)
    return f"""
            WITH src AS (
              SELECT doc_id, text, n_chars * 10 AS dur FROM documents
              UNION ALL
              SELECT doc_id + 100000, text, n_chars * 10 FROM documents
              WHERE doc_id < 50
            ), fr AS (
              SELECT doc_id AS id, text,
                     unnest(range(0, greatest(dur, 1), {every_ms})) AS ts
              FROM src
            ), g AS (
              SELECT id, ts,
                     {gcols}
              FROM fr
            ), fh AS (
              SELECT id, ts,
                     {pack}
                     AS fhash
              FROM g
            ), cnt AS (
              SELECT id, count(*) AS n FROM fh GROUP BY id
            ), m AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS mm
              FROM fh a JOIN fh b ON a.ts = b.ts AND a.fhash = b.fhash
                                 AND a.id < b.id
              GROUP BY 1, 2
            ), losers AS (
              SELECT DISTINCT m.id_b FROM m
              JOIN cnt ca ON ca.id = m.id_a
              JOIN cnt cb ON cb.id = m.id_b
              WHERE m.mm >= {match_fraction} * greatest(ca.n, cb.n)
            )
            SELECT c.id, c.n AS n_frames FROM cnt c
            WHERE c.id NOT IN (SELECT id_b FROM losers)
            ORDER BY c.id
    """


def _audio_dedup_sql(max_hamming: int = 6, bands: int = 4) -> str:
    """operators.multimodal.audio_neardup fake path: 9x9 md5 energy grid,
    Haitsma-Kalker double-difference bit (i, j) =
    (G[i+1][j+1]-G[i+1][j]) - (G[i][j+1]-G[i][j]) > 0 — integer
    arithmetic, exact in both engines."""
    bit_exprs = []
    for i in range(64):
        r, c = divmod(i, 8)
        a = (r + 1) * 9 + (c + 1)
        b = (r + 1) * 9 + c
        cc = r * 9 + (c + 1)
        d = r * 9 + c
        bit_exprs.append(f"(g{a} - g{b}) - (g{cc} - g{d}) > 0")
    return _hamming_dedup_sql(81, "a", bit_exprs, "afp", max_hamming, bands)


def _oracle_sf_dir() -> str:
    """The sf the data-dependent oracle builders read their corpus from:
    the driver's correctness SF by default; tools/check_oracle.py points
    it at its own sf_dir so local sweeps at other SFs stay honest."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                          "/root/testdata/sf0.01")


# The shared LM tokenize -> vocab -> unk-map -> bigram -> counts chain:
# the lp pair table is only correct if its probe realizes EXACTLY the
# pairs the scoring CTEs realize, and the r10 stage-bisect probe
# (docs_lm_probe) is only diagnostic if it inspects EXACTLY these CTEs —
# so all three are built from this one constant. (vocab carries its
# counts since r10: the probe renders them; the other consumers read
# vocab.w only.)
_LM_CTES = r"""
            WITH t AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), vocab AS (
              SELECT w, count(*) AS c FROM (
                SELECT unnest(toks) AS w FROM t WHERE lang = 'en'
              ) q GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT 1024
            ), mapped AS (
              SELECT tk.doc_id, tk.lang, tk.i,
                     CASE WHEN vv.w IS NOT NULL THEN tk.w
                          ELSE '<unk>' END AS w
              FROM (SELECT doc_id, lang, unnest(toks) AS w,
                           generate_subscripts(toks, 1) AS i FROM t) tk
              LEFT JOIN vocab vv ON vv.w = tk.w
            ), ml AS (
              SELECT doc_id, lang, list(w ORDER BY i) AS toks
              FROM mapped GROUP BY doc_id, lang
            ), bi AS (
              SELECT doc_id, lang,
                     unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS g
              FROM ml
            ), model AS (
              SELECT g, count(*) AS c2 FROM bi WHERE lang = 'en' GROUP BY g
            ), ctx AS (
              SELECT string_split(g, ' ')[1] AS w1, sum(c2) AS c1
              FROM model GROUP BY 1
            )"""


def _lm_probe_sql() -> str:
    """DuckDB twin of operators.text.lm_probe — the r10 stage-bisect for
    the docs_lm_score driver red (VERDICT r9 task 1b). Pure integer/string
    SQL over the SAME _LM_CTES chain the scorer's oracle uses: per-doc
    token counts (tokenize), the counted vocabulary (selection order),
    the bigram model and context counts. No floats, no ln() — a red here
    localizes a tokenize/count divergence; green here + red scorer pins
    the divergence to the literal/decimal layer."""
    return _LM_CTES + r"""
            SELECT metric, k, v FROM (
              SELECT 'doc_toks' AS metric, CAST(doc_id AS VARCHAR) AS k,
                     CAST(len(toks) AS BIGINT) AS v
              FROM t
              UNION ALL
              SELECT 'vocab', w, CAST(c AS BIGINT) FROM vocab
              UNION ALL
              SELECT 'bigram', g, CAST(c2 AS BIGINT) FROM model
              UNION ALL
              SELECT 'ctx', w1, CAST(c1 AS BIGINT) FROM ctx
            ) ORDER BY metric, k
    """


def _dsir_probe_sql(buckets: int = 4096, salt: str = "dsir") -> str:
    """DuckDB twin of operators.sampling.dsir_probe — the r10
    stage-bisect for the docs_dsir_sample driver red (VERDICT r9 task
    1b). Pure integer SQL sharing _dsir_sql's tokenize/bucket CTE chain:
    per-bucket raw/target gram counts (the log-ratio model's inputs) and
    each document's hex32(md5(id||salt)) (the Gumbel term's only
    engine-computed input). No floats, no ln()."""
    return rf"""
            WITH t AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, lang, unnest(list_concat(
                       toks,
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                     )) AS gram
              FROM t
            ), b AS (
              SELECT lang,
                     CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                       % {buckets} AS bk
              FROM g
            ), cnt AS (
              SELECT bk, CAST(count(*) AS BIGINT) AS cr,
                     CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct
              FROM b GROUP BY bk
            )
            SELECT metric, k, v FROM (
              SELECT 'bucket_cr' AS metric, CAST(bk AS VARCHAR) AS k, cr AS v
              FROM cnt
              UNION ALL
              SELECT 'bucket_ct', CAST(bk AS VARCHAR), ct
              FROM cnt WHERE ct > 0
              UNION ALL
              SELECT 'doc_u32', CAST(doc_id AS VARCHAR),
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                             || '{salt}'), 1, 8) AS BIGINT)
              FROM documents
            ) ORDER BY metric, k
    """


def _temperature_sql(alpha: float = 0.5, salt: str = "temp10",
                     digits: int = 6) -> str:
    """DuckDB replica of docs_temperature_sample. DATA-DEPENDENT builder
    (r9 rule — no ln/exp/pow in the checking engine): per-source counts
    re-derived with driver-side DuckDB, then the SAME CPython chain the
    operator runs (temperature_weights → mixture_fractions →
    floor_threshold_hex) emits each source's keep-threshold as a STRING
    literal; the SQL only filters on md5 prefixes and aggregates."""
    import duckdb as _duck

    from duckdb_iceberg_spark.operators.sampling import (
        floor_threshold_hex,
        mixture_fractions,
        temperature_weights,
    )

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    con = _duck.connect()
    counts = dict(con.execute(
        "SELECT source, count(*) FROM read_parquet('"
        + path.replace("'", "''") + "') GROUP BY source").fetchall())
    con.close()
    weights = {g: float(w)
               for g, w in temperature_weights(counts, alpha).items()}
    fractions = mixture_fractions(counts, weights)
    thr_values = ", ".join(
        f"('{g}', '{floor_threshold_hex(f, digits)}')"
        for g, f in sorted(fractions.items())) \
        or "('__none__', '')"
    return rf"""
            WITH thr(src, th) AS (
              VALUES {thr_values}
            )
            SELECT d.source AS source, count(*) AS cnt,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents d JOIN thr ON d.source = thr.src
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'),
                         1, {digits}) < th
            GROUP BY d.source ORDER BY d.source
    """


def _cluster_sample_sql(alpha: float = 0.5, salt: str = "csamp15",
                        digits: int = 6) -> str:
    """DuckDB replica of docs_cluster_sample. DATA-DEPENDENT builder
    (r9 rule — no ln/exp/pow in the checking engine): the realized
    DISTINCT cluster sizes are re-derived driver-side with DuckDB
    running the same recursive-CTE components pipeline, then the SAME
    CPython chain the operator runs (cluster_size_fraction →
    floor_threshold_hex) emits each size's keep-threshold as a STRING
    literal; the SQL recomputes true components + window sizes and only
    filters on md5 prefixes."""
    import duckdb as _duck

    from duckdb_iceberg_spark.operators.sampling import (
        cluster_size_fraction,
        floor_threshold_hex,
    )

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    sizes_sql = _dup_components_sql(tail="""
            , comp AS (
              SELECT id AS doc_id, min(r) AS component_id
              FROM reach GROUP BY id
            )
            SELECT DISTINCT count(*) AS cluster_size
            FROM comp GROUP BY component_id ORDER BY cluster_size
    """)
    con = _duck.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + path.replace("'", "''") + "')")
    sizes = [int(r[0]) for r in con.execute(sizes_sql).fetchall()]
    con.close()
    thr_values = ", ".join(
        f"({s}, '{floor_threshold_hex(cluster_size_fraction(s, alpha), digits)}')"
        for s in sizes)
    return _dup_components_sql(tail=f"""
            , comp AS (
              SELECT id AS doc_id, min(r) AS component_id
              FROM reach GROUP BY id
            ), sized AS (
              SELECT doc_id,
                     count(*) OVER (PARTITION BY component_id)
                       AS cluster_size
              FROM comp
            ), thr(sz, th) AS (
              VALUES {thr_values}
            )
            SELECT d.lang, count(*) AS kept,
                   CAST(sum(d.n_chars) AS BIGINT) AS kept_chars,
                   CAST(sum(CAST(floor(1000000.0 / s.cluster_size)
                                 AS BIGINT)) AS BIGINT) AS kept_eff_micro,
                   CAST(max(s.cluster_size) AS BIGINT) AS max_cluster
            FROM documents d
            JOIN sized s ON d.doc_id = s.doc_id
            JOIN thr ON s.cluster_size = thr.sz
            WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '{salt}'),
                         1, {digits}) < thr.th
            GROUP BY d.lang ORDER BY d.lang
    """)


def _lm_sql(buckets: bool = False) -> str:
    """DuckDB replica of operators.text.ngram_lm_score (and, with
    ``buckets``, lm_perplexity_buckets): top-1024 reference-slice vocab
    (count desc, token asc), unk-mapped bigrams, Laplace k=1 model, 6dp
    log-probs summed as DECIMAL; the bucket variant adds per-language
    quantile_cont terciles (== Spark's exact percentile) rounded to 6dp.

    DATA-DEPENDENT builder since r9 (the fix for the r8 driver hash-red):
    the SQL no longer computes ln() at all. The builder derives every
    realized (bigram count, context count) pair from the corpus with
    driver-side DuckDB (exact integer work, version-independent) and
    emits round6(ln((c2+1)/(c1+V))) for each pair as DECIMAL literals
    computed by operators.text.laplace_lp6 — the SAME CPython function
    that builds the table the operator broadcasts, so both engines sum
    identical decimals no matter how the checking engine's libm rounds.
    The probe and the scoring SQL share ONE CTE-chain constant so they
    cannot drift, and scored NULLs its nll when any realized pair is
    missing from the pair table (count(*) <> count(lpv)) — a missing
    pair fails loudly instead of silently shrinking the sum."""
    import duckdb as _duck

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    from duckdb_iceberg_spark.operators.text import laplace_lp6

    con = _duck.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + path.replace("'", "''") + "')")
    # the shared tokenize -> vocab -> unk-map -> bigram -> counts chain:
    ctes = _LM_CTES
    pair_probe = ctes + r"""
            SELECT DISTINCT COALESCE(m.c2, 0) AS c2v,
                   COALESCE(c.c1, 0) AS c1v,
                   (SELECT count(*) + 1 FROM vocab) AS v
            FROM bi b
            LEFT JOIN model m ON m.g = b.g
            LEFT JOIN ctx c ON c.w1 = string_split(b.g, ' ')[1]
    """
    pairs = con.execute(pair_probe).fetchall()
    con.close()
    lp_values = ", ".join(
        f"({int(c2)}, {int(c1)}, "
        f"CAST('{laplace_lp6(int(c2), int(c1), int(v))}' AS DECIMAL(18,6)))"
        for c2, c1, v in pairs) or "(0, 0, CAST('0' AS DECIMAL(18,6)))"
    common = ctes + rf"""
            , lp(c2v, c1v, lpv) AS (
              VALUES {lp_values}
            ), scored AS (
              -- LEFT JOIN + the count guard: a realized pair missing from
              -- lp makes nll NULL (loud hash mismatch), never a silently
              -- smaller sum
              SELECT b.doc_id, count(*) AS n_bigrams,
                     CASE WHEN count(*) = count(l.lpv)
                          THEN -sum(l.lpv) END AS nll
              FROM bi b
              LEFT JOIN model m ON m.g = b.g
              LEFT JOIN ctx c ON c.w1 = string_split(b.g, ' ')[1]
              LEFT JOIN lp l ON l.c2v = COALESCE(m.c2, 0)
                            AND l.c1v = COALESCE(c.c1, 0)
              GROUP BY b.doc_id
            )"""
    if not buckets:
        # micro-unit BIGINT rendering since r11 (VERDICT r10 task 1): the
        # values are identical to the old DECIMAL(28,6) nll_sum / DOUBLE
        # avg_nll × 1e6 — the half-up quotient below is the same integer
        # the operator's DIV computes, before any divide
        return common + r"""
            SELECT d.doc_id,
                   COALESCE(s.n_bigrams, 0) AS n_bigrams,
                   -- DECIMAL(28,6) narrowing keeps ×1e6 inside decimal
                   -- width 38 (exact), never the double path
                   CAST(CAST(COALESCE(s.nll, 0) AS DECIMAL(28,6))
                        * 1000000 AS BIGINT) AS nll_sum_micro,
                   -- half-up 6dp quotient in exact micro-unit integers
                   -- (mirrors the operator; a double round() hit an exact
                   -- tie at sf0.1: 258.481054/76 = 3.4010665 precisely)
                   CASE WHEN s.n_bigrams > 0
                        THEN CAST((2 * CAST(CAST(s.nll AS DECIMAL(28,6))
                                            * 1000000 AS BIGINT)
                                   + s.n_bigrams)
                                  // (2 * s.n_bigrams) AS BIGINT)
                   END AS avg_nll_micro
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
            ORDER BY d.doc_id
        """
    return common + r"""
            , final AS (
              SELECT d.doc_id, d.lang,
                     CASE WHEN s.n_bigrams > 0
                          THEN CAST((2 * CAST(s.nll * 1000000 AS BIGINT)
                                     + s.n_bigrams)
                                    // (2 * s.n_bigrams) AS DOUBLE)
                               / 1000000.0
                     END AS avg_nll
              FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
            ), th AS (
              SELECT lang,
                     round(quantile_cont(avg_nll, 1.0/3), 6) AS t1,
                     round(quantile_cont(avg_nll, 2.0/3), 6) AS t2
              FROM final WHERE avg_nll IS NOT NULL GROUP BY lang
            )
            SELECT f.doc_id, f.lang, f.avg_nll,
                   CASE WHEN f.avg_nll IS NULL THEN NULL
                        WHEN f.avg_nll <= th.t1 THEN 'head'
                        WHEN f.avg_nll <= th.t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM final f LEFT JOIN th ON f.lang = th.lang
            ORDER BY f.doc_id
        """


#: the Gopher keep condition over gm's integer columns — ONE fragment
#: shared by the standalone oracle and the pipeline-composition oracle so
#: the rule arithmetic cannot drift between them (min_words=20, the
#: driver-entry setting)
_GOPHER_KEEP_SQL = (
    "(w BETWEEN 20 AND 100000)"
    " AND (wchars BETWEEN 3 * w AND 10 * w)"
    " AND sym * 10 <= w"
    " AND bullet * 10 <= nl * 9"
    " AND ell * 10 <= nl * 3"
    " AND alpha * 5 >= 4 * w"
    " AND req >= 2")

#: pipeline-composition required-word set: the synthetic corpus' own
#: function words (Gopher's fixed English set keeps ZERO of these docs —
#: the corpus has 'the'/'a' but not be/of/and/…; the operator's
#: required_words parameter exists for exactly this domain adaptation)
_PIPELINE_REQUIRED = ["the", "a"]


def _gopher_ctes(required: list[str] | None = None) -> str:
    """Gopher measurement CTEs (gt/glns/gm — prefixed names so they
    compose with the NB classifier chain in one statement).
    ``required`` overrides the required-word list (pipeline
    composition); default is Gopher's fixed English set."""
    words = required or ["the", "be", "to", "of", "and", "that", "have",
                         "with"]
    req_sql = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return _GOPHER_CTES_TMPL.replace("__REQUIRED__", req_sql)


_GOPHER_CTES_TMPL = r"""
            gt AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         lower(trim(COALESCE(text, ''))), '\s+'),
                         x -> x <> '') AS toks,
                     COALESCE(text, '') AS c
              FROM documents
            ), glns AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(c, chr(10)),
                                                l -> trim(l)),
                                 l -> l <> '') AS ls
              FROM gt
            ), gm AS (
              SELECT t.doc_id,
                     len(t.toks) AS w,
                     COALESCE(list_aggregate(
                         list_transform(t.toks, x -> length(x)), 'sum'),
                         0) AS wchars,
                     (length(t.c) - length(replace(t.c, '#', '')))
                       + (length(t.c) - length(replace(t.c, '…', '')))
                       + (length(t.c) - length(replace(t.c, '...', '')))
                         // 3 AS sym,
                     len(l.ls) AS nl,
                     len(list_filter(l.ls,
                         x -> substr(x, 1, 1)
                              IN ('•', '‣', '▪', '-', '*'))) AS bullet,
                     len(list_filter(l.ls,
                         x -> x LIKE '%...' OR x LIKE '%…')) AS ell,
                     len(list_filter(t.toks,
                         x -> regexp_matches(x, '[a-z]'))) AS alpha,
                     len(list_intersect(list_distinct(t.toks),
                         __REQUIRED__))
                       AS req
              FROM gt t JOIN glns l ON t.doc_id = l.doc_id
            )"""

#: DuckDB replica of operators.text.gopher_document_filter (min_words=20
#: for the driver entry) — identical cross-multiplied integer rules, the
#: same non-overlapping replace() counting for '#'/'…'/'...' occurrences
_GOPHER_SQL = r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         lower(trim(COALESCE(text, ''))), '\s+'),
                         x -> x <> '') AS toks,
                     COALESCE(text, '') AS c
              FROM documents
            ), lns AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(c, chr(10)),
                                                l -> trim(l)),
                                 l -> l <> '') AS ls
              FROM t
            ), m AS (
              SELECT t.doc_id,
                     len(t.toks) AS w,
                     COALESCE(list_aggregate(
                         list_transform(t.toks, x -> length(x)), 'sum'),
                         0) AS wchars,
                     (length(t.c) - length(replace(t.c, '#', '')))
                       + (length(t.c) - length(replace(t.c, '…', '')))
                       + (length(t.c) - length(replace(t.c, '...', '')))
                         // 3 AS sym,
                     len(l.ls) AS nl,
                     len(list_filter(l.ls,
                         x -> substr(x, 1, 1)
                              IN ('•', '‣', '▪', '-', '*'))) AS bullet,
                     len(list_filter(l.ls,
                         x -> x LIKE '%...' OR x LIKE '%…')) AS ell,
                     len(list_filter(t.toks,
                         x -> regexp_matches(x, '[a-z]'))) AS alpha,
                     len(list_intersect(list_distinct(t.toks),
                         ['the','be','to','of','and','that','have','with']))
                       AS req
              FROM t JOIN lns l ON t.doc_id = l.doc_id
            )
            SELECT doc_id,
                   CAST(w AS BIGINT) AS n_words,
                   CAST(nl AS BIGINT) AS n_lines,
                   CAST(sym AS BIGINT) AS n_symbols,
                   CAST(bullet AS BIGINT) AS n_bullet_lines,
                   CAST(ell AS BIGINT) AS n_ellipsis_lines,
                   CAST(alpha AS BIGINT) AS n_alpha_words,
                   CAST(req AS BIGINT) AS n_required_words,
                   (w BETWEEN 20 AND 100000)
                     AND (wchars BETWEEN 3 * w AND 10 * w)
                     AND sym * 10 <= w
                     AND bullet * 10 <= nl * 9
                     AND ell * 10 <= nl * 3
                     AND alpha * 5 >= 4 * w
                     AND req >= 2 AS keep,
                   CASE
                     WHEN NOT (w BETWEEN 20 AND 100000) THEN 'n_words'
                     WHEN NOT (wchars BETWEEN 3 * w AND 10 * w)
                       THEN 'mean_word_len'
                     WHEN NOT (sym * 10 <= w) THEN 'symbol_ratio'
                     WHEN NOT (bullet * 10 <= nl * 9) THEN 'bullet_lines'
                     WHEN NOT (ell * 10 <= nl * 3) THEN 'ellipsis_lines'
                     WHEN NOT (alpha * 5 >= 4 * w) THEN 'alpha_words'
                     WHEN NOT (req >= 2) THEN 'required_words'
                   END AS fail_reason
            FROM m ORDER BY doc_id
        """


#: DuckDB replica of operators.text.c4_clean with the driver entry's
#: settings (min 5 words/line, no terminal-punct requirement, min 3 kept
#: lines, '{' and 'lorem ipsum' doc bans) — identical string rules incl.
#: the rewritten text_clean
_C4_SQL = r"""
            WITH t AS (
              SELECT doc_id, COALESCE(text, '') AS c FROM documents
            ), l AS (
              SELECT doc_id, c,
                     list_filter(list_transform(string_split(c, chr(10)),
                                                x -> trim(x)),
                                 x -> x <> '') AS ls
              FROM t
            ), k AS (
              SELECT doc_id, c, ls,
                     list_filter(ls,
                       x -> len(list_filter(string_split_regex(x, '\s+'),
                                            w -> w <> '')) >= 5
                            AND NOT regexp_matches(lower(x),
                                                   '\bjavascript\b')) AS ks
              FROM l
            )
            SELECT doc_id,
                   CASE WHEN len(ks) >= 3
                             AND NOT contains(lower(c), '{')
                             AND NOT contains(lower(c), 'lorem ipsum')
                        THEN array_to_string(ks, chr(10)) END AS text_clean,
                   CAST(len(ls) AS BIGINT) AS n_lines,
                   CAST(len(ks) AS BIGINT) AS n_lines_kept,
                   (len(ks) >= 3 AND NOT contains(lower(c), '{')
                    AND NOT contains(lower(c), 'lorem ipsum')) AS keep,
                   CASE WHEN NOT (len(ks) >= 3) THEN 'kept_lines'
                        WHEN contains(lower(c), '{') THEN 'curly_brace'
                        WHEN contains(lower(c), 'lorem ipsum')
                          THEN 'banned' END AS fail_reason
            FROM k ORDER BY doc_id
        """


def _pipeline_sql() -> str:
    """DuckDB replica of docs_pipeline_curation: the shared Gopher rule
    CTEs (gkeep), the NB chain over the FILTERED corpus (classifier
    trained and scored on Gopher-keepers, like the Spark side that hands
    the filtered frame to nb_quality_score), logit>0 selection, exact
    keep-first dedup (the _FP_SQL fingerprint), per-language report.
    Weight + prior literals probe over the filtered chain."""
    import duckdb as _duck

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    from duckdb_iceberg_spark.operators.text import laplace_lp6

    ctes = _nb_ctes(gopher_filtered=True)
    con = _duck.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + path.replace("'", "''") + "')")
    pairs = con.execute(ctes + r"""
            SELECT DISTINCT cp, cn,
                   (SELECT CAST(sum(cp) AS BIGINT) FROM cc) AS np,
                   (SELECT CAST(sum(cn) AS BIGINT) FROM cc) AS nn,
                   (SELECT count(*) + 1 FROM vocab) AS v
            FROM cc
    """).fetchall()
    n_pos, n_docs = con.execute(ctes + r"""
            SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM t
    """).fetchone()
    con.close()
    w_values = ", ".join(
        f"({int(cp)}, {int(cn)}, "
        f"CAST('{laplace_lp6(int(cp), int(np), int(v)) - laplace_lp6(int(cn), int(nn), int(v))}'"
        f" AS DECIMAL(18,6)))"
        for cp, cn, np, nn, v in pairs) or "(0, 0, CAST('0' AS DECIMAL(18,6)))"
    n_pos, n_docs = int(n_pos or 0), int(n_docs or 0)
    prior6 = (laplace_lp6(n_pos, max(n_docs, 0), 2)
              - laplace_lp6(n_docs - n_pos, max(n_docs, 0), 2))
    return ctes + rf"""
            , lp(cpv, cnv, w6) AS (
              VALUES {w_values}
            ), nbsc AS (
              SELECT s.doc_id,
                     CASE WHEN count(*) = count(l.w6)
                          THEN sum(l.w6) END AS s6
              FROM stream s
              JOIN cc ON cc.w = s.w
              LEFT JOIN lp l ON l.cpv = cc.cp AND l.cnv = cc.cn
              GROUP BY s.doc_id
            ), sel AS (
              SELECT d.doc_id, d.lang, d.n_chars, d.text
              FROM documents d
              JOIN gkeep USING (doc_id)
              LEFT JOIN nbsc s USING (doc_id)
              WHERE CAST((CAST('{prior6}' AS DECIMAL(18,6))
                          + COALESCE(CAST(s.s6 AS DECIMAL(28,6)),
                                     CAST('0' AS DECIMAL(28,6))))
                         * 1000000 AS BIGINT) > 0
            ), fp AS (
              SELECT doc_id, lang, n_chars, {_FP_SQL} AS f FROM sel
            ), k1 AS (
              SELECT min(doc_id) AS kid FROM fp GROUP BY f
            )
            SELECT lang,
                   count(*) AS n_selected,
                   CAST(sum(CASE WHEN doc_id IN (SELECT kid FROM k1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(COALESCE(sum(CASE WHEN doc_id IN
                                          (SELECT kid FROM k1)
                                     THEN n_chars END), 0) AS BIGINT)
                     AS sum_chars_kept
            FROM fp GROUP BY lang ORDER BY lang
        """


def _bm25_sql() -> str:
    """DuckDB replica of operators.retrieval.bm25_topk: the shared
    tokenizer, the |terms|-bounded hit stream, per-(doc,term) tf, and
    the integer-fraction scoring (module docstring of retrieval.py).
    DATA-DEPENDENT builder (the _lm_sql pattern): N, T, and per-term df
    probe via driver-side DuckDB; the idf literals come from
    operators.retrieval.bm25_idf6 — the SAME CPython decimal-ln the
    operator broadcasts — so neither engine runs a transcendental.
    Positive-only integer division makes DuckDB's floor `//` and
    Spark's truncating DIV identical."""
    import duckdb as _duck

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    from duckdb_iceberg_spark.operators.retrieval import bm25_idf6

    terms_sql = ", ".join(f"'{t}'" for t in sorted(set(_BM25_TERMS)))
    ctes = rf"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), hits AS (
              SELECT doc_id, len(toks) AS dl,
                     unnest(list_filter(toks,
                            w -> w IN ({terms_sql}))) AS w
              FROM t
            ), tf AS (
              SELECT doc_id, w, count(*) AS tf, min(dl) AS dl
              FROM hits GROUP BY doc_id, w
            )"""
    con = _duck.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + path.replace("'", "''") + "')")
    n_docs, t_tokens = con.execute(
        ctes + " SELECT count(*), CAST(COALESCE(sum(len(toks)), 0)"
               " AS BIGINT) FROM t").fetchone()
    dfs = dict(con.execute(
        ctes + " SELECT w, count(*) FROM tf GROUP BY w").fetchall())
    con.close()
    idf_values = ", ".join(
        f"('{t}', {int(bm25_idf6(int(n_docs), int(dfs.get(t, 0))) * 1_000_000)})"
        for t in sorted(set(_BM25_TERMS)))
    return ctes + rf"""
            , idf(w, idf_u) AS (
              VALUES {idf_values}
            ), parts AS (
              SELECT tf.doc_id, i.idf_u, tf.tf,
                     -- dlr = round_half_up(dl*N*1e6 / T), HUGEINT-exact
                     (2 * CAST(tf.dl AS HUGEINT) * {int(n_docs)} * 1000000
                      + {int(t_tokens)})
                     // (2 * CAST({int(t_tokens)} AS HUGEINT)) AS dlr
              FROM tf LEFT JOIN idf i ON i.w = tf.w
            ), scored AS (
              SELECT doc_id, count(*) AS n_matched,
                     CASE WHEN count(*) = count(idf_u) THEN
                       CAST(sum(
                         (2 * CAST(idf_u AS HUGEINT) * 44000000 * tf
                          + (20000000 * CAST(tf AS HUGEINT) + 6000000
                             + 18 * dlr))
                         // (2 * (20000000 * CAST(tf AS HUGEINT) + 6000000
                                  + 18 * dlr))) AS BIGINT)
                     END AS score_micro
              FROM parts GROUP BY doc_id
            )
            SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched,
                   score_micro
            FROM scored
            ORDER BY score_micro DESC, doc_id ASC LIMIT 100
        """


def _nb_ctes(gopher_filtered: bool = False) -> str:
    """The NB classifier's tokenize → corpus-wide vocab → unk-mapped
    stream → per-class count chain (operators.classify.nb_quality_fit
    twin; the tokenizer is the LM family's, operators/text.py lm_tokens).
    With ``gopher_filtered`` the classifier's corpus is the
    Gopher-keepers only (the pipeline composition) — training AND
    scoring see the filtered corpus, exactly like the Spark side that
    passes the filtered frame into nb_quality_score."""
    if gopher_filtered:
        head = ("WITH " + _gopher_ctes(_PIPELINE_REQUIRED) + ", gkeep AS (\n"
                "              SELECT doc_id FROM gm WHERE "
                + _GOPHER_KEEP_SQL + "\n            ), t AS (\n"
                "              SELECT d.doc_id,"
                " COALESCE(d.lang = 'en', FALSE) AS pos,\n"
                "                     list_filter(string_split_regex("
                "lower(trim(d.text)), '\\s+'),\n"
                "                                 x -> x <> '') AS toks\n"
                "              FROM documents d"
                " JOIN gkeep USING (doc_id)\n            )")
    else:
        head = r"""WITH t AS (
              SELECT doc_id, COALESCE(lang = 'en', FALSE) AS pos,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            )"""
    return "\n            " + head + _NB_TAIL


_NB_TAIL = r""", vocab AS (
              SELECT w, count(*) AS c FROM (
                SELECT unnest(toks) AS w FROM t
              ) q GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT 1024
            ), stream AS (
              SELECT tk.doc_id, tk.pos,
                     CASE WHEN vv.w IS NOT NULL THEN tk.w
                          ELSE '<unk>' END AS w
              FROM (SELECT doc_id, pos, unnest(toks) AS w FROM t) tk
              LEFT JOIN vocab vv ON vv.w = tk.w
            ), cc AS (
              SELECT w,
                     CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                       AS cp,
                     CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
                       AS cn
              FROM stream GROUP BY w
            )"""


def _nb_classifier_sql() -> str:
    """DuckDB replica of operators.classify.nb_quality_score: corpus-wide
    top-1024 vocab (count desc, token asc), unk-mapped token stream,
    per-class Laplace log-odds weights. DATA-DEPENDENT builder (the
    _lm_sql pattern): the SQL computes no ln() — the builder derives
    every realized (c_pos, c_neg) count pair plus the class totals with
    driver-side DuckDB (exact integer work) and emits the weight
    round6(ln((cp+1)/(Np+V))) − round6(ln((cn+1)/(Nn+V))) per pair as
    DECIMAL literals via operators.text.laplace_lp6 — the SAME CPython
    function the operator broadcasts, so both engines sum identical
    decimals. scored NULLs its sum when a realized pair is missing from
    the literal table (count guard): loud failure, never a smaller sum."""
    import duckdb as _duck

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    from duckdb_iceberg_spark.operators.text import laplace_lp6

    con = _duck.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + path.replace("'", "''") + "')")
    pairs = con.execute(_nb_ctes() + r"""
            SELECT DISTINCT cp, cn,
                   (SELECT CAST(sum(cp) AS BIGINT) FROM cc) AS np,
                   (SELECT CAST(sum(cn) AS BIGINT) FROM cc) AS nn,
                   (SELECT count(*) + 1 FROM vocab) AS v
            FROM cc
    """).fetchall()
    docs_counts = con.execute("""
            SELECT CAST(sum(CASE WHEN COALESCE(lang = 'en', FALSE)
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM documents
    """).fetchone()
    con.close()
    w_values = ", ".join(
        f"({int(cp)}, {int(cn)}, "
        f"CAST('{laplace_lp6(int(cp), int(np), int(v)) - laplace_lp6(int(cn), int(nn), int(v))}'"
        f" AS DECIMAL(18,6)))"
        for cp, cn, np, nn, v in pairs) or "(0, 0, CAST('0' AS DECIMAL(18,6)))"
    n_pos, n_docs = int(docs_counts[0] or 0), int(docs_counts[1])
    prior6 = (laplace_lp6(n_pos, n_docs, 2)
              - laplace_lp6(n_docs - n_pos, n_docs, 2))
    return _nb_ctes() + rf"""
            , lp(cpv, cnv, w6) AS (
              VALUES {w_values}
            ), scored AS (
              SELECT s.doc_id, count(*) AS n_tokens,
                     CASE WHEN count(*) = count(l.w6)
                          THEN sum(l.w6) END AS s6
              FROM stream s
              JOIN cc ON cc.w = s.w
              LEFT JOIN lp l ON l.cpv = cc.cp AND l.cnv = cc.cn
              GROUP BY s.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST((CAST('{prior6}' AS DECIMAL(18,6))
                         + COALESCE(CAST(s.s6 AS DECIMAL(28,6)),
                                    CAST('0' AS DECIMAL(28,6))))
                        * 1000000 AS BIGINT) AS logit_micro,
                   (CAST((CAST('{prior6}' AS DECIMAL(18,6))
                          + COALESCE(CAST(s.s6 AS DECIMAL(28,6)),
                                     CAST('0' AS DECIMAL(28,6))))
                         * 1000000 AS BIGINT) > 0) AS pred_hq
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
            ORDER BY d.doc_id
        """


def _dsir_sql(k: int = 200, buckets: int = 4096, salt: str = "dsir") -> str:
    """DuckDB replica of operators.sampling.dsir_resample. DATA-DEPENDENT
    builder since r9 (the r8 driver hash-red fix): the SQL computes only
    exact integer bucket counts and DECIMAL joins — every ln() lives in
    literals the builder computed with the SAME CPython code the operator
    uses. The per-bucket log-ratio table replays
    operators.sampling.dsir_log_ratios over counts the builder re-derives
    with driver-side DuckDB (integer-exact); the per-doc Gumbel term
    replays dsir_gumbel6 (hashlib md5 + correctly-rounded decimal ln —
    independent of both engines' md5/ln AND of any platform libm). No
    residual engine-ln class remains since r10: the operator applies
    dsir_gumbel6 itself (pandas UDF), and every literal generator runs
    on decimal ln (operators.exactmath), so the same literals emerge no
    matter which process/JVM/libm generates or grades them."""
    import duckdb as _duck

    from duckdb_iceberg_spark.operators.sampling import (
        dsir_gumbel6,
        dsir_log_ratios,
    )

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    con = _duck.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + path.replace("'", "''") + "')")
    counts = con.execute(r"""
            WITH t AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, lang, unnest(list_concat(
                       toks,
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                     )) AS gram
              FROM t
            ), b AS (
              SELECT lang,
                     CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                       % {bk} AS bk
              FROM g
            )
            SELECT bk, count(*) AS cr,
                   count(*) FILTER (WHERE lang = 'en') AS ct
            FROM b GROUP BY bk
    """.replace("{bk}", str(buckets))).fetchall()
    doc_ids = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    con.close()
    cr = {int(r[0]): int(r[1]) for r in counts}
    ct = {int(r[0]): int(r[2]) for r in counts if r[2]}
    lr = dsir_log_ratios(ct, cr, buckets)
    ratio_values = ", ".join(
        f"({b}, CAST('{v}' AS DECIMAL(18,6)))"
        for b, v in lr if b in cr) or "(0, CAST('0' AS DECIMAL(18,6)))"
    gum_values = ", ".join(
        f"({d}, CAST('{dsir_gumbel6(d, salt)}' AS DECIMAL(18,6)))"
        for d in doc_ids) or "(0, CAST('0' AS DECIMAL(18,6)))"
    return rf"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, unnest(list_concat(
                       toks,
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                     )) AS gram
              FROM t
            ), pb AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                       % {buckets} AS bk,
                     count(*) AS c
              FROM g GROUP BY 1, 2
            ), ratio(bk, lr) AS (
              VALUES {ratio_values}
            ), gum(gid, gv) AS (
              VALUES {gum_values}
            ), w AS (
              SELECT pb.doc_id, sum(ratio.lr * pb.c) AS lw
              FROM pb JOIN ratio ON pb.bk = ratio.bk
              GROUP BY pb.doc_id
            )
            SELECT d.doc_id,
                   -- micro-unit BIGINT rendering since r11 (VERDICT r10
                   -- task 1): decimal(.,6) × 1e6 is exact, one rendering
                   -- the DECIMAL(28,6) narrowing keeps the ×1e6 inside
                   -- decimal width 38 (exact), never the double path
                   CAST(CAST(coalesce(w.lw, 0) AS DECIMAL(28,6))
                        * 1000000 AS BIGINT) AS log_weight_micro,
                   CAST(CAST(coalesce(w.lw, 0) + gum.gv AS DECIMAL(28,6))
                        * 1000000 AS BIGINT) AS score_micro
            FROM documents d
            JOIN gum ON gum.gid = d.doc_id
            LEFT JOIN w ON d.doc_id = w.doc_id
            ORDER BY score_micro DESC, d.doc_id ASC
            LIMIT {k}
    """


def _incremental_minhash_sql(num_hashes: int = 32, bands: int = 8,
                             shingle_k: int = 5,
                             threshold: float = 0.7,
                             split: int = 250,
                             pre_cte: str = "",
                             src: str = "documents",
                             final_sql: str | None = None) -> str:
    """DuckDB replica of operators.dedup.incremental_minhash_dedup over
    the corpus (doc_id < split) / batch (>= split) halves: batch exact
    collapse + exact anti vs corpus fingerprints, within-batch LSH
    dedup (bucket-min pairing + exact-Jaccard verify), then batch
    survivors verified against every corpus representative sharing a
    band. Shares the signature/banding spec with _minhash_sql (signatures
    are computed once over all documents — per-doc independent). Same
    murmur-vs-values banding note as _minhash_sql: Spark's candidate set
    is a collision superset, the exact verify makes survivors identical."""
    from duckdb_iceberg_spark.operators.dedup import _hash_params

    a, b = _hash_params(num_hashes)
    rpb = num_hashes // bands
    mins = ",\n                     ".join(
        f"min(((CAST({int(au)} AS HUGEINT) * h + {int(bu)})"
        f" % 18446744073709551616) // 2) AS s{i}"
        for i, (au, bu) in enumerate(zip(a, b)))
    banded = "\n              UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, {cols} FROM sig".format(
            bi=bi, cols=", ".join(f"s{bi * rpb + j} AS k{j}" for j in range(rpb)))
        for bi in range(bands))
    keys = ", ".join(f"k{j}" for j in range(rpb))
    key_eq = " AND ".join(f"o.k{j} = n.k{j}" for j in range(rpb))
    jacc = (f"round(CAST(COALESCE(i.i, 0) AS DOUBLE)"
            f" / (sa.n + sb.n - COALESCE(i.i, 0)), 6) >= {threshold}")
    return f"""
            WITH {pre_cte}{_rolling_hash_cte(shingle_k, src)}, sh AS (
              SELECT DISTINCT doc_id, h FROM hh
            ), sig AS (
              SELECT doc_id, {mins}
              FROM sh GROUP BY doc_id
            ), banded AS (
              {banded}
            ), nfp AS (
              SELECT doc_id, {_FP_SQL} AS fp FROM {src}
              WHERE doc_id >= {split}
            ), batch0 AS (
              SELECT doc_id FROM nfp f
              WHERE doc_id IN (SELECT min(doc_id) FROM nfp GROUP BY fp)
                AND NOT EXISTS (
                  SELECT 1 FROM (
                    SELECT DISTINCT {_FP_SQL} AS fp FROM {src}
                    WHERE doc_id < {split}) c
                  WHERE c.fp = f.fp)
            ), cands_b AS (
              SELECT DISTINCT m AS id_a, doc_id AS id_b FROM (
                SELECT b.doc_id,
                       min(b.doc_id) OVER (PARTITION BY band, {keys}) AS m
                FROM banded b JOIN batch0 USING (doc_id)) q
              WHERE doc_id <> m
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter_b AS (
              SELECT c.id_a, c.id_b, count(*) AS i
              FROM cands_b c
              JOIN sh x ON x.doc_id = c.id_a
              JOIN sh y ON y.doc_id = c.id_b AND y.h = x.h
              GROUP BY c.id_a, c.id_b
            ), losers_b AS (
              SELECT DISTINCT c.id_b FROM cands_b c
              JOIN sizes sa ON sa.doc_id = c.id_a
              JOIN sizes sb ON sb.doc_id = c.id_b
              LEFT JOIN inter_b i ON i.id_a = c.id_a AND i.id_b = c.id_b
              WHERE {jacc}
            ), batch1 AS (
              SELECT doc_id FROM batch0
              WHERE doc_id NOT IN (SELECT id_b FROM losers_b)
            ), cfp AS (
              SELECT doc_id, {_FP_SQL} AS fp FROM {src}
              WHERE doc_id < {split}
            ), creps AS (
              SELECT doc_id FROM cfp
              WHERE doc_id IN (SELECT min(doc_id) FROM cfp GROUP BY fp)
            ), cross_c AS (
              SELECT DISTINCT o.doc_id AS id_a, n.doc_id AS id_b
              FROM (SELECT b1.* FROM banded b1 JOIN creps USING (doc_id)) o
              JOIN (SELECT b2.* FROM banded b2 JOIN batch1 USING (doc_id)) n
                ON o.band = n.band AND {key_eq}
            ), inter_x AS (
              SELECT c.id_a, c.id_b, count(*) AS i
              FROM cross_c c
              JOIN sh x ON x.doc_id = c.id_a
              JOIN sh y ON y.doc_id = c.id_b AND y.h = x.h
              GROUP BY c.id_a, c.id_b
            ), losers_x AS (
              SELECT DISTINCT c.id_b FROM cross_c c
              JOIN sizes sa ON sa.doc_id = c.id_a
              JOIN sizes sb ON sb.doc_id = c.id_b
              LEFT JOIN inter_x i ON i.id_a = c.id_a AND i.id_b = c.id_b
              WHERE {jacc}
            ), batch2 AS (
              SELECT doc_id FROM batch1
              WHERE doc_id NOT IN (SELECT id_b FROM losers_x)
            )
            {final_sql or f'''SELECT lang, count(*) AS cnt, min(doc_id) AS min_id,
                   max(doc_id) AS max_id
            FROM {src} JOIN batch2 USING (doc_id)
            GROUP BY lang ORDER BY lang'''}
    """


def _srp_bucket_sql(col: str, planes, dim: int) -> str:
    """DuckDB replica of operators.similarity.srp_bucket_column: per-plane
    double dot product (left-fold chain), sign bits packed into an int.
    Shared by the emb_neardup and emb_lsh_topk oracles.

    Known (accepted) flake risk: the Spark side computes the dot product
    via numpy/BLAS matmul (pairwise/blocked summation) while this SQL is a
    sequential left-fold of double adds — a dot product within ~1e-13 of
    zero could take a different SIGN across the two association orders and
    flip one bucket bit, failing the hash check. The fixture embeddings
    (unit-norm random vs random gaussian hyperplanes) put dot products
    ~1e-2 from zero, ~11 orders of magnitude above double rounding error,
    so the disagreement probability is negligible; if it ever fires,
    regenerate the plane seed rather than chasing determinism across
    BLAS builds."""
    return " + ".join(
        "(CASE WHEN ({d}) >= 0 THEN {v} ELSE 0 END)".format(
            v=1 << i,
            d="\n                        + ".join(
                f"CAST({col}[{j + 1}] AS DOUBLE) * ({planes[i][j]!r})"
                for j in range(dim)))
        for i in range(len(planes)))


def _tfidf_sql(top_n: int = 3) -> str:
    """DuckDB replica of operators.text.tfidf_top_terms. DATA-DEPENDENT
    builder since r9 (the recompute-ln audit): smooth idf
    ln((N+1)/(df+1)) + 1 is emitted as one DOUBLE literal per REALIZED
    document-frequency value (CPython libm, repr-round-tripped) instead
    of being re-derived by the checking engine's ln(). The N and df
    values themselves are exact integer work recomputed in SQL; the
    inner JOIN fails loudly if a df value the builder didn't see
    appears. Residual: the operator's idf is JVM F.log — the ≤1-ulp
    JVM-vs-CPython class (SURVEY §8), not the several-ulp engine class."""
    import math

    import duckdb as _duck

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    con = _duck.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('"
                + path.replace("'", "''") + "')")
    n_docs, = con.execute("SELECT count(*) FROM documents").fetchone()
    dfs = [int(r[0]) for r in con.execute(r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), tfc AS (
              SELECT doc_id, term FROM
                (SELECT doc_id, unnest(toks) AS term FROM t)
              GROUP BY doc_id, term
            )
            SELECT DISTINCT count(*) AS df FROM tfc GROUP BY term
    """).fetchall()]
    con.close()
    idf_values = ", ".join(
        f"({d}, CAST('{math.log((n_docs + 1.0) / (d + 1)) + 1!r}'"
        " AS DOUBLE))"
        for d in sorted(dfs)) or "(0, CAST('0' AS DOUBLE))"
    return rf"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), tfc AS (
              SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id, unnest(toks) AS term FROM t)
              GROUP BY doc_id, term
            ), dfreq AS (
              SELECT term, count(*) AS df FROM tfc GROUP BY term
            ), idf(dfv, iv) AS (
              VALUES {idf_values}
            ), scored AS (
              SELECT doc_id, term, tf,
                     round(tf * i.iv, 6) AS score
              FROM tfc JOIN dfreq USING (term) JOIN idf i ON i.dfv = dfreq.df
            ), ranked AS (
              SELECT doc_id, term, tf, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term) AS "rank"
              FROM scored
            )
            SELECT doc_id, term, tf, score, "rank" FROM ranked
            WHERE "rank" <= {top_n} ORDER BY doc_id, "rank"
    """


def _cos6_sql(v: str, q: str, dim: int = 64) -> str:
    """round6 cosine replicating operators.similarity.cosine_similarity's
    exact JVM evaluation order: left-to-right dot and squared-norm
    chains (F.aggregate's fold), sqrt (correctly rounded IEEE), denom =
    norm_v * norm_q, CASE denom > 0. Every op is an exactly-rounded
    IEEE double op in both engines, so the value is bit-identical —
    unlike list_cosine_similarity, whose internal summation order is
    not contractual (the r9 recompute-float audit)."""
    dot = " + ".join(f"({v}[{i}] * {q}[{i}])" for i in range(1, dim + 1))
    sv = " + ".join(f"({v}[{i}] * {v}[{i}])" for i in range(1, dim + 1))
    sq = " + ".join(f"({q}[{i}] * {q}[{i}])" for i in range(1, dim + 1))
    return (f"round(CASE WHEN (sqrt({sv}) * sqrt({sq})) > 0"
            f" THEN ({dot}) / (sqrt({sv}) * sqrt({sq}))"
            f" ELSE 0.0 END, 6)")


def _cos6_lit_sql(v: str, qvec, dim: int = 64) -> str:
    """:func:`_cos6_sql` with the query side as repr-round-tripped DOUBLE
    literals (for builders that hold the query vector driver-side)."""
    ql = [f"CAST('{float(x)!r}' AS DOUBLE)" for x in qvec]
    dot = " + ".join(f"({v}[{i + 1}] * {ql[i]})" for i in range(dim))
    sv = " + ".join(f"({v}[{i}] * {v}[{i}])" for i in range(1, dim + 1))
    sq = " + ".join(f"({l} * {l})" for l in ql)
    return (f"round(CASE WHEN (sqrt({sv}) * sqrt({sq})) > 0"
            f" THEN ({dot}) / (sqrt({sv}) * sqrt({sq}))"
            f" ELSE 0.0 END, 6)")


def _lsh_topk_sql(dim: int = 64, n_planes: int = 6, seed: int = 42,
                  k: int = 10) -> str:
    """DuckDB replica of operators.similarity.cosine_topk_lsh: bucket the
    corpus AND the query row with the same hyperplanes, probe only the
    query's bucket, rank by cosine (vec_id-only output like
    emb_cosine_topk — float ordering stays internal)."""
    from duckdb_iceberg_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    bucket_e = _srp_bucket_sql("e.embedding", planes, dim)
    bucket_q = _srp_bucket_sql("q.embedding", planes, dim)
    return f"""
            WITH q AS (SELECT embedding,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0),
            qb AS (SELECT ({bucket_q}) AS bkt FROM q),
            b AS (
              SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
                     ({bucket_e}) AS bkt
              FROM embeddings e WHERE e.vec_id <> 0
            )
            SELECT b.vec_id
            FROM b, q, qb
            WHERE b.bkt = qb.bkt
            ORDER BY {_cos6_sql("b.v", "q.qv", dim)} DESC,
                     b.vec_id
            LIMIT {k}
    """


def _knn_join_bucketed_sql(dim: int = 64, n_planes: int = 6, seed: int = 42,
                           k: int = 5, nprobe: int = 3) -> str:
    """DuckDB replica of operators.similarity.knn_join_bucketed: corpus
    rows bucket by SRP sign bits; each query probes its own bucket plus
    the nprobe-1 least-confident bit flips (planes ordered by |dot|
    ascending, ties by plane index — matching numpy's stable argsort);
    candidates come from the bucket equi-join and rank by rounded cosine.
    Same accepted sign-flip risk as _srp_bucket_sql; the |dot| ORDERING
    adds a tie risk of the same magnitude (two planes within double
    rounding of each other), equally negligible on the fixture."""
    from duckdb_iceberg_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    bucket_e = _srp_bucket_sql("e.embedding", planes, dim)

    def dot(i: int) -> str:
        return "\n                        + ".join(
            f"CAST(q.embedding[{j + 1}] AS DOUBLE) * ({planes[i][j]!r})"
            for j in range(dim))

    dots = ",\n                   ".join(
        f"({dot(i)}) AS d{i}" for i in range(n_planes))
    structs = ", ".join(
        "{'a': abs(d%d), 'i': %d}" % (i, i) for i in range(n_planes))
    base = " + ".join(
        f"(CASE WHEN d{i} >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes))
    flips = ", ".join(
        f"xor(base, (1 << pl[{j + 1}].i))" for j in range(nprobe - 1))
    return f"""
            WITH qd AS (
              SELECT q.vec_id AS q_id, CAST(q.embedding AS DOUBLE[]) AS q_vec,
                   {dots}
              FROM embeddings q WHERE q.vec_id IN (0, 1, 2)),
            qb AS (
              SELECT q_id, q_vec, ({base}) AS base,
                     list_sort([{structs}]) AS pl
              FROM qd),
            probes AS (
              SELECT q_id, q_vec, unnest([base, {flips}]) AS bkt FROM qb),
            corpus AS (
              SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb,
                     ({bucket_e}) AS bkt
              FROM embeddings e WHERE e.vec_id > 2),
            scored AS (
              SELECT p.q_id, c.vec_id,
                     {_cos6_sql("c.emb", "p.q_vec", dim)} AS sim
              FROM corpus c JOIN probes p USING (bkt)),
            ranked AS (
              SELECT q_id, vec_id,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY sim DESC, vec_id) AS "rank"
              FROM scored)
            SELECT q_id, vec_id, "rank" FROM ranked
            WHERE "rank" <= {k} ORDER BY q_id, "rank"
    """


def _bpe_sql(num_merges: int = 64, sample_size: int = 1024,
             seed: int = 42) -> str:
    """Literal-replay oracle for docs_bpe_tokens: re-derive the merge
    table with the operator's OWN pure fit over the replica-ordered
    sample (spark_xxhash64_long_intlit reproduces F.xxhash64 bit-exact),
    apply the same CPython counting function to every row read via
    DuckDB, aggregate in python, and emit the per-language stats as a
    VALUES literal — integers only, nothing engine-dependent."""
    from collections import Counter

    import duckdb as _duck

    from duckdb_iceberg_spark.functions.xxhash64 import (
        spark_xxhash64_long_intlit,
    )
    from duckdb_iceberg_spark.operators.bpe import (
        _words,
        bpe_count_tokens_py,
        bpe_fit,
    )

    path = os.path.join(_oracle_sf_dir(), "documents.parquet")
    con = _duck.connect()
    rows = con.execute(
        "SELECT doc_id, lang, text FROM read_parquet(?)", [path]).fetchall()
    con.close()

    sample = sorted(
        (r for r in rows if r[2] is not None),
        key=lambda r: spark_xxhash64_long_intlit(r[0], seed))[:sample_size]
    wf: Counter = Counter()
    for _id, _lang, text in sample:
        wf.update(_words(text))
    ranks = {p: i for i, p in enumerate(bpe_fit(wf, num_merges))}

    agg: dict[str, list[int]] = {}
    for _id, lang, text in rows:
        n = bpe_count_tokens_py(text, ranks) if text is not None else 0
        ent = agg.setdefault(lang, [0, 0, None, None])
        ent[0] += 1
        ent[1] += n
        ent[2] = n if ent[2] is None else min(ent[2], n)
        ent[3] = n if ent[3] is None else max(ent[3], n)

    def esc(s: str) -> str:
        return s.replace("'", "''")

    vals = ",\n                   ".join(
        f"('{esc(lang)}', CAST({e[0]} AS BIGINT), CAST({e[1]} AS BIGINT),"
        f" CAST({e[2]} AS BIGINT), CAST({e[3]} AS BIGINT))"
        for lang, e in sorted(agg.items()))
    return f"""
            SELECT * FROM (VALUES
                   {vals})
            AS t(lang, n_docs, sum_tokens, min_tokens, max_tokens)
            ORDER BY lang
    """


def _sq_topk_sql(topk: int = 10) -> str:
    """DuckDB replica of the emb_sq_topk pipeline, with the bounds
    DERIVED INDEPENDENTLY: per-dimension min/max come from DuckDB's own
    aggregates over the parquet (exact — no accumulation), the scales
    from the same 256/(max−min) binary64 division, and the query codes
    from CPython math.floor via the operator's own quantizer. The row
    codes replay as SQL: clamp(floor((v[i] − min_i)·scale_i)) with every
    float literal repr-round-tripped (REAL − DOUBLE promotes exactly as
    Spark's float−double), and the score is a pure-integer dot chain —
    no float ever reaches the compared output."""
    import duckdb as _duck

    from duckdb_iceberg_spark.operators.similarity import (
        sq_quantize_query,
        sq_scales,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                            "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    con = _duck.connect()
    dim = con.execute(
        "SELECT len(embedding) FROM read_parquet(?) LIMIT 1",
        [path]).fetchone()[0]
    agg = ", ".join(
        f"min(embedding[{i + 1}]), max(embedding[{i + 1}])"
        for i in range(dim))
    flat = con.execute(
        f"SELECT {agg} FROM read_parquet(?) WHERE vec_id != 0",
        [path]).fetchone()
    qvec = con.execute(
        "SELECT embedding FROM read_parquet(?) WHERE vec_id = 0",
        [path]).fetchone()[0]
    con.close()
    bounds = [(float(flat[2 * i]), float(flat[2 * i + 1]))
              for i in range(dim)]
    scales = sq_scales(bounds)
    qcodes = sq_quantize_query(qvec, bounds)

    def dlit(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    terms = [
        f"{qcodes[i]} * LEAST(255, GREATEST(CAST(0 AS BIGINT), "
        f"CAST(floor((embedding[{i + 1}] - {dlit(bounds[i][0])})"
        f" * {dlit(scales[i])}) AS BIGINT)))"
        for i in range(dim) if qcodes[i] != 0
    ]
    dot = ("\n                   + ".join(terms)) or "CAST(0 AS BIGINT)"
    return f"""
            SELECT vec_id,
                   CAST({dot} AS BIGINT) AS sq_score
            FROM embeddings
            WHERE vec_id != 0
            ORDER BY sq_score DESC, vec_id ASC
            LIMIT {topk}
    """


def _pq_topk_sql(m: int = 4, k: int = 16, topk: int = 10, seed: int = 42,
                 iters: int = 8, sample_size: int = 2048) -> str:
    """DuckDB replica of the emb_pq_topk pipeline. The codebook fit is
    deterministic given the corpus (seeded init, xxhash64-ordered sample),
    so this builder re-trains the SAME books driver-side — the sample
    order comes from the pure-Python replica of Spark's xxhash64
    (functions/xxhash64.py, bit-verified against F.xxhash64) and the
    Lloyd core is the shared _pq_fit — then replays the distributed half
    in SQL: per-subspace encode as a left-to-right squared-distance chain
    (exactly what pq_encode's sequential accumulation computes) with
    ties-to-lowest argmin via struct list_sort, and ADC scoring as m
    list-literal lookups summed left-to-right. Every float literal is
    repr-round-tripped, so both engines run bit-identical IEEE doubles.

    The corpus is read from $SPARK_GRAFT_ORACLE_SF_DIR (default sf0.01 —
    the driver's correctness SF; tools/check_oracle.py sets it to its
    sf_dir so local sweeps at other SFs stay honest)."""
    import duckdb as _duck
    import numpy as np

    from duckdb_iceberg_spark.functions.xxhash64 import (
        spark_xxhash64_long_intlit,
    )
    from duckdb_iceberg_spark.operators.similarity import _pq_fit

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                            "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    con = _duck.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM read_parquet(?) WHERE vec_id != 0",
        [path]).fetchall()
    qvec = con.execute(
        "SELECT embedding FROM read_parquet(?) WHERE vec_id = 0",
        [path]).fetchone()[0]
    con.close()
    rows.sort(key=lambda r: spark_xxhash64_long_intlit(r[0], seed))
    X = np.asarray([list(r[1]) for r in rows[:sample_size]], dtype="float64")
    books = _pq_fit(X, m, k, iters, seed)
    q = np.asarray(qvec, dtype="float64")
    dim = len(q)
    dsub = dim // m
    # same numpy expression as pq_topk builds its literal tables from —
    # the VALUES must match that plan's literals bit-for-bit
    tables = [
        ((books[j] - q[j * dsub:(j + 1) * dsub][None, :]) ** 2).sum(axis=1)
        for j in range(m)
    ]

    def dlit(x: float) -> str:
        # bare decimal literals parse as DECIMAL in DuckDB (the r6
        # HUGEINT-class trap); a string cast is strtod — correctly
        # rounded, bit-identical to Spark's double literal
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    def chain(j: int, c: int) -> str:
        return "\n                 + ".join(
            f"(v[{j * dsub + t + 1}] - {dlit(books[j][c][t])})"
            f" * (v[{j * dsub + t + 1}] - {dlit(books[j][c][t])})"
            for t in range(dsub))

    codes = ",\n               ".join(
        "list_sort(["
        + ", ".join(
            "{'a': (%s), 'i': %d}" % (chain(j, c), c) for c in range(k))
        + f"])[1].i AS c{j}"
        for j in range(m))
    adc = " + ".join(
        "([" + ", ".join(dlit(x) for x in tables[j]) + f"])[c{j} + 1]"
        for j in range(m))
    return f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id != 0
            ), enc AS (
              SELECT vec_id,
               {codes}
              FROM e
            )
            SELECT vec_id, round({adc}, 6) AS adc_dist
            FROM enc
            ORDER BY adc_dist ASC, vec_id ASC
            LIMIT {topk}
    """


def _ivf_topk_sql(n_centroids: int = 16, nprobe: int = 4, k: int = 10,
                  seed: int = 42) -> str:
    """DuckDB replica of the emb_ivf_topk pipeline. IVF centroids are a
    deterministic hash-sample of the corpus (xxhash64-ordered ids — no
    training at all), so the builder reproduces them with the pure-Python
    xxhash64 replica, emits the normalized centroids and the driver-side
    probe list as literals, and replays assignment + cosine top-k in SQL.
    Assignment is BIT-EXACT, not merely ranking-equivalent: the operator
    accumulates dot(raw row, unit centroid) left-to-right over dims
    (see ivf_topk), which is exactly what the explicit ``+`` chains here
    evaluate — the same trick that makes the PQ encode replay exact.
    Since r9 the output cosine is exact too: _cos6_lit_sql replays the
    operator's fold order instead of list_cosine_similarity (the
    recompute-float audit)."""
    import duckdb as _duck
    import numpy as np

    from duckdb_iceberg_spark.functions.xxhash64 import (
        spark_xxhash64_long_intlit,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                            "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    con = _duck.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM read_parquet(?) WHERE vec_id != 0",
        [path]).fetchall()
    qvec = con.execute(
        "SELECT embedding FROM read_parquet(?) WHERE vec_id = 0",
        [path]).fetchone()[0]
    con.close()
    rows.sort(key=lambda r: spark_xxhash64_long_intlit(r[0], seed))
    cents = np.asarray([list(r[1]) for r in rows[:n_centroids]],
                       dtype="float64")
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    q = np.asarray(qvec, dtype="float64")
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cents @ qn))[:nprobe].tolist()

    def dot_chain(c: int) -> str:
        # explicit left-to-right chain — matches the operator's
        # sequential accumulation bit-for-bit (list_inner_product's
        # internal summation order is not contractual)
        return "\n                        + ".join(
            f"v[{t + 1}] * CAST('{float(cents[c][t])!r}' AS DOUBLE)"
            for t in range(cents.shape[1]))

    assigns = ", ".join(
        "{'a': -(%s), 'i': %d}" % (dot_chain(c), c)
        for c in range(n_centroids))
    return f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id != 0
            ), a AS (
              SELECT vec_id, v,
                     list_sort([{assigns}])[1].i AS lst
              FROM e
            )
            SELECT vec_id,
                   {_cos6_lit_sql("v", q, len(q))} AS similarity
            FROM a WHERE lst IN ({", ".join(str(int(p)) for p in probes)})
            ORDER BY similarity DESC, vec_id ASC
            LIMIT {k}
    """


def _kmeans_rows(seed: int = 42):
    import duckdb as _duck

    path = os.path.join(_oracle_sf_dir(), "embeddings.parquet")
    con = _duck.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM read_parquet(?)", [path]).fetchall()
    con.close()
    return rows


def _kmeans_sql(n_clusters: int = 8, iters: int = 2, seed: int = 42) -> str:
    """DuckDB replica of the emb_kmeans pipeline (hash-checked since r9):
    clustering.kmeans_replica re-runs the deterministic fit driver-side
    (same xxhash64-ordered init, same left-to-right assignment
    accumulation, same order-independent micro-unit centroid sums), then
    this SQL replays ONLY the final assignment from centroid literals —
    explicit ``+`` chains with ties-to-lowest argmax via struct
    list_sort, the IVF pattern — and aggregates membership per cluster."""
    from duckdb_iceberg_spark.operators.clustering import kmeans_replica

    rows = _kmeans_rows(seed)
    _, _, cents = kmeans_replica(rows, n_clusters, iters, seed)
    k, dim = cents.shape

    def dot_chain(c: int) -> str:
        return "\n                        + ".join(
            f"v[{t + 1}] * CAST('{float(cents[c][t])!r}' AS DOUBLE)"
            for t in range(dim))

    assigns = ", ".join(
        "{'a': -(%s), 'i': %d}" % (dot_chain(c), c) for c in range(k))
    return f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), a AS (
              SELECT vec_id,
                     list_sort([{assigns}])[1].i AS cluster_id
              FROM e
            )
            SELECT CAST(cluster_id AS INT) AS cluster_id,
                   count(*) AS n_members,
                   min(vec_id) AS min_id,
                   CAST(sum(vec_id) AS BIGINT) AS id_sum
            FROM a GROUP BY cluster_id ORDER BY cluster_id
    """


def _semdedup_sql(threshold: float = 0.99, n_clusters: int = 8,
                  iters: int = 2, seed: int = 42) -> str:
    """DuckDB replica of emb_semantic_dedup (hash-checked since r9):
    clustering.semantic_dedup_replica replays the deterministic fit and
    the greedy within-cluster drop driver-side; the SQL cross-checks the
    literal survivor set against the corpus table (membership, count,
    min, sum). See clustering.py for the documented threshold-adjacency
    caveat — the only float compare the replay leans on."""
    from duckdb_iceberg_spark.operators.clustering import (
        semantic_dedup_replica,
    )

    rows = _kmeans_rows(seed)
    ids = semantic_dedup_replica(rows, threshold, n_clusters, iters, seed)
    id_list = ", ".join(str(i) for i in ids) or "NULL"
    return f"""
            SELECT count(*) AS survivors,
                   min(vec_id) AS min_id,
                   CAST(sum(vec_id) AS BIGINT) AS id_sum
            FROM embeddings WHERE vec_id IN ({id_list})
    """


_ANN_ORACLE_CACHE: dict[str, dict[str, str]] = {}


def _data_oracles() -> dict[str, str]:
    """The DATA-DEPENDENT oracle builders: each reads the corpus parquet
    and re-derives a deterministic driver-side model (PQ codebooks, IVF
    centroids, k-means fit, DSIR ratio/Gumbel tables, the LM log-prob
    pair table, tf-idf's idf table), then replays it as SQL literals —
    the r9 rule that no oracle recomputes ln()/float folds in the
    checking engine. Build once per oracle sf_dir (oracle_sql() is
    called repeatedly by the contract test and local sweeps). OMIT the
    group — degrading exactly these queries to rows-only — ONLY when the
    corpus itself is unreadable (missing testdata mount, duckdb IO
    error); any other builder failure is a real bug and raises (ADVICE
    r8: a blanket except silently parked the hash coverage these
    rotations claim)."""
    import duckdb as _duck

    sf_dir = _oracle_sf_dir()
    if sf_dir not in _ANN_ORACLE_CACHE:
        try:
            _ANN_ORACLE_CACHE[sf_dir] = {
                "emb_pq_topk": _pq_topk_sql(),
                "emb_sq_topk": _sq_topk_sql(),
                "docs_bpe_tokens": _bpe_sql(),
                "emb_ivf_topk": _ivf_topk_sql(),
                "emb_kmeans": _kmeans_sql(),
                "emb_semantic_dedup": _semdedup_sql(),
                "docs_dsir_sample": _dsir_sql(),
                "docs_lm_score": _lm_sql(),
                "docs_lm_buckets": _lm_sql(buckets=True),
                "docs_quality_classifier": _nb_classifier_sql(),
                "docs_bm25_topk": _bm25_sql(),
                "docs_gopher_filter": _GOPHER_SQL,
                "docs_pipeline_curation": _pipeline_sql(),
                "docs_c4_clean": _C4_SQL,
                "docs_tfidf": _tfidf_sql(),
                "docs_temperature_sample": _temperature_sql(),
                "docs_cluster_sample": _cluster_sample_sql(),
            }
        except (FileNotFoundError, OSError, _duck.IOException):
            _ANN_ORACLE_CACHE[sf_dir] = {}
        except _duck.Error as e:
            # duckdb wraps a missing-parquet IO error in
            # InvalidInputException when it surfaces through a pending
            # query — still the unreadable-corpus class; anything else
            # is a real builder bug and must raise
            if "No files found" in str(e) or "IO Error" in str(e):
                _ANN_ORACLE_CACHE[sf_dir] = {}
            else:
                raise
    return _ANN_ORACLE_CACHE[sf_dir]


def _ngram_dedup_sql(n: int = 3, threshold: float = 0.8) -> str:
    """DuckDB replica of operators.dedup.ngram_jaccard_dedup: word n-grams
    (Spark's split keeps empty tokens — no list_filter here), distinct per
    doc, pairwise intersection counts via self-join on shared grams,
    Jaccard >= threshold drops the higher id. Grams compare as STRINGS here
    vs 32-bit F.hash values in Spark — identical results unless two
    distinct grams of one document collide (~1e-5 per 200-gram doc)."""
    return f"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(text), '\\s+') AS toks
              FROM documents WHERE text IS NOT NULL
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(0, greatest(len(toks) - {n}, 0) + 1),
                       i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' ')
                     )) AS grams
              FROM t
            ), e AS (
              SELECT doc_id, unnest(grams) AS gr FROM g
            ), s AS (
              SELECT doc_id, len(grams) AS sz FROM g
            ), p AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS inter
              FROM e l JOIN e r ON l.gr = r.gr AND l.doc_id < r.doc_id
              GROUP BY 1, 2
            ), losers AS (
              SELECT DISTINCT id_b FROM p
              JOIN s a ON a.doc_id = p.id_a
              JOIN s b ON b.doc_id = p.id_b
              WHERE inter * 1.0 / (a.sz + b.sz - inter) >= {threshold}
            )
            SELECT count(*) AS survivors,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM documents
            WHERE doc_id NOT IN (SELECT id_b FROM losers)
    """


def _neardup_sql(dim: int = 64, n_planes: int = 8, seed: int = 42,
                 threshold: float = 0.99) -> str:
    """DuckDB replica of operators.dedup.embedding_neardup. Floating-point
    exactness hinges on replicating Spark's promotion rules: SRP bucket dots
    are double×double (vec cast to double), while the pairwise cosine
    multiplies RAW float32 elements (float32 product, then double
    accumulation) — so products here are CAST(... AS REAL) before the double
    sum, and every sum is an explicit left-fold chain matching F.aggregate's
    order. Hyperplane coefficients come from the package's seeded generator,
    embedded at full repr precision."""
    from duckdb_iceberg_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    bucket = _srp_bucket_sql("embedding", planes, dim)
    sq = "\n                       + ".join(
        f"CAST(CAST(embedding[{j + 1}] * embedding[{j + 1}] AS REAL) AS DOUBLE)"
        for j in range(dim))
    dot = "\n                         + ".join(
        f"CAST(CAST(l.embedding[{j + 1}] * r.embedding[{j + 1}] AS REAL) AS DOUBLE)"
        for j in range(dim))
    return f"""
            WITH b AS (
              SELECT vec_id, embedding,
                     ({bucket}) AS bucket,
                     sqrt({sq}) AS nrm
              FROM embeddings
            ), losers AS (
              SELECT DISTINCT r.vec_id
              FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
              WHERE (CASE WHEN l.nrm * r.nrm > 0
                          THEN ({dot}) / (l.nrm * r.nrm)
                          ELSE 0.0 END) >= {threshold}
            )
            SELECT count(*) AS survivors FROM embeddings
            WHERE vec_id NOT IN (SELECT vec_id FROM losers)
    """


# 60-bit md5 blob hash shared by the multimodal fake decoders
# (= operators.multimodal._blob_hash60 over the utf-8 text bytes)
_MM_HASH_CTE = """
            WITH h AS (
              SELECT doc_id AS id,
                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                     CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
              FROM documents
            )
"""


def _lang_score_sql(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        f"x -> list_contains([{lst}], x)))"
    )


def oracle_sql() -> dict[str, str]:
    from duckdb_iceberg_spark.operators.text import _LANG_MARKERS

    lang_cols = ", ".join(
        f"CAST({_lang_score_sql(_LANG_MARKERS[l])} AS INT) AS score_{l}"
        for l in sorted(_LANG_MARKERS)
    )
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS sum_disc_price,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_charge,
                   round(CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(28,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
                   round(CAST(sum(CAST(round(l_discount, 2) AS DECIMAL(28,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q01_mor_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS sum_disc_price,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_charge,
                   round(CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(28,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
                   round(CAST(sum(CAST(round(l_discount, 2) AS DECIMAL(28,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              AND l_orderkey % 20 <> 0
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q03_shipping_priority": """
            SELECT l_orderkey,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q05_region_revenue": """
            SELECT n_name,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS revenue
            FROM region, nation, customer, orders, lineitem, supplier
            WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
              AND c_nationkey = n_nationkey AND o_custkey = c_custkey
              AND l_orderkey = o_orderkey AND s_suppkey = l_suppkey
              AND s_nationkey = c_nationkey
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "q06_revenue_forecast": """
            SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        "q04_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q07_volume_shipping": """
            SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
                   year(l_shipdate) AS l_year,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region cr ON cn.n_regionkey = cr.r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN region sr ON sn.n_regionkey = sr.r_regionkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
              AND ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE')
                   OR (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q08_market_share": """
            SELECT year(o_orderdate) AS o_year,
                   round(
                     CAST(sum(CASE WHEN sr.r_name = 'ASIA'
                              THEN CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))
                              ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                     / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE),
                     6) AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region cr ON cn.n_regionkey = cr.r_regionkey AND cr.r_name = 'ASIA'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN region sr ON sn.n_regionkey = sr.r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        "q09_product_profit": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2 ORDER BY nation, o_year DESC
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
                   round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-10-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND l_returnflag = 'R'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "q13_customer_distribution": """
            SELECT c_count, count(*) AS custdist FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
                GROUP BY c_custkey) t
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
        "q14_promo_revenue": """
            SELECT round(
                     100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))
                              ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                     / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE),
                     6) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        """,
        "q15_top_supplier": """
            WITH revenue AS (
                SELECT l_suppkey AS supplier_no,
                       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
            ORDER BY s_suppkey
        """,
        "q16_supplier_cnt": """
            SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q17_small_quantity": """
            SELECT round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(28,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
            FROM lineitem
            JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#1'
            JOIN (SELECT l_partkey AS agg_partkey, count(*) AS cnt,
                         sum(CAST(l_quantity AS BIGINT)) AS sq
                  FROM lineitem GROUP BY l_partkey) pa
              ON l_partkey = agg_partkey
            WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sq
        """,
        "q18_large_volume": """
            SELECT c_name, c_custkey, o_orderkey,
                   CAST(o_orderdate AS VARCHAR) AS o_orderdate,
                   o_totalprice, sum_qty
            FROM orders
            JOIN (SELECT l_orderkey,
                         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(CAST(l_quantity AS BIGINT)) > 150) big
              ON o_orderkey = big.l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "q19_disjunctive": """
            SELECT round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 2) AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 40)
        """,
        "q02_min_cost_supplier": """
            WITH partsup AS (
              SELECT l_partkey, l_suppkey,
                     min(round(l_extendedprice / l_quantity, 4)) AS cost
              FROM lineitem GROUP BY 1, 2
            ), minc AS (
              SELECT l_partkey, min(cost) AS min_cost FROM partsup GROUP BY 1
            )
            SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name, cost
            FROM partsup
            JOIN minc USING (l_partkey)
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE cost = min_cost AND p_type = 'LARGE'
              AND r_name = 'EUROPE'
            ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100
        """,
        "q11_important_stock": """
            WITH val AS (
              SELECT l_partkey,
                     sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS val_dec
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3'
              GROUP BY 1
            )
            SELECT l_partkey, round(CAST(val_dec AS DOUBLE), 2) AS val
            FROM val
            WHERE val_dec * 1000 > (SELECT sum(val_dec) FROM val)
            ORDER BY val DESC, l_partkey
        """,
        "q12_late_lines": """
            SELECT l_returnflag AS mode,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "q20_excess_shippers": """
            WITH qty AS (
              SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(28,2))) AS qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE '%bolt%'
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1
            )
            SELECT s_name, s_acctbal FROM supplier
            WHERE s_suppkey IN (SELECT l_suppkey FROM qty
                                WHERE qty * 2 > (SELECT max(qty) FROM qty))
            ORDER BY s_name
        """,
        "q21_waiting_supplier": """
            WITH late AS (
              SELECT l_orderkey, l_suppkey
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            )
            SELECT s_name, count(*) AS numwait
            FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM late l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey)
            GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
        """,
        "q22_sales_opportunity": """
            WITH pos AS (SELECT c_custkey, c_nationkey,
                                CAST(c_acctbal AS DECIMAL(18,2)) AS bal
                         FROM customer WHERE c_acctbal > 0.0),
                 stats AS (SELECT count(*) AS cnt, sum(bal) AS total FROM pos)
            SELECT c_nationkey, count(*) AS numcust,
                   round(CAST(sum(bal) AS DOUBLE), 2) AS totacctbal
            FROM pos, stats
            WHERE bal * cnt > total
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "q_window_top_order": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
            WHERE rn = 1
            ORDER BY o_custkey
            LIMIT 500
        """,
        "q_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                   round(CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_distinct_parts": """
            SELECT count(DISTINCT l_partkey) AS distinct_parts,
                   count(DISTINCT l_suppkey) AS distinct_supps
            FROM lineitem
        """,
        "q_topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
        """,
        "q_setop_nations": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey AS nationkey FROM supplier
            ORDER BY nationkey
        """,
        "q_anti_join": """
            SELECT count(*) AS customers_without_orders
            FROM customer WHERE NOT EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "q_asof_join": """
            WITH c AS (
              SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'click'
            ), p0 AS (
              SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                     round(value, 6) AS value,
                     row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                                        ORDER BY event_id DESC) AS rn
              FROM events WHERE event_type = 'purchase'
            ), p AS (
              SELECT user_id, ts, event_id, value FROM p0 WHERE rn = 1
            )
            SELECT c.click_id, p.event_id AS purchase_id,
                   p.value AS purchase_value
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND c.ts >= p.ts
            ORDER BY click_id LIMIT 2500
        """,
        "q_interval_join": """
            WITH c AS (
              SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'click'
            ), p AS (
              SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
              FROM events WHERE event_type = 'purchase'
            )
            SELECT c.click_id, count(*) AS n_purchases,
                   round(CAST(sum(CAST(round(p.value, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_value
            FROM c JOIN p ON c.user_id = p.user_id
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
            GROUP BY c.click_id ORDER BY click_id LIMIT 2500
        """,
        "q_events_hourly": """
            SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start,
                   event_type, count(*) AS cnt, round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_value
            FROM events
            GROUP BY 1, 2 ORDER BY hour_start, event_type LIMIT 500
        """,
        "ice_mor_delete_scan": """
            SELECT o_orderstatus, count(*) AS cnt,
                   round(CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_price
            FROM orders WHERE o_orderkey % 7 <> 0
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "ice_delete_using_scan": """
            SELECT o_orderpriority, count(*) AS cnt,
                   round(CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_price
            FROM orders
            WHERE o_custkey NOT IN (
                SELECT c_custkey FROM customer WHERE c_acctbal < 0)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "ice_dv_delete_scan": """
            SELECT o_orderstatus, count(*) AS cnt,
                   round(CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_price
            FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "ice_update_scan": """
            SELECT c_mktsegment, count(*) AS cnt,
                   round(CAST(sum(CAST(round(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100.0 ELSE c_acctbal END, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "ice_spec_evolution_scan": """
            SELECT c_nationkey, count(*) AS cnt,
                   round(CAST(sum(CAST(round(c_acctbal, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM customer WHERE c_mktsegment = 'BUILDING'
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "ice_upsert_scan": """
            SELECT s_nationkey, count(*) AS cnt,
                   round(CAST(sum(CAST(round(
                     CASE WHEN s_suppkey % 3 = 0 THEN s_acctbal + 500.0
                          ELSE s_acctbal END, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
        """,
        "ice_sql_merge": """
            SELECT s_nationkey, count(*) AS cnt,
                   round(CAST(sum(CAST(round(
                     CASE WHEN s_suppkey % 4 = 0 THEN s_acctbal + 1000.0
                          ELSE s_acctbal END, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM supplier WHERE s_suppkey % 10 <> 1
            GROUP BY s_nationkey ORDER BY s_nationkey
        """,
        "ice_merge_scan": """
            SELECT r_regionkey,
                   CASE WHEN r_regionkey = 0 THEN 'MERGED-ZERO' ELSE r_name END AS r_name
            FROM region
            UNION ALL
            SELECT 99 AS r_regionkey, 'MERGED-NEW' AS r_name
            ORDER BY r_regionkey
        """,
        "ice_merge_conditional": """
            WITH survivors AS (
                -- WHEN MATCHED AND c_mktsegment='BUILDING' THEN DELETE;
                -- WHEN MATCHED AND s.c_acctbal > 5000 THEN UPDATE (source
                -- adds 100); WHEN MATCHED THEN DO NOTHING
                SELECT c_mktsegment,
                       CASE WHEN c_custkey % 3 = 0 AND c_acctbal + 100.0 > 5000.0
                            THEN c_acctbal + 100.0 ELSE c_acctbal END AS bal
                FROM customer
                WHERE NOT (c_custkey % 3 = 0 AND c_mktsegment = 'BUILDING')
            ), inserted AS (
                -- WHEN NOT MATCHED AND s.c_acctbal > 0 THEN INSERT *
                SELECT c_mktsegment, c_acctbal AS bal
                FROM customer WHERE c_custkey % 5 = 0 AND c_acctbal > 0.0
            )
            SELECT c_mktsegment, count(*) AS cnt,
                   round(CAST(sum(CAST(round(bal, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM (SELECT * FROM survivors UNION ALL SELECT * FROM inserted)
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "ice_time_travel": """
            SELECT 'v1' AS version, count(*) AS cnt FROM nation
            UNION ALL
            SELECT 'v2' AS version, 2 * count(*) AS cnt FROM nation
            ORDER BY version
        """,
        "ice_schema_evolution": """
            SELECT 2 * count(*) AS cnt,
                   count(*) AS with_price,
                   round(CAST(sum(CAST(round(p_retailprice, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_price
            FROM part
        """,
        "ice_compaction_scan": """
            SELECT p_brand, 3 * count(*) AS cnt,
                   round(CAST(sum(CAST(round(p_retailprice, 6) AS DECIMAL(28,6))) AS DOUBLE) * 3, 2) AS sum_price,
                   1 AS files_after_compaction
            FROM part GROUP BY p_brand ORDER BY p_brand
        """,
        "ice_count_star_metadata": "SELECT count(*) AS cnt FROM lineitem",
        "ice_objectstore_scan": """
            SELECT s_nationkey, count(*) AS cnt,
                   round(CAST(sum(CAST(round(s_acctbal, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM supplier WHERE s_suppkey % 10 <> 0
            GROUP BY s_nationkey ORDER BY s_nationkey
        """,
        "ice_snapshot_history": """
            SELECT * FROM (VALUES
                (CAST(1 AS BIGINT), 'append'),
                (CAST(2 AS BIGINT), 'append'),
                (CAST(3 AS BIGINT), 'delete')) AS t(sequence_number, operation)
            ORDER BY sequence_number
        """,
        "ice_partition_stats": """
            -- one data manifest with one partition-field summary after the
            -- single append; bounds span all months present
            SELECT CAST(1 AS BIGINT) AS n_summaries,
                   CAST((year(min(l_shipdate)) - 1970) * 12 + month(min(l_shipdate)) - 1 AS INT) AS min_month,
                   CAST((year(max(l_shipdate)) - 1970) * 12 + month(max(l_shipdate)) - 1 AS INT) AS max_month
            FROM lineitem
        """,
        "ice_column_stats": """
            SELECT min(l_orderkey) AS min_orderkey,
                   max(l_orderkey) AS max_orderkey,
                   count(*) AS total_values
            FROM lineitem
        """,
        "ice_bucket_pruned_scan": """
            SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_orderkey IN (1, 7, 32, 129, 1000)
            ORDER BY o_orderkey
        """,
        "ice_dynamic_prune_join": """
            SELECT o_orderkey,
                   CASE o_orderkey WHEN 1 THEN 'a' WHEN 7 THEN 'b'
                        WHEN 32 THEN 'c' WHEN 129 THEN 'd' ELSE 'e' END AS tag,
                   o_orderstatus, round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_orderkey IN (1, 7, 32, 129, 1000)
            ORDER BY o_orderkey
        """,
        "ice_metadata_files": "SELECT count(*) AS total_records FROM lineitem",
        "ice_variant_extract": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE lang = 'en' ORDER BY doc_id
        """,
        "ice_topk_scan": """
            SELECT round(l_extendedprice, 2) AS l_extendedprice
            FROM lineitem ORDER BY l_extendedprice DESC LIMIT 25
        """,
        "ice_truncate_fn": """
            SELECT p_partkey,
                   CAST(p_size - ((p_size % 10 + 10) % 10) AS INT) AS size_trunc10,
                   substr(p_type, 1, 4) AS type_trunc4
            FROM part ORDER BY p_partkey LIMIT 500
        """,
        "docs_exact_dedup": f"""
            SELECT d.lang AS lang, count(*) AS survivors
            FROM documents d
            JOIN (SELECT min(doc_id) AS keep_id FROM documents
                  GROUP BY {_FP_SQL}) k
              ON d.doc_id = k.keep_id
            GROUP BY d.lang ORDER BY lang
        """,
        "docs_token_count": """
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
            FROM documents ORDER BY doc_id LIMIT 1000
        """,
        "docs_substr_dedup": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents
            ), g AS (
              SELECT doc_id, i AS s,
                     md5(array_to_string(tk[i:i+7], ' ')) AS gr
              FROM t, LATERAL unnest(range(1, len(tk) - 6)) AS r(i)
              WHERE len(tk) >= 8
            ), occ AS (
              SELECT doc_id, s,
                     row_number() OVER (PARTITION BY gr
                                        ORDER BY doc_id, s) AS rn,
                     count(*) OVER (PARTITION BY gr) AS cnt
              FROM g
            ), dup AS (
              SELECT doc_id, s FROM occ WHERE cnt > 1 AND rn > 1
            ), cov AS (
              SELECT DISTINCT doc_id, p
              FROM dup, LATERAL unnest(range(s, s + 8)) AS rr(p)
            ), tok AS (
              SELECT doc_id, i AS p, tk[i] AS w
              FROM t, LATERAL unnest(range(1, len(tk) + 1)) AS r(i)
            ), kept AS (
              SELECT tok.doc_id, p, w FROM tok
              ANTI JOIN cov USING (doc_id, p)
            ), reb AS (
              SELECT doc_id, count(*) AS kept_n,
                     array_to_string(list(w ORDER BY p), ' ') AS txt
              FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id, md5(coalesce(reb.txt, '')) AS text_md5,
                   coalesce(reb.kept_n, 0) AS n_tokens_kept,
                   len(t.tk) - coalesce(reb.kept_n, 0) AS n_tokens_removed
            FROM t LEFT JOIN reb USING (doc_id)
            ORDER BY doc_id LIMIT 500
        """,
        "docs_source_cap": r"""
            WITH s AS (
              SELECT doc_id, source,
                CAST(length(text) AS DOUBLE) AS n,
                CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digits,
                CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) AS punct,
                CAST(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) AS toks,
                CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> x IN ('the','and','of','is','with'))) AS DOUBLE) AS stop_hits
              FROM documents
            ), r AS (
              SELECT doc_id, source,
                round(alpha / (CASE WHEN n > 0 THEN n ELSE 1 END), 6) AS alpha_ratio,
                round(digits / (CASE WHEN n > 0 THEN n ELSE 1 END), 6) AS digit_ratio,
                round(punct / (CASE WHEN n > 0 THEN n ELSE 1 END), 6) AS punct_ratio,
                round(n / (CASE WHEN toks > 0 THEN toks ELSE 1 END), 6) AS avg_token_len,
                round(stop_hits / (CASE WHEN toks > 0 THEN toks ELSE 1 END), 6) AS stopword_ratio
              FROM s
            ), q AS (
              SELECT doc_id, source,
                round(0.35 * least(alpha_ratio / 0.7, 1.0)
                    + 0.25 * least(stopword_ratio / 0.2, 1.0)
                    + 0.20 * (CASE WHEN avg_token_len >= 3 AND avg_token_len <= 12
                              THEN 1.0 ELSE 0.3 END)
                    + 0.20 * (1.0 - least(punct_ratio * 4 + digit_ratio * 2, 1.0)),
                    6) AS quality
              FROM r
            ), ranked AS (
              SELECT source, doc_id, quality,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY quality DESC, doc_id) AS "rank"
              FROM q
            )
            SELECT source, "rank", doc_id, quality FROM ranked
            WHERE "rank" <= 5 ORDER BY source, "rank"
        """,
        "docs_quality": """
            SELECT doc_id,
                   round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                         / length(text), 6) AS alpha_ratio,
                   round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                         / length(text), 6) AS digit_ratio,
                   round(CAST(length(text) AS DOUBLE) /
                         (CASE WHEN trim(text) = '' THEN 1
                               ELSE len(string_split_regex(trim(text), '\\s+')) END), 6) AS avg_token_len
            FROM documents WHERE length(text) > 0
            ORDER BY doc_id LIMIT 1000
        """,
        "docs_repetition": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents WHERE length(trim(text)) > 0
            ), norm AS (
              SELECT doc_id, t, length(array_to_string(t, ' ')) AS norm_len
              FROM toks
            ), bi AS (
              SELECT doc_id, norm_len, array_to_string(t[i:i+1], ' ') AS g
              FROM norm, LATERAL unnest(range(1, len(t))) AS r(i)
              WHERE len(t) >= 2
            ), bic AS (
              SELECT doc_id, norm_len, g, count(*) AS cnt
              FROM bi GROUP BY 1, 2, 3
            ), ranked AS (
              SELECT doc_id, norm_len, g, cnt,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY cnt DESC, g) AS rn
              FROM bic
            ), agg AS (
              SELECT doc_id, norm_len,
                     max(CASE WHEN rn = 1 THEN g END) AS top_ngram,
                     max(CASE WHEN rn = 1 THEN cnt * length(g) END) AS top_chars,
                     sum(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS dup_chars
              FROM ranked GROUP BY doc_id, norm_len
            ), shorts AS (
              SELECT doc_id, CAST(NULL AS VARCHAR) AS top_ngram,
                     0.0 AS top_ngram_frac, 0.0 AS dup_ngram_frac
              FROM norm WHERE len(t) < 2
            )
            SELECT doc_id, top_ngram,
                   round(CAST(top_chars AS DOUBLE) / norm_len, 6) AS top_ngram_frac,
                   round(CAST(dup_chars AS DOUBLE) / norm_len, 6) AS dup_ngram_frac
            FROM agg
            UNION ALL SELECT * FROM shorts
            ORDER BY doc_id LIMIT 1000
        """,
        "docs_decontaminate": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents WHERE length(trim(text)) > 0
            ), ng AS (
              SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+2], ' ')) AS g
              FROM toks, LATERAL unnest(range(1, len(t) - 1)) AS r(i)
              WHERE len(t) >= 3
            ), ev AS (
              SELECT DISTINCT g FROM ng WHERE doc_id % 10 = 0
            )
            SELECT d.doc_id, count(*) AS n_hits
            FROM ng d JOIN ev ON d.g = ev.g
            WHERE d.doc_id % 10 <> 0
            GROUP BY d.doc_id ORDER BY d.doc_id LIMIT 2000
        """,
        "docs_line_dedup": r"""
            WITH synth AS (
              SELECT doc_id,
                     regexp_replace(text, '((?:\S+\s+){7}\S+)\s+',
                                    '\1' || chr(10), 'g') AS t
              FROM documents
            ), ls AS (
              SELECT doc_id, string_split(t, chr(10)) AS arr FROM synth
            ), lines AS (
              SELECT doc_id, CAST(i AS INT) AS pos,
                     trim(arr[CAST(i AS INT) + 1]) AS line
              FROM ls, LATERAL unnest(range(0, len(arr))) AS r(i)
            ), ranked AS (
              -- eligibility is a function of the line text, so every
              -- member of a PARTITION BY line group shares it
              SELECT doc_id, pos, line,
                     (length(line) < 2
                      OR row_number() OVER (PARTITION BY line
                                            ORDER BY doc_id, pos) = 1)
                     AS keep
              FROM lines
            ), agg AS (
              SELECT doc_id,
                     coalesce(string_agg(CASE WHEN keep THEN line END,
                                         chr(10) ORDER BY pos), '') AS txt,
                     count(*) FILTER (keep) AS n_lines_kept,
                     count(*) FILTER (NOT keep) AS n_lines_removed
              FROM ranked GROUP BY doc_id
            )
            SELECT doc_id, md5(txt) AS text_md5,
                   CAST(length(txt) AS INT) AS text_len,
                   CAST(n_lines_kept AS BIGINT) AS n_lines_kept,
                   CAST(n_lines_removed AS BIGINT) AS n_lines_removed
            FROM agg ORDER BY doc_id LIMIT 2000
        """,
        "docs_resample_mixture": """
            WITH w(src, wt) AS (
              VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 0.25)
            ), cnt AS (
              SELECT source, count(*) AS n FROM documents
              WHERE source IN ('src0', 'src1', 'src2') GROUP BY source
            ), tt AS (
              SELECT min(n / wt) AS t FROM cnt JOIN w ON cnt.source = w.src
            ), thr AS (
              SELECT cnt.source,
                     CASE WHEN least(wt * (SELECT t FROM tt) / n, 1.0) >= 1.0
                          THEN 'g'
                          ELSE printf('%06x', CAST(floor(
                            least(wt * (SELECT t FROM tt) / n, 1.0)
                            * 16777216) AS BIGINT)) END AS th
              FROM cnt JOIN w ON cnt.source = w.src
            )
            SELECT d.source AS source, count(*) AS cnt,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents d JOIN thr ON d.source = thr.source
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'mix5'), 1, 6) < th
            GROUP BY d.source ORDER BY d.source
        """,
        "docs_redact_pii": r"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                     substr(text, 1, 40) || ' contact user'
                       || CAST(doc_id AS VARCHAR) || '@ex.org from 10.0.0.'
                       || CAST(doc_id % 250 AS VARCHAR)
                       || ' call +1 555 867 5309 ssn 123-45-6789',
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '[EMAIL]', 'g'),
                     '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
                     '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}',
                     '[PHONE]', 'g'),
                     '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[ID]', 'g')
                   AS redacted
            FROM documents ORDER BY doc_id LIMIT 1000
        """,
        "docs_normalize": r"""
            SELECT doc_id,
                   trim(regexp_replace(
                     lower(nfc_normalize(
                       'CAFE' || chr(769) || ' ' || substr(text, 1, 60))),
                     '\s+', ' ', 'g')) AS norm
            FROM documents ORDER BY doc_id LIMIT 1000
        """,
        "docs_incremental_dedup": f"""
            WITH new_docs AS (
              SELECT *, {_FP_SQL} AS fp FROM documents WHERE doc_id >= 250
            ), firsts AS (
              SELECT * FROM new_docs
              WHERE doc_id IN (SELECT min(doc_id) FROM new_docs GROUP BY fp)
            ), corpus AS (
              SELECT DISTINCT {_FP_SQL} AS fp FROM documents WHERE doc_id < 250
            )
            SELECT lang, count(*) AS cnt, min(doc_id) AS min_id,
                   max(doc_id) AS max_id
            FROM firsts f WHERE NOT EXISTS (
                SELECT 1 FROM corpus c WHERE c.fp = f.fp)
            GROUP BY lang ORDER BY lang
        """,
        # bloom-membership ingest dedup: rebuild the SAME m=2^16/k=4 filter
        # (md5-derived bit positions, 32-bit LONG words via bit_or) so even
        # the deterministic false positives replay bit for bit
        "docs_bloom_dedup": f"""
            WITH corpus AS (
              SELECT DISTINCT {_FP_SQL} AS fp
              FROM documents WHERE doc_id % 2 = 0
            ), cpos AS (
              SELECT CAST('0x' || substr(md5(fp || '#' || i), 1, 8)
                          AS BIGINT) % 65536 AS p
              FROM corpus, range(4) r(i)
            ), words AS (
              SELECT p // 32 AS word_idx,
                     bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS word
              FROM cpos GROUP BY 1
            ), batch AS (
              SELECT doc_id, lang, {_FP_SQL} AS fp
              FROM documents WHERE doc_id % 2 = 1
              UNION ALL
              SELECT doc_id + 1000000, lang, {_FP_SQL}
              FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
            ), firsts AS (
              SELECT * FROM batch
              WHERE doc_id IN (SELECT min(doc_id) FROM batch GROUP BY fp)
            ), probes AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(fp || '#' || i), 1, 8)
                          AS BIGINT) % 65536 AS p
              FROM firsts, range(4) r(i)
            ), hits AS (
              SELECT doc_id,
                     sum(CASE WHEN w.word IS NOT NULL AND
                          (w.word & (CAST(1 AS BIGINT)
                                     << CAST(p % 32 AS INT))) <> 0
                          THEN 1 ELSE 0 END) AS nh
              FROM probes LEFT JOIN words w ON w.word_idx = p // 32
              GROUP BY doc_id
            )
            SELECT f.lang, count(*) AS cnt, min(f.doc_id) AS min_id,
                   max(f.doc_id) AS max_id
            FROM firsts f JOIN hits h ON f.doc_id = h.doc_id
            WHERE h.nh < 4
            GROUP BY f.lang ORDER BY f.lang
        """,
        "docs_stratified_sample": """
            SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'r5'), 1, 6) <
                  CASE lang WHEN 'en' THEN '400000'
                            WHEN 'de' THEN '800000' ELSE 'g' END
            GROUP BY lang ORDER BY lang
        """,
        "docs_pack_sequences": """
            WITH toks AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            ), packed AS (
              SELECT doc_id, n_tokens, doc_id % 16 AS shard,
                     COALESCE(SUM(n_tokens) OVER (
                         PARTITION BY doc_id % 16 ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS bin_offset
              FROM toks
            )
            SELECT shard, CAST(FLOOR(bin_offset / 256) AS BIGINT) AS bin,
                   count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
            FROM packed GROUP BY shard, bin ORDER BY shard, bin
        """,
        "docs_fingerprint": f"""
            SELECT doc_id, {_FP_SQL} AS fingerprint
            FROM documents ORDER BY doc_id LIMIT 1000
        """,
        "docs_lang_scores": f"""
            SELECT doc_id, {lang_cols}
            FROM documents ORDER BY doc_id LIMIT 1000
        """,
        "emb_cosine_topk": f"""
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0),
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings WHERE vec_id <> 0)
            SELECT e.vec_id
            FROM e CROSS JOIN q
            ORDER BY {_cos6_sql("e.v", "q.qv")} DESC,
                     e.vec_id
            LIMIT 10
        """,
        "emb_lsh_topk": _lsh_topk_sql(),
        "emb_knn_join_bucketed": _knn_join_bucketed_sql(),
        "docs_ngram_dedup": _ngram_dedup_sql(),
        "docs_incremental_minhash": _incremental_minhash_sql(),
        "ice_docs_curation": rf"""
            WITH base AS (
              SELECT * FROM documents
              WHERE source <> 'src19' AND lang <> 'zh' AND length(text) > 0
            ), reps AS (
              SELECT * FROM (
                SELECT *, min(doc_id) OVER (PARTITION BY {_FP_SQL}) AS m
                FROM base) q
              WHERE doc_id = m
            ), filt AS (
              SELECT lang,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS nt
              FROM reps
              WHERE round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                               AS DOUBLE) / length(text), 6) >= 0.55
            )
            SELECT lang, count(*) AS kept, CAST(sum(nt) AS BIGINT) AS sum_tokens
            FROM filt GROUP BY lang ORDER BY lang
        """,
        "docs_chunk": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents WHERE length(trim(text)) > 0
            ), base AS (
              SELECT doc_id, t, len(t) AS n FROM toks
            ), ch AS (
              SELECT doc_id, CAST(i AS INT) AS chunk_id,
                     t[i*12+1 : i*12+16] AS c
              FROM base, LATERAL unnest(range(0,
                greatest(1, CAST(ceil((n - 4) / 12.0) AS BIGINT)))) AS r(i)
            )
            SELECT doc_id, chunk_id, array_to_string(c, ' ') AS chunk_text,
                   CAST(len(c) AS BIGINT) AS n_tokens
            FROM ch ORDER BY doc_id, chunk_id LIMIT 3000
        """,
        "docs_vocab": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), grams AS (
              SELECT doc_id, unnest(list_concat(
                       toks,
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                     )) AS gram
              FROM t
            ), pd AS (
              SELECT gram, doc_id, count(*) AS c
              FROM grams GROUP BY gram, doc_id
            )
            SELECT gram,
                   CAST(len(string_split(gram, ' ')) AS INT) AS n,
                   CAST(sum(c) AS BIGINT) AS "count",
                   count(*) AS doc_freq
            FROM pd GROUP BY gram
            ORDER BY "count" DESC, n ASC, gram ASC
            LIMIT 200
        """,
        "docs_dup_components": _dup_components_sql(),
        # soft dedup (r14): true components + window cluster sizes +
        # the exact floor(1e6/size) micro-weight arithmetic replayed
        "docs_dup_weights": _dup_components_sql(tail="""
            , comp AS (
              SELECT id AS doc_id, min(r) AS component_id
              FROM reach GROUP BY id
            ), sized AS (
              SELECT doc_id,
                     count(*) OVER (PARTITION BY component_id)
                       AS cluster_size
              FROM comp
            )
            SELECT d.lang, count(*) AS n,
                   CAST(sum(CAST(floor(1000000.0 / s.cluster_size)
                                 AS BIGINT)) AS BIGINT) AS eff_micro,
                   CAST(max(s.cluster_size) AS BIGINT) AS max_cluster
            FROM documents d JOIN sized s ON d.doc_id = s.doc_id
            GROUP BY d.lang ORDER BY d.lang
        """),
        # docs_cluster_sample lives in _data_oracles (its builder
        # re-derives the realized cluster sizes from the corpus)
        # keep-best curation (r13): true components + the argmax window
        # replayed — kept = winners per cluster, covered_docs = the
        # winners' cluster sizes (sums to the corpus size overall)
        "docs_dup_keep_best": _dup_components_sql(tail="""
            , comp AS (
              SELECT id AS doc_id, min(r) AS component_id
              FROM reach GROUP BY id
            ), ranked AS (
              SELECT d.doc_id, d.lang, d.n_chars, c.component_id,
                     row_number() OVER (
                       PARTITION BY c.component_id
                       ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
                     count(*) OVER (
                       PARTITION BY c.component_id) AS cluster_size
              FROM documents d JOIN comp c ON c.doc_id = d.doc_id
            )
            SELECT lang, count(*) AS kept,
                   CAST(sum(n_chars) AS BIGINT) AS kept_chars,
                   CAST(sum(cluster_size) AS BIGINT) AS covered_docs
            FROM ranked WHERE rn = 1 GROUP BY lang ORDER BY lang
        """),
        # same component pipeline over the Iceberg-filtered corpus
        # (MoR delete + partition prune + length gate), then the
        # keep-one-per-cluster curation rule
        "ice_dup_cluster_curation": _dup_components_sql(
            src="(SELECT * FROM documents WHERE source <> 'src19' "
                "AND lang <> 'zh' AND length(text) > 0)",
            tail="""
            , comp AS (
              SELECT id AS doc_id, min(r) AS component_id
              FROM reach GROUP BY id
            )
            SELECT d.lang,
                   CAST(count(*) FILTER (WHERE c.component_id = d.doc_id)
                        AS BIGINT) AS kept,
                   CAST(count(*) FILTER (WHERE c.component_id <> d.doc_id)
                        AS BIGINT) AS dropped
            FROM (SELECT doc_id, lang FROM documents
                  WHERE source <> 'src19' AND lang <> 'zh'
                    AND length(text) > 0) d
            JOIN comp c ON d.doc_id = c.doc_id
            GROUP BY d.lang ORDER BY d.lang"""),
        "mm_image_dedup": _image_dedup_sql(),
        "mm_audio_dedup": _audio_dedup_sql(),
        "mm_video_dedup": _video_dedup_sql(),
        "stream_minhash_curation": _incremental_minhash_sql(
            pre_cte="""srcx AS (
              SELECT doc_id, text, lang FROM documents
              UNION ALL
              SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
                     text || ' near dup tail', lang
              FROM documents WHERE doc_id % 11 = 0
            ), """,
            src="srcx",
            final_sql="""SELECT lang, count(*) AS survivors,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM srcx JOIN (
              SELECT doc_id FROM srcx WHERE doc_id < 250
              UNION ALL SELECT doc_id FROM batch2
            ) USING (doc_id)
            GROUP BY lang ORDER BY lang"""),
        "docs_corpus_report": r"""
            WITH toks AS (
              SELECT source, lang,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS nt
              FROM documents
            ), base AS (
              SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens,
                     round(quantile_cont(nt, 0.5), 6) AS p50_tokens,
                     round(quantile_cont(nt, 0.9), 6) AS p90_tokens,
                     count(DISTINCT lang) AS n_langs
              FROM toks GROUP BY source
            ), lc AS (
              SELECT source, lang, count(*) AS cnt
              FROM toks GROUP BY source, lang
            ), top AS (
              SELECT source, lang AS top_lang, cnt FROM (
                SELECT *, row_number() OVER (PARTITION BY source
                                             ORDER BY cnt DESC, lang) AS rn
                FROM lc) q WHERE rn = 1
            )
            SELECT b.source AS source, n_docs, total_tokens, p50_tokens,
                   p90_tokens, n_langs, top_lang,
                   round(CAST(t.cnt AS DOUBLE) / n_docs, 6) AS top_lang_frac
            FROM base b JOIN top t ON b.source = t.source
            ORDER BY source
        """,
        "emb_knn_join": f"""
            WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
                       FROM embeddings WHERE vec_id IN (0, 1, 2)),
            c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings WHERE vec_id > 2),
            scored AS (
              SELECT q.q_id, c.vec_id,
                     {_cos6_sql("c.v", "q.q_vec")} AS sim
              FROM c CROSS JOIN q),
            ranked AS (
              SELECT q_id, vec_id,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY sim DESC, vec_id) AS "rank"
              FROM scored)
            SELECT q_id, vec_id, "rank" FROM ranked
            WHERE "rank" <= 5 ORDER BY q_id, "rank"
        """,
        "stream_changelog": """
            SELECT 0 AS _change_ordinal, 'insert' AS _change_type,
                   count(*) AS cnt, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
            FROM orders WHERE o_orderkey % 2 = 1
            UNION ALL
            SELECT 1, 'delete', count(*), CAST(sum(o_orderkey) AS BIGINT)
            FROM orders WHERE o_orderkey % 7 = 0
            ORDER BY _change_ordinal, _change_type
        """,
        "stream_incremental": """
            SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey
        """,
        "stream_sink_roundtrip": """
            SELECT s_nationkey, count(*) AS cnt,
                   round(CAST(sum(CAST(round(s_acctbal, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
        """,
        "stream_curation": f"""
            WITH src AS (
              SELECT doc_id, lang, n_chars, text FROM documents
              UNION ALL
              SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
                     lang, n_chars, text
              FROM documents WHERE doc_id % 7 = 0
            ), q AS (
              SELECT doc_id, lang, n_chars, {_FP_SQL} AS fp
              FROM src
              WHERE round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                               AS DOUBLE) / length(text), 6) >= 0.55
            ), keep AS (
              SELECT min(doc_id) AS keep_id FROM q GROUP BY fp
            )
            SELECT lang, count(*) AS survivors, CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM q JOIN keep ON q.doc_id = keep.keep_id
            GROUP BY lang ORDER BY lang
        """,
        "stream_dedup_ttl": """
            SELECT 'b0' AS tag, count(*) AS cnt,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum,
                   CAST(sum(n_chars) AS BIGINT) AS chars_sum
            FROM documents WHERE doc_id >= 0 AND doc_id < 200
            UNION ALL
            SELECT 'b1', count(*), CAST(sum(doc_id) AS BIGINT),
                   CAST(sum(n_chars) AS BIGINT)
            FROM documents WHERE doc_id >= 200 AND doc_id < 300
            UNION ALL
            SELECT 'b2', count(*), CAST(sum(doc_id) AS BIGINT),
                   CAST(sum(n_chars) AS BIGINT)
            FROM documents WHERE doc_id >= 300 AND doc_id < 400
            UNION ALL
            SELECT 'b3', count(*), CAST(sum(doc_id) AS BIGINT),
                   CAST(sum(n_chars) AS BIGINT)
            FROM documents WHERE doc_id >= 300 AND doc_id < 400
            ORDER BY tag
        """,
        "stream_tumbling_events": """
            SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
                   event_type, count(*) AS cnt,
                   round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_value
            FROM events
            GROUP BY 1, 2 ORDER BY window_start, event_type LIMIT 500
        """,
        "stream_sliding_events": """
            WITH e AS (
              SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
            ), w AS (
              SELECT event_type, value,
                     unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                             time_bucket(INTERVAL 30 MINUTE, ts)
                               - INTERVAL 30 MINUTE]) AS window_start
              FROM e
            )
            SELECT CAST(window_start AS VARCHAR) AS window_start, event_type,
                   count(*) AS cnt,
                   round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_value
            FROM w GROUP BY 1, 2
            ORDER BY window_start, event_type LIMIT 500
        """,
        "stream_session_events": """
            WITH e AS (
              SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
            ), o AS (
              SELECT event_type, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY event_type ORDER BY ts)
                               >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
              FROM e
            ), s AS (
              SELECT *, sum(brk) OVER (PARTITION BY event_type ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM o
            )
            SELECT CAST(min(ts) AS VARCHAR) AS session_start,
                   CAST(max(ts) + INTERVAL 10 MINUTE AS VARCHAR) AS session_end,
                   event_type, count(*) AS cnt,
                   round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_value
            FROM s GROUP BY event_type, sid
            ORDER BY session_start, event_type LIMIT 500
        """,
        "mm_frame_sample": """
            SELECT doc_id AS id,
                   count(*) AS n_frames,
                   max(ts) AS last_ts
            FROM (SELECT doc_id,
                         unnest(range(0, greatest(n_chars * 10 - 1, 0) + 1, 1000)) AS ts
                  FROM documents) t
            GROUP BY doc_id ORDER BY id LIMIT 1000
        """,
        "docs_simhash": _simhash_sql(),
        "docs_winnow": _winnow_sql(),
        "docs_minhash_dedup": _minhash_sql(),
        "emb_neardup": _neardup_sql(),
        "mm_image_features": _MM_HASH_CTE + """
            SELECT id, n_bytes,
                   CAST(16 + (h & 255) AS INT) AS width,
                   CAST(16 + ((h >> 8) & 255) AS INT) AS height,
                   CAST(((h >> 0) & 255) + ((h >> 4) & 255) + ((h >> 8) & 255)
                      + ((h >> 12) & 255) + ((h >> 16) & 255) + ((h >> 20) & 255)
                      + ((h >> 24) & 255) + ((h >> 28) & 255) AS BIGINT) AS feat_sum256
            FROM h ORDER BY id LIMIT 500
        """,
        "mm_video_meta": _MM_HASH_CTE + """
            SELECT id,
                   CAST(1000 + (h & 65535) AS BIGINT) AS duration_ms,
                   CAST(320 + ((h >> 4) & 255) AS INT) AS width,
                   CAST(240 + ((h >> 8) & 255) AS INT) AS height,
                   CAST(1 + ((h >> 16) & 1) AS INT) AS n_tracks,
                   n_bytes
            FROM h ORDER BY id LIMIT 500
        """,
        "mm_audio_features": _MM_HASH_CTE + """
            SELECT id, n_bytes,
                   CAST(100 + (h & 65535) AS BIGINT) AS duration_ms,
                   CAST(([8000, 16000, 22050, 44100])[CAST(((h >> 16) & 3) + 1 AS INT)] AS INT) AS sample_rate
            FROM h ORDER BY id LIMIT 500
        """,
        "ice_bucket_fn": (
            "WITH b(p_partkey, bucket16) AS (VALUES "
            + ", ".join(
                f"({k}, {v})" for k, v in enumerate(_BUCKET16_PARTKEY)
            )
            + """)
            SELECT p.p_partkey AS p_partkey, CAST(b.bucket16 AS INT) AS bucket16
            FROM (SELECT p_partkey FROM part ORDER BY p_partkey LIMIT 500) p
            JOIN b ON p.p_partkey = b.p_partkey
            ORDER BY p_partkey
            """
        ),
        # deterministic literal-replay oracles (PQ/IVF/k-means/SemDeDup
        # models, DSIR ratio+Gumbel, LM log-prob pairs, tf-idf idf —
        # all re-derived driver-side from the corpus and replayed as
        # SQL literals; no ln()/float recompute in the checking engine).
        # Omitted (rows-only) only if the corpus parquet is unreadable.
        **_data_oracles(),
        # r10 stage-bisect probes for the two r8/r9 driver hash-reds:
        # pure integer/string SQL (no literals to build, no ln anywhere),
        # carried next to the queries they bisect
        "docs_lm_probe": _lm_probe_sql(),
        "docs_dsir_probe": _dsir_probe_sql(),
        # TimeType end-to-end (r10; r12 makes the driver-facing columns
        # mode-independent µs BIGINTs — the r11 red was the TIME-typed
        # min/max failing in the driver's flag-less session): rebuild the
        # identical µs time-of-day from doc_id with exact integer
        # arithmetic — min/max/count match bit-for-bit in either session
        # mode. 43200000000 = µs of TIME'12:00:00'.
        "ice_time_scan": """
            WITH t AS (
              SELECT doc_id,
                     CAST(doc_id % 24 AS INT) AS event_hour,
                     ((doc_id % 24) * 3600 + (doc_id % 60) * 60
                      + (doc_id % 60)) * 1000000
                     + (doc_id % 1000) * 1000 AS us
              FROM documents
            )
            SELECT event_hour, count(*) AS n,
                   CAST(min(us) AS BIGINT) AS min_t,
                   CAST(max(us) AS BIGINT) AS max_t
            FROM t WHERE us >= 43200000000
            GROUP BY event_hour ORDER BY event_hour
        """,
        # custom write paths: replay the subset + MoR delete predicate
        # from the raw rows — a path mis-resolution (wrong root, spurious
        # marker rewrite) changes the counts
        # ORC roundtrip (r11): replay the equality-delete upsert
        # arithmetic + lang pruning predicate from the raw rows — a wrong
        # MoR merge, a missed partition constant, or an ORC-corrupted
        # value changes the sums
        "ice_orc_scan": """
            WITH t AS (
              SELECT doc_id, lang, source,
                     CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000000
                          ELSE n_chars END AS n_chars
              FROM documents
            )
            SELECT source, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM t WHERE lang <> 'zh'
            GROUP BY source ORDER BY source
        """,
        # positional MoR over ORC (r12): replay the merge-on-read DELETE
        # predicate + the source pruning predicate from the raw rows — a
        # wrong arrow-plane ordinal, a delete joined to the wrong file,
        # or a missed partition constant changes counts and sums
        "ice_orc_mor_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_id
            FROM documents
            WHERE source <> 'src3' AND doc_id % 7 <> 0
            GROUP BY lang ORDER BY lang
        """,
        # rewrite_position_delete_files (r12): replay the three stacked
        # MoR delete predicates + the lang pruning predicate from the raw
        # rows — a position lost or resurrected by the delete-file merge
        # changes counts and sums
        "ice_delete_compaction_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM documents
            WHERE lang <> 'de'
              AND NOT (doc_id % 9 = 0)
              AND NOT (n_chars > 4500)
              AND NOT (doc_id % 100 = 13)
            GROUP BY lang ORDER BY lang
        """,
        # Avro data files (r12): replay the MoR delete predicate + lang
        # pruning from the raw rows — a mis-decoded value or wrong
        # ordinal changes the sums
        "ice_avro_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM documents
            WHERE lang <> 'es' AND doc_id % 6 <> 2
            GROUP BY lang ORDER BY lang
        """,
        # streaming upsert sink (r12): keep-LAST per key across three
        # ordered CDC batches — %10 keys got +5000 last, else %5 +1000
        "stream_upsert_sink": """
            WITH t AS (
              SELECT doc_id, lang,
                     CASE WHEN doc_id % 10 = 0 THEN n_chars + 5000
                          WHEN doc_id % 5 = 0 THEN n_chars + 1000
                          ELSE n_chars END AS n_chars
              FROM documents
            )
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM t GROUP BY lang ORDER BY lang
        """,
        # WAP (r12): replay base + staged-clone (fr rows under doc_id+1e6)
        # arithmetic — a pre-publish leak or lost branch commit mismatches
        "ice_wap_scan": """
            WITH t AS (
              SELECT doc_id, lang, n_chars FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, lang, n_chars
              FROM documents WHERE lang = 'fr'
            )
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_id
            FROM t GROUP BY lang ORDER BY lang
        """,
        # ref retention (r13): the audit branch holds snapshots 1-3's
        # content (doc_id % 4 < 3); expiry dropped the aged tag and
        # snapshot 1, so a broken retention path loses the branch head or
        # its ancestors and the scan errors / mismatches
        "ice_retention_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_id
            FROM documents WHERE doc_id % 4 < 3
            GROUP BY lang ORDER BY lang
        """,
        # partition statistics (r13): one row per lang partition — row
        # counts, the forced 1-file layout, and the replayed delete
        # predicate counts, straight from the raw corpus
        "ice_partition_stats_file": """
            SELECT lang, count(*) AS n_rows,
                   CAST(1 AS BIGINT) AS n_files,
                   CAST(sum(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos_deletes
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # ndv statistics (r13): every sketched column is far below k, so
        # the theta estimates are EXACT distinct counts — literal replay
        "ice_ndv_stats": """
            SELECT col_name, ndv FROM (
              SELECT 'doc_mod' AS col_name,
                     CAST(count(DISTINCT doc_id % 50) AS BIGINT) AS ndv
              FROM documents
              UNION ALL
              SELECT 'lang', CAST(count(DISTINCT lang) AS BIGINT)
              FROM documents
              UNION ALL
              SELECT 'source', CAST(count(DISTINCT source) AS BIGINT)
              FROM documents
            ) ORDER BY col_name
        """,
        # cherrypick (r13): the published table must hold the WHOLE corpus
        # (base %3==0 + picked %3==1 + diverged-main %3==2) exactly once —
        # a lost pick or a double-apply flips the counts/sums
        "ice_cherrypick_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_id
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # avro WRITE path (r13): replay the delete predicate + n_chars
        # filter from the raw rows over the engine-written avro files
        "ice_avro_write_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_id
            FROM documents
            WHERE n_chars >= 100 AND doc_id % 9 <> 4
            GROUP BY lang ORDER BY lang
        """,
        # partitioned nested avro WRITE (r14): replay the ts derivation
        # (doc_id%5 days past 2024-01-01) and the struct-member filter
        # from the raw rows — a mis-rendered transform dir, broken day
        # pruning, or a mis-encoded nested leaf all change the sums
        "ice_avro_write_part_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_id
            FROM documents
            WHERE TIMESTAMP '2024-01-01 00:00:00'
                    + (doc_id % 5) * INTERVAL 1 DAY
                    >= TIMESTAMP '2024-01-03 00:00:00'
              AND n_chars >= 120
            GROUP BY lang ORDER BY lang
        """,
        # z-order clustered rewrite (r14): replay the deterministic x/y
        # derivations + the 2-dim filter from the raw orders rows — a
        # row lost/duplicated by the clustering rewrite or a wrong bound
        # excluding a matching file changes the sums (duckdb sum(BIGINT)
        # is HUGEINT, hence the cast)
        "ice_zorder_scan": """
            SELECT (o_orderkey * 9973) % 1000 % 7 AS g,
                   count(*) AS n,
                   CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
                   max(o_orderkey) AS max_key
            FROM orders
            WHERE (o_orderkey * 9973) % 1000 >= 800
              AND (o_orderkey * o_orderkey) % 1000 < 200
            GROUP BY g ORDER BY g
        """,
        # string-dimension z-order (r15): replay the concat/lpad string
        # derivation + both filters from the raw orders rows
        "ice_zorder_string_scan": """
            SELECT substr(concat('w', lpad(CAST((o_orderkey * 9973) % 1000
                                               AS VARCHAR), 4, '0')),
                          3, 1) AS g,
                   count(*) AS n,
                   CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
                   max(concat('w', lpad(CAST((o_orderkey * 9973) % 1000
                                             AS VARCHAR), 4, '0'))) AS max_s
            FROM orders
            WHERE concat('w', lpad(CAST((o_orderkey * 9973) % 1000
                                        AS VARCHAR), 4, '0')) >= 'w0800'
              AND (o_orderkey * o_orderkey) % 1000 < 200
            GROUP BY g ORDER BY g
        """,
        # avro-format DELETE files (r14): replay both delete flavors
        # from the raw rows (positional doc_id%11=2, equality lang='de')
        "ice_avro_delete_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_id
            FROM documents
            WHERE doc_id % 11 <> 2 AND lang <> 'de'
            GROUP BY lang ORDER BY lang
        """,
        # uuid/fixed/time over Avro writes (r15): rebuild uuid text,
        # fixed hex and µs-of-day from doc_id with md5/substr/integer
        # arithmetic; the TIME predicate replays as a µs comparison
        "ice_avro_types_scan": """
            WITH d AS (
              SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                     (((doc_id * 7919) % 1440) * 60 + doc_id % 60)
                       * 1000000 + (doc_id % 997) * 1000 AS t_us
              FROM documents
            )
            SELECT doc_id % 5 AS g, count(*) AS n,
                   min(t_us) AS min_t, max(t_us) AS max_t,
                   min(concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-',
                              substr(h, 13, 4), '-', substr(h, 17, 4),
                              '-', substr(h, 21, 12))) AS min_uuid,
                   max(substr(h, 9, 8)) AS max_fix
            FROM d
            WHERE t_us >= 43200000000
            GROUP BY g ORDER BY g
        """,
        # nested Avro (r13): replay the struct/list/map nesting arithmetic
        # from the raw rows — tags is NULL when doc_id%13=7, 2-element
        # when doc_id%3=0, else 1; props['len'] = n_chars % 100; the
        # struct member was renamed to language post-write (field-id read)
        "ice_avro_nested_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(sum(CASE WHEN doc_id % 13 = 7 THEN NULL
                                 WHEN doc_id % 3 = 0 THEN 2
                                 ELSE 1 END) AS BIGINT) AS n_tags,
                   CAST(sum(n_chars % 100) AS BIGINT) AS sum_plen
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # add_files import (r12): the table references the RAW corpus
        # parquet, renamed lang→language post-import (name-mapping read)
        # with an added all-NULL quality column — count(quality) must be
        # 0 everywhere, values identical to the raw rows
        "ice_add_files_scan": """
            SELECT lang AS language, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(0 AS BIGINT) AS n_quality
            FROM documents
            WHERE n_chars >= 200
            GROUP BY lang ORDER BY language
        """,
        "ice_custom_paths_scan": """
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            WHERE doc_id % 2 = 0 AND source <> 'src7'
            GROUP BY lang ORDER BY lang
        """,
        # variant write roundtrip: the summary replays from the raw rows,
        # so any value corrupted by variant encode/decode mismatches
        "ice_variant_write_scan": """
            SELECT source AS src, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE lang <> 'zh'
            GROUP BY source ORDER BY src
        """,
        # emb_kmeans / emb_semantic_dedup: hash-checked since r9 via
        # _data_oracles — the fit's reductions became order-independent
        # (micro-unit integer sums) so a driver replay is exact
    }
