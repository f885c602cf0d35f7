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

_CACHE_ROOT = os.environ.get("SPARK_GRAFT_ICE_CACHE", "/tmp/spark_graft_ice_cache")


# ---------------------------------------------------------------------------
# Iceberg fixture tables, built once per (sf_dir, variant) and cached
# ---------------------------------------------------------------------------

def _pq(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_CACHE_VERSION = "v2"  # bump when fixture derivations change


def _variant_dir(sf_dir: str, variant: str) -> str:
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return os.path.join(
        _CACHE_ROOT,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{key}-{_CACHE_VERSION}",
        variant,
    )


def _build_once(sf_dir: str, variant: str, builder) -> str:
    loc = _variant_dir(sf_dir, variant)
    done = os.path.join(loc, "_BUILD_DONE")
    if os.path.exists(done):
        return loc
    shutil.rmtree(loc, ignore_errors=True)
    os.makedirs(os.path.dirname(loc), exist_ok=True)
    builder(loc)
    with open(done, "w") as fh:
        fh.write("ok")
    return loc


def _ice_lineitem(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg

        write_iceberg(_pq(spark, sf_dir, "lineitem"), loc,
                      partition_by=["month(l_shipdate)"])

    return _build_once(sf_dir, "lineitem_month", build)


def _ice_orders_mor(spark: SparkSession, sf_dir: str) -> str:
    def build(loc: str) -> None:
        from duckdb_iceberg_spark import write_iceberg
        from duckdb_iceberg_spark.sources.dml import delete_from

        write_iceberg(_pq(spark, sf_dir, "orders"), loc)
        delete_from(spark, loc, "o_orderkey % 7 = 0", mode="merge-on-read")

    return _build_once(sf_dir, "orders_mor_delete", build)


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
    return (
        cust.filter("c_mktsegment = 'BUILDING'")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter("o_orderdate < TIMESTAMP '1995-03-15 00:00:00'")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
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
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_pq(spark, sf_dir, "supplier"),
              (F.col("s_suppkey") == F.col("l_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _scan_lineitem(
        spark, sf_dir,
        where="l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'",
    )
    return li.filter("l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24").agg(
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue")
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


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _pq(spark, sf_dir, "events")
    # events.ts is TIMESTAMP(NANOS) parquet, read as long ns (session conf);
    # floor to µs for Spark timestamp math
    ev = ev.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return (
        ev.withColumn("hour_start", F.date_trunc("hour", F.col("ts")).cast("string"))
        .groupBy("hour_start", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), _dec_sum(F.col("value"), 6).alias("sum_value"))
        .orderBy("hour_start", "event_type")
        .limit(500)
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


def ice_merge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_scan

    loc = _ice_region_merge(spark, sf_dir)
    return iceberg_scan(spark, loc).select("r_regionkey", "r_name").orderBy("r_regionkey")


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


def ice_count_star_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark import iceberg_count

    n = iceberg_count(_ice_lineitem(spark, sf_dir))
    return spark.createDataFrame([(n,)], "cnt: bigint")


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
    # no SQL oracle: murmur3 bucket is not expressible in DuckDB SQL;
    # spec-vector correctness is pinned in tests/test_metadata_core.py
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
    # rows-only check: LSH banding is not SQL-expressible
    from duckdb_iceberg_spark.operators.dedup import minhash_dedup

    docs = _pq(spark, sf_dir, "documents")
    return (
        minhash_dedup(docs, "text", "doc_id", num_hashes=32, bands=8)
        .agg(F.count(F.lit(1)).alias("survivors"))
    )


def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only check: deterministic simhash values
    from duckdb_iceberg_spark.operators.dedup import simhash64

    docs = _pq(spark, sf_dir, "documents")
    return simhash64(docs, "text", "doc_id").orderBy("doc_id").limit(500)


def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_iceberg_spark.operators.similarity import cosine_topk

    emb = _pq(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    return cosine_topk(emb.filter("vec_id != 0"), qvec, k=10).select("vec_id")


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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q03_shipping_priority": q03_shipping_priority,
        "q05_region_revenue": q05_region_revenue,
        "q06_revenue_forecast": q06_revenue_forecast,
        "q_window_top_order": q_window_top_order,
        "q_rollup": q_rollup,
        "q_distinct_parts": q_distinct_parts,
        "q_topk_orders": q_topk_orders,
        "q_setop_nations": q_setop_nations,
        "q_anti_join": q_anti_join,
        "q_events_hourly": q_events_hourly,
        "ice_mor_delete_scan": ice_mor_delete_scan,
        "ice_update_scan": ice_update_scan,
        "ice_merge_scan": ice_merge_scan,
        "ice_time_travel": ice_time_travel,
        "ice_schema_evolution": ice_schema_evolution,
        "ice_count_star_metadata": ice_count_star_metadata,
        "ice_snapshot_history": ice_snapshot_history,
        "ice_partition_stats": ice_partition_stats_q,
        "ice_column_stats": ice_column_stats_q,
        "ice_truncate_fn": ice_truncate_fn,
        "ice_bucket_fn": ice_bucket_fn,
        "docs_exact_dedup": docs_exact_dedup,
        "docs_token_count": docs_token_count,
        "docs_quality": docs_quality,
        "docs_fingerprint": docs_fingerprint,
        "docs_lang_scores": docs_lang_scores,
        "docs_minhash_dedup": docs_minhash_dedup,
        "docs_simhash": docs_simhash,
        "emb_cosine_topk": emb_cosine_topk,
        "emb_knn_join": emb_knn_join,
    }


_FP_SQL = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


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
            WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
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
        "ice_update_scan": """
            SELECT c_mktsegment, count(*) AS cnt,
                   round(CAST(sum(CAST(round(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100.0 ELSE c_acctbal END, 6) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "ice_merge_scan": """
            SELECT r_regionkey,
                   CASE WHEN r_regionkey = 0 THEN 'MERGED-ZERO' ELSE r_name END AS r_name
            FROM region
            UNION ALL
            SELECT 99 AS r_regionkey, 'MERGED-NEW' AS r_name
            ORDER BY r_regionkey
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
        "ice_count_star_metadata": "SELECT count(*) AS cnt FROM lineitem",
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
        "docs_fingerprint": f"""
            SELECT doc_id, {_FP_SQL} AS fingerprint
            FROM documents ORDER BY doc_id LIMIT 1000
        """,
        "docs_lang_scores": f"""
            SELECT doc_id, {lang_cols}
            FROM documents ORDER BY doc_id LIMIT 1000
        """,
        "emb_cosine_topk": """
            SELECT vec_id
            FROM embeddings
            WHERE vec_id <> 0
            ORDER BY round(list_cosine_similarity(
                        CAST(embedding AS DOUBLE[]),
                        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) DESC,
                     vec_id
            LIMIT 10
        """,
        # ice_bucket_fn, docs_minhash_dedup, docs_simhash, emb_knn_join:
        # intentionally omitted (non-SQL-expressible; rows-only check)
    }
