"""Streaming tests: snapshot-incremental batch reads, the iceberg_inc
Python Data Source (availableNow microbatches + checkpoint resume), and
window helpers (unified batch semantics)."""

import time

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark import write_iceberg
from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
from duckdb_iceberg_spark.streaming import (
    incremental_scan,
    register_stream_source,
    session_agg,
    streaming_dedup,
    tumbling_agg,
)


def test_incremental_scan_between_snapshots(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg(spark.range(0, 10).selectExpr("id"), loc)
    snap1 = load_table_metadata(loc).current_snapshot_id
    write_iceberg(spark.range(10, 25).selectExpr("id"), loc)

    inc = sorted(r.id for r in incremental_scan(
        spark, loc, from_snapshot_id=snap1).collect())
    assert inc == list(range(10, 25))
    full = sorted(r.id for r in incremental_scan(spark, loc).collect())
    assert full == list(range(25))


def test_incremental_scan_skips_compaction(spark, tmp_path):
    from duckdb_iceberg_spark.sources.maintenance import rewrite_data_files

    loc = str(tmp_path / "t2")
    write_iceberg(spark.range(0, 50).repartition(2), loc)
    snap1 = load_table_metadata(loc).current_snapshot_id
    write_iceberg(spark.range(50, 80).repartition(2), loc)
    rewrite_data_files(spark, loc, rewrite_all=True)

    inc = sorted(r.id for r in incremental_scan(
        spark, loc, from_snapshot_id=snap1).collect())
    assert inc == list(range(50, 80))  # replace snapshot contributes nothing


def test_incremental_scan_rejects_delete_by_default(spark, tmp_path):
    from duckdb_iceberg_spark.sources.dml import delete_from

    loc = str(tmp_path / "t3")
    write_iceberg(spark.range(0, 40).selectExpr("id", "id % 4 AS k"), loc)
    snap1 = load_table_metadata(loc).current_snapshot_id
    delete_from(spark, loc, "k = 1", mode="merge-on-read")
    write_iceberg(spark.range(40, 50).selectExpr("id", "id % 4 AS k"), loc)

    with pytest.raises(ValueError, match="non-append"):
        incremental_scan(spark, loc, from_snapshot_id=snap1)
    inc = sorted(r.id for r in incremental_scan(
        spark, loc, from_snapshot_id=snap1, on_non_append="skip").collect())
    assert inc == list(range(40, 50))


def _run_available_now(spark, loc, checkpoint, out_dir):
    df = (spark.readStream.format("iceberg_inc")
          .option("path", loc).option("starting", "earliest").load())
    q = (df.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_stream_source_available_now_and_resume(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_iceberg(spark.range(0, 20).selectExpr("id", "id * 2 AS v"), loc)
    write_iceberg(spark.range(20, 30).selectExpr("id", "id * 2 AS v"), loc)

    register_stream_source(spark)
    _run_available_now(spark, loc, ckpt, out)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(30))

    # append more; resuming from the checkpoint must emit ONLY the new rows
    write_iceberg(spark.range(30, 37).selectExpr("id", "id * 2 AS v"), loc)
    _run_available_now(spark, loc, ckpt, out)
    got2 = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got2 == list(range(37))  # 30 old + exactly the 7 new


def test_stream_windowed_aggregation(spark, tmp_path):
    loc = str(tmp_path / "tbl_w")
    rows = [(i, f"2024-01-01 00:{i // 10:02d}:{(i * 7) % 60:02d}") for i in range(40)]
    df = spark.createDataFrame(rows, "id: long, ts_s: string") \
        .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts")
    write_iceberg(df, loc)

    register_stream_source(spark)
    sdf = (spark.readStream.format("iceberg_inc")
           .option("path", loc).option("starting", "earliest").load())
    agg = tumbling_agg(sdf, "ts", "1 minute",
                       {"cnt": F.count(F.lit(1))}, watermark="2 minutes")
    q = (agg.writeStream.format("memory").queryName("w1")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_w"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # batch equivalence: same helper over the same data as a batch frame
    batch = {(r.window_start, r.cnt)
             for r in tumbling_agg(df, "ts", "1 minute",
                                   {"cnt": F.count(F.lit(1))}).collect()}
    # append-mode stream emits only watermark-closed windows; every emitted
    # window must match the batch result
    stream = {(r.window_start, r.cnt) for r in spark.sql("SELECT * FROM w1").collect()}
    assert stream <= batch
    assert len(batch) == 4


def test_window_helpers_batch_semantics(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", "a"), (2, "2024-01-01 00:00:20", "a"),
         (3, "2024-01-01 00:02:00", "a"), (4, "2024-01-01 00:00:30", "b")],
        "id: long, ts_s: string, k: string",
    ).selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts", "k")

    t = tumbling_agg(df, "ts", "1 minute", {"cnt": F.count(F.lit(1))}, keys=["k"])
    got = {(str(r.window_start), r.k): r.cnt for r in t.collect()}
    assert got[("2024-01-01 00:00:00", "a")] == 2
    assert got[("2024-01-01 00:02:00", "a")] == 1
    assert got[("2024-01-01 00:00:00", "b")] == 1

    s = session_agg(df.filter("k = 'a'"), "ts", "30 seconds",
                    {"cnt": F.count(F.lit(1))})
    sessions = sorted((str(r.session_start), r.cnt) for r in s.collect())
    assert sessions == [("2024-01-01 00:00:05", 2), ("2024-01-01 00:02:00", 1)]

    d = streaming_dedup(df, ["k"])
    assert d.count() == 2


def _stream(spark, loc):
    register_stream_source(spark)
    return (spark.readStream.format("iceberg_inc")
            .option("path", loc).option("starting", "earliest").load())


def test_stateful_running_counts_accumulate_across_runs(spark, tmp_path):
    from duckdb_iceberg_spark.streaming import running_counts

    loc = str(tmp_path / "tbl_rc")
    ckpt = str(tmp_path / "ckpt_rc")
    out = str(tmp_path / "out_rc")
    write_iceberg(spark.range(10).selectExpr("id % 3 AS k", "id"), loc)

    def run():
        agg = running_counts(_stream(spark, loc), ["k"])
        q = (agg.writeStream.format("parquet").option("path", out)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    got1 = {r.k: r.events for r in spark.read.parquet(out).collect()}
    assert got1 == {0: 4, 1: 3, 2: 3}

    # second batch: counts must ACCUMULATE via the state store
    write_iceberg(spark.range(10, 16).selectExpr("id % 3 AS k", "id"), loc)
    run()
    latest = {}
    for r in spark.read.parquet(out).collect():
        latest[r.k] = max(latest.get(r.k, 0), r.events)
    assert latest == {0: 6, 1: 5, 2: 5}  # ids 10-15 add two per key

    # batch fallback has the same shape
    batch = running_counts(spark.read.parquet(out).limit(0)
                           .selectExpr("k", "events AS id"), ["k"])
    assert batch.columns == ["k", "events"]


def test_stateful_first_seen_filter(spark, tmp_path):
    from duckdb_iceberg_spark.streaming import first_seen_filter

    loc = str(tmp_path / "tbl_fs")
    ckpt = str(tmp_path / "ckpt_fs")
    out = str(tmp_path / "out_fs")
    write_iceberg(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k: long, payload: string"), loc)

    def run():
        dd = first_seen_filter(_stream(spark, loc), ["k"])
        q = (dd.writeStream.format("parquet").option("path", out)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    assert {(r.k, r.payload) for r in spark.read.parquet(out).collect()} == \
        {(1, "a"), (2, "b")}

    # same keys again + one new: only the new key may appear
    write_iceberg(spark.createDataFrame(
        [(1, "a2"), (3, "c")], "k: long, payload: string"), loc)
    run()
    rows = {(r.k, r.payload) for r in spark.read.parquet(out).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_iceberg_sink_foreachbatch_exactly_once(spark, tmp_path):
    """Micro-batches append via foreachBatch; a replayed batch-id is a
    no-op, so restart replays don't duplicate rows."""
    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.streaming import iceberg_sink, last_committed_batch

    loc = str(tmp_path / "sink")
    writer = iceberg_sink(loc, query_id="q1")

    writer(spark.range(0, 5).selectExpr("id"), 0)
    writer(spark.range(5, 9).selectExpr("id"), 1)
    assert last_committed_batch(loc, "q1") == 1
    assert sorted(r.id for r in iceberg_scan(spark, loc).collect()) == list(range(9))

    # replay of batch 1 (e.g. after a restart) must not duplicate
    writer(spark.range(5, 9).selectExpr("id"), 1)
    assert sorted(r.id for r in iceberg_scan(spark, loc).collect()) == list(range(9))
    writer(spark.range(9, 12).selectExpr("id"), 2)
    assert sorted(r.id for r in iceberg_scan(spark, loc).collect()) == list(range(12))


def test_sink_query_id_ambiguous_with_concurrent_streams():
    """ADVICE r12: with >1 active streaming queries, inferring query_id
    from streams.active can record ANOTHER query's id and corrupt the
    idempotence key — the sink must demand an explicit query_id instead.
    Pure unit test over duck-typed stand-ins (no second real stream
    needed)."""
    from types import SimpleNamespace as NS

    import pytest

    from duckdb_iceberg_spark.streaming.sink import _resolve_query_id

    def fake_df(active):
        return NS(sparkSession=NS(streams=NS(active=active)))

    # zero or one active stream: inference is well-defined
    assert _resolve_query_id(fake_df([])) == "default"
    assert _resolve_query_id(fake_df([NS(id="q-abc")])) == "q-abc"
    # two active streams: ambiguous — refuse loudly
    with pytest.raises(ValueError, match="pass query_id"):
        _resolve_query_id(fake_df([NS(id="q1"), NS(id="q2")]))


def test_iceberg_sink_with_real_stream(spark, tmp_path):
    """End-to-end: a rate-limited file stream writes into an Iceberg table
    with availableNow, and the table reads back complete."""
    import os

    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.streaming import iceberg_sink

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.range(0, 30).selectExpr("id").coalesce(1).write.parquet(src, mode="overwrite")

    loc = str(tmp_path / "sink")
    stream = (spark.readStream.schema("id long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream
         .foreachBatch(iceberg_sink(loc, query_id="q2"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    got = sorted(r.id for r in iceberg_scan(spark, loc).collect())
    assert got == list(range(30))


def test_stream_rate_limit_max_snapshots_per_trigger(spark, tmp_path):
    """maxSnapshotsPerTrigger bounds each microbatch to N append
    snapshots — a catch-up over a long backlog proceeds in bounded
    batches instead of one giant one (Spark-connector
    maxFilesPerTrigger analogue)."""
    loc = str(tmp_path / "tbl_rate")
    ckpt = str(tmp_path / "ckpt_rate")
    out = str(tmp_path / "out_rate")
    for lo in range(0, 40, 10):
        write_iceberg(
            spark.range(lo, lo + 10).selectExpr("id", "id * 2 AS v"), loc)

    register_stream_source(spark)

    def run_once():
        df = (spark.readStream.format("iceberg_inc")
              .option("path", loc).option("starting", "earliest")
              .option("maxSnapshotsPerTrigger", "1").load())
        q = (df.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    # each availableNow run advances AT MOST one append snapshot (the
    # trigger pins latestOffset once, and the reader bounds it)
    assert run_once() == list(range(10))
    assert run_once() == list(range(20))
    assert run_once() == list(range(30))
    assert run_once() == list(range(40))


def test_interval_join_stream_stream(spark, tmp_path):
    """Stream-stream interval join: two file streams of timestamped
    events joined within [0s, 10m] per key, watermarks bounding state.
    Results must equal the batch-parity run of the same operator."""
    import datetime as dt

    from duckdb_iceberg_spark.operators.joins import interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    clicks_rows = [(1, 1, ts(0)), (2, 2, ts(0)), (3, 1, ts(30))]
    buys_rows = [(10, 1, ts(5)), (11, 1, ts(15)), (12, 2, ts(8)),
                 (13, 1, ts(35))]
    cdir = str(tmp_path / "clicks")
    bdir = str(tmp_path / "buys")
    spark.createDataFrame(clicks_rows, "cid long, user_id long, ts timestamp") \
        .write.parquet(cdir)
    spark.createDataFrame(buys_rows, "bid long, user_id long, ts timestamp") \
        .write.parquet(bdir)

    cs = spark.readStream.schema("cid long, user_id long, ts timestamp") \
        .parquet(cdir)
    bs = spark.readStream.schema("bid long, user_id long, ts timestamp") \
        .parquet(bdir)
    j = interval_join(cs, bs, "ts", ["user_id"], "0 seconds", "10 minutes")
    q = (j.select("cid", "bid").writeStream.format("memory")
         .queryName("ij_test")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql(
        "SELECT cid, bid FROM ij_test").collect())

    cb = spark.createDataFrame(clicks_rows, "cid long, user_id long, ts timestamp")
    bb = spark.createDataFrame(buys_rows, "bid long, user_id long, ts timestamp")
    want = sorted(tuple(r) for r in interval_join(
        cb, bb, "ts", ["user_id"], "0 seconds", "10 minutes")
        .select("cid", "bid").collect())
    assert got == want == [(1, 10), (2, 12), (3, 13)]


def test_stateful_dedup_keys_ttl(spark, tmp_path):
    """transformWithStateInPandas-based dedup: first row per key survives
    across micro-batch runs via the state store; TTL bounds the state so
    a key seen again AFTER expiry is re-admitted (the bounded-state
    property first_seen_filter lacks)."""
    import time as _time

    from duckdb_iceberg_spark.streaming import dedup_keys_ttl

    loc = str(tmp_path / "tbl_ttl")
    ckpt = str(tmp_path / "ckpt_ttl")
    out = str(tmp_path / "out_ttl")
    write_iceberg(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k: long, payload: string"), loc)

    def run(ttl_ms):
        dd = dedup_keys_ttl(_stream(spark, loc), ["k"], ttl_ms=ttl_ms)
        q = (dd.writeStream.format("parquet").option("path", out)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run(60_000)
    assert {(r.k, r.payload) for r in spark.read.parquet(out).collect()} == \
        {(1, "a"), (2, "b")}

    # within TTL: repeats suppressed, new key admitted
    write_iceberg(spark.createDataFrame(
        [(1, "a2"), (3, "c")], "k: long, payload: string"), loc)
    run(60_000)
    assert {(r.k, r.payload) for r in spark.read.parquet(out).collect()} == \
        {(1, "a"), (2, "b"), (3, "c")}

    # short TTL + wait past it: an expired key is re-admitted by design
    write_iceberg(spark.createDataFrame(
        [(9, "x1")], "k: long, payload: string"), loc)
    run(500)
    _time.sleep(1.2)
    write_iceberg(spark.createDataFrame(
        [(9, "x2")], "k: long, payload: string"), loc)
    run(500)
    xs = {r.payload for r in spark.read.parquet(out).collect() if r.k == 9}
    assert xs == {"x1", "x2"}

    # batch fallback
    b = dedup_keys_ttl(spark.createDataFrame(
        [(1, "p"), (1, "q")], "k: long, payload: string"), ["k"])
    assert b.count() == 1


def test_stateful_dedup_ttl_repeat_then_silence_gc(spark, tmp_path):
    """A key that arrives a SECOND time within its TTL (suppressed path)
    and then goes quiet must still have its state marker garbage-collected:
    the suppression branch re-arms the ProcessingTimeTimeout, since Spark
    clears the registered timeout on every invocation. Observable via the
    state-store row count — without the re-arm the marker lives forever."""
    import time as _time

    from duckdb_iceberg_spark.streaming import dedup_keys_ttl

    loc = str(tmp_path / "tbl_ttl_gc")
    ckpt = str(tmp_path / "ckpt_ttl_gc")
    out = str(tmp_path / "out_ttl_gc")
    # TTL must outlive two query startups (seconds each) so the repeat
    # arrival genuinely lands INSIDE the window; the deadline is stamped at
    # first arrival, so total wait is bounded by ttl regardless of startup.
    ttl_ms = 20_000
    write_iceberg(spark.createDataFrame(
        [(9, "x1")], "k: long, payload: string"), loc)

    def run():
        dd = dedup_keys_ttl(_stream(spark, loc), ["k"], ttl_ms=ttl_ms)
        q = (dd.writeStream.format("parquet").option("path", out)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        prog = q.lastProgress
        ops = (prog or {}).get("stateOperators") or []
        return ops[0]["numRowsTotal"] if ops else None

    t0 = _time.time()
    run()                                       # first arrival: emitted
    # the expiry deadline is stamped at first ARRIVAL, which happens mid-
    # run1 after seconds of query startup: t_arr (taken after run1
    # returns) is an upper bound on it, so sleeping until t_arr + ttl is
    # guaranteed past the deadline — sleeping ttl from t0 is NOT (observed:
    # the third batch's timestamp landed 5s before the registered timeout
    # and correctly declined to GC)
    t_arr = _time.time()
    write_iceberg(spark.createDataFrame(
        [(9, "x2")], "k: long, payload: string"), loc)
    run()                                       # repeat within TTL: suppressed
    assert _time.time() - t0 < ttl_ms / 1000, "startup outran the TTL window"
    # ... then silence until past the deadline stamped at first arrival
    _time.sleep(max(0.0, ttl_ms / 1000 + 1.5 - (_time.time() - t_arr)))
    write_iceberg(spark.createDataFrame(
        [(10, "y")], "k: long, payload: string"), loc)
    rows_total = run()                          # unrelated batch triggers GC
    # key 9's marker must be gone; only key 10 remains in the state store
    assert rows_total == 1
    got = {(r.k, r.payload) for r in spark.read.parquet(out).collect()}
    assert got == {(9, "x1"), (10, "y")}


def test_iceberg_upsert_sink_exactly_once_cdc(spark, tmp_path):
    """r12 upsert sink: micro-batches CDC-upsert on key — later batches
    replace earlier rows with the same key, replays are no-ops, the
    first batch creates the table."""
    from duckdb_iceberg_spark import iceberg_scan
    from duckdb_iceberg_spark.streaming import (
        iceberg_upsert_sink,
        last_committed_batch,
    )

    loc = str(tmp_path / "upsink")
    writer = iceberg_upsert_sink(loc, ["id"], query_id="uq1")

    writer(spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "id: long, v: string"), 0)
    writer(spark.createDataFrame(
        [(1, "B"), (3, "d")], "id: long, v: string"), 1)
    got = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert got == {0: "a", 1: "B", 2: "c", 3: "d"}
    assert last_committed_batch(loc, "uq1") == 1

    # replayed batch: no duplicate, no extra snapshot
    writer(spark.createDataFrame([(1, "B"), (3, "d")],
                                 "id: long, v: string"), 1)
    got = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert got == {0: "a", 1: "B", 2: "c", 3: "d"}

    writer(spark.createDataFrame([(0, "A2")], "id: long, v: string"), 2)
    got = {r.id: r.v for r in iceberg_scan(spark, loc).collect()}
    assert got == {0: "A2", 1: "B", 2: "c", 3: "d"}
