"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming; these are the Spark-native stateful
building blocks a snapshot-fed pipeline needs. State lives in Spark's
state store (per-key, checkpointed, watermark/timeout-bounded) — the
operators also run on batch DataFrames for test parity via a groupBy
fallback."""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def running_counts(
    df: DataFrame,
    keys: Sequence[str],
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running event count + running max of a monotonically
    increasing `seq` column if present. On a stream, counts accumulate in
    the state store across microbatches; on a batch frame it degrades to a
    plain groupBy (same output schema)."""
    keys = list(keys)
    out_schema = T.StructType(
        [T.StructField(k, df.schema[k].dataType) for k in keys]
        + [T.StructField("events", T.LongType())]
    )
    if not df.isStreaming:
        return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("events"))

    state_schema = T.StructType([T.StructField("events", T.LongType())])

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame([{**dict(zip(keys, key)), "events": total}])

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "Append", timeout)


def first_seen_filter(
    df: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Stateful exactly-once key filter: emits only the FIRST row ever seen
    per key (across the stream's lifetime — state-store backed, unlike
    dropDuplicatesWithinWatermark's watermark-bounded state). Batch frames
    fall back to one row per key (min by key ordering is not defined —
    representative row)."""
    keys = list(keys)
    if not df.isStreaming:
        return df.dropDuplicates(keys)

    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    cols = [f.name for f in df.schema.fields]

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][cols]
        state.update((True,))
        if first is not None:
            yield first

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "Append", "NoTimeout")


def dedup_keys_ttl(
    df: DataFrame,
    keys: Sequence[str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exactly-once key dedup with TTL-BOUNDED state: emits the
    first row per key; the per-key marker expires after ``ttl_ms``, so the
    state store stays bounded on infinite key spaces — the property
    first_seen_filter (state-forever) cannot offer, and the difference
    that matters at 100 TB: an unbounded crawl's key universe outgrows any
    state store, while a TTL window matches the dedup horizon the pipeline
    actually needs (e.g. "drop re-crawls seen in the last 7 days"). After
    expiry the key is admitted again by design.

    Implementation: the expiry deadline lives IN the state value and is
    checked on every arrival (exact re-admission even when the key keeps
    appearing), while a ProcessingTimeTimeout garbage-collects markers for
    keys that stop arriving. (Spark 4's transformWithStateInPandas ships
    native TTL state, but its python worker needs google.protobuf, which
    this environment lacks; this formulation is dependency-free and has
    the same contract.)

    Batch frames fall back to dropDuplicates (no TTL — a batch has no
    time axis)."""
    keys = list(keys)
    if not df.isStreaming:
        return df.dropDuplicates(keys)

    out_schema = df.schema
    cols = [f.name for f in df.schema.fields]
    state_schema = T.StructType([T.StructField("expires", T.LongType())])
    timeout = "ProcessingTimeTimeout" if ttl_ms is not None else "NoTimeout"

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        import time as _time

        if state.hasTimedOut:
            state.remove()
            return
        now_ms = int(_time.time() * 1000)
        if state.exists:
            expires = state.get[0]
            if expires is None or expires > now_ms:
                # suppressed: seen within the TTL window (or forever). Spark
                # clears the registered timeout on EVERY invocation of this
                # function, so re-arm it here — otherwise a key that arrives
                # twice within its TTL and then goes quiet would keep its
                # marker forever, defeating the bounded-state contract. The
                # JVM only persists a timeout change when the state is also
                # flagged updated, so re-write the (unchanged) value too.
                if ttl_ms is not None and expires is not None:
                    state.update((expires,))
                    state.setTimeoutDuration(max(expires - now_ms, 1))
                return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][cols]
        state.update((now_ms + ttl_ms if ttl_ms is not None else None,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield first

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "Append", timeout)
