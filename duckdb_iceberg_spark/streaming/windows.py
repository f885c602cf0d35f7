"""Event-time windowing + streaming dedup helpers.

Thin, opinionated wrappers over Structured Streaming's built-ins — the
watermark/window plumbing every pipeline re-derives. All helpers work on
both batch and streaming DataFrames (Spark's unified semantics); on a
stream they produce watermark-bounded state."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation; late rows beyond the
    watermark are dropped (stream) / included (batch)."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    g = df.groupBy(F.window(ts_col, window), *keys)
    out = g.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys, *aggs.keys(),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    g = df.groupBy(F.window(ts_col, window, slide), *keys)
    out = g.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys, *aggs.keys(),
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge."""
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    g = df.groupBy(F.session_window(ts_col, gap), *keys)
    out = g.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys, *aggs.keys(),
    )


def streaming_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Exactly-once key dedup. On a stream with a watermark the state is
    bounded (dropDuplicatesWithinWatermark); batch falls back to
    dropDuplicates."""
    if df.isStreaming and ts_col and watermark:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
