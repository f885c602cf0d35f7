"""Time-series join operators Spark lacks as builtins.

- asof_join: for each left row, the single right row with the greatest
  ``ts <= left.ts`` per key (optionally within ``tolerance``) — the
  standard "latest reading at event time" join. Implemented WITHOUT a
  range self-join: both sides union into one frame sorted per key by
  (ts, side), and a running ``last(right_payload, ignorenulls)`` window
  carries the newest right row forward onto every left row. One shuffle
  + one sort per key partition, linear in rows — the 100 TB shape
  (a naive inequality join is quadratic per key and unprunable).
  DuckDB's native ASOF JOIN is the oracle twin.

- interval_join: right rows within ``[left.ts + lower, left.ts + upper]``
  per key — the stream-stream join shape. On streaming inputs both
  sides get watermarks and Spark's symmetric hash join bounds state by
  the interval; on batch frames the identical condition runs as a plain
  range join (what the DuckDB oracle replays).

Tie semantics (asof): right rows sharing (key, ts) resolve to the
greatest payload struct (deterministic across engines when the payload
leads with a unique id — put the id first)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join (backward): every ``left`` row, plus
    ``value_cols`` from the latest ``right`` row with ``right.ts <=
    left.ts`` and equal ``by`` keys (NULLs when none). ``tolerance`` (a
    Column interval or literal, e.g. ``F.expr("INTERVAL 10 MINUTES")``)
    bounds the lookback; older matches null out.

    The right payload struct leads with ``ts`` then ``value_cols`` —
    make the first value column a unique id for deterministic ties."""
    by = list(by)
    payload = F.struct(
        F.col(ts_col).alias("__rts"),
        *[F.col(c).alias(c) for c in value_cols]).alias("__r")
    r2 = right.select(*by, F.col(ts_col).alias("__ts"),
                      F.lit(0).alias("__is_left"), payload)
    l2 = left.select(
        "*", F.col(ts_col).alias("__ts"), F.lit(1).alias("__is_left"),
        F.lit(None).cast(r2.schema["__r"].dataType).alias("__r"))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (Window.partitionBy(*by)
         .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(),
                  F.col("__r").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = F.last("__r", ignorenulls=True).over(w)
    out = u.withColumn("__m", m).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(F.col("__m.__rts") >= F.col("__ts") - tolerance,
                   F.col("__m")))
    keep = [c for c in left.columns]
    sel = [F.col(c) for c in keep] + [
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols]
    return out.select(*sel)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    lower: str,
    upper: str,
    watermark: str = "10 minutes",
    suffix: str = "_r",
) -> DataFrame:
    """Rows of ``right`` whose ``ts`` falls in ``[left.ts + lower,
    left.ts + upper]`` with matching keys (inner). ``lower``/``upper``
    are interval strings (e.g. ``"0 seconds"``, ``"10 minutes"``).
    Streaming inputs get ``watermark`` on both sides so the state store
    evicts rows once the interval cannot match anymore."""
    by = list(by)
    lf, rf = left, right
    if lf.isStreaming:
        lf = lf.withWatermark(ts_col, watermark)
    if rf.isStreaming:
        rf = rf.withWatermark(ts_col, watermark)
    lcols = set(lf.columns)
    renames = {c: f"{c}{suffix}" for c in rf.columns
               if c in lcols and c not in by}
    for old, new in renames.items():
        rf = rf.withColumnRenamed(old, new)
    rts = renames.get(ts_col, ts_col)
    cond = (
        (F.col(rts) >= F.col(ts_col) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rts) <= F.col(ts_col) + F.expr(f"INTERVAL {upper}"))
    )
    # key equality + the range condition in ONE join predicate, so a
    # streaming run uses the watermarked stream-stream join and a batch
    # run lets Catalyst pick the range-join strategy
    pred = cond
    for k in by:
        pred = (lf[k] == rf[k]) & pred
    joined = lf.join(rf, pred)
    # drop the duplicate right-side key columns
    for k in by:
        joined = joined.drop(rf[k])
    return joined
