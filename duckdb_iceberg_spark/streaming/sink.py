"""Streaming Iceberg sink: exactly-once appends via foreachBatch.

Beyond the reference's scope (it has no streaming; SURVEY.md §2.4) but the
natural Spark-first completion of the streaming layer: each micro-batch is
appended with ``write_iceberg`` and the (query-id, batch-id) watermark is
recorded in the snapshot summary, so a restarted query that replays a
micro-batch recognizes the already-committed batch and skips it —
exactly-once table contents on top of Spark's at-least-once replay.

Usage::

    writer = iceberg_sink(location)
    q = (df.writeStream.foreachBatch(writer)
           .option("checkpointLocation", ckpt).start())
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from ..metadata.table_metadata import load_table_metadata

__all__ = ["iceberg_sink", "last_committed_batch"]

_QUERY_PROP = "spark.streaming.query-id"
_BATCH_PROP = "spark.streaming.batch-id"


def last_committed_batch(location: str, query_id: str | None = None) -> Optional[int]:
    """Highest batch-id recorded in any snapshot summary (optionally
    restricted to one streaming query)."""
    try:
        tm = load_table_metadata(location)
    except FileNotFoundError:
        return None
    best: Optional[int] = None
    for s in tm.snapshots:
        summary = s.summary or {}
        if _BATCH_PROP not in summary:
            continue
        if query_id is not None and summary.get(_QUERY_PROP) != query_id:
            continue
        b = int(summary[_BATCH_PROP])
        best = b if best is None or b > best else best
    return best


def _resolve_query_id(batch_df: DataFrame) -> str:
    """Default query-id for a sink that wasn't given one explicitly.

    Safe only when AT MOST one streaming query is active: with several,
    ``streams.active`` has no defined order and picking any entry can
    record ANOTHER query's id, corrupting the (query-id, batch-id)
    idempotence key — a replayed batch could double-commit or a fresh
    batch be skipped (ADVICE r12). In that case the sink must be built
    with an explicit ``query_id=``."""
    streams = batch_df.sparkSession.streams.active
    if len(streams) > 1:
        raise ValueError(
            "iceberg sink: cannot infer query_id with "
            f"{len(streams)} concurrent streaming queries active; "
            "pass query_id= explicitly when building the sink")
    return str(streams[0].id) if streams else "default"


def iceberg_sink(
    location: str,
    *,
    partition_by=None,
    query_id: str | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function appending micro-batches to the
    Iceberg table at ``location`` with batch-id idempotence."""
    from ..sources.writer import write_iceberg

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch runs on the driver; the active query is available
        qid = query_id if query_id is not None else _resolve_query_id(batch_df)
        done = last_committed_batch(location, qid)
        if done is not None and batch_id <= done:
            return  # replayed batch: already committed
        if transform is not None:
            batch_df = transform(batch_df)
        write_iceberg(
            batch_df, location, partition_by=partition_by,
            snapshot_properties={_QUERY_PROP: qid,
                                 _BATCH_PROP: str(batch_id)})

    return write_batch


def iceberg_upsert_sink(
    location: str,
    key_columns: list[str],
    *,
    query_id: str | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function CDC-UPSERTING micro-batches into
    the Iceberg table at ``location`` (NEW r12 — the Flink-connector
    upsert-sink pattern): each batch commits ONE snapshot carrying an
    equality-delete file for the incoming keys plus the new data files,
    so replays of the same key within later batches replace earlier rows
    while concurrent readers only ever see whole batches. Exactly-once
    via the same batch-id idempotence the append sink uses: a replayed
    micro-batch (restart between sink commit and checkpoint) is detected
    by the recorded query/batch snapshot properties and skipped.

    Precondition: each micro-batch carries at most one row per key (the
    usual CDC-compaction contract — apply ``transform`` to keep-last
    per key if the stream may contain intra-batch duplicates).

    Long streams stack one equality-delete file per batch (each scan
    then pays one broadcast anti-join per stacked file) — schedule
    ``rewrite_position_delete_files(..., convert_equality=True)``
    periodically to materialize the stack into per-file positional
    deletes, exactly the Flink + maintenance-job deployment shape."""
    from ..sources.dml import upsert_equality

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        qid = query_id if query_id is not None else _resolve_query_id(batch_df)
        done = last_committed_batch(location, qid)
        if done is not None and batch_id <= done:
            return  # replayed batch: already committed
        if transform is not None:
            batch_df = transform(batch_df)
        if len(batch_df.take(1)) == 0:
            return  # empty batch: no snapshot
        from ..sources.writer import current_version_number, write_iceberg

        props = {_QUERY_PROP: qid, _BATCH_PROP: str(batch_id)}
        if current_version_number(location) == 0:
            # first batch creates the table — no prior rows to delete
            write_iceberg(batch_df, location, snapshot_properties=props)
            return
        upsert_equality(
            batch_df.sparkSession, location, batch_df, key_columns,
            snapshot_properties=props)

    return write_batch
