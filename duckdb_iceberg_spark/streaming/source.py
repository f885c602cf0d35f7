"""Structured Streaming source over Iceberg snapshot increments
(Spark 4 Python Data Source API).

Usage::

    from duckdb_iceberg_spark.streaming import register_stream_source
    register_stream_source(spark)
    df = (spark.readStream.format("iceberg_inc")
          .option("path", "/tables/events")
          .option("starting", "earliest")          # or "latest" / snapshot id
          .load())

Offsets are ``{"snapshot_id", "sequence_number"}``; each microbatch plans
the append snapshots in (start, end] and emits one input partition per
added data file. Workers read their file with pyarrow and yield Arrow
record batches (zero row-by-row Python). Append-only semantics: replace
(compaction) snapshots are skipped; row-level deletes don't retract
already-streamed rows (documented, matching Iceberg's Spark streaming
source)."""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from ..metadata import types as ice_types
from ..metadata.table_metadata import load_table_metadata
from .incremental import appended_snapshots, incremental_tasks

FORMAT_NAME = "iceberg_inc"


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.options = options
        self.path = options["path"]
        self.columns = schema.fieldNames()
        starting = str(options.get("starting", "latest")).lower()
        tm = load_table_metadata(self.path)
        cur = tm.current_snapshot()
        if starting == "earliest":
            self._initial = {"snapshot_id": None, "sequence_number": 0}
        elif starting == "latest":
            self._initial = {
                "snapshot_id": cur.snapshot_id if cur else None,
                "sequence_number": cur.sequence_number if cur else 0,
            }
        else:
            snap = tm.snapshot_by_id(int(starting))
            self._initial = {"snapshot_id": snap.snapshot_id,
                             "sequence_number": snap.sequence_number}
        # rate limiting: at most N append-snapshots advance per microbatch
        # (Apache Spark-connector analogue of maxFilesPerTrigger — bounds a
        # catch-up over a long backlog to executor-sized batches)
        mx = options.get("maxsnapshotspertrigger",
                         options.get("max_snapshots_per_trigger"))
        self._max_snaps = int(mx) if mx is not None else None
        self._last_end = dict(self._initial)

    # -- offsets ------------------------------------------------------------

    def initialOffset(self) -> dict:
        return self._initial

    def latestOffset(self) -> dict:
        tm = load_table_metadata(self.path)
        cur = tm.current_snapshot()
        if cur is None:
            return self._initial
        tip = {"snapshot_id": cur.snapshot_id,
               "sequence_number": cur.sequence_number}
        if self._max_snaps is None:
            return tip
        pending = appended_snapshots(
            tm, self._last_end.get("snapshot_id"), cur.snapshot_id,
            on_non_append="skip")
        if len(pending) <= self._max_snaps:
            self._last_end = tip
            return tip
        bounded = pending[self._max_snaps - 1]
        self._last_end = {"snapshot_id": bounded.snapshot_id,
                          "sequence_number": bounded.sequence_number}
        return dict(self._last_end)

    # -- planning -----------------------------------------------------------

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # keep the rate-limit cursor ahead of every engine-visible offset:
        # on restart the reader is rebuilt, and bounding from a stale
        # cursor must never hand the engine an offset behind the
        # checkpointed start
        if end.get("sequence_number", 0) > self._last_end.get("sequence_number", 0):
            self._last_end = dict(end)
        start_id = start.get("snapshot_id")
        end_id = end.get("snapshot_id")
        if end_id is None or start_id == end_id:
            return []
        tm = load_table_metadata(self.path)
        snaps = appended_snapshots(tm, start_id, end_id, on_non_append="skip")
        plan = incremental_tasks(tm, snaps)
        return [_FilePartition(t.data_file.file_path, self.columns)
                for t in plan.tasks]

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        # project/reorder to the stream schema by name; missing columns
        # (pre-evolution files) yield nulls
        import pyarrow as pa

        cols = []
        for name in partition.columns:
            if name in table.column_names:
                col = table.column(name)
                # INT96/ns parquet timestamps arrive as Timestamp(NANOSECOND),
                # which Spark's Arrow bridge rejects — floor to µs
                if pa.types.is_timestamp(col.type) and col.type.unit == "ns":
                    col = col.cast(pa.timestamp("us", col.type.tz))
                cols.append(col)
            else:
                cols.append(pa.nulls(table.num_rows))
        out = pa.table(dict(zip(partition.columns, cols)))
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        pass


class IcebergStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        tm = load_table_metadata(self.options["path"])
        return ice_types.schema_to_struct(tm.schema_json())

    def streamReader(self, schema: T.StructType) -> IcebergStreamReader:
        return IcebergStreamReader(schema, dict(self.options))


def register_stream_source(spark: SparkSession) -> None:
    spark.dataSource.register(IcebergStreamDataSource)
