"""Structured Streaming over Iceberg: incremental scans, a Python Data
Source stream reader, and event-time window helpers."""

from .changelog import changelog_scan  # noqa: F401
from .incremental import appended_snapshots, incremental_scan  # noqa: F401
from .sink import (iceberg_sink, iceberg_upsert_sink,  # noqa: F401
                   last_committed_batch)
from .source import (  # noqa: F401
    FORMAT_NAME,
    IcebergStreamDataSource,
    register_stream_source,
)
from .stateful import (dedup_keys_ttl, first_seen_filter,  # noqa: F401
                       running_counts)
from .windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    streaming_dedup,
    tumbling_agg,
    with_watermark,
)
