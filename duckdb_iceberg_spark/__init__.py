"""duckdb_iceberg_spark — a PySpark-native Iceberg engine.

Brand-new engine with the query/data-processing capabilities of the
DuckDB-Iceberg extension (reference study in SURVEY.md), re-expressed
Spark-first: Iceberg metadata planning on the driver, all data movement as
Catalyst-optimized DataFrames.
"""

from .session import get_spark
from .sources.add_files import add_files
from .sources.ddl import (
    cherrypick_snapshot,
    fast_forward,
    rollback_to_snapshot,
    set_current_snapshot,
)
from .sources.ducklake import iceberg_to_ducklake
from .sources.maintenance import (
    expire_snapshots,
    remove_orphan_files,
    rewrite_data_files,
    rewrite_manifests,
    rewrite_position_delete_files,
    vacuum,
)
from .sources.scan import iceberg_scan, iceberg_count, scan_with_runtime_filter
from .sources.sql import attach_catalog, execute_sql, refresh_table, register_table
from .sources.statistics import (
    compute_partition_stats,
    compute_table_stats,
    read_partition_stats,
    table_ndv,
)
from .sources.writer import create_table, write_iceberg

__all__ = [
    "get_spark",
    "iceberg_scan",
    "iceberg_count",
    "create_table",
    "write_iceberg",
    "register_table",
    "execute_sql",
    "refresh_table",
    "scan_with_runtime_filter",
    "attach_catalog",
    "iceberg_to_ducklake",
    # import / maintenance / snapshot management (r12 top-level surface)
    "add_files",
    "rewrite_data_files",
    "rewrite_position_delete_files",
    "rewrite_manifests",
    "expire_snapshots",
    "remove_orphan_files",
    "vacuum",
    "fast_forward",
    "rollback_to_snapshot",
    "set_current_snapshot",
    "cherrypick_snapshot",
    "compute_table_stats",
    "table_ndv",
    "compute_partition_stats",
    "read_partition_stats",
]
