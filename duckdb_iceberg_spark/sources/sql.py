"""SQL surface: make Iceberg tables addressable from ``spark.sql``.

The reference's ``ATTACH '…' (TYPE ICEBERG)`` makes ``cat.ns.tbl``
name-resolvable in SQL (reference: iceberg_attach.cpp:14-138 +
IcebergTableSchemaVersion::GetScanFunction injecting iceberg_scan,
iceberg_table_schema_version.cpp:101-106). The Spark-native analogue is a
temp view over the planned scan DataFrame: Catalyst then applies
projection/filter pushdown through the view like any other relation.

One semantic difference, documented: the reference resolves the table's
current snapshot at QUERY time; a temp view freezes the file list at
registration time. Re-register (or call ``attach_catalog`` again) to see
new commits — the same read-isolation model as a fixed snapshot scan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .scan import iceberg_scan


def register_table(
    spark: SparkSession,
    view_name: str,
    source: Any,
    **scan_opts,
) -> DataFrame:
    """Register an Iceberg table as a SQL temp view.

    ``source`` is a filesystem table path (str) or a catalog
    ``RestTable``. ``scan_opts`` pass through to the scan (``snapshot_id``,
    ``as_of``, ``where``, …). Returns the underlying DataFrame."""
    if isinstance(source, str):
        df = iceberg_scan(spark, source, **scan_opts)
    else:
        from ..catalog.scan_planning import scan_rest_table

        df = scan_rest_table(spark, source, **scan_opts)
    df.createOrReplaceTempView(view_name)
    return df


def attach_catalog(
    spark: SparkSession,
    catalog: Any,
    namespace: str | tuple,
    *,
    view_prefix: str = "",
    server_planning: bool = True,
) -> list[str]:
    """ATTACH analogue: register every table of a REST-catalog namespace as
    a temp view named ``<view_prefix><table>``; returns the view names.
    Table loads are driver-side metadata fetches only — no data is read
    until a query touches a view."""
    names: list[str] = []
    for ident in catalog.list_tables(namespace):
        name = ident["name"] if isinstance(ident, dict) else ident
        table = catalog.load_table(namespace, name)
        view = f"{view_prefix}{name}"
        register_table(spark, view, table, server_planning=server_planning)
        names.append(view)
    return names
