"""iceberg_to_ducklake: migrate Iceberg tables into a DuckLake catalog.

DuckLake stores a lakehouse's metadata as plain SQL tables in a database
file; the data parquet files are shared — migration rewrites METADATA
ONLY, never data (reference:
src/function/ducklake/iceberg_to_ducklake.cpp — the whole conversion is
generated INSERT statements into ducklake_* tables; per-entity SQL
shapes in src/function/ducklake/ducklake_{snapshot,schema,table,column,
data_file,delete_file,partition,partition_column}.cpp).

This implementation authors the DuckLake catalog tables (public DuckLake
spec v0.2 layout) directly via the in-process duckdb engine, walking
each Iceberg table's main-branch ancestry oldest→newest:

- one ducklake_snapshot per Iceberg snapshot, ordered by commit time
  across all migrated tables (the reference keys snapshots by timestamp)
- versioned catalog rows (begin_snapshot/end_snapshot ranges) for
  schemas, tables, columns, partitions
- ducklake_data_file rows whose [begin, end) snapshot range reproduces
  every historical file set — time travel survives migration
- ducklake_delete_file rows for positional deletes; parquet delete files
  must reference exactly ONE data file (lower==upper bound of
  file_path, reference: ducklake_delete_file.cpp:17-37) and Puffin DVs
  must span the whole blob (offset 0, content_size == file_size).
  Equality deletes refuse conversion (iceberg_to_ducklake.cpp:238-240).

Driver-only metadata work: nothing here touches Spark executors or data
files; cost is O(#snapshots × #files) manifest parsing.
"""

from __future__ import annotations

import uuid as _uuid
from typing import Any, Mapping

from ..metadata import manifest as mf
from ..metadata import types as ice_types
from ..metadata.table_metadata import TableMetadata, load_table_metadata
from ..plans.scan_plan import _localize

_POS_DELETE_PATH_FID = 2147483546

_DDL = """
CREATE TABLE IF NOT EXISTS ducklake_metadata(key VARCHAR NOT NULL, value VARCHAR NOT NULL, scope VARCHAR, scope_id BIGINT);
CREATE TABLE IF NOT EXISTS ducklake_snapshot(snapshot_id BIGINT PRIMARY KEY, snapshot_time TIMESTAMPTZ, schema_version BIGINT, next_catalog_id BIGINT, next_file_id BIGINT);
CREATE TABLE IF NOT EXISTS ducklake_snapshot_changes(snapshot_id BIGINT PRIMARY KEY, changes_made VARCHAR, author VARCHAR, commit_message VARCHAR, commit_extra_info VARCHAR);
CREATE TABLE IF NOT EXISTS ducklake_schema(schema_id BIGINT PRIMARY KEY, schema_uuid UUID, begin_snapshot BIGINT, end_snapshot BIGINT, schema_name VARCHAR, path VARCHAR, path_is_relative BOOLEAN);
CREATE TABLE IF NOT EXISTS ducklake_table(table_id BIGINT, table_uuid UUID, begin_snapshot BIGINT, end_snapshot BIGINT, schema_id BIGINT, table_name VARCHAR, path VARCHAR, path_is_relative BOOLEAN);
CREATE TABLE IF NOT EXISTS ducklake_column(column_id BIGINT, begin_snapshot BIGINT, end_snapshot BIGINT, table_id BIGINT, column_order BIGINT, column_name VARCHAR, column_type VARCHAR, initial_default VARCHAR, default_value VARCHAR, nulls_allowed BOOLEAN, parent_column BIGINT, default_value_type VARCHAR, default_value_dialect VARCHAR);
CREATE TABLE IF NOT EXISTS ducklake_data_file(data_file_id BIGINT, table_id BIGINT, begin_snapshot BIGINT, end_snapshot BIGINT, file_order BIGINT, path VARCHAR, path_is_relative BOOLEAN, file_format VARCHAR, record_count BIGINT, file_size_bytes BIGINT, footer_size BIGINT, row_id_start BIGINT, partition_id BIGINT, encryption_key VARCHAR, mapping_id BIGINT, partial_max BIGINT);
CREATE TABLE IF NOT EXISTS ducklake_delete_file(delete_file_id BIGINT, table_id BIGINT, begin_snapshot BIGINT, end_snapshot BIGINT, data_file_id BIGINT, path VARCHAR, path_is_relative BOOLEAN, format VARCHAR, delete_count BIGINT, file_size_bytes BIGINT, footer_size BIGINT, encryption_key VARCHAR, partial_max BIGINT);
CREATE TABLE IF NOT EXISTS ducklake_partition_info(partition_id BIGINT, table_id BIGINT, begin_snapshot BIGINT, end_snapshot BIGINT);
CREATE TABLE IF NOT EXISTS ducklake_partition_column(partition_id BIGINT, table_id BIGINT, partition_key_index BIGINT, column_id BIGINT, transform VARCHAR);
CREATE TABLE IF NOT EXISTS ducklake_file_partition_value(data_file_id BIGINT, table_id BIGINT, partition_key_index BIGINT, partition_value VARCHAR);
CREATE TABLE IF NOT EXISTS ducklake_table_stats(table_id BIGINT, record_count BIGINT, next_row_id BIGINT, file_size_bytes BIGINT);
CREATE TABLE IF NOT EXISTS ducklake_table_column_stats(table_id BIGINT, column_id BIGINT, contains_null BOOLEAN, contains_nan BOOLEAN, min_value VARCHAR, max_value VARCHAR, extra_stats VARCHAR);
CREATE TABLE IF NOT EXISTS ducklake_file_column_stats(data_file_id BIGINT, table_id BIGINT, column_id BIGINT, column_size_bytes BIGINT, value_count BIGINT, null_count BIGINT, min_value VARCHAR, max_value VARCHAR, contains_nan BOOLEAN, extra_stats VARCHAR);
CREATE TABLE IF NOT EXISTS ducklake_schema_versions(begin_snapshot BIGINT, schema_version BIGINT, table_id BIGINT);
"""

_ICE_TO_DUCK = {
    "boolean": "BOOLEAN", "int": "INTEGER", "long": "BIGINT",
    "float": "FLOAT", "double": "DOUBLE", "date": "DATE", "time": "TIME",
    "timestamp": "TIMESTAMP", "timestamptz": "TIMESTAMP WITH TIME ZONE",
    "timestamp_ns": "TIMESTAMP_NS", "timestamptz_ns": "TIMESTAMP_NS",
    "string": "VARCHAR", "uuid": "UUID", "binary": "BLOB", "fixed": "BLOB",
}


def _duck_type(t: Any) -> str:
    if isinstance(t, dict):
        kind = t.get("type")
        return {"struct": "struct", "list": "list", "map": "map"}.get(kind, "VARCHAR")
    name = ice_types.primitive_name(t)
    if name == "decimal":
        p, s = ice_types.decimal_precision_scale(t)
        return f"DECIMAL({p},{s})"
    return _ICE_TO_DUCK.get(name, "VARCHAR")


def _snapshot_entries(tm: TableMetadata, snap) -> list:
    """Live manifest entries (data + delete) of one snapshot."""
    out = []
    if not snap.manifest_list:
        return out
    for m in mf.read_manifest_list(_localize(tm, snap.manifest_list)):
        entries = mf.read_manifest(_localize(tm, m.manifest_path))
        for e in entries:
            if e.status == mf.STATUS_DELETED:
                continue
            if e.sequence_number is None:
                e.sequence_number = m.sequence_number
            out.append(e)
    return out


def _referenced_data_file(table_name: str, d: mf.DataFile) -> str:
    """The single data file a positional-delete entry targets (reference:
    ducklake_delete_file.cpp — parquet delete files must have
    lower==upper file_path bounds; DVs carry referenced_data_file and
    must span the whole blob)."""
    fmt = (d.file_format or "parquet").lower()
    if fmt == "parquet":
        if d.referenced_data_file:
            return d.referenced_data_file
        lo = (d.lower_bounds or {}).get(_POS_DELETE_PATH_FID)
        hi = (d.upper_bounds or {}).get(_POS_DELETE_PATH_FID)
        if lo is None or hi is None:
            raise ValueError(
                f"No lower/upper bounds are available for the Position "
                f"Delete File for table {table_name}, this is required "
                f"for export to DuckLake")
        if lo != hi:
            raise ValueError(
                "For a Position Delete File to be eligible for conversion "
                "to DuckLake, it can only reference a single data file")
        return bytes(lo).decode("utf-8")
    if fmt == "puffin":
        if d.content_offset not in (0, None) or (
                d.content_size_in_bytes is not None
                and d.content_size_in_bytes != d.file_size_in_bytes):
            raise ValueError(
                "Only deletion vectors spanning the whole Puffin blob can "
                "be converted to DuckLake currently")
        if not d.referenced_data_file:
            raise ValueError("Puffin delete file is missing 'referenced_data_file'")
        return d.referenced_data_file
    raise ValueError(
        f"Can't convert Iceberg table (name: {table_name}) to DuckLake, as "
        f"it contains a delete file with file_format '{fmt}'")


def iceberg_to_ducklake(
    tables: Mapping[str, str] | str,
    ducklake_db: str,
    *,
    schema_name: str = "main",
    data_path: str = "",
    skip_tables: list[str] | None = None,
) -> dict:
    """Convert Iceberg table(s) into a DuckLake metadata catalog at
    ``ducklake_db`` (a duckdb database file). ``tables``: mapping of
    table name → table location, or a single location (named after its
    last path component). Data files are NOT copied — DuckLake rows point
    at the existing parquet. Returns a summary dict with the
    iceberg→ducklake snapshot-id mapping per table."""
    import duckdb

    if isinstance(tables, str):
        import os as _os

        tables = {_os.path.basename(_os.path.normpath(tables)): tables}
    skip = set(skip_tables or [])

    con = duckdb.connect(ducklake_db)
    con.execute("BEGIN TRANSACTION")
    for stmt in _DDL.strip().split(";"):
        if stmt.strip():
            con.execute(stmt)
    con.execute(
        "INSERT INTO ducklake_metadata VALUES ('version', '0.2', NULL, NULL), "
        "('created_by', 'duckdb_iceberg_spark iceberg_to_ducklake', NULL, NULL), "
        "('data_path', ?, NULL, NULL)", [data_path])

    # ---- global snapshot ordering across tables by commit time ----------
    loaded: list[tuple[str, TableMetadata, list]] = []
    events: list[tuple[int, int, str, Any]] = []  # (ts, tiebreak, tname, snap)
    tie = 0
    for tname, loc in tables.items():
        if tname in skip:
            continue
        tm = load_table_metadata(loc)
        chain = []
        cur = tm.current_snapshot()
        while cur is not None:
            chain.append(cur)
            cur = (tm.snapshot_by_id(cur.parent_snapshot_id)
                   if cur.parent_snapshot_id is not None else None)
        chain.reverse()
        loaded.append((tname, tm, chain))
        for s in chain:
            events.append((s.timestamp_ms, tie, tname, s))
            tie += 1
    events.sort(key=lambda e: (e[0], e[1]))

    # ducklake ids: snapshot 0 = catalog creation (schema 'main'),
    # converted snapshots follow (reference serializer semantics:
    # ducklake_snapshot.cpp FinalizeEntry)
    dl_snap_of: dict[tuple[str, int], int] = {}
    next_snap = 1
    for _, _, tname, s in events:
        dl_snap_of[(tname, s.snapshot_id)] = next_snap
        next_snap += 1

    schema_id = 0
    con.execute(
        "INSERT INTO ducklake_schema VALUES (?, ?, 0, NULL, ?, '', false)",
        [schema_id, str(_uuid.uuid4()), schema_name])
    con.execute(
        "INSERT INTO ducklake_snapshot VALUES (0, now(), 0, 1, 0)")
    con.execute(
        "INSERT INTO ducklake_snapshot_changes VALUES "
        "(0, ?, NULL, NULL, NULL)", [f"created_schema:{schema_name}"])

    next_catalog_id = 1
    next_file_id = 0
    schema_version = 0
    summary: dict[str, Any] = {"tables": {}, "snapshots": len(events)}

    # per-snapshot bookkeeping rows (filled per table below)
    snap_changes: dict[int, list[str]] = {}
    snap_catalog_adds: dict[int, int] = {}
    snap_file_adds: dict[int, int] = {}
    snap_schema_change: dict[int, bool] = {}

    for tname, tm, chain in loaded:
        first_dl = dl_snap_of[(tname, chain[0].snapshot_id)]
        table_id = next_catalog_id
        next_catalog_id += 1
        snap_catalog_adds[first_dl] = snap_catalog_adds.get(first_dl, 0) + 1
        snap_schema_change[first_dl] = True
        snap_changes.setdefault(first_dl, []).append(
            f"created_table:{schema_name}.{tname}")
        con.execute(
            "INSERT INTO ducklake_table VALUES (?, ?, ?, NULL, ?, ?, '', false)",
            [table_id, tm.table_uuid or str(_uuid.uuid4()), first_dl,
             schema_id, tname])

        # ---- columns: one version per (field, schema era) ---------------
        # walk schema ids along the chain; when the schema changes, close
        # removed/changed columns and open new versions
        def flat_fields(schema_json) -> list[tuple]:
            out = []

            def walk(fields, parent_id):
                for order, f in enumerate(fields):
                    out.append((f["id"], order, f["name"], f["type"],
                                not f.get("required"), parent_id,
                                f.get("initial-default"),
                                f.get("write-default", f.get("initial-default"))))
                    if isinstance(f["type"], dict) and f["type"].get("type") == "struct":
                        walk(f["type"]["fields"], f["id"])

            walk(schema_json["fields"], None)
            return out

        open_cols: dict[int, tuple] = {}  # fid -> row signature + begin
        last_schema_id = None
        for s in chain:
            dl = dl_snap_of[(tname, s.snapshot_id)]
            sid = s.schema_id if s.schema_id is not None else tm.current_schema_id
            if sid == last_schema_id:
                continue
            last_schema_id = sid
            sch = tm.schema_json(sid)
            now_fields = {fid: (fid, order, name, typ, nullable, parent, idflt, wdflt)
                          for fid, order, name, typ, nullable, parent, idflt, wdflt
                          in flat_fields(sch)}
            if s is not chain[0]:
                snap_schema_change[dl] = True
                if f"altered_table:{table_id}" not in snap_changes.get(dl, []):
                    snap_changes.setdefault(dl, []).append(
                        f"altered_table:{table_id}")
            # close columns that vanished or changed
            for fid in list(open_cols):
                sig, begin = open_cols[fid]
                if fid not in now_fields or now_fields[fid] != sig:
                    _emit_column(con, table_id, sig, begin, dl)
                    del open_cols[fid]
            # open new/changed columns
            for fid, sig in now_fields.items():
                if fid not in open_cols:
                    open_cols[fid] = (sig, dl)
        for fid, (sig, begin) in open_cols.items():
            _emit_column(con, table_id, sig, begin, None)

        # ---- partition spec (current-only, like the table's live layout) -
        spec = tm.default_spec()
        partition_id = 0  # per-table partition ids are offset by table
        if spec.fields:
            partition_id = next_catalog_id
            next_catalog_id += 1
            # the partition object consumes a catalog id: count it in the
            # snapshot's next_catalog_id accounting like the table itself
            snap_catalog_adds[first_dl] = snap_catalog_adds.get(first_dl, 0) + 1
            con.execute(
                "INSERT INTO ducklake_partition_info VALUES (?, ?, ?, NULL)",
                [partition_id, table_id, first_dl])
            for idx, pf in enumerate(spec.fields):
                con.execute(
                    "INSERT INTO ducklake_partition_column VALUES (?, ?, ?, ?, ?)",
                    [partition_id, table_id, idx, pf.source_id, pf.transform])

        # ---- data/delete files: begin/end ranges from per-snapshot diff -
        file_ids: dict[str, int] = {}
        open_data: dict[str, int] = {}    # path -> begin dl snapshot
        open_delete: dict[str, tuple] = {}  # path -> (begin, target path, entry)
        data_rows: list[tuple] = []       # finished rows
        delete_rows: list[tuple] = []
        entries_prev: dict[str, mf.ManifestEntry] = {}
        for s in chain:
            dl = dl_snap_of[(tname, s.snapshot_id)]
            entries_now: dict[str, mf.ManifestEntry] = {}
            deletes_now: dict[str, mf.ManifestEntry] = {}
            for e in _snapshot_entries(tm, s):
                d = e.data_file
                if d.content == mf.CONTENT_DATA:
                    entries_now[d.file_path] = e
                elif d.content == mf.CONTENT_EQUALITY_DELETES:
                    raise ValueError(
                        "Can't convert a table with equality deletes to a "
                        "DuckLake table")
                else:
                    deletes_now[d.file_path] = e
            added = set(entries_now) - set(open_data)
            removed = set(open_data) - set(entries_now)
            if added:
                snap_changes.setdefault(dl, []).append(
                    f"inserted_into_table:{table_id}")
            if removed or (set(deletes_now) - {p for p in open_delete}):
                snap_changes.setdefault(dl, []).append(
                    f"deleted_from_table:{table_id}")
            for p in sorted(added):
                fid_ = next_file_id
                next_file_id += 1
                file_ids[p] = fid_
                open_data[p] = dl
                snap_file_adds[dl] = snap_file_adds.get(dl, 0) + 1
                e = entries_now[p]
                fmt = (e.data_file.file_format or "parquet").lower()
                if fmt != "parquet":
                    raise ValueError(
                        f"Can't convert Iceberg table (name: {tname}) to "
                        f"DuckLake, because it contains a data file with "
                        f"file_format '{fmt}'")
            for p in sorted(removed):
                data_rows.append((file_ids[p], open_data[p], dl,
                                  entries_prev[p]))
                del open_data[p]
            # delete files
            dadded = set(deletes_now) - set(open_delete)
            dremoved = set(open_delete) - set(deletes_now)
            for p in sorted(dadded):
                e = deletes_now[p]
                target = _referenced_data_file(tname, e.data_file)
                fid_ = next_file_id
                next_file_id += 1
                file_ids[p] = fid_
                open_delete[p] = (dl, target, e)
                snap_file_adds[dl] = snap_file_adds.get(dl, 0) + 1
            for p in sorted(dremoved):
                begin, target, e = open_delete[p]
                delete_rows.append((file_ids[p], begin, dl, target, e))
                del open_delete[p]
            entries_prev = dict(entries_now)
            entries_prev.update(deletes_now)

        for p, begin in open_data.items():
            data_rows.append((file_ids[p], begin, None, entries_prev[p]))
        for p, (begin, target, e) in open_delete.items():
            delete_rows.append((file_ids[p], begin, None, target, e))

        part_names = [pf.name for pf in spec.fields]
        for fid_, begin, end, e in data_rows:
            d = e.data_file
            con.execute(
                "INSERT INTO ducklake_data_file VALUES "
                "(?, ?, ?, ?, NULL, ?, false, 'parquet', ?, ?, NULL, NULL, "
                "?, NULL, NULL, NULL)",
                [fid_, table_id, begin, end, d.file_path,
                 int(d.record_count or 0), int(d.file_size_in_bytes or 0),
                 partition_id])
            for idx, pname in enumerate(part_names):
                if d.partition and pname in d.partition:
                    con.execute(
                        "INSERT INTO ducklake_file_partition_value VALUES "
                        "(?, ?, ?, ?)",
                        [fid_, table_id, idx, str(d.partition[pname])])
        data_ids_by_path = {e.data_file.file_path: fid_
                            for fid_, _, _, e in data_rows}
        from ..sources.scan import _norm_path_py

        data_ids_norm = {_norm_path_py(p): v for p, v in data_ids_by_path.items()}
        for fid_, begin, end, target, e in delete_rows:
            d = e.data_file
            target_id = data_ids_by_path.get(target,
                                             data_ids_norm.get(_norm_path_py(target)))
            if target_id is None:
                raise ValueError(
                    f"delete file {d.file_path} references unknown data "
                    f"file {target}")
            con.execute(
                "INSERT INTO ducklake_delete_file VALUES "
                "(?, ?, ?, ?, ?, ?, false, ?, ?, ?, NULL, NULL, NULL)",
                [fid_, table_id, begin, end, target_id, d.file_path,
                 (d.file_format or "parquet").lower(),
                 int(d.record_count or 0), int(d.file_size_in_bytes or 0)])

        # ---- table stats (current snapshot) ------------------------------
        live = [e for _, b, end, e in
                [(r[0], r[1], r[2], r[3]) for r in data_rows] if end is None]
        rec = sum(int(e.data_file.record_count or 0) for e in live)
        byt = sum(int(e.data_file.file_size_in_bytes or 0) for e in live)
        con.execute("INSERT INTO ducklake_table_stats VALUES (?, ?, ?, ?)",
                    [table_id, rec, tm.next_row_id or 0, byt])

        summary["tables"][tname] = {
            "table_id": table_id,
            "data_files": len(data_rows),
            "delete_files": len(delete_rows),
            "snapshot_map": {s.snapshot_id: dl_snap_of[(tname, s.snapshot_id)]
                             for s in chain},
        }

    # ---- ducklake_snapshot rows (serializer id accounting) --------------
    running_catalog = 1
    running_file = 0
    for _, _, tname, s in events:
        dl = dl_snap_of[(tname, s.snapshot_id)]
        schema_version += 1 if snap_schema_change.get(dl) else 0
        running_catalog += snap_catalog_adds.get(dl, 0)
        running_file += snap_file_adds.get(dl, 0)
        import datetime as _dt

        ts = _dt.datetime.fromtimestamp(s.timestamp_ms / 1000,
                                        tz=_dt.timezone.utc)
        con.execute("INSERT INTO ducklake_snapshot VALUES (?, ?, ?, ?, ?)",
                    [dl, ts, schema_version, running_catalog, running_file])
        changes = snap_changes.get(dl, [])
        con.execute(
            "INSERT INTO ducklake_snapshot_changes VALUES (?, ?, NULL, NULL, NULL)",
            [dl, ",".join(changes)])

    con.execute("COMMIT")
    con.close()
    return summary


def _emit_column(con, table_id: int, sig: tuple, begin: int, end) -> None:
    fid, order, name, typ, nullable, parent, idflt, wdflt = sig
    con.execute(
        "INSERT INTO ducklake_column VALUES "
        "(?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, 'literal', 'duckdb')",
        [fid, begin, end, table_id, order, name, _duck_type(typ),
         None if idflt is None else str(idflt),
         None if wdflt is None else str(wdflt),
         bool(nullable), parent])
