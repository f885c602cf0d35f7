"""REST server-side scan planning (``planTableScan``).

When the catalog service implements the plan endpoint, manifest reading and
file pruning are delegated to the server and the client consumes
file-scan-tasks (reference: src/planning/scan_plan/
iceberg_server_scan_plan_provider.cpp; provider selection and the opt-outs —
writes, row-lineage reads — in src/planning/iceberg_scan_plan_provider.cpp:16-83
and src/planning/iceberg_optimizer.cpp:27-66).

Spark mapping: the returned tasks are parsed into the same ``ScanPlan`` the
client-side planner produces, so ``scan_to_dataframe`` executes them
identically (one declarative parquet read + delete-application joins). At
100 TB this moves the metadata bottleneck (manifest I/O) to the service,
which can cache it; the data path is unchanged.
"""

from __future__ import annotations

import datetime as _dt
import time
from typing import Any, Optional

from ..metadata import manifest as mf
from ..plans import predicates as P
from ..plans.scan_plan import FileScanTask, ScanPlan, plan_scan

__all__ = ["predicate_to_rest", "plan_table_scan", "scan_rest_table"]


# --- filter serialization ---------------------------------------------------

_OPS = {"=": "eq", "!=": "not-eq", "<": "lt", "<=": "lt-eq",
        ">": "gt", ">=": "gt-eq"}


def _json_value(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def predicate_to_rest(pred: P.Predicate) -> Optional[dict]:
    """Serialize the parsed WHERE AST to the REST expression JSON the plan
    endpoint accepts (and/or fold to binary nodes; literals JSON-safe)."""
    if pred is None:
        return None
    if isinstance(pred, P.Comparison):
        if not isinstance(pred.column, str):
            # variant_get()/non-column terms have no REST serialization —
            # drop the conjunct (conservative: server prunes less, the
            # residual Spark filter still applies it exactly)
            return None
        return {"type": _OPS[pred.op], "term": pred.column,
                "value": _json_value(pred.value)}
    if isinstance(pred, P.InList):
        if not isinstance(pred.column, str):
            return None
        return {"type": "in", "term": pred.column,
                "values": [_json_value(v) for v in pred.values]}
    if isinstance(pred, P.IsNull):
        if not isinstance(pred.column, str):
            return None
        return {"type": "is-null", "term": pred.column}
    if isinstance(pred, P.NotNull):
        if not isinstance(pred.column, str):
            return None
        return {"type": "not-null", "term": pred.column}
    if isinstance(pred, (P.And, P.Or)):
        node = "and" if isinstance(pred, P.And) else "or"
        kids = [predicate_to_rest(c) for c in pred.children]
        if isinstance(pred, P.Or) and any(k is None for k in kids):
            # Dropping an OR disjunct would make the server filter MORE
            # restrictive than the query (files matching only the
            # unserializable side get pruned and their rows silently lost,
            # since the residual Spark filter only sees returned files).
            # Only AND may drop children (less restrictive = conservative).
            return None
        kids = [k for k in kids if k is not None]
        if not kids:
            return None
        out = kids[0]
        for k in kids[1:]:
            out = {"type": node, "left": out, "right": k}
        return out
    raise ValueError(f"unserializable predicate: {pred!r}")


# --- file-scan-task parsing -------------------------------------------------

_CONTENT = {"data": mf.CONTENT_DATA,
            "position-deletes": mf.CONTENT_POSITION_DELETES,
            "equality-deletes": mf.CONTENT_EQUALITY_DELETES}


def _parse_content_file(d: dict, tm, spec_id: int) -> mf.DataFile:
    part = d.get("partition")
    if isinstance(part, list):
        spec = tm.partition_specs.get(spec_id)
        names = [pf.name for pf in spec.fields] if spec else []
        part = dict(zip(names, part))
    return mf.DataFile(
        content=_CONTENT.get(d.get("content", "data"), mf.CONTENT_DATA),
        file_path=d["file-path"],
        file_format=d.get("file-format", "parquet"),
        partition=part or {},
        record_count=int(d.get("record-count", 0)),
        file_size_in_bytes=int(d.get("file-size-in-bytes", 0)),
        equality_ids=d.get("equality-ids"),
        referenced_data_file=d.get("referenced-data-file"),
        content_offset=d.get("content-offset"),
        content_size_in_bytes=d.get("content-size-in-bytes"),
        first_row_id=d.get("first-row-id"),
    )


def _parse_tasks(resp: dict, tm) -> list[FileScanTask]:
    deletes_json = resp.get("delete-files") or []
    tasks: list[FileScanTask] = []
    for tj in resp.get("file-scan-tasks") or []:
        dj = tj["data-file"]
        spec_id = int(dj.get("spec-id", tm.default_spec_id))
        data_file = _parse_content_file(dj, tm, spec_id)
        task = FileScanTask(data_file=data_file, sequence_number=0,
                            spec_id=spec_id)
        for idx in tj.get("delete-file-references") or []:
            del_json = deletes_json[idx]
            del_spec = int(del_json.get("spec-id", spec_id))
            del_file = _parse_content_file(del_json, tm, del_spec)
            if del_file.content == mf.CONTENT_EQUALITY_DELETES:
                # the server already resolved sequence-number applicability;
                # seq 1 > data seq 0 keeps the executor's eq-delete rule true
                task.equality_deletes.append((1, del_file))
            else:
                task.positional_deletes.append(del_file)
        tasks.append(task)
    return tasks


# --- the planning round trip ------------------------------------------------

def plan_table_scan(
    table,
    where: str | None = None,
    *,
    snapshot_id: int | None = None,
    poll_interval_s: float = 0.05,
    max_polls: int = 200,
) -> ScanPlan:
    """POST planTableScan and build a ScanPlan from the returned tasks.

    Handles both the synchronous ("completed") and asynchronous
    ("submitted" + plan-id polling) protocols, plus plan-task pagination
    (each plan-task is fetched and its tasks appended)."""
    import urllib.parse

    cat, tm = table.catalog, table.metadata
    base = (f"/namespaces/{cat._ns(table.namespace)}"
            f"/tables/{urllib.parse.quote(table.name)}")
    body: dict[str, Any] = {"case-sensitive": True}
    if snapshot_id is not None:
        body["snapshot-id"] = snapshot_id
    filt = predicate_to_rest(P.parse_where(where))
    if filt is not None:
        body["filter"] = filt

    resp = cat._request("POST", f"{base}/plan", body)
    polls = 0
    while resp.get("status") == "submitted":
        plan_id = resp["plan-id"]
        if polls >= max_polls:
            raise TimeoutError(f"planTableScan {plan_id} did not complete")
        time.sleep(poll_interval_s)
        polls += 1
        resp = cat._request("GET", f"{base}/plan/{plan_id}")
    if resp.get("status") not in (None, "completed"):
        raise RuntimeError(f"planTableScan failed: {resp}")

    tasks = _parse_tasks(resp, tm)
    for pt in resp.get("plan-tasks") or []:
        page = cat._request("POST", f"{base}/tasks", {"plan-task": pt})
        tasks.extend(_parse_tasks(page, tm))

    snapshot = tm.select_snapshot(snapshot_id=snapshot_id)
    from ..plans.scan_plan import _localize

    for t in tasks:
        t.data_file.file_path = _localize(tm, t.data_file.file_path)
        for d in t.positional_deletes:
            d.file_path = _localize(tm, d.file_path)
        for _, d in t.equality_deletes:
            d.file_path = _localize(tm, d.file_path)
    return ScanPlan(tm, snapshot, tasks, where, None,
                    {"planned_by": "server", "files_total": len(tasks)})


def scan_rest_table(spark, table, where: str | None = None, *,
                    snapshot_id: int | None = None,
                    ref: str | None = None,
                    server_planning: bool = True, **scan_opts):
    """Read a catalog table into a DataFrame, preferring server-side
    planning and falling back to client-side manifest planning when the
    service doesn't implement the endpoint (404/400 capability probe, the
    reference's provider-selection behavior). ``ref`` resolves a branch or
    tag name (always client-side — the plan endpoint takes snapshot ids)."""
    from ..sources.scan import scan_to_dataframe
    from .rest_catalog import CatalogError

    if ref is not None and snapshot_id is None:
        snapshot_id = table.metadata.snapshot_by_ref(ref).snapshot_id
    if server_planning:
        try:
            plan = plan_table_scan(table, where, snapshot_id=snapshot_id)
            return scan_to_dataframe(spark, plan, **scan_opts)
        except CatalogError as e:
            if e.status not in (400, 404, 405, 501):
                raise
    tm = table.metadata
    snapshot = tm.select_snapshot(snapshot_id=snapshot_id)
    return scan_to_dataframe(spark, plan_scan(tm, snapshot, where), **scan_opts)
