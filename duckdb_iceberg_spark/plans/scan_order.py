"""ORDER BY + LIMIT file ordering and pruning (top-k scans).

Reference parity: /root/reference/src/planning/scan_order/
iceberg_scan_order.cpp:52-135 — for a numeric order column where every
candidate file carries non-null lower/upper bounds, files are sorted by
the relevant bound and a file is pruned when files already kept GUARANTEE
``limit`` rows at-or-beyond its best possible value. Nulls in the column,
missing bounds, or applicable delete files disable pruning (ordering still
applies). Spark still re-sorts the surviving rows — the win is not reading
files that cannot contribute to the top k."""

from __future__ import annotations

from typing import Optional

from ..metadata import types as ice_types
from .scan_plan import ScanPlan

_NUMERIC = {"int", "long", "float", "double", "date",
            "timestamp", "timestamptz", "timestamp_ns", "timestamptz_ns"}


def _numeric_type(t) -> bool:
    if not isinstance(t, str):
        return False
    return ice_types.primitive_name(t) in _NUMERIC or t.startswith("decimal")


def topk_order_plan(
    plan: ScanPlan,
    column: str,
    limit: Optional[int],
    descending: bool = True,
) -> ScanPlan:
    """Reorder ``plan``'s tasks by the order column's file bounds and prune
    files that provably cannot reach the top ``limit``. Always safe: falls
    back to the original plan when preconditions fail."""
    tm = plan.tm
    f = None
    for fld in plan.schema_json["fields"]:
        if fld["name"] == column:
            f = fld
            break
    if f is None or not _numeric_type(f["type"]) or len(plan.tasks) <= 1:
        return plan
    fid = f["id"]

    entries = []
    can_prune = limit is not None and limit > 0
    for t in plan.tasks:
        d = t.data_file
        lo_b = (d.lower_bounds or {}).get(fid)
        hi_b = (d.upper_bounds or {}).get(fid)
        if lo_b is None or hi_b is None:
            return plan  # a boundless file defeats ordering entirely
        lo = ice_types.decode_bound(f["type"], lo_b)
        hi = ice_types.decode_bound(f["type"], hi_b)
        if lo is None or hi is None:
            return plan
        nulls = (d.null_value_counts or {}).get(fid)
        if nulls is None or nulls > 0:
            can_prune = False  # null rows sort outside the bounds
        if t.has_deletes:
            can_prune = False  # deleted rows make record_count an overcount
        entries.append((t, lo, hi, d.record_count))

    # DESC wants files with the greatest upper bound first; ASC the least
    # lower bound (reference: primary()/opposite() in Apply)
    primary = (lambda e: e[2]) if descending else (lambda e: e[1])
    opposite = (lambda e: e[1]) if descending else (lambda e: e[2])
    entries.sort(key=lambda e: primary(e), reverse=descending)

    keep = len(entries)
    if can_prune:
        keep = 0
        for k, e in enumerate(entries):
            frontier = primary(e)
            guaranteed = 0
            for j in range(k):
                o = opposite(entries[j])
                beats = (o >= frontier) if descending else (o <= frontier)
                if beats:
                    guaranteed += entries[j][3]
                if guaranteed >= limit:
                    break
            if guaranteed >= limit:
                break
            keep = k + 1

    pruned = len(entries) - keep
    stats = dict(plan.stats or {})
    stats["topk_files_pruned"] = pruned
    stats["topk_files_kept"] = keep
    return ScanPlan(tm, plan.snapshot, [e[0] for e in entries[:keep]],
                    plan.residual, plan.schema_id, stats)
