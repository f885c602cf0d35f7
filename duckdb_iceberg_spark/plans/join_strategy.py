"""Statistics-driven join-side strategy (NEW r15 — VERDICT r14 task 4).

The engine maintains two statistics planes that nothing was consuming
for join planning: per-file row/byte counts in manifests (ScanPlan) and
theta-sketch NDV statistics files (compute_table_stats). Spark's STATIC
size estimate can mis-broadcast an un-aggregated fact — the r13
five-query defect, fixed then by HAND with ``.hint("merge")`` in each
query. This module centralizes the broadcast-vs-merge decision so the
engine's own DML joins (MERGE source↔target, DELETE ... USING, the CDC
upsert) derive it from the engine's numbers instead of Spark's guesses.

Reference parity note: the reference feeds its cardinality estimates to
DuckDB's optimizer for exactly this purpose
(iceberg_cardinality_estimates.test — EXPLAIN shows ~live row counts so
joins plan against them); Spark exposes no per-source injection point,
so the engine decides the side hint itself.

Decision inputs, in trust order:

1. an engine :class:`~..plans.scan_plan.ScanPlan` attached to the frame
   (``iceberg_scan`` / ``scan_to_dataframe`` stamp
   ``_iceberg_scan_plan``): the planned files' compressed on-disk byte
   sum plus the live row estimate (``estimated_row_count`` — delete
   cardinality already subtracted). This is the number a
   1000-executor cluster would actually ship, unaffected by Spark's
   post-projection arithmetic;
2. Spark's optimized-plan ``sizeInBytes`` — trustworthy for literal
   frames and plain file reads, where the estimate IS the data size;
   it is treated as what it is, an upper bound;
3. unknown → DON'T broadcast and pin ``.hint("merge")``: a wrongly
   shuffled small join costs milliseconds, a wrongly broadcast fact
   costs the executors.

100 TB shape: the decision itself is metadata-only (no Spark job — byte
sums come from manifests already parsed for planning); what it prevents
is the O(cluster) blow-up of shipping a fact table to every executor.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frame_size_bytes", "decide_broadcast", "apply_side_hint",
           "attach_scan_plan", "broadcast_threshold_bytes"]

#: attribute iceberg_scan/scan_to_dataframe stamp onto returned frames
PLAN_ATTR = "_iceberg_scan_plan"

#: ScanPlan byte sums are COMPRESSED parquet/orc/avro sizes; in-memory
#: join build sides decompress — a conservative expansion factor keeps
#: "barely under threshold on disk" tables from broadcasting 4x bigger
ONDISK_EXPANSION = 4


def attach_scan_plan(df: DataFrame, plan) -> DataFrame:
    """Stamp the originating ScanPlan onto ``df`` (plain Python
    attribute — survives as long as the caller passes THIS frame, which
    is exactly the MERGE/DELETE-USING source shape; derived frames
    fall back to Spark's estimate)."""
    try:
        setattr(df, PLAN_ATTR, plan)
    except Exception:
        pass
    return df


def broadcast_threshold_bytes(spark) -> int:
    """Spark's own ``autoBroadcastJoinThreshold`` (suffixed forms like
    ``'10485760b'`` / ``'10MB'`` parse via the writer's byte-size
    parser), so the engine's decision respects the same knob users
    already tune; ``-1`` (broadcast disabled) maps to 0."""
    from ..sources.writer import parse_byte_size

    try:
        raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        return 10 * 1024 * 1024
    raw = raw.strip().lower().removesuffix("b") or "0"
    try:
        n = parse_byte_size(raw)
    except Exception:
        try:
            n = int(raw)
        except ValueError:
            return 10 * 1024 * 1024
    return max(0, int(n))


def frame_size_bytes(df: DataFrame) -> tuple[Optional[int], str]:
    """(estimated in-memory bytes, provenance) for a join side.

    Engine scan plans win: on-disk planned bytes × ONDISK_EXPANSION,
    scaled by live/total rows when deletes apply. Falls back to Spark's
    optimized-plan ``sizeInBytes`` (``'spark-static'``), or
    ``(None, 'unknown')`` when even that fails."""
    plan = getattr(df, PLAN_ATTR, None)
    if plan is not None:
        try:
            disk = sum(int(t.data_file.file_size_in_bytes or 0)
                       for t in plan.tasks)
            total = sum(int(t.data_file.record_count or 0)
                        for t in plan.tasks)
            live = plan.estimated_row_count()
            frac = (live / total) if total else 1.0
            return int(disk * ONDISK_EXPANSION * frac), "scan-plan"
        except Exception:
            pass
    try:
        n = int(df._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes())
        # Spark's unknown sentinel is Long.MaxValue-ish; treat as unknown
        if n >= (1 << 62):
            return None, "unknown"
        return n, "spark-static"
    except Exception:
        return None, "unknown"


def decide_broadcast(df: DataFrame, spark=None,
                     threshold_bytes: Optional[int] = None) -> bool:
    """True → broadcast this side; False → pin a merge join (which also
    STOPS Spark's own static estimate from broadcasting it — the r13
    defect class). Unknown sizes decide False: conservative by design."""
    if threshold_bytes is None:
        threshold_bytes = broadcast_threshold_bytes(
            spark or df.sparkSession)
    size, _src = frame_size_bytes(df)
    return size is not None and size <= threshold_bytes


def apply_side_hint(df: DataFrame, broadcast: bool) -> DataFrame:
    """Materialize the decision as a plan hint on ``df``."""
    return F.broadcast(df) if broadcast else df.hint("merge")
