"""Read executor: ScanPlan → Spark DataFrame.

The PySpark re-expression of the reference's scan
(reference: src/function/scan/iceberg_scan.cpp:92-126 +
src/planning/iceberg_multi_file_reader.cpp): the driver plans a pruned file
list (plans/scan_plan.py), then the data path is a single declarative
``spark.read.schema(s).parquet(*files)`` so Catalyst/Tungsten provide
vectorized reads, whole-stage codegen, residual filter pushdown and column
pruning. Delete application is expressed as DataFrame ops:

- positional deletes / deletion vectors → left-anti join on
  ``(_metadata.file_path, _metadata.row_index)``
  (reference applies a deletion_filter per reader,
  iceberg_multi_file_reader.cpp:407; we let Spark's join engine do it —
  the delete side is small relative to data and broadcast when possible)
- equality deletes → null-safe anti-join on the equality_id columns,
  honoring sequence numbers per file
  (reference builds IS-DISTINCT-FROM conjunctions per chunk,
  iceberg_multi_file_reader.cpp:436-558)
- identity partition constants for files that omit the partition column →
  broadcast join on a tiny (file_path → constants) map
  (reference: ApplyPartitionConstants, iceberg_multi_file_reader.cpp:292-378)

Virtual columns (reference: iceberg_multi_file_reader.cpp:604-713):
``filename``, ``file_row_number``, and v3 row lineage ``_row_id`` /
``_last_updated_sequence_number`` derived from per-file first_row_id.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import jrpc as _jx
from ..io import arrow_data as _ad
from ..metadata import manifest as mf
from ..metadata import types as ice_types
from ..metadata.table_metadata import TableMetadata, load_table_metadata
from ..plans.scan_plan import FileScanTask, ScanPlan, plan_scan

#: per-session memo of CONSTRUCTED scan DataFrames (r15): maps a live
#: SparkSession → {(metadata file, snapshot id, predicate, flags) → frame}.
#: Holds lazy logical plans only — never data, never results; see the note
#: in iceberg_scan. WeakKeyDictionary so a stopped session's entries drop
#: with the session object; the inner dict is bounded FIFO.
import weakref as _weakref

_scan_frame_memo: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_SCAN_FRAME_MEMO_MAX = 128


def clear_scan_frame_memo() -> None:
    """Drop every memoized scan frame (all sessions). Needed only when
    module-level construction knobs (broadcast thresholds, delete routing)
    are changed at runtime — table data/metadata changes invalidate
    naturally through the metadata-location/snapshot key."""
    _scan_frame_memo.clear()

_FILE_COL = "__ice_file"


_qcol = ice_types.quoted_col
_POS_COL = "__ice_pos"

#: ``TIME '12:34:56.789'`` literals inside a residual filter string
_TIME_LIT_RE = None  # compiled lazily below


def _residual_filter(df: DataFrame, residual: str) -> DataFrame:
    """Apply the residual predicate string to the scan relation.

    When the active session's ``spark.sql.timeType.enabled`` flag is OFF,
    iceberg ``time`` columns degrade to the tagged-Long µs mapping
    (metadata/types.py:92), so a ``TIME'…'`` literal in the residual would
    fail analysis against BIGINT (the r11 driver red ``ice_time_scan``:
    DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES). In that mode NO TimeType
    column can exist in the relation, so every TIME literal is rewritten
    to its exact µs-since-midnight BIGINT value — the same value the
    tagged-Long column carries. With the flag on the string passes through
    untouched (pinned by tests/test_time_flagless_session.py both ways)."""
    global _TIME_LIT_RE
    if not ice_types.time_type_available() and "TIME" in residual.upper():
        import datetime as _dt
        import re as _re

        if _TIME_LIT_RE is None:
            # Alternation order is load-bearing: at a TIME keyword the
            # first branch consumes the literal; at any other quote the
            # second branch consumes the WHOLE string constant (with ''
            # escapes), so a "TIME '…'" spelled INSIDE a string literal is
            # swallowed untouched instead of corrupted (ADVICE r12).
            _TIME_LIT_RE = _re.compile(
                r"\bTIME\s*'([^']*)'|'(?:[^']|'')*'", _re.IGNORECASE)

        def _to_us(m) -> str:
            if m.group(1) is None:
                return m.group(0)  # a plain string constant: pass through
            try:
                us = ice_types.time_to_micros(_dt.time.fromisoformat(m.group(1)))
            except ValueError:
                return m.group(0)  # unparsable: let Spark raise its own error
            return f"CAST({us} AS BIGINT)"

        residual = _TIME_LIT_RE.sub(_to_us, residual)
    return df.filter(F.expr(residual))


def _norm_path(col):
    # Scheme canonicalization for RAW (manifest-spelled) path columns:
    # s3a:// (the Hadoop-native rewrite of s3://) normalizes back so join
    # keys match across writers; file: URIs become plain paths. MUST stay in
    # lockstep with _norm_path_py below — every path-equality join in this
    # module has one side built Spark-side and one side from manifest
    # strings.
    return F.regexp_replace(
        F.regexp_replace(col, r"^file:/+", "/"), r"^s3a://", "s3://")


def _norm_uri_path(col):
    # For Spark's ``_metadata.file_path``, which is a URI: percent-encoded
    # (a literal '%3A' in a directory name arrives as '%253A'). Decode back
    # to the raw path so it joins against manifest-recorded spellings.
    # url_decode turns '+' into space, so protect literal '+' first.
    return F.url_decode(
        F.regexp_replace(_norm_path(col), r"\+", "%2B"))


#: SQL-string twins of _norm_path/_norm_uri_path (r16): scan construction
#: batches projections into single selectExpr round-trips (guide §1.2 —
#: driver chatter is serial latency at any cluster size), so the path
#: normalizations need SQL spellings. The regexes avoid backslash escapes
#: ('[+]' not '\\+') so the strings parse identically whether or not a
#: session sets spark.sql.parser.escapedStringLiterals. MUST stay in
#: lockstep with the Column versions above (pinned by
#: tests/test_scan_rpc_batching.py).
def _norm_path_sql(col_sql: str) -> str:
    return ("regexp_replace(regexp_replace(" + col_sql +
            ", '^file:/+', '/'), '^s3a://', 's3://')")


def _norm_uri_path_sql(col_sql: str) -> str:
    return ("url_decode(regexp_replace(" + _norm_path_sql(col_sql) +
            ", '[+]', '%2B'))")


def _replace_col_sql(df: DataFrame, col: str, expr_sql: str) -> DataFrame:
    """withColumn(col, expr) for an EXISTING column, as one selectExpr
    round-trip preserving column order."""
    return _jx.select_exprs(df, [
        expr_sql + " AS " + _jx.quote_name(c) if c == col else _jx.quote_name(c)
        for c in df.columns])


def _norm_path_py(p: str) -> str:
    """Python twin of :func:`_norm_path` for manifest-derived literals
    (sequence-number maps, equality-delete applicability pairs, row-lineage
    maps, partition-constant maps). Manifests written through s3a:// (or
    file:) URIs would otherwise never join against the normalized scan-side
    file column and deletes/lineage would silently not apply."""
    from ..io import normalize_path

    return normalize_path(p)


def _uuid_field_paths(schema: T.StructType) -> list[list[str]]:
    """Dot-paths of uuid-typed fields (schema_to_struct tags them with
    ICEBERG_TYPE_KEY), descending into structs. Array/map elements carry no
    Spark metadata, so uuid inside them cannot be tagged (or rewritten)."""
    out: list[list[str]] = []

    def walk(st: T.StructType, prefix: list[str]) -> None:
        for f in st.fields:
            md = f.metadata or {}
            if md.get(ice_types.ICEBERG_TYPE_KEY) == "uuid":
                out.append(prefix + [f.name])
            elif isinstance(f.dataType, T.StructType):
                walk(f.dataType, prefix + [f.name])

    walk(schema, [])
    return out


def _uuidify_read_schema(schema: T.StructType) -> T.StructType:
    """Read-time schema twin: uuid fields (string in the logical schema)
    become BinaryType so Spark's parquet reader accepts FIXED_LEN_BYTE_ARRAY
    physical storage; _uuid_to_str converts back after the scan."""
    def conv(dt, md):
        if (md or {}).get(ice_types.ICEBERG_TYPE_KEY) == "uuid":
            return T.BinaryType()
        if isinstance(dt, T.StructType):
            return T.StructType([
                T.StructField(f.name, conv(f.dataType, f.metadata),
                              f.nullable, f.metadata)
                for f in dt.fields])
        return dt

    return conv(schema, None)


def _read_plain_parquet(spark, files, schema, *, with_path_pos=False,
                        path_col="__kf", pos_col="__kp"):
    """Read auxiliary parquet (delete files, key files) with an explicit
    schema, Spark-native when the scheme allows, else through the arrow data
    plane. ``with_path_pos`` appends (normalized source path, row position)."""
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if _ad.is_spark_native(spark, files):
        df = _jx.read_files(spark, [_ad.to_native_path(f) for f in files], st)
        if with_path_pos:
            df = _jx.select_exprs(df, ["*",
                _norm_uri_path_sql("_metadata.file_path")
                + " AS " + _jx.quote_name(path_col),
                "_metadata.row_index AS " + _jx.quote_name(pos_col)])
        return df
    df = _ad.read_parquet(spark, files, st, with_path_pos=with_path_pos,
                          path_col=path_col, pos_col=pos_col)
    if with_path_pos:
        df = _replace_col_sql(df, path_col,
                              _norm_path_sql(_jx.quote_name(path_col)))
    return df


def _read_delete_files(spark, delete_files, schema, *, with_path_pos=False,
                       path_col="__kf", pos_col="__kp"):
    """Format-routed auxiliary read for DELETE files (r13): the spec lets
    positional/equality delete files be parquet, ORC, or Avro independent
    of the data format — Flink's avro tables write avro equality deletes.
    ``delete_files`` maps path → recorded file_format; parquet goes
    through the native/arrow parquet path, ORC/Avro through the arrow
    plane's format-general reader (by-field-id for avro)."""
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    by_fmt: dict[str, list[str]] = {}
    for p, fmt in delete_files.items():
        by_fmt.setdefault((fmt or "PARQUET").upper(), []).append(p)
    parts = []
    for fmt, paths in sorted(by_fmt.items()):
        if fmt == "PARQUET":
            parts.append(_read_plain_parquet(
                spark, sorted(paths), st, with_path_pos=with_path_pos,
                path_col=path_col, pos_col=pos_col))
        elif fmt in ("ORC", "AVRO"):
            p = _ad.read_parquet(spark, sorted(paths), st,
                                 with_path_pos=with_path_pos,
                                 path_col=path_col, pos_col=pos_col,
                                 file_format=fmt.lower())
            if with_path_pos:
                p = p.withColumn(path_col, _norm_path(F.col(path_col)))
            parts.append(p)
        else:
            raise NotImplementedError(
                f"unsupported delete-file format {fmt!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def iceberg_scan(
    spark: SparkSession,
    path: str,
    *,
    snapshot_id: int | None = None,
    as_of: Any = None,
    ref: str | None = None,
    version: str | None = None,
    version_name_format: str | None = None,
    metadata_compression_codec: str = "",
    where: str | None = None,
    with_file_info: bool = False,
    with_row_lineage: bool = False,
    plan: ScanPlan | None = None,
    lean: bool = False,
) -> DataFrame:
    """Scan an Iceberg table at ``path`` into a DataFrame.

    Mirrors ``iceberg_scan(path, version, snapshot_from_timestamp,
    snapshot_from_id)`` (reference: iceberg_scan.cpp:40-48); ``ref``
    additionally resolves a branch or tag name from the metadata refs map.
    ``where`` is both a pruning hint (driver-side file pruning) and a
    residual filter (applied by Spark, so over-approximation is safe).

    ``lean=True`` (r15) strips per-column stats from the planned tasks
    after pruning — ~3x less driver memory per planned file on
    many-file tables; the read itself never consults them. Leave off
    when the returned frame feeds statistics consumers (scan-order
    reads, stats aggregation).
    """
    if plan is not None:
        # a precomputed plan already pins metadata version + snapshot:
        # accepting a lookup option alongside it would silently ignore
        # the lookup (r10 sweep of silently-ignored option combinations,
        # the class the reference rejects loudly for
        # snapshot_from_id+snapshot_from_timestamp)
        clash = {"snapshot_id": snapshot_id, "as_of": as_of, "ref": ref,
                 "version": version}
        given = [k for k, v in clash.items() if v is not None]
        if given:
            raise ValueError(
                f"iceberg_scan: {', '.join(given)} cannot be combined "
                "with a precomputed plan= (the plan already pins the "
                "snapshot)")
    if plan is None:
        tm = load_table_metadata(
            path, version, version_name_format=version_name_format,
            metadata_compression_codec=metadata_compression_codec)
        snapshot = tm.select_snapshot(snapshot_id=snapshot_id, as_of=as_of, ref=ref)
        # many-manifest tables plan on executors (metadata late
        # materialization at 100 TB); small tables stay on the driver
        from ..plans.distributed_planner import plan_scan_distributed

        # reference lookup-source semantics: explicit id/timestamp lookups
        # read the snapshot's schema, LATEST reads the current schema
        explicit = snapshot_id is not None or as_of is not None
        # DataFrame-CONSTRUCTION memo (r15, guide §1.2 order-of-ops /
        # §7.3 driver-side work): building the scan frame costs ~400 py4j
        # round-trips (delete-file reads, partition-constant joins, column
        # rewrites) — ~0.5 s of driver latency per call at any data size.
        # The memo returns the SAME immutable lazy plan for an identical
        # (metadata file, snapshot, predicate, flags) request within one
        # session. This caches no data and no results: every action on the
        # frame recomputes from the parquet/ORC/Avro inputs; a table
        # change produces a new metadata location or snapshot id and
        # therefore a new key (resolution above runs on every call).
        key = (tm.metadata_location, snapshot.snapshot_id if snapshot else None,
               where, explicit, lean, with_file_info, with_row_lineage)
        memo = _scan_frame_memo.setdefault(spark, {})
        hit = memo.get(key)
        if hit is not None:
            return hit
        plan = plan_scan_distributed(spark, tm, snapshot, where,
                                     snapshot_schema=explicit, lean=lean)
        df = scan_to_dataframe(spark, plan, with_file_info=with_file_info,
                               with_row_lineage=with_row_lineage)
        if len(memo) >= _SCAN_FRAME_MEMO_MAX:
            memo.pop(next(iter(memo)))
        memo[key] = df
        return df
    return scan_to_dataframe(spark, plan, with_file_info=with_file_info,
                             with_row_lineage=with_row_lineage)


def _sql_literal(v: Any) -> str:
    import datetime as _dt

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _registered_ndv(path: str, col: str) -> int | None:
    """NDV of ``col`` from the table's registered theta-sketch
    statistics file (compute_table_stats), or None when the table has no
    statistics / the column was not sketched. Metadata-only: one Puffin
    footer + one blob read on the driver."""
    try:
        from .statistics import table_ndv

        return table_ndv(path).get(col)
    except Exception:
        return None


def scan_with_runtime_filter(
    spark: SparkSession,
    path: str,
    build_df: DataFrame,
    key_col: str,
    build_col: str | None = None,
    *,
    max_in_keys: int = 1000,
    where: str | None = None,
    **scan_opts,
) -> DataFrame:
    """Dynamic file-list re-pruning from a join's build side (reference:
    IcebergMultiFileList::DynamicFilterPushdown,
    src/planning/iceberg_multi_file_list.cpp:243-273 — runtime filters from
    a selective join re-prune the planned file list).

    Spark's own runtime filtering reaches parquet row groups but not our
    driver-planned file list, so a selective dimension join would still
    open every planned-in data file. This helper materializes the build
    side's distinct join keys (the dimension side of a star join — small by
    construction) and RE-PLANS the scan with them:

    - up to ``max_in_keys`` distinct keys → an ``IN`` predicate, pruning on
      exact per-file bounds + partition values (bucket/identity transforms
      prune exactly);
    - more keys → a ``BETWEEN`` over the build side's min/max, still
      pruning range-partitioned/sorted layouts;
    - r14 (NDV-statistics consumer, VERDICT r13 task 7): when the table
      registers theta-sketch NDV for ``key_col`` (compute_table_stats)
      and the overflowing build side carries at least as many distinct
      keys as the table's whole domain, the filter's estimated
      selectivity is ~1 — every file survives — so the min/max probe
      job and the re-plan are SKIPPED and the plain scan returns.
      Estimating join selectivity from NDV is exactly what the
      statistics file exists for (the r13 static-estimate mis-broadcast
      class, prevented by data instead of hand hints).

    The predicate is also applied as the Spark residual filter, so the
    returned frame is exactly the semi-filtered scan; join it with the
    build side for final results. The build side is evaluated once here
    (one small Spark job) — the same blocking point the reference's
    dynamic-filter pushdown has.
    """
    build_col = build_col or key_col
    # NULLs never match an equi-join, so drop them BEFORE sampling: a NULL
    # inside the limited sample would otherwise shrink an over-limit key set
    # back under max_in_keys and an incomplete IN list would silently drop
    # rows for the omitted key instead of falling back to the range filter.
    distinct = (build_df.select(build_col)
                .where(F.col(build_col).isNotNull()).distinct())
    keys = [r[0] for r in distinct.limit(max_in_keys + 1).collect()]
    if not keys:
        # no build keys: empty-result scan; prune everything via 1=0 is not
        # parseable — use an impossible range on the key instead
        dynamic = None
    elif len(keys) > max_in_keys:
        ndv = _registered_ndv(path, key_col)
        # ADVICE r14: the key sample above saturates at max_in_keys+1, so
        # comparing it against the (approximate) theta estimate could
        # skip the range filter while the build side covers only part of
        # the key domain. Compare the EXACT build-side distinct count
        # instead — one count job on the already-distinct frame, cheaper
        # than the min/max probe it replaces, and immune to sample
        # truncation; only a genuinely domain-spanning build side skips.
        if ndv is not None and distinct.count() >= ndv:
            # the build side spans (at least) the table's whole key
            # domain: estimated selectivity ~1, nothing can prune —
            # skip the min/max job and scan plain (callers join with
            # the build side, so looser filtering stays correct; the
            # range branch below is itself approximate already)
            dynamic = None
        else:
            lo, hi = build_df.agg(F.min(build_col), F.max(build_col)).first()
            dynamic = (f"{key_col} >= {_sql_literal(lo)}"
                       f" AND {key_col} <= {_sql_literal(hi)}")
    else:
        dynamic = f"{key_col} IN ({', '.join(_sql_literal(k) for k in keys)})"
    if dynamic is None:
        combined = where
    elif where:
        combined = f"({where}) AND {dynamic}"
    else:
        combined = dynamic
    return iceberg_scan(spark, path, where=combined, **scan_opts)


def topk_scan(
    spark: SparkSession,
    path: str,
    order_by: str,
    limit: int,
    *,
    descending: bool = True,
    where: str | None = None,
    **scan_opts,
) -> DataFrame:
    """ORDER BY <col> [DESC] LIMIT <k> over an Iceberg table with
    metadata-level file ordering + pruning (reference:
    iceberg_scan_order.cpp hook in iceberg_scan.cpp:75-79). Files whose
    bounds provably cannot reach the top k are never read; Spark's TakeOrdered
    handles the surviving rows."""
    from ..plans.scan_order import topk_order_plan

    tm = load_table_metadata(path, scan_opts.pop("version", None))
    snapshot = tm.select_snapshot(
        snapshot_id=scan_opts.pop("snapshot_id", None),
        as_of=scan_opts.pop("as_of", None))
    plan = plan_scan(tm, snapshot, where)
    plan = topk_order_plan(plan, order_by, limit, descending)
    df = scan_to_dataframe(spark, plan, **scan_opts)
    col = F.col(order_by).desc() if descending else F.col(order_by).asc()
    return df.orderBy(col).limit(limit)


def scan_to_dataframe(
    spark: SparkSession,
    plan: ScanPlan,
    *,
    with_file_info: bool = False,
    with_row_lineage: bool = False,
) -> DataFrame:
    schema = plan.spark_schema()
    if not plan.tasks:
        df = spark.createDataFrame([], schema)
        if with_file_info:
            df = df.withColumn("filename", F.lit(None).cast(T.StringType())) \
                   .withColumn("file_row_number", F.lit(None).cast(T.LongType()))
        if with_row_lineage:
            df = df.withColumn("_row_id", F.lit(None).cast(T.LongType())) \
                   .withColumn("_last_updated_sequence_number", F.lit(None).cast(T.LongType()))
        if plan.residual:
            df = _residual_filter(df, plan.residual)
        from ..plans.join_strategy import attach_scan_plan

        return attach_scan_plan(df, plan)

    files = [t.data_file.file_path for t in plan.tasks]
    # ORC data files (beyond the reference, which refuses every non-parquet
    # data file: iceberg_multi_file_list.cpp:528-529) read through Spark's
    # native ORC source. Spark exposes _metadata.file_path for ORC but NOT
    # _metadata.row_index; since r12, ORC files that need REAL row
    # positions — positional deletes / DVs attached, or the caller asked
    # for file_row_number / row lineage — route through the arrow data
    # plane instead, which reads each file whole executor-side and
    # synthesizes exact per-file ordinals (the spec's position semantics).
    # That lands MoR positional deletes, v3 deletion vectors, virtual
    # position columns AND MoR DML (which derives delete rows from
    # file_row_number) over ORC (VERDICT r11 task 5; the r11 refusal is
    # gone). Position-free ORC files stay on the native vectorized source.
    orc_files = {
        t.data_file.file_path for t in plan.tasks
        if (t.data_file.file_format or "PARQUET").upper() == "ORC"}
    if with_file_info or with_row_lineage:
        orc_pos_files = set(orc_files)
    else:
        orc_pos_files = {
            t.data_file.file_path for t in plan.tasks
            if t.data_file.file_path in orc_files and t.positional_deletes}
    # Avro data files (r12 — THIRD format beyond the reference's
    # parquet-only): always the arrow plane, decoded executor-side by the
    # pure-Python Avro codec with by-field-id resolution; whole-file
    # sequential reads give exact row ordinals, so positional deletes /
    # DVs, virtual position columns and MoR DML work like parquet.
    avro_files = {
        t.data_file.file_path for t in plan.tasks
        if (t.data_file.file_format or "PARQUET").upper() == "AVRO"}
    need_pos = (
        plan.has_deletes
        or with_file_info
        or with_row_lineage
        or _needs_partition_constants(plan)
        or bool(_defaulted_fields(plan))
    )

    def _with_pos(d: DataFrame) -> DataFrame:
        if need_pos:
            d = _jx.select_exprs(d, ["*",
                _norm_uri_path_sql("_metadata.file_path") + " AS " + _FILE_COL,
                "_metadata.row_index AS " + _POS_COL])
        return d

    # name-mapping fallback for files written without parquet field-ids
    # (reference: ApplyFieldMapping, iceberg_multi_file_reader.cpp:203-238):
    # such files are read by mapped column name and aliased/cast onto the
    # current schema, then unioned with the field-id read.
    legacy: dict[str, list[str]] = {}
    mapping_prop = plan.tm.properties.get("schema.name-mapping.default")
    if mapping_prop:
        # ORC files are read by name regardless (no parquet field-ids to
        # sniff) and Avro files resolve by their own embedded field-ids,
        # so neither takes the legacy union branch
        legacy = _files_without_field_ids(
            spark, [f for f in files
                    if f not in orc_files and f not in avro_files])
    main_files = [f for f in files
                  if f not in legacy and f not in orc_files
                  and f not in avro_files]

    # uuid columns: parquet stores FIXED_LEN_BYTE_ARRAY(16); Spark can read
    # that only as binary. Read uuid fields as BinaryType — including struct
    # MEMBERS (foreign fixture add_columns_with_defaults_in_struct; the
    # reference's initial_default_in_struct_all_types.test) — then render
    # the canonical lowercase-hex form the schema promises (StringType),
    # pure Column expressions, no Python in the row path. uuid inside
    # array/map stays unsupported (no metadata slot to tag it).
    uuid_paths = _uuid_field_paths(schema)
    read_schema = _uuidify_read_schema(schema) if uuid_paths else schema

    def _uuid_fmt(col):
        h = F.lower(F.hex(col))
        canonical = F.concat_ws(
            "-", F.substring(h, 1, 8), F.substring(h, 9, 4),
            F.substring(h, 13, 4), F.substring(h, 17, 4),
            F.substring(h, 21, 12))
        # 16 raw bytes (spec FIXED[16], foreign writers) → format; anything
        # longer is already canonical text (our writer stores the 36-char
        # form — parquet strings read fine as binary)
        return (F.when(col.isNull(), F.lit(None).cast("string"))
                 .when(F.length(col) == 16, canonical)
                 .otherwise(col.cast("string")))

    def _uuid_to_str(d: DataFrame) -> DataFrame:
        for path in uuid_paths:
            if len(path) == 1:
                d = d.withColumn(path[0], _uuid_fmt(_qcol(path[0])))
            else:
                # struct member: rewrite in place via withField (dotted path
                # relative to the top-level struct column)
                top, rest = path[0], ".".join(path[1:])
                src = _qcol(top)
                for part in path[1:]:
                    src = src.getField(part)
                d = d.withColumn(top, _qcol(top).withField(
                    rest, _uuid_fmt(src)))
        return d

    # Spark's parquet field-id reader misresolves when a top-level field
    # name literally contains a dot and a struct path spells the same
    # dotted string (parquet-mr ColumnPath ambiguity — requested id-1
    # column comes back with the struct leaf's values). The arrow reader
    # resolves by exact top-level name + field id, so route such schemas
    # through it; DuckDB reads these correctly and so must we.
    # ... gate on every historical schema version: after a rename the
    # CURRENT names may be dot-free while older data files still carry the
    # dotted column. Nested names count too — a struct member literally
    # named 'b.c' beside a sibling struct b{c} collides one level down
    # the same way.
    def _any_dotted(t) -> bool:
        if isinstance(t, dict):
            kind = t.get("type")
            if kind == "struct":
                return any("." in f["name"] or _any_dotted(f["type"])
                           for f in t["fields"])
            if kind == "list":
                return _any_dotted(t["element"])
            if kind == "map":
                return _any_dotted(t["key"]) or _any_dotted(t["value"])
        return False

    dotted_names = any(
        "." in f["name"] or _any_dotted(f["type"])
        for sch in plan.tm.schemas.values() for f in sch["fields"])
    if dotted_names and main_files:
        from .. import io as _fio

        try:
            _fio.get_io(main_files[0])
        except ValueError:
            # no FileIO registered for this scheme (e.g. hdfs://): stay on
            # the native reader — only the rare colliding-path case is at
            # risk there, while failing every scan of the table would be
            # strictly worse
            dotted_names = False

    parts: list[DataFrame] = []
    if main_files:
        if _ad.is_spark_native(spark, main_files) and not dotted_names:
            parts.append(_uuid_to_str(_with_pos(_jx.read_files(
                spark, [_ad.to_native_path(f) for f in main_files],
                read_schema))))
        else:
            p = _ad.read_parquet(
                spark, main_files, schema, with_path_pos=need_pos,
                path_col=_FILE_COL, pos_col=_POS_COL)
            if need_pos:
                p = _replace_col_sql(p, _FILE_COL, _norm_path_sql(_FILE_COL))
            parts.append(p)
    if orc_files:
        # files carrying positional deletes / DVs need REAL row positions
        # → arrow plane (exact per-file sequential positions); the rest
        # stay on Spark's native ORC source. A file appears on exactly one
        # plane, so the union never duplicates rows.
        orc_native = sorted(orc_files - orc_pos_files)
        if orc_native and _ad.is_spark_native(spark, orc_native):
            # by-name read + cast onto the table schema (Spark's ORC
            # source has no field-id resolution; our own ORC writes use
            # current names). uuid columns stay the canonical string form
            # our writer stores. Spark exposes no row_index for ORC, but
            # files on this plane have no positional deletes — the NULL
            # position is only ever carried, never joined on.
            o = _jx.read_files(
                spark, [_ad.to_native_path(f) for f in orc_native], schema,
                file_format="orc")
            if need_pos:
                o = _jx.select_exprs(o, ["*",
                    _norm_uri_path_sql("_metadata.file_path")
                    + " AS " + _FILE_COL,
                    "CAST(NULL AS BIGINT) AS " + _POS_COL])
            parts.append(o)
            orc_arrow = sorted(orc_pos_files)
        else:
            orc_arrow = sorted(orc_files)
        if orc_arrow:
            # the arrow data plane reads ORC executor-side (pyarrow.orc
            # over the FileIO, by-name) and synthesizes exact row
            # positions — the plane positional deletes / DVs join against
            o = _ad.read_parquet(
                spark, orc_arrow, schema, with_path_pos=need_pos,
                path_col=_FILE_COL, pos_col=_POS_COL, file_format="orc")
            if need_pos:
                o = _replace_col_sql(o, _FILE_COL, _norm_path_sql(_FILE_COL))
            parts.append(o)
    if avro_files:
        a = _ad.read_parquet(
            spark, sorted(avro_files), schema, with_path_pos=need_pos,
            path_col=_FILE_COL, pos_col=_POS_COL, file_format="avro")
        if need_pos:
            a = _replace_col_sql(a, _FILE_COL, _norm_path_sql(_FILE_COL))
        parts.append(a)
    if legacy:
        parts.extend(_read_by_name_mapping(spark, legacy, mapping_prop,
                                           plan, need_pos))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)

    df = _apply_initial_defaults(spark, df, plan, files)
    df = _apply_partition_constants(spark, df, plan)
    df = _apply_positional_deletes(spark, df, plan)
    df = _apply_equality_deletes(spark, df, plan)

    if with_row_lineage:
        df = _add_row_lineage(spark, df, plan)
    if with_file_info:
        df = df.withColumn("filename", F.col(_FILE_COL)) \
               .withColumn("file_row_number", F.col(_POS_COL))

    keep = [f.name for f in schema.fields]
    if with_file_info:
        keep += ["filename", "file_row_number"]
    if with_row_lineage:
        keep += ["_row_id", "_last_updated_sequence_number"]
    df = _jx.select_exprs(df, [_jx.quote_name(c) for c in keep])

    if plan.residual:
        df = _residual_filter(df, plan.residual)
    # stamp the plan so statistics-driven join planning (r15,
    # plans/join_strategy.py) can size this side from manifests instead
    # of Spark's static estimate when the frame feeds a DML join
    from ..plans.join_strategy import attach_scan_plan

    return attach_scan_plan(df, plan)


# ---------------------------------------------------------------------------
# name-mapping fallback (files written without parquet field-ids)
# ---------------------------------------------------------------------------

#: above this many files, footer sniffing fans out to executors
_FOOTER_SNIFF_DRIVER_MAX = 64


def _arrow_schema_info(sch) -> tuple[list[str], list[int], str]:
    """Recursive walk of an arrow schema: (dotted field-name paths, all
    field-ids incl. nested, layout signature for grouping). List elements and
    map key/values appear under ``element``/``key``/``value`` path segments
    to match Iceberg name-mapping conventions."""
    import pyarrow as pa

    names: list[str] = []
    fids: list[int] = []
    sig: list[str] = []

    def visit(f, prefix: str) -> None:
        path = f"{prefix}.{f.name}" if prefix else f.name
        names.append(path)
        if f.metadata and b"PARQUET:field_id" in f.metadata:
            fids.append(int(f.metadata[b"PARQUET:field_id"]))
        t = f.type
        if pa.types.is_struct(t):
            for c in t:
                visit(c, path)
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            visit(t.value_field, path)
        elif pa.types.is_map(t):
            visit(t.key_field, path)
            visit(t.item_field, path)
        if not prefix:
            sig.append(f"{f.name}:{t}")

    for f in sch:
        visit(f, "")
    return names, fids, "|".join(sig)


#: sniff results survive for the life of the process: Iceberg data files are
#: immutable (a path is written exactly once), so a table carrying a
#: name-mapping property left over from migration costs one footer read per
#: file EVER, not one cluster job per query (VERDICT r1 "What's wrong" #5).
_SNIFF_CACHE: dict[str, tuple[str, bool, list[str], list[int], str]] = {}
_SNIFF_CACHE_MAX = 1_000_000


def _sniff_schema(path: str, fs_io, file_format: str) -> tuple[str, bool, list[str], list[int], str]:
    """One file's (path, has_field_ids, dotted names, field-ids, layout
    signature). Module-level (not a closure) so the executor fan-out path
    ships only this function + the format string, never a driver object
    graph. ORC carries no field-id story in Spark's source, so ORC files
    always report has_field_ids=False (name-resolved downstream)."""
    from ..io import get_io
    from ..io.arrow_data import _open_arrow_input

    fs_io = fs_io or get_io(path)
    if file_format == "orc":
        import pyarrow.orc as po

        sch = po.ORCFile(_open_arrow_input(fs_io, path)).schema
        names, _fids, sig = _arrow_schema_info(sch)
        return path, False, names, [], sig
    import pyarrow.parquet as pq

    names, fids, sig = _arrow_schema_info(
        pq.read_schema(_open_arrow_input(fs_io, path)))
    return path, bool(fids), names, fids, sig


def _sniff_footers(spark: SparkSession, files: list[str],
                   file_format: str = "parquet") -> list[tuple[str, bool, list[str], list[int], str]]:
    """(path, has_field_ids, dotted column-name paths, field-ids incl.
    nested, layout signature) per file. Schema reads are distributed above
    _FOOTER_SNIFF_DRIVER_MAX files so the driver never serially opens
    thousands of footers (manifest-late-materialization posture); results
    are cached per path. Since r12 the same fan-out serves both formats
    (``file_format`` = parquet|orc) — an ORC table with thousands of files
    (foreign writers) plans through the identical mapInPandas path instead
    of a driver thread pool (VERDICT r11 task 4)."""

    from ..io import get_io, io_from_storage_options, storage_options_for

    cached = [_SNIFF_CACHE[f] for f in files if f in _SNIFF_CACHE]
    files = [f for f in files if f not in _SNIFF_CACHE]
    if not files:
        return cached

    def _remember(results):
        if len(_SNIFF_CACHE) < _SNIFF_CACHE_MAX:
            for r in results:
                _SNIFF_CACHE[r[0]] = r
        return cached + results

    if not get_io(files[0]).shippable or len(files) <= _FOOTER_SNIFF_DRIVER_MAX:
        if len(files) > 4:
            # a schema read is one small-ranged tail read — I/O-bound, so
            # a driver thread pool hides latency below the fan-out cutoff
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                return _remember(list(ex.map(
                    lambda f: _sniff_schema(f, None, file_format), files)))
        return _remember([_sniff_schema(f, None, file_format) for f in files])
    import pandas as pd

    opts = storage_options_for(files[0])
    fmt = file_format

    def sniff_batches(batches):
        fs_io = io_from_storage_options(opts)
        for pdf in batches:
            out = [_sniff_schema(p, fs_io, fmt) for p in pdf["path"]]
            yield pd.DataFrame(
                {"path": [o[0] for o in out],
                 "has_ids": [o[1] for o in out],
                 "names": [o[2] for o in out],
                 "fids": [o[3] for o in out],
                 "sig": [o[4] for o in out]})

    meta = spark.createDataFrame([(f,) for f in files], "path: string")
    return _remember([
        (r.path, r.has_ids, list(r.names), [int(i) for i in r.fids], r.sig)
        for r in meta.repartition(32).mapInPandas(
            sniff_batches,
            "path string, has_ids boolean, names array<string>, "
            "fids array<int>, sig string"
        ).collect()
    ])


def _sniff_orc_schemas(spark: SparkSession, files: list[str]) -> list[tuple[str, bool, list[str], list[int], str]]:
    """ORC twin of the parquet sniff — same shared fan-out path since r12
    (driver thread pool ≤64 files, mapInPandas executor fan-out above)."""
    return _sniff_footers(spark, files, file_format="orc")


def _files_without_field_ids(spark: SparkSession, files: list[str]) -> dict[str, str]:
    """{file_path: layout signature} for data files whose parquet schema
    carries no field-id metadata. Only consulted when the table declares
    ``schema.name-mapping.default``."""
    return {p: sig for p, has, _names, _fids, sig in _sniff_footers(spark, files)
            if not has}


def _mapping_entry(mapping: list | None, fid: int) -> dict | None:
    for ent in mapping or []:
        if ent.get("field-id") == fid:
            return ent
    return None


def _mapped_field_expr(f: dict, mapping: list, file_st: T.DataType, parent):
    """Resolve current-schema field ``f`` at one nesting level of a legacy
    file: the mapping entry's historical ``names`` are matched against the
    file's struct members; unmatched → NULL (reference: ApplyFieldMapping,
    iceberg_multi_file_reader.cpp:203-238, recursing into child mappings)."""
    spark_t = ice_types.iceberg_to_spark(f["type"])
    ent = _mapping_entry(mapping, f["id"])
    names = list(ent.get("names", [])) if ent else []
    if not isinstance(file_st, T.StructType):
        return F.lit(None).cast(spark_t)
    src_name = next((n for n in names if n in file_st.names), None)
    if src_name is None:
        return F.lit(None).cast(spark_t)
    # getField is exact; the top-level reference must be quoted too or a
    # legacy column literally named 'a.b' would resolve as a struct path
    src = _qcol(src_name) if parent is None else parent.getField(src_name)
    return _mapped_value_expr(f["type"], ent.get("fields", []) if ent else [],
                              file_st[src_name].dataType, src)


def _mapped_value_expr(ice_t: Any, child_mapping: list, file_t: T.DataType, src):
    """Value-level name-mapping resolution: primitives cast; structs rebuild
    member-by-member; lists/maps recurse through ``element``/``key``/``value``
    mapping entries via higher-order functions (stays in codegen)."""
    spark_t = ice_types.iceberg_to_spark(ice_t)
    if ice_types.is_primitive(ice_t):
        return src.cast(spark_t)
    kind = ice_t.get("type")
    if kind == "struct":
        if not isinstance(file_t, T.StructType):
            return F.lit(None).cast(spark_t)
        children = [
            _mapped_field_expr(cf, child_mapping, file_t, src).alias(cf["name"])
            for cf in ice_t["fields"]
        ]
        return F.when(src.isNull(), F.lit(None).cast(spark_t)) \
                .otherwise(F.struct(*children))
    if kind == "list":
        if not isinstance(file_t, T.ArrayType):
            return F.lit(None).cast(spark_t)
        elem_ent = next((e for e in child_mapping
                         if "element" in e.get("names", [])), None)
        elem_children = elem_ent.get("fields", []) if elem_ent else []
        return F.transform(src, lambda x: _mapped_value_expr(
            ice_t["element"], elem_children, file_t.elementType, x))
    if kind == "map":
        if not isinstance(file_t, T.MapType):
            return F.lit(None).cast(spark_t)
        key_ent = next((e for e in child_mapping if "key" in e.get("names", [])), None)
        val_ent = next((e for e in child_mapping if "value" in e.get("names", [])), None)
        keys = F.transform(F.map_keys(src), lambda k: _mapped_value_expr(
            ice_t["key"], key_ent.get("fields", []) if key_ent else [],
            file_t.keyType, k))
        vals = F.transform(F.map_values(src), lambda v: _mapped_value_expr(
            ice_t["value"], val_ent.get("fields", []) if val_ent else [],
            file_t.valueType, v))
        return F.map_from_arrays(keys, vals)
    return F.lit(None).cast(spark_t)


def _read_by_name_mapping(
    spark: SparkSession,
    legacy: dict[str, str],
    mapping_prop: str,
    plan: ScanPlan,
    need_pos: bool,
) -> list[DataFrame]:
    """Read legacy files by name via ``schema.name-mapping.default``: each
    mapping entry lists historical column names for a field-id; the file's
    actual column is matched against that list, aliased to the current name
    and cast to the current type; unmatched fields become NULL. Nested
    structs, lists, and maps resolve recursively through the mapping's
    ``fields`` children (_mapped_field_expr)."""
    import json

    mapping = json.loads(mapping_prop)

    # group files by their full-layout signature so heterogeneous legacy
    # layouts each get one reader (bounded by distinct layouts, not files)
    groups: dict[str, list[str]] = {}
    for path, sig in legacy.items():
        groups.setdefault(sig, []).append(path)

    out = []
    for sig, paths in sorted(groups.items()):
        paths = sorted(paths)
        if _ad.is_spark_native(spark, paths):
            raw = spark.read.parquet(*[_ad.to_native_path(p) for p in paths])
            if need_pos:
                # resolve the hidden _metadata column while the plan leaf is
                # still the file scan, before the rename projection drops it
                raw = raw.withColumn(_FILE_COL, _norm_uri_path(F.col("_metadata.file_path"))) \
                         .withColumn(_POS_COL, F.col("_metadata.row_index"))
        else:
            # one layout signature per group → the first file's footer schema
            # holds for the whole group
            file_st = _ad.infer_spark_schema(paths[0])
            raw = _ad.read_parquet(spark, paths, file_st,
                                   with_path_pos=need_pos,
                                   path_col=_FILE_COL, pos_col=_POS_COL)
            if need_pos:
                raw = raw.withColumn(_FILE_COL, _norm_path(F.col(_FILE_COL)))
        file_st = T.StructType(
            [fl for fl in raw.schema.fields if fl.name not in (_FILE_COL, _POS_COL)])
        sel = [
            _mapped_field_expr(f, mapping, file_st, None).alias(f["name"])
            for f in plan.schema_json["fields"]
        ]
        if need_pos:
            sel += [F.col(_FILE_COL), F.col(_POS_COL)]
        out.append(raw.select(*sel))
    return out


# ---------------------------------------------------------------------------
# initial-default column values (schema evolution)
# ---------------------------------------------------------------------------

def _defaulted_fields(plan: ScanPlan) -> list[tuple[tuple[str, ...], dict]]:
    """(dotted path, field json) for every field carrying an
    ``initial-default``, recursing into struct members (defaults inside
    list/map element types are out of scope — the spec restricts defaults to
    primitive values anyway)."""
    out: list[tuple[tuple[str, ...], dict]] = []

    def walk(fields: list[dict], prefix: tuple[str, ...]) -> None:
        for f in fields:
            path = prefix + (f["name"],)
            if f.get("initial-default") is not None:
                out.append((path, f))
            t = f["type"]
            if isinstance(t, dict) and t.get("type") == "struct":
                walk(t["fields"], path)

    walk(plan.schema_json["fields"], ())
    return out


def _apply_initial_defaults(
    spark: SparkSession, df: DataFrame, plan: ScanPlan, files: list[str]
) -> DataFrame:
    """Columns added with ``initial-default`` surface the default (not NULL)
    for data files written before the column existed (reference:
    iceberg_column_definition.cpp:26-75 + missing-column handling in
    iceberg_multi_file_reader.cpp:100-115). Implemented like partition
    constants: a broadcast (file → field-missing flags) map drives a
    per-row conditional, so any file count scales."""
    defaulted = _defaulted_fields(plan)
    if not defaulted or not files:
        return df

    orc = {t.data_file.file_path for t in plan.tasks
           if (t.data_file.file_format or "PARQUET").upper() == "ORC"}
    sniffed = _sniff_footers(spark, [f for f in files if f not in orc])
    if orc:
        sniffed = sniffed + _sniff_orc_schemas(spark, sorted(orc))
    rows = []
    for path, has_ids, names, fids, _sig in sniffed:
        row: dict[str, Any] = {"__def_file": _norm_path_py(path)}
        for i, (fpath, f) in enumerate(defaulted):
            present = (f["id"] in fids) if has_ids else (".".join(fpath) in names)
            row[f"__def_{i}"] = not present
        rows.append(row)
    schema = T.StructType(
        [T.StructField("__def_file", T.StringType())]
        + [T.StructField(f"__def_{i}", T.BooleanType())
           for i in range(len(defaulted))])
    flag_df = spark.createDataFrame(rows, schema)
    df = df.join(F.broadcast(flag_df),
                 _jx.jexpr(_FILE_COL + " = __def_file"), "left")
    for i, (fpath, f) in enumerate(defaulted):
        default_val = ice_types.json_default_to_python(
            f["type"], f["initial-default"])
        spark_t = ice_types.iceberg_to_spark(f["type"])
        flag = F.coalesce(F.col(f"__def_{i}"), F.lit(False))
        repl = F.when(flag, F.lit(default_val).cast(spark_t)) \
                .otherwise(F.col(".".join(fpath)))
        if len(fpath) == 1:
            df = df.withColumn(fpath[0], repl)
        else:
            # nested member: rebuild via withField so only the defaulted
            # leaf changes; a NULL parent struct stays NULL
            df = df.withColumn(
                fpath[0], F.col(fpath[0]).withField(".".join(fpath[1:]), repl))
    return df.drop("__def_file", *[f"__def_{i}" for i in range(len(defaulted))])


# ---------------------------------------------------------------------------
# partition constants (identity partitions whose column may be absent in files)
# ---------------------------------------------------------------------------

def _identity_constant_fields(plan: ScanPlan) -> list[tuple[str, str, Any]]:
    """[(column_name, iceberg_type, None)] for identity-partitioned columns."""
    tm = plan.tm
    out = []
    seen = set()
    for t in plan.tasks:
        spec = tm.partition_specs.get(t.spec_id)
        if not spec:
            continue
        for pf in spec.fields:
            if pf.transform != "identity" or pf.field_id in seen:
                continue
            src = tm.field_by_id(pf.source_id)
            if src is None:
                continue
            seen.add(pf.field_id)
            out.append((src["name"], src["type"], pf.name))
    return out


def _needs_partition_constants(plan: ScanPlan) -> bool:
    return bool(_identity_constant_fields(plan))


def _apply_partition_constants(spark: SparkSession, df: DataFrame, plan: ScanPlan) -> DataFrame:
    """Identity-partition columns materialized from partition metadata when a
    file omits them (reference: iceberg_multi_file_reader.cpp:292-378).
    Implemented as a broadcast join on a (file_path → constant…) map so it
    scales to any file count without per-file plan branches."""
    fields = _identity_constant_fields(plan)
    if not fields:
        return df
    from ..plans.scan_plan import _norm_partition_value

    rows = []
    for t in plan.tasks:
        spec = plan.tm.partition_specs.get(t.spec_id)
        row: dict[str, Any] = {"__pc_file": _norm_path_py(t.data_file.file_path)}
        for col, ice_t, pname in fields:
            v = t.data_file.partition.get(pname)
            row["__pc_" + col] = _norm_partition_value(v, ice_t)
        rows.append(row)

    fields_schema = [T.StructField("__pc_file", T.StringType())]
    for col, ice_t, _ in fields:
        fields_schema.append(T.StructField("__pc_" + col, ice_types.iceberg_to_spark(ice_t)))
    const_df = spark.createDataFrame(rows, T.StructType(fields_schema))
    orig_cols = df.columns
    df = df.join(F.broadcast(const_df),
                 _jx.jexpr(_FILE_COL + " = __pc_file"), "left")
    # one selectExpr does all the per-field coalesces AND the drop (r16
    # round-trip batching): identical plan to withColumn(coalesce)+drop
    pc = {col for col, _, _ in fields}
    return _jx.select_exprs(df, [
        ("coalesce({0}, {1}) AS {0}".format(
            _jx.quote_name(c), _jx.quote_name("__pc_" + c))
         if c in pc else _jx.quote_name(c))
        for c in orig_cols])


# ---------------------------------------------------------------------------
# deletes
# ---------------------------------------------------------------------------

def _apply_positional_deletes(spark: SparkSession, df: DataFrame, plan: ScanPlan) -> DataFrame:
    row_delete_files: dict[str, str] = {}  # path -> recorded file format
    dv_blobs: dict[str, "mf.DataFile"] = {}  # referenced data file -> DV entry
    for t in plan.tasks:
        for d in t.positional_deletes:
            if (d.file_format or "").lower() == "puffin":
                ref = _norm_path_py(
                    d.referenced_data_file or t.data_file.file_path)
                prev = dv_blobs.get(ref)
                if prev is not None and (
                    prev.file_path != d.file_path
                    or prev.content_offset != d.content_offset
                ):
                    # reference: iceberg_multi_file_list.cpp:24-63
                    raise ValueError(
                        f"corrupt table: two deletion vectors reference {ref}")
                dv_blobs[ref] = d
            else:
                row_delete_files[d.file_path] = d.file_format
    if not row_delete_files and not dv_blobs:
        return df

    parts = []
    if row_delete_files:
        # positional-delete schema: file_path string (fid 2147483546),
        # pos long (fid 2147483545) — files may be parquet, ORC, or Avro
        # (r13 format routing; Flink's avro tables write avro deletes)
        parts.append(_jx.select_exprs(
            _read_delete_files(spark, row_delete_files,
                               "file_path string, pos long"),
            [_norm_path_sql("file_path") + " AS __del_file",
             "CAST(pos AS BIGINT) AS __del_pos"]))
    if dv_blobs:
        parts.append(_dv_positions_df(spark, dv_blobs))
    del_df = parts[0]
    for p in parts[1:]:
        del_df = del_df.unionByName(p)
    # broadcast only when the manifests say the delete side is small; a
    # 100 TB table's delete files can exceed executor memory, where the
    # anti-join should shuffle (AQE decides from real sizes)
    total_del_rows = sum(
        int(d.record_count or 0)
        for t in plan.tasks for d in t.positional_deletes)
    if total_del_rows <= _DELETE_BROADCAST_MAX_ROWS:
        del_df = del_df.hint("broadcast")
    return df.join(
        del_df,
        _jx.jexpr(_FILE_COL + " = __del_file AND " + _POS_COL + " = __del_pos"),
        "left_anti",
    )


#: below this many DV blobs the driver decodes them locally (they are tiny
#: roaring bitmaps) instead of paying a mapInPandas Python-worker round trip.
_DV_DRIVER_DECODE_MAX = 64

#: manifest-reported delete rows above which the anti-join side is NOT
#: broadcast-hinted (AQE shuffles instead). Applies to positional and
#: equality deletes alike.
_DELETE_BROADCAST_MAX_ROWS = 20_000_000
_EQ_DELETE_BROADCAST_MAX_ROWS = _DELETE_BROADCAST_MAX_ROWS


def _dv_positions_df(spark: SparkSession, dv_blobs: dict[str, "mf.DataFile"]) -> DataFrame:
    """Decode Puffin deletion vectors into a (__del_file, __del_pos)
    DataFrame. Few blobs: decoded on the driver (bitmaps are KB-sized) and
    shipped via Arrow. Many blobs: decode runs on executors via mapInPandas —
    the driver ships only (path, offset, length) triples, so a table with
    thousands of DVs doesn't funnel bitmap bytes through the driver."""
    import numpy as np
    import pandas as pd

    meta = [(ref, d.file_path, int(d.content_offset or 0),
             int(d.content_size_in_bytes or 0)) for ref, d in sorted(dv_blobs.items())]

    if len(meta) <= _DV_DRIVER_DECODE_MAX:
        from ..metadata.puffin import read_dv_positions

        frames = []
        for ref, path, offset, length in meta:
            pos = read_dv_positions(path, offset if length else None,
                                    length if length else None, ref)
            frames.append(pd.DataFrame(
                {"__del_file": ref,
                 "__del_pos": np.asarray(pos, dtype=np.int64)}))
        pdf = (pd.concat(frames, ignore_index=True) if frames
               else pd.DataFrame({"__del_file": pd.Series(dtype="object"),
                                  "__del_pos": pd.Series(dtype="int64")}))
        return spark.createDataFrame(
            pdf, "`__del_file` string, `__del_pos` long")
    from ..io import parse_uri, register_io, storage_options_for
    from ..io import io_from_storage_options

    opts = storage_options_for(meta[0][1]) if meta else {}
    scheme = parse_uri(meta[0][1])[0] if meta else ""

    meta_df = spark.createDataFrame(
        meta, "ref: string, puffin: string, offset: long, length: long")

    def decode(batches):
        from ..metadata.puffin import read_dv_positions

        if scheme and opts:
            # executor process: rebuild the driver's (possibly vended) IO
            register_io(scheme, io_from_storage_options(opts))
        for pdf in batches:
            for r in pdf.itertuples():
                pos = read_dv_positions(
                    r.puffin, r.offset if r.length else None,
                    r.length if r.length else None, r.ref)
                yield pd.DataFrame({"__del_file": r.ref, "__del_pos": pos})

    return meta_df.repartition(max(1, min(32, len(meta)))).mapInPandas(
        decode, "`__del_file` string, `__del_pos` long")


def _projection_struct(schema: T.StructType, paths: list[str]) -> T.StructType:
    """Read schema for an equality-delete file: the nested projection of
    the table schema keeping only ``paths`` (dotted) and their ancestor
    structs — the spec's delete-file schema for nested equality ids."""
    tree: dict = {}
    for p in paths:
        node = tree
        parts = p.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = True

    def build(st: T.StructType, node: dict) -> T.StructType:
        out = []
        for f in st.fields:
            if f.name not in node:
                continue
            v = node[f.name]
            if v is True:
                out.append(T.StructField(f.name, f.dataType, True))
            else:
                out.append(T.StructField(f.name, build(f.dataType, v), True))
        return T.StructType(out)

    return build(schema, tree)


def _apply_equality_deletes(spark: SparkSession, df: DataFrame, plan: ScanPlan) -> DataFrame:
    """Equality deletes: null-safe anti-join on the equality_id columns,
    honoring per-pair sequence numbers (delete.seq > data.seq,
    iceberg_file_pruner.cpp:340-356); absent fields compare as NULL
    (IS NOT DISTINCT FROM, iceberg_multi_file_reader.cpp:436-523).

    Scale shape: ONE anti-join per distinct equality-id signature — not per
    delete file. Delete files of a signature are read in a single parquet
    scan; per-file sequence numbers attach via a broadcast (path → seq)
    map. Globally-applicable deletes join on keys+seq alone; partition-
    scoped deletes additionally carry the planner's (delete file → data
    file) applicability pairs, so planner truth (partition match,
    referenced_data_file) is preserved without per-file IN lists."""
    by_sig: dict[tuple, dict[str, tuple[mf.DataFile, int, set[str]]]] = {}
    for t in plan.tasks:
        for seq, d in t.equality_deletes:
            sig = tuple(d.equality_ids or [])
            ent = by_sig.setdefault(sig, {}).setdefault(
                d.file_path, (d, seq, set()))
            ent[2].add(t.data_file.file_path)
    if not by_sig:
        return df

    all_files = {t.data_file.file_path for t in plan.tasks}
    seq_rows = [(_norm_path_py(t.data_file.file_path),
                 int(t.sequence_number or 0)) for t in plan.tasks]
    data_seq = spark.createDataFrame(
        seq_rows, "`__ds_file` string, `__data_seq` long").dropDuplicates()
    df = df.join(F.broadcast(data_seq),
                 _jx.jexpr(_FILE_COL + " = __ds_file"), "left").drop("__ds_file")

    tm = plan.tm
    for sig, files in sorted(by_sig.items()):
        # resolve ids to (possibly nested-dotted) column paths — equality
        # ids may reference a struct member
        # (test_equality_delete_struct_field.test stores the deepest leaf id)
        cols = []
        for fid in sig:
            hit = tm.field_path_by_id(fid)
            if hit is not None:
                cols.append(hit[0])
        if not cols:
            continue
        is_global = all(applicable == all_files
                        for _, _, applicable in files.values())
        # broadcast the key set only when the manifests say it is small
        # (mirrors the positional-delete guard above). A CDC-heavy table's
        # accumulated equality deletes can be tens of GB; forcing a broadcast
        # there OOMs executors — let AQE pick a shuffled anti-join instead
        # (reference streams them: iceberg_multi_file_reader.cpp:525-558).
        sig_del_rows = sum(
            int(d.record_count or 0) for d, _, _ in files.values())
        maybe_broadcast = (
            (lambda k: k.hint("broadcast"))
            if sig_del_rows <= _EQ_DELETE_BROADCAST_MAX_ROWS
            else (lambda k: k))
        del_meta = spark.createDataFrame(
            [(_norm_path_py(p), int(seq))
             for p, (_, seq, _) in sorted(files.items())],
            "`__del_file` string, `__del_seq` long")
        key_st = _projection_struct(tm.spark_schema(), cols)
        keys = (
            _read_delete_files(
                spark, {p: d.file_format for p, (d, _, _) in files.items()},
                key_st, with_path_pos=True, path_col="__kf")
            .join(F.broadcast(del_meta), F.col("__kf") == F.col("__del_file"))
        )
        alias = {c: f"__eq_k{i}" for i, c in enumerate(cols)}
        if is_global:
            keys = keys.select(
                *[F.col(c).alias(alias[c]) for c in cols], "__del_seq"
            ).dropDuplicates()
            eq_cond = None
            for c in cols:
                piece = df[c].eqNullSafe(keys[alias[c]])
                eq_cond = piece if eq_cond is None else (eq_cond & piece)
            df = df.join(maybe_broadcast(keys),
                         eq_cond & (keys["__del_seq"] > df["__data_seq"]),
                         "left_anti")
        else:
            pairs = [(_norm_path_py(p), _norm_path_py(target))
                     for p, (_, _, applicable) in files.items()
                     for target in applicable]
            pair_df = spark.createDataFrame(
                pairs, "`__p_del` string, `__p_data` string")
            keys = (
                keys.join(F.broadcast(pair_df),
                          F.col("__del_file") == F.col("__p_del"))
                .select(*[F.col(c).alias(alias[c]) for c in cols],
                        "__del_seq", F.col("__p_data"))
                .dropDuplicates()
            )
            eq_cond = None
            for c in cols:
                piece = df[c].eqNullSafe(keys[alias[c]])
                eq_cond = piece if eq_cond is None else (eq_cond & piece)
            df = df.join(
                maybe_broadcast(keys),
                eq_cond & (keys["__del_seq"] > df["__data_seq"])
                & (df[_FILE_COL] == keys["__p_data"]),
                "left_anti")
    return df.drop("__data_seq")


# ---------------------------------------------------------------------------
# row lineage (v3)
# ---------------------------------------------------------------------------

def _add_row_lineage(spark: SparkSession, df: DataFrame, plan: ScanPlan) -> DataFrame:
    """_row_id = file.first_row_id + file_row_number; _last_updated_sequence_number
    from the file's sequence number (reference:
    iceberg_table_schema_version.cpp:116-125, COALESCE semantics)."""
    rows = [
        (_norm_path_py(t.data_file.file_path), t.first_row_id, t.sequence_number)
        for t in plan.tasks
    ]
    map_df = spark.createDataFrame(
        rows, T.StructType([
            T.StructField("__rl_file", T.StringType()),
            T.StructField("__rl_first_row_id", T.LongType()),
            T.StructField("__rl_seq", T.LongType()),
        ])
    )
    orig_cols = df.columns
    df = df.join(F.broadcast(map_df),
                 _jx.jexpr(_FILE_COL + " = __rl_file"), "left")
    return _jx.select_exprs(df, [_jx.quote_name(c) for c in orig_cols] + [
        "CASE WHEN __rl_first_row_id IS NOT NULL THEN "
        f"__rl_first_row_id + {_POS_COL} END AS _row_id",
        "__rl_seq AS _last_updated_sequence_number"])


# ---------------------------------------------------------------------------
# metadata-only count(*)
# ---------------------------------------------------------------------------

def iceberg_count(path: str, *, snapshot_id: int | None = None, as_of: Any = None,
                  where: str | None = None) -> Optional[int]:
    """Exact count(*) from manifest metadata when no deletes/filters apply
    (reference: iceberg_multi_file_list.cpp:395-427). Returns None when the
    metadata alone cannot answer."""
    tm = load_table_metadata(path)
    snapshot = tm.select_snapshot(snapshot_id=snapshot_id, as_of=as_of)
    if where is not None:
        return None
    if snapshot is None or not snapshot.manifest_list:
        return 0
    # fast path: manifest-LIST row-count sums answer count(*) without
    # opening any manifest when no delete manifests exist (reference:
    # cardinality from manifest list, iceberg_multi_file_list.cpp:332-364)
    from ..plans.scan_plan import _localize

    manifests = mf.read_manifest_list(_localize(tm, snapshot.manifest_list))
    if all(m.content == 0 for m in manifests):  # data manifests only
        return sum(m.added_rows_count + m.existing_rows_count
                   for m in manifests)
    plan = plan_scan(tm, snapshot, where)
    return plan.exact_row_count()
