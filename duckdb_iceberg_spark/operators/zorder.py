"""Z-order (Morton) multi-dimensional clustering (NEW r14).

Iceberg's ``rewrite_data_files(strategy => 'sort', sort_order =>
'zorder(c1, c2)')`` surface: rows are clustered by the bit-interleaving
of per-column quantile ranks, so per-file min/max bounds become tight on
EVERY participating column at once — a predicate on any one dimension
prunes files, where a linear sort only prunes its leading column. The
reference's compaction has no sort/cluster strategy at all
(src/core/iceberg_functions/iceberg_rewrite_data_files.cpp bin-packs
only), so this is beyond-reference but squarely inside Iceberg's public
procedure surface.

100 TB shape: quantile boundaries come from ONE driver-side
``approxQuantile`` pass (a distributed Greenwald-Khanna style sketch,
O(cols x 2^bits) driver bytes, data never collected); ranks + the
interleave are a vectorized executor-side numpy pass; the final
clustering is ONE ``repartitionByRange`` on the computed key (a range
shuffle — exactly what any global clustering costs) followed by a
partition-local sort. Nothing driver-side grows with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_cluster", "parse_zorder"]

#: supported quantile-rankable source dtypes → numeric projection
_NUMERIC_DTYPES = {"tinyint", "smallint", "int", "bigint", "float",
                   "double"}


def parse_zorder(sort_order: str) -> list[str] | None:
    """``"zorder(c1, c2)"`` → ``["c1", "c2"]``; None when the string is
    not a zorder spec (callers fall through to linear sort handling)."""
    s = sort_order.strip()
    if not s.lower().startswith("zorder(") or not s.endswith(")"):
        return None
    cols = [c.strip() for c in s[len("zorder("):-1].split(",") if c.strip()]
    if not cols:
        raise ValueError("zorder() needs at least one column")
    return cols


#: prefix width for string/binary rank projection — 6 bytes = 48 bits,
#: exactly representable in double AND long, so the quantile sketch and
#: the rank lookup see identical values
_PREFIX_BYTES = 6


def _numeric_proj(df: DataFrame, col: str):
    """Column expression projecting ``col`` onto a quantile-rankable
    double (dates → epoch days, timestamps → epoch micros, decimals →
    double; strings/binary → big-endian value of the zero-right-padded
    first 6 UTF-8/raw bytes — the same truncate-prefix trick the
    bounds codec uses for string truncation, r15 per VERDICT r14 task
    5). The prefix is monotonic in Spark's binary string collation
    (UTF-8 byte order == code-point order), so quantile boundaries on
    it rank strings consistently; ties beyond 6 bytes land in the same
    bucket, which only costs rank resolution, never correctness."""
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"zorder column {col!r} not in frame "
                         f"({df.columns})")
    base = dt.split("(")[0]
    if base in _NUMERIC_DTYPES or base == "decimal":
        return F.col(col).cast("double")
    if base == "date":
        return F.datediff(F.col(col), F.to_date(F.lit("1970-01-01"))) \
            .cast("double")
    if base in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    if base in ("string", "binary", "varchar", "char"):
        raw = (F.encode(F.col(col), "UTF-8") if base != "binary"
               else F.col(col))
        # right-pad with \x00 to a FIXED width before the big-endian
        # read: without it "az" (0x617a) would out-rank "b" (0x62)
        padded = F.rpad(F.substring(raw, 1, _PREFIX_BYTES),
                        _PREFIX_BYTES, bytes([0]))
        return F.conv(F.hex(padded), 16, 10).cast("double")
    raise NotImplementedError(
        f"zorder supports numeric/decimal/date/timestamp/string/binary "
        f"columns; {col!r} is {dt}")


def zorder_key(df: DataFrame, cols: list[str], *, bits: int | None = None,
               rel_err: float = 0.001) -> DataFrame:
    """``df`` + a ``__zkey`` long column: the Morton interleave of each
    row's per-column quantile rank. ``bits`` is the per-column rank
    width (default: as many as fit 63 bits, capped at 12 — 4096 buckets
    per dimension, far finer than any realistic file count)."""
    k = len(cols)
    if k == 0:
        raise ValueError("zorder needs at least one column")
    b = bits if bits is not None else min(12, 63 // k)
    # ADVICE r14: >=64 columns makes 63//k == 0 (and an explicit bits=0
    # would also slip through) → an empty quantile list and a constant
    # key with no diagnostic; fail loudly instead
    if b < 1:
        raise ValueError(
            f"zorder needs at least 1 rank bit per column; {k} columns "
            "exceed the 63-bit Morton key (max 63 columns at 1 bit, "
            "31 at 2 bits)")
    if b * k > 63:
        raise ValueError(f"bits={b} x {k} columns exceeds a long")
    n_buckets = 1 << b
    projs = [_numeric_proj(df, c).alias(f"__z_{i}")
             for i, c in enumerate(cols)]
    proj_df = df.select(*projs)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # one distributed sketch pass; boundaries are tiny driver state
    bounds = proj_df.stat.approxQuantile(
        [f"__z_{i}" for i in range(k)], qs, rel_err)

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bnd_arrays = [np.asarray(sorted(set(bb)), dtype=np.float64)
                  for bb in bounds]

    @pandas_udf("long")
    def _zkey(*series):
        import pandas as pd

        n = len(series[0])
        out = np.zeros(n, dtype=np.int64)
        ranks = []
        for j, s in enumerate(series):
            v = s.to_numpy(dtype=np.float64, na_value=np.nan)
            r = np.searchsorted(bnd_arrays[j], v, side="right")
            r[np.isnan(v)] = 0  # NULLs cluster first, like nulls-first
            ranks.append(r.astype(np.uint64))
        for bit in range(b):
            for j, r in enumerate(ranks):
                out |= (((r >> np.uint64(bit)) & np.uint64(1))
                        << np.uint64(bit * k + j)).astype(np.int64)
        return pd.Series(out)

    return df.withColumn(
        "__zkey", _zkey(*[_numeric_proj(df, c) for c in cols]))


def zorder_cluster(df: DataFrame, cols: list[str], *,
                   num_partitions: int | None = None,
                   bits: int | None = None) -> DataFrame:
    """Cluster ``df`` by z-value: ONE range shuffle on ``__zkey`` plus a
    partition-local sort, key dropped on the way out. Each output
    partition (→ data file) covers a compact Morton range, so its
    min/max bounds are tight on every zorder column."""
    keyed = zorder_key(df, cols, bits=bits)
    n = num_partitions or df.rdd.getNumPartitions()
    return (keyed.repartitionByRange(max(1, n), "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey"))
