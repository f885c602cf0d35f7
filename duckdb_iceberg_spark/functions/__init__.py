"""Scalar functions: iceberg_bucket / iceberg_truncate.

The only scalar functions the reference registers
(reference: src/function/iceberg_functions.cpp:11-39;
src/function/iceberg_scalar_functions.cpp:172-351). Column-expression forms
reuse the transform library so write-path partitioning and the public
functions can never disagree.

``iceberg_truncate`` on strings follows the Iceberg spec (code points); the
reference truncates grapheme clusters — a documented deviation we do not
copy (iceberg_scalar_functions.cpp:241-255).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans import transforms as tr


def iceberg_bucket(n: int, col: Column | str, source_type: str = "long") -> Column:
    """Spec-exact Iceberg bucket transform: (murmur3(v) & 0x7FFFFFFF) % n.

    ``source_type`` is the Iceberg type name governing the hash's byte
    convention ('int'/'long'/'string'/'date'/'timestamp'/'decimal(p, s)'/
    'binary'/'uuid'/'time'); int32 values hash sign-extended to 8 bytes
    (reference: iceberg_hash.cpp:56-62)."""
    c = F.col(col) if isinstance(col, str) else col
    return tr.transform_column(f"bucket[{n}]", c, source_type)


def iceberg_truncate(w: int, col: Column | str, source_type: str = "long") -> Column:
    """Iceberg truncate transform: ints floor to a multiple of w
    (v - (((v % w) + w) % w), reference iceberg_scalar_functions.cpp:229-239),
    strings keep the first w code points, binaries the first w bytes,
    decimals truncate on the unscaled value."""
    c = F.col(col) if isinstance(col, str) else col
    return tr.transform_column(f"truncate[{w}]", c, source_type)


__all__ = ["iceberg_bucket", "iceberg_truncate"]
