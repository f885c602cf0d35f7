"""Platform-independent transcendental math for cross-engine literals.

Every 6dp DECIMAL literal this engine shares with a checking engine
(DSIR log-ratios and Gumbel terms, the Laplace bigram log-probs) used to
be derived from ``math.log`` — the platform libm. CPython's ``log`` and
the JVM's ``Math.log`` are each within 1 ulp of correctly rounded, but
*which* side of the true value they land on is platform/JIT-dependent,
and a last-ulp difference flips a ROUND_HALF_UP 6dp boundary when the
true value sits within ~1e-16 of a ``…5e-7`` tie.  Two rounds of driver
hash-reds (`docs_dsir_sample`, `docs_lm_score`, CORRECTNESS_r08/r09)
that reproduced bit-identical locally are exactly that failure class:
the literals were regenerated in a different process/JVM than the one
that graded them.

:func:`dec_ln` removes the class instead of chasing it: ``decimal``
``ln()`` is **correctly rounded by specification** (IBM decimal
arithmetic; CPython's libmpdec and the pure-Python fallback both
implement it), so the same input yields the same digits on every
platform, every libm, every process.  At 40 significant digits the
rounding error is ~1e-39 relative; for a result to quantize differently
at 6dp the true value would have to sit within 1e-39 of a half-up tie,
which for logarithms of rationals (transcendental except ln(1)) does
not occur.

Used by :func:`~duckdb_iceberg_spark.operators.text.laplace_lp6` and
:func:`~duckdb_iceberg_spark.operators.sampling.dsir_log_ratios` /
:func:`~duckdb_iceberg_spark.operators.sampling.dsir_gumbel6` — the
single implementations shared by each operator and its SQL-oracle
builder, so both engines consume identical DECIMAL literals no matter
where either side was computed.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, localcontext
from functools import lru_cache

_PREC = 40
_Q6 = Decimal("0.000001")


def dec_ln(x) -> Decimal:
    """Correctly-rounded natural log of ``x`` at 40 significant digits.

    ``x`` may be an int, a float (converted exactly — ``Decimal(float)``
    is the precise binary value, so e.g. the DSIR ``u`` term, an exact
    dyadic rational, loses nothing), or a Decimal.
    """
    with localcontext() as ctx:
        ctx.prec = _PREC
        return Decimal(x).ln()


@lru_cache(maxsize=65536)
def dec_ln_int(n: int) -> Decimal:
    """Cached :func:`dec_ln` for integer arguments — the Laplace /
    log-ratio tables call ln on small repeated counts (≤ a few thousand
    distinct values across a 4096-bucket model), so one ln per distinct
    integer instead of one per table row."""
    return dec_ln(n)


def q6(d: Decimal) -> Decimal:
    """Quantize to 6dp with ROUND_HALF_UP — SQL ``round()`` semantics,
    the contract every cross-engine literal in this package uses."""
    return d.quantize(_Q6, ROUND_HALF_UP)
