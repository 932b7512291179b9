"""Exact integer/fixed-point arithmetic helpers (cross-engine doctrine).

The grading oracle hash-compares Spark results against DuckDB, so every
ratio/share/mean that reaches an output column is computed in exact
integer arithmetic on BOTH engines. These are the canonical Spark-side
forms; `mie_spark.queries.relational` re-exports them for query code.

Layering: this module sits under `functions/` so operator modules can
use it without importing the query registry.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_div(x: Column, d) -> Column:
    """Exact integral quotient floor(x / d) for non-negative operands.

    Two traps this avoids (both oracle-parity killers):
    - Spark's `/` on longs is DOUBLE division — floor(x / d) silently
      loses exactness once x exceeds 2^53, where DuckDB's integer `//`
      stays exact.
    - Spark's `/` on DECIMALS rounds the quotient HALF_UP to scale 6
      *before* floor, so floor(decimal/decimal) reads 1 when the exact
      quotient is 0.9999995+ (e.g. num=50*20000+den, den=1000001) —
      DuckDB's `//` never rounds. Subtracting the remainder first makes
      the decimal division exact (zero remainder -> no rounding), which
      matches SQL `div` bit-for-bit over the full decimal(38,0) range.

    `d` may be a Python int or a Column; both operands must be
    non-negative (pmod semantics — the doctrine everywhere in this repo).
    Operands may exceed long range (they compute in decimal(38,0)), but
    the QUOTIENT must fit in a long — the result is cast to long, and a
    quotient past 2^63 wraps (non-ANSI) or errors (ANSI). Every caller
    divides by at least the share/mean scale, keeping quotients in
    range; pinned by tests/test_properties.py.
    """
    xd = x.cast("decimal(38,0)")
    dd = (F.lit(d) if isinstance(d, int) else d).cast("decimal(38,0)")
    return ((xd - F.pmod(xd, dd)) / dd).cast("long")


def share_half_up_4dp(num: Column, den: Column) -> Column:
    """num/den rounded HALF_UP to 4 decimals, computed exactly in integers.

    floor((num*2*10^4 + den) / (2*den)) / 10^4 — the oracle-side analog is
    `(num*20000 + den) // (den*2) / 10000.0`. Uses int_div so the quotient
    is the exact integral one (no decimal scale-6 pre-rounding)."""
    return (
        int_div(num.cast("decimal(38,0)") * 20000 + den, den.cast("decimal(38,0)") * 2)
        / F.lit(10000.0)
    )
