"""Cross-engine numeric parity helpers.

The driver compares Spark results against DuckDB by value hash, so float
columns must be *bit-identical* across engines. Sources of drift:

1. Aggregation order — engines sum doubles in different orders (Spark:
   partial/final hash agg; DuckDB: segment trees for window frames), so
   raw float sums differ in the low bits.
2. ``round()`` — Spark rounds via Java BigDecimal HALF_UP on the exact
   binary value; DuckDB multiplies then ``std::round``s. On exact
   half-boundaries (ubiquitous when inputs have fixed decimal precision,
   e.g. prices with 2 decimals) the engines disagree by 1 ulp of output.

Strategy — *exact integer-quanta aggregation*:

- ``quanta(x, d)`` recovers the exact integer ``x·10^d`` from a double
  holding a d-decimal value (`floor(x·10^d + 0.5)` — the float noise of
  the stored double is ≪ 0.5 quanta).
- Sums run over BIGINT quanta: exact, order-independent, identical in
  every engine. (Range check: quanta magnitudes must keep the total
  < 2^63; callers pick ``d`` accordingly.)
- One final float division converts back: identical operands ⇒
  bit-identical IEEE result.

This mirrors the engine's 100 TB stance on money (SURVEY §4.3 H7):
token quantities are integers; floating point only at the display edge.

``fround`` remains for values that are already bit-identical (e.g.
ratios of exact integers) — it is a *deterministic shared recipe*
(floor(x·10^d + 0.5)/10^d), not a correctness device for noisy floats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column, digits: int) -> Column:
    """Deterministic cross-engine rounding recipe (Spark side). Only
    safe when ``col`` is already bit-identical across engines."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def fround_sql(expr: str, digits: int) -> str:
    """SQL twin of :func:`fround` (same IEEE ops, same result)."""
    scale = 10**digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def quanta(col: Column, digits: int) -> Column:
    """Exact integer quanta of a d-decimal double (Spark side)."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def quanta_sql(expr: str, digits: int) -> str:
    scale = 10**digits
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def dsum(col: Column, digits: int, out_digits: int | None = None) -> Column:
    """Order-independent exact sum of a d-decimal double, returned as a
    double. ``out_digits`` divides further (e.g. the reference's ÷1e6
    ADA scaling) — still a single exact-operand division."""
    scale = float(10 ** (digits + (out_digits or 0)))
    return F.sum(quanta(col, digits)).cast("double") / F.lit(scale)


def dsum_sql(expr: str, digits: int, out_digits: int | None = None) -> str:
    scale = 10 ** (digits + (out_digits or 0))
    return f"(CAST(sum({quanta_sql(expr, digits)}) AS DOUBLE) / {scale})"


def davg(col: Column, digits: int) -> Column:
    """Exact-numerator average: quanta sum / (count · 10^d)."""
    scale = float(10**digits)
    return F.sum(quanta(col, digits)).cast("double") / (
        F.count(F.lit(1)).cast("double") * F.lit(scale)
    )


def davg_sql(expr: str, digits: int) -> str:
    scale = 10**digits
    return (
        f"(CAST(sum({quanta_sql(expr, digits)}) AS DOUBLE)"
        f" / (CAST(count(*) AS DOUBLE) * {scale}))"
    )


# hex digit → int as portable SQL (DuckDB lacks conv(); a CASE table
# keeps md5-derived uniform draws engine-identical). Shared by every
# md5-bucketing oracle (shard shuffle, fold assignment).
HEX_DIGIT_SQL = (
    "CASE {col} "
    + " ".join(f"WHEN '{d}' THEN {int(d, 16)}" for d in "0123456789abcdef")
    + " END"
)


def md5_bucket_sql(expr: str, n: int) -> str:
    """First-two-hex-digits md5 bucket of ``expr`` in [0, n) — DuckDB
    twin of ``conv(substr(md5(expr), 1, 2), 16, 10) % n``."""
    h = f"md5({expr})"
    return (
        f"(16 * ({HEX_DIGIT_SQL.format(col=f'substr({h}, 1, 1)')})"
        f" + ({HEX_DIGIT_SQL.format(col=f'substr({h}, 2, 1)')})) % {n}"
    )
