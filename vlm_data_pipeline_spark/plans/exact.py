"""Exact cross-engine float aggregation.

Summing doubles is order-dependent, so Spark and DuckDB disagree in the last
ulps — and ``round()`` can't repair that when the true value sits exactly on a
rounding boundary (an avg of 2-decimal money over an even group size does
this constantly). The fix: aggregate in *exact integer* space.

- fixed-decimal inputs (money, discounts): scale to integer "cents"
  (``round(x * 10^s)`` is exact — the double is within 1e-9 of the true
  k-decimal value), sum as BIGINT (exact, associative), then ONE IEEE
  division back to double — bit-identical in every engine.
- continuous doubles: quantize to a documented precision first, then the
  same integer sum. The quantization is part of the operator's contract.

This also scales: BIGINT sums never lose precision where a double sum over
10^9 rows drifts by whole units.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------- Spark side ----------------


def to_scaled_long(col: Column, scale: int = 2) -> Column:
    """Exact integer representation of a fixed-decimal double."""
    return F.round(col * (10**scale)).cast("long")


def exact_sum(col: Column, scale: int = 2) -> Column:
    """Deterministic sum of a fixed-decimal double, as double."""
    return F.sum(to_scaled_long(col, scale)).cast("double") / float(10**scale)


def exact_avg(col: Column, scale: int = 2) -> Column:
    """Deterministic average of a fixed-decimal double, as double."""
    return F.sum(to_scaled_long(col, scale)).cast("double") / (
        F.count(col).cast("double") * float(10**scale)
    )


# ---------------- DuckDB side ----------------


def duck_scaled_long(expr: str, scale: int = 2) -> str:
    return f"cast(round(({expr}) * {10**scale}) as BIGINT)"


def duck_exact_sum(expr: str, scale: int = 2) -> str:
    return f"(cast(sum({duck_scaled_long(expr, scale)}) as DOUBLE) / {float(10**scale)})"


def duck_exact_avg(expr: str, scale: int = 2) -> str:
    return (
        f"(cast(sum({duck_scaled_long(expr, scale)}) as DOUBLE)"
        f" / (cast(count({expr}) as DOUBLE) * {float(10**scale)}))"
    )
