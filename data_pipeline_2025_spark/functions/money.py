"""Exact-decimal money math helpers.

The oracle-parity rule of this engine (SURVEY.md §7 "hard parts" #1):
floating-point aggregation is order-dependent, so every money/metric
pipeline casts its double inputs to bounded decimals FIRST, does all
arithmetic exactly in decimal (keeping precision within 38 so no
engine rounds), and only casts the FINAL value to double. Two engines
computing the same exact rational then rounding once to the nearest
IEEE double produce bit-identical results.

Precision budget (inputs are < 10^8 with ≤2-4 decimals):
  money  decimal(12,2)   rate decimal(6,4)
  money * (1±rate)              → decimal(20,6)
  money * (1±rate) * (1±rate)   → decimal(28,10)
  sum(...)                      → decimal(38,s)   (still exact)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Cast to an exact decimal; the first step of every money chain."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dec_lit(value: str, precision: int = 6, scale: int = 4) -> Column:
    """An exact decimal literal (e.g. dec_lit('1.0000'))."""
    return F.lit(value).cast(f"decimal({precision},{scale})")


def to_double(c: Column) -> Column:
    """Final cast of an exact decimal to double (bit-deterministic)."""
    return c.cast("double")


def money_out(c: Column, scale: int = 2) -> Column:
    """Round an exact decimal aggregate, then cast to double.

    The round is NOT cosmetic: a decimal with >15 significant digits
    (e.g. a scale-10 sum in the 1e8 range) converts to double
    differently across engines (DuckDB computes int128/10^scale with
    two float roundings; Spark rounds correctly). Rounding first
    keeps the unscaled integer < 2^53, making both casts exact and
    bit-identical. Both engines round decimals half-away-from-zero.
    Oracle side must apply the same ROUND(x, scale).
    """
    return F.round(c, scale).cast("double")
