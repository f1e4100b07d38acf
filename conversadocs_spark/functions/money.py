"""Exact decimal arithmetic for money expressions.

Why this exists: ``l_extendedprice * (1-l_discount) * (1+l_tax)`` in
DOUBLE differs between engines at the ULP level (multiply association /
codegen differences), so casting the double product to DECIMAL rounds
half-boundary values in different directions — measured: ~23% of rows
differ in the 4th decimal between Spark and DuckDB on the fixture data.

The fixture money columns are exact 2-decimal values (verified:
round(x,2)==x for l_extendedprice/l_discount/l_tax/o_totalprice), so
casting the COLUMNS to decimal first and doing the arithmetic in
decimal is exact, associative, and engine-independent. Precisions are
kept tight so chained products stay within DuckDB's 38-digit cap.

Matching DuckDB SQL fragments for oracles:
    CAST(l_extendedprice AS DECIMAL(12,2))
        * (1 - CAST(l_discount AS DECIMAL(4,2)))                -- scale 4
    ... * (1 + CAST(l_tax AS DECIMAL(4,2)))                     -- scale 6
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: str | Column, precision: int = 12) -> Column:
    """Exact 2-dp money column as DECIMAL(precision,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},2)")


def rate(col: str | Column) -> Column:
    """Exact 2-dp rate (discount/tax) as DECIMAL(4,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(4,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact, DECIMAL(18,4).

    Intermediate casts are exact (values fit, scale never shrinks);
    they only keep chained products inside the 38-digit decimal cap
    on both engines.
    """
    one_minus = (F.lit(1) - rate("l_discount")).cast("decimal(4,2)")
    return (money("l_extendedprice") * one_minus).cast("decimal(18,4)")


def charge() -> Column:
    """l_extendedprice * (1-l_discount) * (1+l_tax), exact, DECIMAL(24,6)."""
    one_plus = (F.lit(1) + rate("l_tax")).cast("decimal(4,2)")
    return (disc_price() * one_plus).cast("decimal(24,6)")


# --------------------------------------------------------------------------
# scaled-integer fast path (exact, same values as the decimal forms)
# --------------------------------------------------------------------------
#
# BigDecimal multiplies dominate the decimal formulation's per-row cost
# (measured at sf0.1: TPC-H-Q1-shaped agg 1.45s decimal vs 0.78s with
# this path, identical output). Because every money/rate column is an
# exact 2-dp value, the products are exact in scaled-integer (long)
# arithmetic:
#
#   disc_e4   = price_cents * (100 - disc_cents)            <= ~1e9/row
#   charge_e6 = disc_e4 * (100 + tax_cents)                 <= ~4.2e11/row
#
# Per-row longs never overflow. SUMS of the wide products must NOT
# accumulate in long at scale (9.2e18 / 4.2e11 ~= 2.2e7 rows/group for
# charge_e6 — fine at test sf, overflow at 100 TB), so `sum_scaled`
# accumulates in DECIMAL(28,0): one cheap integral-decimal add per row
# instead of 2-3 BigDecimal multiplies, ~2e16 rows/group of headroom.
# Narrow inputs (quantity cents <= 5e3/row -> ~2e15 rows/group of long
# headroom) may sum in plain long via `sum_cents`.
#
# Output typing: SUM columns are emitted as round(double, 2) — cents.
# Cross-engine round(double, d) only agrees while |sum|*10^d < 2^53
# (DuckDB's float round is identity beyond that; Spark's BigDecimal
# round is exact), so product-scale rounding (4/6 dp) diverged at a
# ~5e10 sum in 10x-scale gate runs. Cents hold to |sum| ~ $9e13 per
# group; past that, emit the exact DECIMAL and compare as strings
# instead of doubles.


def cents(col: str | Column, scale: int = 100) -> Column:
    """Exact scaled-integer of a 2-dp column: round(x*scale) as long.
    The round() absorbs the one-ulp error of double multiplication
    (e.g. 1.15*100 == 114.99999...); exactness holds because the
    fixture money columns are true 2-dp values (verified, see module
    docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale, 0).cast("long")


def disc_price_e4() -> Column:
    """l_extendedprice * (1 - l_discount) as a long with 4 implied
    decimals — exact, equal to ``disc_price()`` after /1e4."""
    return cents("l_extendedprice") * (
        F.lit(100).cast("long") - cents("l_discount")
    )


def charge_e6() -> Column:
    """l_extendedprice * (1-l_discount) * (1+l_tax) as a long with 6
    implied decimals — exact, equal to ``charge()`` after /1e6."""
    return disc_price_e4() * (F.lit(100).cast("long") + cents("l_tax"))


def sum_scaled(col: str | Column, scale: int) -> Column:
    """Overflow-safe exact sum of a scaled-integer column, descaled to
    a DOUBLE (caller rounds). DECIMAL(28,0) accumulation: exact at any
    realistic group size, integral adds only."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("decimal(28,0)")) / scale).cast("double")


def sum_cents(col: str | Column, scale: int = 100) -> Column:
    """Plain long sum for NARROW scaled columns only (per-row value
    <= ~1e4, e.g. quantity/discount cents: >= 1e14 rows/group before
    overflow). Descaled to DOUBLE; caller rounds."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c) / scale).cast("double")


# SQL fragments for DuckDB oracles (keep in sync with the above)
SQL_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"
    " AS DECIMAL(18,4))"
)
SQL_CHARGE = (
    "CAST(" + SQL_DISC_PRICE
    + " * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))"
    " AS DECIMAL(24,6))"
)
