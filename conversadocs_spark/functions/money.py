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
