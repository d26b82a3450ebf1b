"""Shared helpers for operator implementations.

Numeric convention for cross-engine (Spark vs DuckDB oracle) exactness:
money doubles are cast to DECIMAL(18,2) *before* arithmetic and all
sums/products stay decimal-exact internally (no rounding casts —
Spark and DuckDB disagree on cast rounding modes at the last digit).
FINAL output columns are then cast to DOUBLE on both sides: the
correctness driver compares pandas-stringified values, where a Spark
Decimal renders '23.4000' but a DuckDB decimal surfaces as float64
'23.4'. Casting the same exact decimal to double is deterministic on
both engines, so the rendered strings agree. Averages are
CAST(exact_decimal_sum AS DOUBLE) / COUNT so both engines perform the
identical IEEE division.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MONEY = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal, scale 4."""
    return dec("l_extendedprice") * (F.lit(1).cast(MONEY) - dec("l_discount"))


def avg_of(sum_col: Column, count_col: Column) -> Column:
    return (sum_col.cast("double") / count_col).cast("double")
