"""Hash-stable numeric expression helpers.

The driver's correctness gate compares Spark and DuckDB results by value
hash, so floating-point outputs must be **bitwise identical** across
engines. Two rules make that true:

1. Per-row double arithmetic (``+ - * /``, ``sqrt``, ``abs``) is IEEE-754
   and therefore engine-identical when the expression tree matches — emit
   it raw, never ``ROUND`` it (engine ROUND implementations differ at
   representation boundaries: Spark rounds the exact binary value via
   BigDecimal, DuckDB multiplies by 10^s first, which double-rounds).

2. Aggregates over doubles are summation-order-dependent. Instead, cast
   the raw columns to DECIMAL at the scan — the testdata money columns
   hold exact 2-decimal values, so ``double → DECIMAL(18,2)`` is tie-free
   in both engines — do the arithmetic and SUM in exact decimal, and cast
   the final result to DOUBLE. Exact decimal → nearest double is
   deterministic and engine-independent.

DuckDB oracle equivalents are spelled in the SQL strings alongside each
query (``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`` etc.).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Scan-side decimal type for exact-2-decimal money/value columns.
MONEY = "decimal(18,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    """Cast a raw money column to exact decimal for order-independent aggs."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, typ: str = MONEY) -> Column:
    """Exact decimal SUM of a money column, emitted as double.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
    """
    return F.sum(dec(col, typ)).cast("double")


def dsum_expr(expr: Column) -> Column:
    """Exact decimal SUM of an already-decimal expression, emitted as double."""
    return F.sum(expr).cast("double")


def davg(col: str | Column, typ: str = MONEY) -> Column:
    """Order-independent average: exact decimal sum, double division.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)``.
    """
    return F.sum(dec(col, typ)).cast("double") / F.count(F.lit(1))
