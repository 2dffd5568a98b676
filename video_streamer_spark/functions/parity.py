"""Cross-engine determinism helpers.

The correctness gate hash-compares Spark results against a DuckDB oracle,
so every floating/temporal output column must be *bit-identical* across
engines. Three rules, applied on BOTH sides:

1. **Aggregate in DECIMAL, not DOUBLE.** Double summation is
   order-dependent (different partial-agg trees on Spark vs DuckDB give
   ~1e-9 relative noise, which survives ROUND on large sums). Casting the
   inputs to DECIMAL(18,6) makes every sum exact and order-independent.

2. **Round via DECIMAL(38,9).** Spark's ROUND(double) goes through Java's
   shortest-round-trip string (HALF_UP on the decimal rendering) while
   DuckDB rounds the scaled binary double — they disagree on values whose
   shortest rendering ends in 5 (e.g. 100.25*1.1). Rounding the
   DECIMAL(38,9) cast first absorbs the binary noise at 1e-9 and makes
   both engines apply away-from-zero on the same decimal value.

3. **Render timestamps/dates as strings** with one explicit format, in
   UTC, so engine-native temporal encodings never reach the hasher.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def dec(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Cast to exact decimal before arithmetic/aggregation (rule 1)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DecimalType(precision, scale))


def _round_via_decimal(col: Column | str, places: int, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast(DecimalType(38, scale)), places).cast("double")


def round2(col: Column | str) -> Column:
    """ROUND(x, 2) with cross-engine-stable semantics (rule 2)."""
    return _round_via_decimal(col, 2, 9)


def round4(col: Column | str) -> Column:
    """ROUND(x, 4) for similarity scores; absorbs <5e-13 fp noise."""
    return _round_via_decimal(col, 4, 12)


def ts_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def date_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c.cast("date"), "yyyy-MM-dd")


# DuckDB-side SQL fragments implementing the same rules, for oracle text.
def sql_round2(expr: str) -> str:
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(38,9)), 2) AS DOUBLE)"


def sql_round4(expr: str) -> str:
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(38,12)), 4) AS DOUBLE)"


def sql_dec(expr: str, precision: int = 18, scale: int = 6) -> str:
    return f"CAST(({expr}) AS DECIMAL({precision},{scale}))"
