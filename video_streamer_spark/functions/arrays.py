"""Vector/array column expressions — all JVM-side (no Python UDFs).

Embedding math stays inside whole-stage codegen via ``zip_with`` +
``aggregate`` higher-order functions: a 64-dim dot product compiles to a
tight generated loop, no Arrow round-trip. At 100 TB this is the
difference between a scan-speed similarity pass and a Python bottleneck.

Elements are cast to double *before* accumulation so Spark's fold and
DuckDB's list_dot_product see identical operand values; both accumulate
sequentially over the array, so results match to the last bit for dim≤64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i as a codegen'd fold (reference for Q18-style similarity)."""
    pa, pb = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(pa, pb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    pa = _as_double_array(a)
    return F.sqrt(
        F.aggregate(pa, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (|a||b|); NULL-safe on zero norms."""
    d = dot_product(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
