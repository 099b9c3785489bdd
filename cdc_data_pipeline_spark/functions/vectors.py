"""Vector math over ``array<float>`` embedding columns.

Native higher-order functions (``zip_with`` + ``aggregate``) keep the
arithmetic JVM-side — no Python boundary crossing per row. All math is
done in DOUBLE so a DuckDB oracle (unnest + sum of products) matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _as_col(a), _as_col(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    a = _as_col(a)
    sq = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return F.sqrt(sq)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _as_col(a), _as_col(b)
    diffs = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))
