"""Vector math over ``array<float>`` embedding columns.

Native higher-order functions (``zip_with`` + ``aggregate``) keep the
arithmetic JVM-side — no Python boundary crossing per row. All math is
done in DOUBLE so a DuckDB oracle (unnest + sum of products) matches.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _finite(x, where: str) -> float:
    """repr(nan)/repr(inf) would render 'nanD'/'infD' literals that fail
    SQL analysis with an opaque parse error far from the cause (e.g. a
    degenerate centroid from an empty k-means cell); fail fast here."""
    f = float(x)
    if not math.isfinite(f):
        raise ValueError(f"non-finite literal {f!r} in {where}")
    return f


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


def lit_double_array(values) -> Column:
    """``array<double>`` literal built from ONE SQL string — a single
    py4j round-trip — instead of one JVM call per element. Building
    2.5k per-element ``F.lit`` columns costs ~1s of DRIVER time per
    plan (py4j call latency), which was the PQ/IVF family's dominant
    "sf-invariant" cost. ``repr()`` round-trips float64 exactly and
    Spark parses D-suffixed literals with ``Double.parseDouble``, so
    the resulting plan literals are bit-identical to the ``F.lit``
    form (pinned by the engine-agreement and oracle-parity tests)."""
    return F.expr("array(" + ",".join(
        "%rD" % _finite(x, "lit_double_array") for x in values) + ")")


def lit_id_vector_array(pairs, id_sql_type: str = "INT") -> Column:
    """``array<struct<c:<id_sql_type>, v:array<double>>>`` literal in
    one py4j call: the (id, vector) constant table that argmin/argmax
    ``transform`` projections scan (k-means centroids, IVF cells, PQ
    codebooks)."""
    entries = ",".join(
        "named_struct('c', CAST({} AS {}), 'v', array({}))".format(
            int(cid), id_sql_type,
            ",".join("%rD" % _finite(x, f"lit_id_vector_array id={cid}")
                     for x in v))
        for cid, v in pairs)
    return F.expr("array(" + entries + ")")


def lit_id_vector_map(pairs, id_sql_type: str = "INT") -> Column:
    """``map<<id_sql_type>, array<double>>`` literal in one py4j call:
    constant id -> vector lookup (e.g. IVF cell id -> coarse centroid
    for residual computation)."""
    entries = ",".join(
        "CAST({} AS {}), array({})".format(
            int(cid), id_sql_type,
            ",".join("%rD" % _finite(x, f"lit_id_vector_map id={cid}")
                     for x in v))
        for cid, v in pairs)
    return F.expr("map(" + entries + ")")
