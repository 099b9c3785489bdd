"""HALF_UP rounding for the numpy (Arrow) engines.

Spark's ``F.round`` and DuckDB's ``ROUND`` round ties AWAY FROM ZERO
(java.math.RoundingMode.HALF_UP over the decimal rendering), while
``np.round`` is banker's round-half-to-even — a distance or cosine
landing exactly on the rounding grid would round differently across
engines and could flip an argmin/argmax tiebreak. Every Arrow-engine
rounding in this repo goes through ``round_half_up`` so the grid
semantics match the native/oracle path.

Residual caveat (documented, not hidden): the SUMMATION ORDER still
differs — numpy matmul/einsum use blocked/pairwise accumulation while
the native fold is strictly left-to-right — so a value within one ulp
of a grid boundary can still land on different sides. Cross-engine
agreement is therefore pinned empirically by the engine-agreement
tests on the fixture data; the native engine remains the
oracle-checked path.
"""

from __future__ import annotations


def round_half_up(a, decimals: int):
    """Vectorized HALF_UP: round(|a| * 10^d + 0.5 -> floor) with the
    sign restored (ties away from zero). ``+ 0.0`` normalizes -0.0."""
    import numpy as np

    s = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * s + 0.5) / s + 0.0
