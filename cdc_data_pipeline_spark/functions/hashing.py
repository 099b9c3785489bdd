"""Deterministic cross-engine uniform hashing.

One primitive underlies the sampling / sketch operators: a
reproducible map ``value -> uniform double in [0, 1)`` that both Spark
and an ANSI-SQL oracle (DuckDB) compute bit-identically. md5 is the
only hash both engines share, so:

    u(x) = int64(first 15 hex chars of md5(seed|x)) / 2^60

15 hex chars = 60 bits — exact in int64 and in an IEEE double's 53-bit
mantissa path the same way on both engines (single division by a power
of two, no rounding drift).

md5 is the slow-but-oracle-able choice; for purely-internal sampling
(no conformance oracle) pass ``fast=True`` to use ``xxhash64``
(JVM-native, ~10x cheaper) with the same [0,1) contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_60 = float(1 << 60)


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def uniform_hash(col: Column | str, seed: int = 0, fast: bool = False) -> Column:
    """Deterministic uniform double in [0, 1) from a value + seed.

    Partition-local (no shuffle), codegen'd. Reproducible across runs,
    engines, and cluster sizes — unlike ``F.rand`` whose draw depends
    on partition layout, this is a pure function of the VALUE, which is
    what makes sampling decisions re-derivable at 100 TB (a re-run or a
    backfill selects the exact same rows).
    """
    salted = F.concat(F.lit(f"{seed}|"), _as_col(col).cast("string"))
    if fast:
        # xxhash64 returns a signed long; fold to [0, 2^60) via
        # unsigned shift (4 bits off the top keeps it positive-exact)
        h = F.shiftrightunsigned(F.xxhash64(salted), 4)
        return h.cast("double") / F.lit(TWO_60)
    h = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
    return h.cast("double") / F.lit(TWO_60)


def uniform_hash_sql(expr: str, seed: int = 0) -> str:
    """The DuckDB-side twin of ``uniform_hash`` for oracle SQL."""
    return (f"(('0x' || substr(md5('{seed}|' || ({expr})::VARCHAR), 1, 15))::BIGINT"
            f" / {int(TWO_60)}.0)")


def py_uniform_hash(value: str, seed: int = 0) -> float:
    """Pure-Python twin of ``uniform_hash``'s md5 path (same salted
    md5 -> first 15 hex chars -> /2^60). For test references and
    driver-side spot checks; data paths use the Column form."""
    import hashlib

    h = int(hashlib.md5(f"{seed}|{value}".encode()).hexdigest()[:15], 16)
    return h / TWO_60
