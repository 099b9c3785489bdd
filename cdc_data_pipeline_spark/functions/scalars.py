"""Scalar function surface (SURVEY §2.5 F1-F14).

All native Column expressions — no UDFs, everything stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LAGOS_TZ = "Africa/Lagos"  # UTC+1, no DST — reference display timezone


def full_name(first: Column | str, last: Column | str) -> Column:
    """F1: ``concat(first, ' ', last)`` (reference dim_users.sql:8)."""
    return F.concat_ws(" ", F.col(first) if isinstance(first, str) else first,
                       F.col(last) if isinstance(last, str) else last)


def to_lagos(ts: Column | str) -> Column:
    """F2: ``toTimeZone(ts, 'Africa/Lagos')`` (stg_savings_plan.sql:17-18).

    Lagos is a fixed UTC+1 offset (no DST), so this is exactly
    ``ts + INTERVAL 1 HOUR`` — expressed that way so a DuckDB oracle
    reproduces it bit-for-bit.
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    return col + F.expr("INTERVAL 1 HOUR")


def month_start(ts: Column | str) -> Column:
    """F4: ``toStartOfMonth(ts)`` (init-clickhouse.sql:37) — partition key."""
    return F.date_trunc("month", F.col(ts) if isinstance(ts, str) else ts)


def parse_staged_timestamp(col: Column | str) -> Column:
    """F11/F12: parse the reference's staged ``%Y-%m-%d %H:%M:%S`` strings."""
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col, "yyyy-MM-dd HH:mm:ss")


def json_get(col: Column | str, path: str) -> Column:
    """F14: JSON field extraction (staging round-trip, base_loader.py:130)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, f"$.{path}")
