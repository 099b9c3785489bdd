"""Query catalog: every implemented operator exposed as a named query
(spark, sf_dir) -> DataFrame with (where expressible) a DuckDB oracle.

This is the engine's conformance surface — SURVEY.md §2 operator IDs are
noted on each entry.

Two tiers:

- ``queries()`` / ``oracles()`` — the 50 entries exported through
  ``__spark_entry__`` for the driver's conformance check (the driver
  evaluates at most 50; extension modules iterate first as extra
  safety against a lower cap). Rounds rotate which entries ride the
  cap — newly added flagship operators are promoted and redundant
  shapes demoted, never removed.
- ``extra_queries()`` / ``extra_oracles()`` — everything else: shapes
  whose operator machinery also appears in an exported entry, plus
  operators added after the cap filled. They get the identical
  DuckDB-oracle treatment in tests/test_oracle_parity.py on every run,
  so both tiers carry the same correctness evidence.
"""

from cdc_data_pipeline_spark.catalog import analytics, core, ext, ingest, llm, tpch

_MODULES = (ext, llm, core, ingest, analytics, tpch)


def queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return {k: v for k, v in out.items() if v is not None}


def extra_queries():
    out = {}
    for m in _MODULES:
        out.update(getattr(m, "EXTRA_QUERIES", {}))
    return out


def extra_oracles():
    out = {}
    for m in _MODULES:
        out.update(getattr(m, "EXTRA_ORACLES", {}))
    return {k: v for k, v in out.items() if v is not None}
