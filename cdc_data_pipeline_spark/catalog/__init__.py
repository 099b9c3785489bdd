"""Query catalog: every implemented operator exposed as a named query
(spark, sf_dir) -> DataFrame with (where expressible) a DuckDB oracle.

This is the engine's conformance surface — SURVEY.md §2 operator IDs are
noted on each entry.
"""

from cdc_data_pipeline_spark.catalog import analytics, core, ext, ingest, tpch

_MODULES = (core, analytics, ingest, tpch, ext)


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
