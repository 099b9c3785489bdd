"""Model registry + topological pipeline execution (SURVEY §2.7 O1-O3).

Reference orchestration is Dagster assets + dbt-manifest DAG with
upstream-closure selection (dagster_code/jobs/all_jobs.py:24-42,
assets/dbt_assets.py:6-25). Here: a plain registry of named models with
declared dependencies, topologically executed; ``select`` supports the
dbt-style ``+model`` upstream-closure syntax.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


class ModelRegistry:
    def __init__(self) -> None:
        self._models: dict[str, tuple[tuple[str, ...], Callable[..., DataFrame]]] = {}

    def model(self, name: str, deps: tuple[str, ...] = ()):
        """Register ``fn(*dep_frames) -> DataFrame`` as model ``name``."""
        def deco(fn: Callable[..., DataFrame]):
            self._models[name] = (tuple(deps), fn)
            return fn
        return deco

    def add_source(self, name: str, df: DataFrame) -> None:
        self._models[name] = ((), lambda df=df: df)

    def sql_model(self, name: str, sql: str, deps: tuple[str, ...] = ()) -> None:
        """Register a dbt-style SQL model: ``sql`` references each dep
        by its model name as a table (dbt's ``{{ ref('x') }}`` resolves
        to exactly this). Each dep DataFrame is exposed as a temp view
        just before the statement runs, so the SQL sees the CURRENT
        build's frames, then Catalyst folds everything into one logical
        plan — a SQL model and a Python model compose freely in the
        same DAG and cost the same at execution."""
        def fn(*frames: DataFrame) -> DataFrame:
            from pyspark.sql import SparkSession

            spark = (frames[0].sparkSession if frames
                     else SparkSession.getActiveSession())
            for dep_name, df in zip(deps, frames):
                df.createOrReplaceTempView(dep_name)
            return spark.sql(sql)
        self._models[name] = (tuple(deps), fn)

    def upstream_closure(self, name: str) -> list[str]:
        """dbt's ``+model`` selection: the model and everything upstream."""
        seen: list[str] = []

        def visit(n: str) -> None:
            if n in seen:
                return
            deps, _ = self._models[n]
            for d in deps:
                visit(d)
            seen.append(n)

        visit(name)
        return seen

    def topo_order(self) -> list[str]:
        order: list[str] = []
        for n in self._models:
            for m in self.upstream_closure(n):
                if m not in order:
                    order.append(m)
        return order

    def run(self, select: str | None = None) -> dict[str, DataFrame]:
        """Execute models in dependency order; returns name -> DataFrame.

        ``select='+fact_x'`` runs fact_x and its upstream closure only.
        Execution is lazy plan construction — materialization happens
        when the caller writes/collects a result.
        """
        if select:
            # deps must be built to build the model, so non-'+' select
            # still executes the closure; '+' is the dbt-style spelling
            names = self.upstream_closure(select.lstrip("+"))
        else:
            names = self.topo_order()
        out: dict[str, DataFrame] = {}
        for n in names:
            deps, fn = self._models[n]
            out[n] = fn(*[out[d] for d in deps])
        return out


def materialize(registry: ModelRegistry, spark, base_path: str,
                select: str | None = None,
                sources: tuple[str, ...] = (),
                checks: dict | None = None) -> dict[str, int]:
    """``dbt build`` equivalent: execute the selected DAG, run each
    model's data-quality checks, and publish every non-source model as
    a new atomic table version (``sources/versioned.py``). Returns
    name -> published version.

    ``checks`` maps model name -> list of ``fn(df)`` callables (the
    ``operators/quality.expect_*`` family) run BEFORE that model's
    publish — dbt build's run-then-test semantics with a stronger
    guarantee: a failing test means the bad version is never published,
    so downstream readers keep the last good version (dbt materializes
    first and tests after). The check failure aborts the remaining
    build; models already published stay published (idempotent-forward
    re-run after the fix).

    Every publish appends an audit row to ``<base_path>/_runs``
    (run_id, model, version, rows, duration_sec, published_at) — the
    run-history manifest the reference gets from Dagster
    ``Output(rows_loaded, metadata)`` (extract_assets.py:148-159).
    Row counts come from the published parquet footers: no extra scan.

    At scale each model is its own Spark job; nothing holds more than
    one model's write in flight.
    """
    import datetime
    import os
    import time
    import uuid

    from cdc_data_pipeline_spark.sources.versioned import (
        append_run_record, publish_version, published_row_count)

    run_id = uuid.uuid4().hex[:12]
    frames = registry.run(select)
    published: dict[str, int] = {}
    for name, df in frames.items():
        if name in sources:
            continue
        for check in (checks or {}).get(name, ()):
            check(df)
        t0 = time.time()
        table_path = os.path.join(base_path, name)
        # heal_crashed: the dbt-build path is the declared single
        # writer of its model tables, so a replayed build may reclaim
        # the ids of its own crashed (torn, no-_SUCCESS) publishes —
        # raw publish_version stays race-safe by default
        version = publish_version(df, table_path, heal_crashed=True)
        published[name] = version
        append_run_record(base_path, {
            "run_id": run_id,
            "model": name,
            "version": version,
            "rows": published_row_count(table_path, version),
            "duration_sec": round(time.time() - t0, 3),
            "published_at": datetime.datetime.now(datetime.timezone.utc),
        })
    return published
