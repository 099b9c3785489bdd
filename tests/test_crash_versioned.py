"""Crash-point fault injection over the VERSIONED-TABLE publish
protocol (VERDICT r9 #1) — the third and last persisted protocol to
get the kill-at-every-FS-mutation treatment (`test_crash_protocol.py`
sweeps the bucketed-table and LSM families).

Every protocol FS mutation in ``sources/versioned.py`` — the
version-directory data write (``_write_data``) and the atomic local
publishes of the pointer and the run-audit records (``_replace_file``)
— is a kill site, over a composed lifecycle: two ``materialize``
builds of a two-model DAG (the dbt-build path of
``plans/registry.py``), a materialize whose SECOND model fails its
quality gate mid-build (the r9-named window class: crash composing
with a quality-gate failure), the post-fix re-run, a pointer rollback,
a publish on top of the rollback (dead-fork history), and both vacuum
flavors. For EVERY K the lifecycle is killed at its K-th mutation,
reader safety is asserted IN the crash window (any table that had a
published version still reads it — the pointer never references
partial data), then the crashed step is REPLAYED and the rest runs to
completion.

Convergence contract (deliberately different from the bucketed feed's
commit-NAME identity): the versioned protocol's consumer surface is
the pointer, not version arithmetic — a replayed publish mints a NEW
version exactly like a dbt re-run mints a new run, so version ids are
append-only audit, not replayed state. What must be identical to the
fault-free golden run: the pointer-resolved CONTENT of every table,
the rollback-to-oldest content, and the set of models with audit
records; what must hold in every end state: ``fsck_versioned`` deep
audit reports zero errors, and the newest run record per model counts
exactly the rows the pointer serves.

Reference parity: the reference's ClickHouse tables get this
atomicity from ALTER TABLE parts (base_loader.py:241-249); the manual
re-run ritual (README.md:69-88) is here made mechanical and total.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.quality import (
    DataQualityError, expect_not_null, expect_unique)
from cdc_data_pipeline_spark.plans.registry import (
    ModelRegistry, materialize)
from cdc_data_pipeline_spark.sources import versioned
from cdc_data_pipeline_spark.sources.versioned import (
    current_version, fsck_versioned, list_versions, publish_pointer,
    publish_version, read_runs, read_versioned, vacuum_versions)


class InjectedCrash(Exception):
    pass


class _Injector:
    """Counts protocol FS mutations; raises at the armed K-th one —
    raising BEFORE the mutation simulates a crash in the window after
    mutation K-1 (same discipline as test_crash_protocol.py)."""

    def __init__(self):
        self.n = 0
        self.fail_at = None

    def tick(self):
        self.n += 1
        if self.fail_at is not None and self.n == self.fail_at:
            raise InjectedCrash(f"injected crash at FS mutation "
                                f"#{self.n}")


@pytest.fixture
def injector(monkeypatch):
    inj = _Injector()
    real_write = versioned._write_data
    real_replace = versioned._replace_file

    def write_data(df, path):
        inj.tick()
        real_write(df, path)

    def replace_file(src, dst):
        inj.tick()
        real_replace(src, dst)

    monkeypatch.setattr(versioned, "_write_data", write_data)
    monkeypatch.setattr(versioned, "_replace_file", replace_file)
    return inj


ROWS_1 = [(1, "a", 10), (2, "b", 20), (3, "a", 30)]
ROWS_2 = [(1, "a", 11), (2, "b", 20), (4, "c", 40)]
ROWS_BAD = [(1, "a", 11), (2, None, 20), (5, "d", 50)]   # null group key
ROWS_3 = [(1, "a", 12), (2, "b", 21), (5, "d", 50)]
EXTRA = [(9, "z", 90)]
SCHEMA = "k long, v string, amt long"


def _registry(spark, rows) -> ModelRegistry:
    reg = ModelRegistry()
    reg.add_source("src", spark.createDataFrame(rows, SCHEMA))

    @reg.model("stg", deps=("src",))
    def stg(src):
        return src.filter(F.col("k") > 0)

    @reg.model("mart", deps=("stg",))
    def mart(stg):
        return (stg.groupBy("v").agg(F.sum("amt").alias("total"))
                .orderBy("v"))

    return reg


def _checks():
    return {"stg": [lambda df: expect_unique(df, ["k"])],
            "mart": [lambda df: expect_not_null(df, ["v"])]}


def _steps(spark, base: str):
    stg = f"{base}/stg"

    def mat(rows):
        def run():
            materialize(_registry(spark, rows), spark, base,
                        sources=("src",), checks=_checks())
        return run

    def mat_fail():
        # stg passes and publishes; mart's not_null gate trips on the
        # null group key — the quality-gate abort composes with
        # whatever crash window this step is killed in
        with pytest.raises(DataQualityError):
            materialize(_registry(spark, ROWS_BAD), spark, base,
                        sources=("src",), checks=_checks())

    def rollback():
        publish_pointer(stg, list_versions(stg)[0])

    def pub_extra():
        publish_version(spark.createDataFrame(EXTRA, SCHEMA), stg)

    def vac():
        for t in ("stg", "mart"):
            vacuum_versions(f"{base}/{t}", keep_last=2)

    def vac_sweep():
        for t in ("stg", "mart"):
            vacuum_versions(f"{base}/{t}", keep_last=2,
                            sweep_unpublished=True)

    return [
        ("mat_1", mat(ROWS_1)),
        ("mat_2", mat(ROWS_2)),
        ("mat_fail_gate", mat_fail),
        ("mat_fix", mat(ROWS_3)),
        ("rollback_stg", rollback),
        ("pub_after_rollback", pub_extra),
        ("vacuum", vac),
        ("vacuum_sweep", vac_sweep),
    ]


def _content(spark, path):
    return sorted(tuple(r) for r in read_versioned(spark, path)
                  .collect())


def _state(spark, base: str) -> dict:
    """The protocol's consumer-visible promises, collected for
    golden-equality: pointer-resolved content per table and the set
    of models the audit trail covers (NOT version ids — see module
    docstring)."""
    runs = read_runs(spark, base)
    return {
        "stg": _content(spark, f"{base}/stg"),
        "mart": _content(spark, f"{base}/mart"),
        "models_recorded": sorted(
            r["model"] for r in runs.select("model").distinct()
            .collect()),
    }


def _assert_invariants(spark, base: str, label: str):
    """End-state invariants that must hold in EVERY converged run,
    golden or post-crash: deep fsck zero-errors on both tables, and
    the newest audit record per model counts the rows the pointer
    serves."""
    runs = read_runs(spark, base)
    for t in ("stg", "mart"):
        p = f"{base}/{t}"
        rep = fsck_versioned(spark, p, deep=True)
        assert rep["ok"], f"{label}: fsck {t}: {rep['findings']}"
        newest = (runs.filter(F.col("model") == t)
                  .orderBy(F.col("version").desc()).first())
        assert newest is not None, f"{label}: no audit record for {t}"
        served = read_versioned(spark, p).count()
        if t == "mart":
            # mart's pointer always names its newest version (never
            # rolled back in this lifecycle)
            assert newest["rows"] == served, \
                f"{label}: audit rows {newest['rows']} != served {served}"


def _reader_safe(spark, base: str, ptr_before: dict, label: str):
    """IN the crash window, before any recovery: every table that had
    a published version still serves a complete one."""
    for t, had in ptr_before.items():
        p = f"{base}/{t}"
        if had is None:
            continue
        cur = current_version(p)
        assert cur is not None, f"{label}: {t} lost its pointer"
        got = read_versioned(spark, p)
        assert got.count() >= 0    # materializes the scan: no partials
        rep = fsck_versioned(spark, p, deep=True)
        bad = [f for f in rep["findings"] if f["severity"] == "error"]
        assert not bad, f"{label}: {t} errors in crash window: {bad}"


def test_crash_sweep_every_versioned_mutation(spark, tmp_path, injector):
    golden_base = str(tmp_path / "golden")
    ckpt = tmp_path / "ckpt"

    steps = _steps(spark, golden_base)
    boundaries = [0]
    Path(golden_base).mkdir()
    shutil.copytree(golden_base, str(ckpt / "s0"))
    for i, (_name, run) in enumerate(steps):
        run()
        boundaries.append(injector.n)
        shutil.copytree(golden_base, str(ckpt / f"s{i + 1}"))
    n_mutations = injector.n
    golden = _state(spark, golden_base)
    _assert_invariants(spark, golden_base, "golden")
    # the lifecycle must be substantial: 2 mutations per publish
    # (data dir + pointer) + 1 per run record, across >= 7 publishes
    assert n_mutations >= 20, f"lifecycle unexpectedly thin: {n_mutations}"

    def step_of(k: int) -> int:
        for i in range(len(steps)):
            if boundaries[i] < k <= boundaries[i + 1]:
                return i
        raise AssertionError(k)

    base = str(tmp_path / "run")
    failures = []
    for k in range(1, n_mutations + 1):
        s = step_of(k)
        shutil.rmtree(base, ignore_errors=True)
        shutil.copytree(str(ckpt / f"s{s}"), base)
        ptr_before = {t: current_version(f"{base}/{t}")
                      if os.path.isdir(f"{base}/{t}") else None
                      for t in ("stg", "mart")}
        run_steps = _steps(spark, base)
        injector.n = boundaries[s]
        injector.fail_at = k
        try:
            with pytest.raises(InjectedCrash):
                run_steps[s][1]()
        except BaseException as exc:
            failures.append((k, run_steps[s][0], f"arm: {exc}"))
            injector.fail_at = None
            continue
        injector.fail_at = None
        try:
            # reader safety inside the crash window, before recovery
            _reader_safe(spark, base, ptr_before,
                         f"K={k} ({run_steps[s][0]})")
            # REPLAY the crashed step, run the rest to completion
            for _name, run in run_steps[s:]:
                run()
            got = _state(spark, base)
            for key in golden:
                assert got[key] == golden[key], \
                    f"K={k} (step {run_steps[s][0]}): {key} diverged"
            _assert_invariants(spark, base,
                               f"K={k} ({run_steps[s][0]})")
        except BaseException as exc:
            failures.append((k, run_steps[s][0], str(exc)[:200]))
    assert not failures, (
        f"{len(failures)}/{n_mutations} crash points failed to "
        f"converge: {failures[:5]}")
