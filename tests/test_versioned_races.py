"""RACING publishers against one versioned pointer table — real
threads with barrier/event steering (VERDICT r10 #3), the same
discipline the bucketed table got in ``test_table_races.py``.

The versioned protocol is single-writer by contract; these tests pin
what the contract PROMISES when that contract is violated anyway:

- publish/publish electing the SAME id: exactly one writer's
  ``mode=error`` data write fails LOUDLY before its pointer ever
  moves (ADVICE r10: the pre-r10 behavior, restored by making the
  crash-heal sweep opt-in); the loser re-runs and mints the next id.
- heal/publish with the healer sweeping FIRST: the competitor elects
  the reclaimed id — deterministic same-id collision, same loud
  outcome. This is exactly why ``heal_crashed`` demands a declared
  single writer; the test pins that even the misuse cannot corrupt
  published state.
- heal/publish with the competitor electing FIRST: ids diverge (the
  competitor mints past the torn dir it saw; the healer reclaims the
  swept id), both succeed, the pointer is last-wins.

In EVERY outcome: the pointer resolves to a complete, readable
version; ``fsck_versioned(deep=True)`` reports zero errors; no
already-published version is ever touched.
"""

from __future__ import annotations

import os
import threading
import types

import pytest

from pyspark.sql import functions as F

from cdc_data_pipeline_spark.sources import versioned
from cdc_data_pipeline_spark.sources.versioned import (
    current_version,
    fsck_versioned,
    list_versions,
    publish_version,
    read_versioned,
)


def _df(spark, n, tag):
    return spark.range(n).select(F.col("id"), F.lit(tag).alias("tag"))


def _run_two(fn_a, fn_b):
    errs: dict[str, BaseException | None] = {"a": None, "b": None}

    def wrap(name, fn):
        def run():
            try:
                fn()
            except BaseException as exc:
                errs[name] = exc
        return threading.Thread(target=run, name=f"racer-{name}")

    ta, tb = wrap("a", fn_a), wrap("b", fn_b)
    ta.start(); tb.start()
    ta.join(300); tb.join(300)
    assert not ta.is_alive() and not tb.is_alive(), "racer deadlocked"
    return errs


def _assert_sane(spark, t):
    """The invariants that must hold in EVERY race outcome."""
    cur = current_version(t)
    assert cur is not None and cur in list_versions(t)
    assert read_versioned(spark, t).count() >= 0
    rep = fsck_versioned(spark, t, deep=True)
    assert rep["errors"] == 0, rep["findings"]


def _serialize_writes(monkeypatch, elect_gate):
    """Steered ``_write_data``: hold both racers at the seam until
    BOTH have elected their version id, then serialize the writes so
    the second write deterministically observes the first's directory
    (the unsteered hazard is both passing mode=error's existence
    check together — see module docstring of sources/versioned.py)."""
    real = versioned._write_data
    write_lock = threading.Lock()

    def steered(df, path):
        try:
            elect_gate.wait()
        except threading.BrokenBarrierError:
            pass
        with write_lock:
            real(df, path)

    monkeypatch.setattr(versioned, "_write_data", steered)


def test_steered_publish_publish_same_id(spark, tmp_path, monkeypatch):
    """Both publishers elect v=2 (barrier-steered); the serialized
    second write fails loudly on mode=error BEFORE its pointer moves;
    the winner's publish is intact; the loser's documented recovery
    (re-run) mints v=3."""
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "base"), t)

    gate = threading.Barrier(2, timeout=120)
    _serialize_writes(monkeypatch, gate)
    errs = _run_two(lambda: publish_version(_df(spark, 5, "A"), t),
                    lambda: publish_version(_df(spark, 7, "B"), t))
    monkeypatch.undo()

    raised = [n for n, e in errs.items() if e is not None]
    assert len(raised) == 1, errs          # exactly one loud failure
    assert list_versions(t) == [1, 2]
    assert current_version(t) == 2
    got = read_versioned(spark, t)
    assert got.count() in (5, 7)           # the winner's payload, whole
    _assert_sane(spark, t)
    # the loser re-runs (the documented recovery) and mints the next id
    loser_rows = 7 if got.count() == 5 else 5
    assert publish_version(_df(spark, loser_rows, "retry"), t) == 3
    assert read_versioned(spark, t).count() == loser_rows
    _assert_sane(spark, t)


def _patch_rmtree(monkeypatch, hook):
    """Wrap the module's shutil.rmtree (the heal sweep's deletion
    seam) without touching the global shutil module."""
    import shutil as real_shutil

    def rmtree(path, **kw):
        hook(path)
        real_shutil.rmtree(path, **kw)

    monkeypatch.setattr(
        versioned, "shutil",
        types.SimpleNamespace(rmtree=rmtree))


def test_steered_heal_sweeps_then_competitor_elects(spark, tmp_path,
                                                    monkeypatch):
    """heal/publish, collision ordering: the healer sweeps the torn
    v=2 FIRST; the competitor (released by the sweep) then lists a
    clean table and elects the reclaimed id — deterministic same-id
    collision. Exactly one write fails loudly; nothing published is
    lost; re-run converges."""
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "base"), t)
    os.makedirs(os.path.join(t, "v=2"))            # torn crash debris

    swept = threading.Event()
    _patch_rmtree(monkeypatch, lambda path: swept.set())
    gate = threading.Barrier(2, timeout=120)
    _serialize_writes(monkeypatch, gate)

    def healer():
        publish_version(_df(spark, 5, "H"), t, heal_crashed=True)

    def competitor():
        assert swept.wait(120), "healer never swept"
        publish_version(_df(spark, 7, "P"), t)

    errs = _run_two(healer, competitor)
    monkeypatch.undo()

    raised = [n for n, e in errs.items() if e is not None]
    assert len(raised) == 1, errs
    assert list_versions(t) == [1, 2]
    assert current_version(t) == 2
    assert read_versioned(spark, t).count() in (5, 7)
    _assert_sane(spark, t)
    assert publish_version(_df(spark, 9, "retry"), t) == 3
    assert read_versioned(spark, t).count() == 9
    _assert_sane(spark, t)


def test_steered_competitor_elects_then_heal_sweeps(spark, tmp_path,
                                                    monkeypatch):
    """heal/publish, benign ordering: the competitor elects FIRST
    (minting past the torn v=2 it saw → v=3); the healer's sweep is
    held until the competitor reached the write seam, then reclaims
    v=2. Ids diverge, both publishes succeed whole, the pointer is
    last-wins — and deep fsck is green whichever won."""
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "base"), t)
    os.makedirs(os.path.join(t, "v=2"))            # torn crash debris

    # two-way steering: the healer's sweep is held until the
    # competitor has ELECTED (reached the write seam, torn v=2 still
    # in its listing -> id 3), and the competitor's write is held
    # until the healer has elected the reclaimed id 2 (its post-sweep
    # listing must not see the competitor's directory)
    competitor_elected = threading.Event()
    healer_elected = threading.Event()
    real_write = versioned._write_data

    def steered_write(df, path):
        if threading.current_thread().name == "racer-b":
            competitor_elected.set()
            assert healer_elected.wait(120), "healer never elected"
        else:
            healer_elected.set()
        real_write(df, path)

    monkeypatch.setattr(versioned, "_write_data", steered_write)
    _patch_rmtree(
        monkeypatch,
        lambda path: competitor_elected.wait(120))

    def healer():
        publish_version(_df(spark, 5, "H"), t, heal_crashed=True)

    def competitor():
        publish_version(_df(spark, 7, "P"), t)

    errs = _run_two(healer, competitor)
    monkeypatch.undo()

    assert errs["a"] is None and errs["b"] is None, errs
    assert list_versions(t) == [1, 2, 3]
    assert current_version(t) in (2, 3)            # last pointer wins
    counts = {read_versioned(spark, t, version=2).count(),
              read_versioned(spark, t, version=3).count()}
    assert counts == {5, 7}                        # both landed whole
    _assert_sane(spark, t)


def test_unsteered_publish_publish_is_loud_or_clean(spark, tmp_path):
    """The UNSTEERED two-publisher race on a LOCAL path: whatever
    interleaving the scheduler picks, the end state is either two
    clean versions (the elections serialized) or a loud loser — the
    atomic ``os.mkdir`` claim means two same-id writers can NEVER
    both write into one directory, so a silently mixed payload is
    structurally impossible here (on object stores, where no atomic
    claim exists, the single-writer contract covers that window)."""
    t = str(tmp_path / "tbl")
    publish_version(_df(spark, 3, "base"), t)
    errs = _run_two(lambda: publish_version(_df(spark, 5, "A"), t),
                    lambda: publish_version(_df(spark, 7, "B"), t))
    raised = [n for n, e in errs.items() if e is not None]
    assert len(raised) <= 1, errs
    _assert_sane(spark, t)
    if not raised:
        # scheduler serialized the elections: two clean versions
        assert list_versions(t) == [1, 2, 3]
        counts = {read_versioned(spark, t, version=2).count(),
                  read_versioned(spark, t, version=3).count()}
        assert counts == {5, 7}
    else:
        assert isinstance(errs[raised[0]], FileExistsError)
        assert list_versions(t) == [1, 2]
        assert read_versioned(spark, t).count() in (5, 7)


def test_default_vacuum_races_live_pointer_publish(spark, tmp_path,
                                                   monkeypatch):
    """The exact ADVICE-r10 window, raced for real: a publisher is
    BETWEEN its pointer tmp write and the atomic os.replace when a
    DEFAULT vacuum runs. Pre-r11, vacuum unconditionally deleted
    ._LATEST.tmp and the publisher crashed on the vanished file; now
    the default vacuum leaves in-flight state alone and the publish
    completes."""
    t = str(tmp_path / "tbl")
    for i in range(3):
        publish_version(_df(spark, i + 2, f"t{i}"), t)

    in_window = threading.Event()
    vacuumed = threading.Event()
    real_replace = versioned._replace_file

    def steered_replace(src, dst):
        if dst.endswith("_LATEST"):
            in_window.set()                  # tmp written, not swapped
            assert vacuumed.wait(120), "vacuum never ran"
        real_replace(src, dst)

    monkeypatch.setattr(versioned, "_replace_file", steered_replace)

    import cdc_data_pipeline_spark.sources.versioned as v

    def publisher():
        publish_version(_df(spark, 9, "new"), t)

    def vacuumer():
        assert in_window.wait(120), "publisher never reached the window"
        try:
            removed = v.vacuum_versions(t, keep_last=2)  # DEFAULT mode
        finally:
            vacuumed.set()
        # old versions go; the in-flight v=4 (above the pointer) and
        # the publisher's ._LATEST.tmp are left alone
        assert removed == [1, 2]

    errs = _run_two(publisher, vacuumer)
    monkeypatch.undo()
    assert errs["a"] is None and errs["b"] is None, errs
    assert current_version(t) == 4
    assert read_versioned(spark, t).count() == 9
    _assert_sane(spark, t)
