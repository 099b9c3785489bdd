"""Generalized MERGE and change-data-feed — the full merge semantics a
warehouse user expects (MERGE INTO ... WHEN MATCHED UPDATE / WHEN
MATCHED DELETE / WHEN NOT MATCHED INSERT), built on one full-outer
key join (the reference's delete+insert strategy, base_loader.py:275-338,
implements only the update-or-insert subset).

Scale notes: ONE key-equi full-outer join between target and source
decides every row's fate via case routing — the target is scanned
once (the previous formulation ran four separate semi/anti joins
against it). The source (change-batch) side is small in the CDC case,
so AQE picks a broadcast-ish plan and the target is never shuffled
twice. The CDF variant emits the per-row change log
(insert/update_pre/update_post/delete) the way Delta's change data
feed does, from the same single join via an exploded event array.

Like SQL MERGE, the join expects at most one source row and one
target row per key (dedupe upstream with ``latest_per_key``); a WHEN
condition that evaluates NULL counts as not-taken (SQL semantics).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _routing(target: DataFrame, source: DataFrame, keys: Sequence[str],
             delete_when, update_when, insert_when):
    """Shared full-outer join + routing predicates for merge/CDF."""
    keys = list(keys)
    payload = list(target.columns)
    # WHEN conditions reference SOURCE columns (documented contract), so
    # they are evaluated on the source frame BEFORE the join — both to
    # avoid post-join reference ambiguity and so each predicate runs
    # once per source row, not once per joined row
    src = source.withColumn("__s", F.lit(True)) \
        .withColumn("__del", delete_when if delete_when is not None else F.lit(False)) \
        .withColumn("__upd", update_when if update_when is not None else F.lit(True)) \
        .withColumn("__ins", insert_when if insert_when is not None else F.lit(True)) \
        .alias("s")
    # presence flags survive the outer join even when key columns are
    # NULL; plain `==` join (not null-safe) preserves the anti/semi
    # behavior of the delete+insert algebra: NULL keys never match
    tgt = target.withColumn("__t", F.lit(True)).alias("t")
    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    j = tgt.join(src, cond, "full_outer")
    in_t = F.col("t.__t").isNotNull()
    in_s = F.col("s.__s").isNotNull()
    del_ = F.coalesce(F.col("s.__del"), F.lit(False))
    upd_ = F.coalesce(F.col("s.__upd"), F.lit(False))
    ins_ = F.coalesce(F.col("s.__ins"), F.lit(False))
    return j, payload, in_t & in_s, in_t & ~in_s, ~in_t & in_s, del_, upd_, ins_


def merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_when: Column | None = None,
    update_when: Column | None = None,
    insert_when: Column | None = None,
) -> DataFrame:
    """MERGE semantics as a pure function: returns the new target state.

    - matched + ``delete_when``            -> row removed
    - matched + ``update_when`` (def all)  -> source row replaces target
    - matched otherwise                    -> target row kept
    - not matched + ``insert_when`` (def all, unless delete-only row)
                                           -> source row inserted
    Conditions are evaluated against SOURCE columns.

    Single-pass plan: one full-outer join, one filter, one projection —
    no unions, no repeated scans of the target.
    """
    j, payload, matched, only_t, only_s, del_, upd_, ins_ = _routing(
        target, source, keys, delete_when, update_when, insert_when)

    keep = only_t | (matched & ~del_) | (only_s & ~del_ & ins_)
    use_src = (matched & ~del_ & upd_) | only_s
    return j.filter(keep).select(*[
        F.when(use_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in payload
    ])


CDF_COL = "_change_type"


def merge_with_cdf(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_when: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Upsert-or-delete merge that ALSO returns the change feed:
    one row per change with ``_change_type`` in
    ``insert | update_preimage | update_postimage | delete`` —
    the Delta-CDF shape.

    The feed derives from one full-outer join: each joined row emits
    its 0-2 change events through an exploded conditional array (a
    matched update yields preimage + postimage), so the target is
    scanned once for the feed rather than once per change type.
    """
    new_state = merge(target, source, keys, delete_when=delete_when)

    j, payload, matched, _only_t, only_s, del_, _upd_, _ins_ = _routing(
        target, source, keys, delete_when, None, None)

    def evt(tag: str, side: str) -> Column:
        return F.struct(*[F.col(f"{side}.{c}").alias(c) for c in payload],
                        F.lit(tag).alias(CDF_COL))

    events = F.array(
        F.when(matched & ~del_, evt("update_preimage", "t")),
        F.when(matched & ~del_, evt("update_postimage", "s")),
        F.when(matched & del_, evt("delete", "t")),
        F.when(only_s & ~del_, evt("insert", "s")),
    )
    changes = (
        j.select(F.explode(F.filter(events, lambda x: x.isNotNull())).alias("__e"))
        .select("__e.*")
    )
    return new_state, changes
