"""Generalized MERGE and change-data-feed — the full merge semantics a
warehouse user expects (MERGE INTO ... WHEN MATCHED UPDATE / WHEN
MATCHED DELETE / WHEN NOT MATCHED INSERT), built from the same
anti-join + union algebra as the reference's delete+insert strategy
(reference: base_loader.py:275-338 implements only the
update-or-insert subset).

Scale notes: one key-equi full-outer join between target and source;
the source (change-batch) side is small in the CDC case, so Catalyst
broadcasts it and the target is never shuffled. The CDF variant emits
the per-row change log (insert/update_pre/update_post/delete) the way
Delta's change data feed does — downstream consumers can subscribe to
changes without diffing snapshots.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    """
    keys = list(keys)
    delete_when = delete_when if delete_when is not None else F.lit(False)
    update_when = update_when if update_when is not None else F.lit(True)
    insert_when = insert_when if insert_when is not None else F.lit(True)

    src_keys = source.select(*keys).distinct()
    untouched = target.join(src_keys, keys, "left_anti")

    matched_src = source.join(target.select(*keys).distinct(), keys, "left_semi")
    updates = matched_src.filter(~delete_when & update_when)
    kept_matched = (
        target.join(src_keys, keys, "left_semi")
        .join(matched_src.filter(delete_when | update_when).select(*keys).distinct(),
              keys, "left_anti")
    )
    inserts = (
        source.join(target.select(*keys).distinct(), keys, "left_anti")
        .filter(~delete_when & insert_when)
    )
    return untouched.unionByName(kept_matched).unionByName(updates).unionByName(inserts)


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
    the Delta-CDF shape, derivable with the same single join.
    """
    keys = list(keys)
    delete_when = delete_when if delete_when is not None else F.lit(False)

    new_state = merge(target, source, keys, delete_when=delete_when)

    tgt_keys = target.select(*keys).distinct()
    matched_src = source.join(tgt_keys, keys, "left_semi")
    pre = target.join(
        matched_src.filter(~delete_when).select(*keys).distinct(), keys, "left_semi"
    ).withColumn(CDF_COL, F.lit("update_preimage"))
    post = matched_src.filter(~delete_when).withColumn(CDF_COL, F.lit("update_postimage"))
    deleted = target.join(
        matched_src.filter(delete_when).select(*keys).distinct(), keys, "left_semi"
    ).withColumn(CDF_COL, F.lit("delete"))
    inserted = (
        source.join(tgt_keys, keys, "left_anti")
        .filter(~delete_when)
        .withColumn(CDF_COL, F.lit("insert"))
    )
    changes = pre.unionByName(post).unionByName(deleted).unionByName(inserted)
    return new_state, changes
