"""Token-budget shard packing: assign documents to ~N-token output
shards.

Training pipelines materialize a corpus as fixed-token-budget shards
(sequence-packing input files). Greedy packing over a deterministic
document order is the standard: shard(d) = floor(exclusive-prefix-sum
of token counts / budget). A shard can overflow by at most one
document, every shard except the last is >= budget, and the
assignment is a pure function of (order, counts) — re-runs and the
SQL oracle agree exactly.

Scale: a single global cumsum window is a one-partition bottleneck at
100 TB. ``pack_token_shards`` computes it in two stages like Spark's
own zipWithIndex: per-range-chunk token totals (tiny aggregate) turn
into chunk offsets via a window over #chunks rows, then a within-chunk
cumsum rides a (chunk)-keyed window. No stage ever sees more than one
chunk's rows in a single window partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_shards(df: DataFrame, budget: int, token_col: str,
                      order_col: str, chunk: int = 4096) -> DataFrame:
    """Adds ``shard_id``: greedy packing of ``token_col`` into shards
    of ``budget`` tokens over ascending ``order_col`` (must be unique,
    e.g. a doc id; contiguity not required).

    ``chunk`` groups ~that many order units per cumsum partition —
    size it so one chunk's rows fit a task comfortably.
    """
    t = F.col(token_col).cast("long")
    chunked = df.withColumn("__chunk", F.floor(F.col(order_col) / chunk))

    # stage 1: per-chunk totals -> exclusive chunk offsets (window over
    # #chunks rows only)
    totals = chunked.groupBy("__chunk").agg(F.sum(t).alias("__ct"))
    w_chunks = Window.orderBy("__chunk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    offsets = totals.select(
        "__chunk",
        (F.sum("__ct").over(w_chunks) - F.col("__ct")).alias("__off"))

    # stage 2: within-chunk exclusive cumsum + broadcast offset join
    w_in = (Window.partitionBy("__chunk").orderBy(F.col(order_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (chunked.join(F.broadcast(offsets), "__chunk")
            .withColumn("__cum_excl",
                        F.col("__off") + F.sum(t).over(w_in) - t)
            .withColumn("shard_id",
                        F.floor(F.col("__cum_excl") / budget).cast("long"))
            .drop("__chunk", "__off", "__cum_excl"))


def shard_manifest(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-shard stats (docs, tokens) — the write manifest."""
    return (packed.groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(token_col).cast("long")).alias("n_tokens")))
