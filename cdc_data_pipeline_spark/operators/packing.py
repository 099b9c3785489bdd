"""Token-budget shard packing and fixed-length sequence layout.

Training pipelines materialize a corpus in two granularities:

- ``pack_token_shards`` — assign documents to ~N-token output shards
  (sequence-packing input FILES). Greedy packing over a deterministic
  document order: shard(d) = floor(exclusive-prefix-sum of token
  counts / budget). A shard can overflow by at most one document,
  every shard except the last is >= budget, and the assignment is a
  pure function of (order, counts) — re-runs and the SQL oracle agree
  exactly.
- ``pack_sequences`` — the GPT-style EXAMPLE layout: all documents
  concatenated in order and cut into fixed ``seq_len``-token training
  windows, documents spanning window boundaries (the standard causal-
  LM pretraining pack; the fragment map is what an input pipeline
  needs to slice each document's token range into its windows).

Scale: a single global cumsum window is a one-partition bottleneck at
100 TB. Both operators compute the exclusive prefix sum in two stages
like Spark's own zipWithIndex: per-range-chunk token totals (tiny
aggregate) turn into chunk offsets via a window over #chunks rows,
then a within-chunk cumsum rides a (chunk)-keyed window. No stage
ever sees more than one chunk's rows in a single window partition.
``pack_sequences`` then emits fragments with a per-row ``sequence``
explode — output size is input docs + boundary crossings, never a
driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _exclusive_cumsum(df: DataFrame, token_col: str, order_col: str,
                      chunk: int) -> DataFrame:
    """Adds ``__cum_excl``: the exclusive prefix sum of ``token_col``
    over ascending ``order_col``, computed in two skew-safe stages
    (see module docstring). ``order_col`` must be unique; contiguity
    is not required."""
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
            .drop("__chunk", "__off"))


def pack_token_shards(df: DataFrame, budget: int, token_col: str,
                      order_col: str, chunk: int = 4096) -> DataFrame:
    """Adds ``shard_id``: greedy packing of ``token_col`` into shards
    of ``budget`` tokens over ascending ``order_col`` (must be unique,
    e.g. a doc id; contiguity not required).

    ``chunk`` groups ~that many order units per cumsum partition —
    size it so one chunk's rows fit a task comfortably.
    """
    return (_exclusive_cumsum(df, token_col, order_col, chunk)
            .withColumn("shard_id",
                        F.floor(F.col("__cum_excl") / budget).cast("long"))
            .drop("__cum_excl"))


def pack_sequences(df: DataFrame, seq_len: int, token_col: str,
                   order_col: str, chunk: int = 4096) -> DataFrame:
    """Fixed-length training-sequence layout: concatenate every
    document's tokens in ascending ``order_col`` order and cut the
    stream into ``seq_len``-token windows. Documents SPAN window
    boundaries (no padding, no document loss — the standard causal-LM
    "packed" pretraining layout). Returns one FRAGMENT row per
    (document × overlapped window):

    - ``seq_id``     — 0-based window index,
    - ``doc_offset`` — the fragment's first token within the document,
    - ``seq_offset`` — its first position within the window,
    - ``frag_len``   — tokens contributed (> 0).

    Every window except the last is exactly ``seq_len`` tokens =
    sum(frag_len) over its fragments; a document of T tokens appears
    in 1 + floor((start mod seq_len + T - 1) / seq_len) consecutive
    windows. Zero-token documents are dropped. All arithmetic is
    integer (exclusive cumsum + integer division), so the layout is a
    pure function of (order, counts) with an exact SQL oracle.

    Scale: the two-stage cumsum (see module docstring) plus one
    ``sequence``-explode per row — fragments per doc are bounded by
    ceil(T/seq_len)+1, so output rows ~ docs + total_tokens/seq_len.
    """
    t = F.col(token_col).cast("long")
    cum = (_exclusive_cumsum(df, token_col, order_col, chunk)
           .filter(F.col(token_col) > 0)
           .withColumn("__s", F.col("__cum_excl"))
           .withColumn("__e", F.col("__cum_excl") + t)
           .drop("__cum_excl"))
    # integer DIV keeps the layout exact at any token total (a double
    # floor would drift past 2^53 tokens)
    first = F.expr(f"__s DIV {int(seq_len)}")
    last = F.expr(f"(__e - 1) DIV {int(seq_len)}")
    frag_start = F.greatest(F.col("__s"), F.col("seq_id") * seq_len)
    frag_end = F.least(F.col("__e"), (F.col("seq_id") + 1) * seq_len)
    return (cum
            .withColumn("seq_id", F.explode(F.sequence(first, last)))
            .withColumn("doc_offset", frag_start - F.col("__s"))
            .withColumn("seq_offset", frag_start - F.col("seq_id") * seq_len)
            .withColumn("frag_len", frag_end - frag_start)
            .drop("__s", "__e"))


def shard_manifest(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-shard stats (docs, tokens) — the write manifest."""
    return (packed.groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(token_col).cast("long")).alias("n_tokens")))
