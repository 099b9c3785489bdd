"""Context-window document chunking.

LLM training and retrieval pipelines do not consume whole documents:
they consume fixed-size token windows with overlap (so no boundary
context is lost). This operator turns ``(doc_id, text)`` into
``(doc_id, chunk_id, n_tokens, chunk_text)`` rows.

Reference parity: the reference has no chunker (it ships row-shaped
OLTP data, `dagster_code/clickhouse_load_tool/base_loader.py:107-165`);
this is part of the training-data surface layered on top (SURVEY
§2.9).

Scale design (100 TB):

- tokenization, window-start generation and slicing are all native
  Column expressions (``split`` / ``sequence`` / ``slice`` /
  ``array_join``) — whole-stage codegen, zero Python, zero shuffle:
  a pure flatMap the optimizer pipelines into the scan;
- output size is input size * (1 + overlap/step) — the only data
  growth is the declared overlap;
- no window functions, no groupBy: chunking a 100 TB corpus is
  embarrassingly parallel over input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.functions.text import tokens


def chunk_documents(df: DataFrame, chunk_tokens: int = 64, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id",
                    join_sep: str = " ") -> DataFrame:
    """Split documents into overlapping windows of whitespace tokens
    (``functions.text.tokens`` convention: empty tokens dropped).

    Window starts advance by ``chunk_tokens - overlap``; the final
    window of a document may be shorter than ``chunk_tokens`` (never
    empty, except for a token-less document which yields one empty
    chunk). ``chunk_id`` is the 0-based window index within the
    document.
    """
    assert 0 <= overlap < chunk_tokens, "overlap must be < chunk_tokens"
    step = chunk_tokens - overlap
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step))
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens))
    return out.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, join_sep).alias("chunk_text"),
    )
