"""Distributed batch inference plumbing (text -> embedding).

The last mile of a training-data pipeline is model inference at corpus
scale: embed every document, score every image, classify every page.
The Spark-side shape is always the same — ``mapInPandas`` with an
Arrow-batched model call — and that plumbing (schema contract,
batching, worker-local model reuse) is what this module makes real and
tested. The model itself is pluggable; the default is a deterministic
stub (no ML runtime ships in this container) whose output is a pure
function of the input text, so correctness of the PLUMBING has an
exact SQL oracle.

Reference parity: no counterpart (the reference moves OLTP rows,
`base_loader.py`); SURVEY §2.9 training-data surface.

Scale design (100 TB):

- ``mapInPandas`` processes Arrow batches (driver never sees data);
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory
  per batch independent of corpus size;
- the model handle is built ONCE per partition iterator (not per
  batch, not per row) — the idiom that amortizes multi-second model
  load over millions of rows; a real model would be loaded the same
  place the stub closure is built;
- embarrassingly parallel: no shuffle, output partitioning inherits
  input partitioning, so a downstream bucketed write needs no extra
  exchange.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_60 = float(1 << 60)


def stub_text_encoder(dim: int, seed: int = 0) -> Callable[[pd.Series], list]:
    """A deterministic fake encoder: component i of embed(t) is
    ``uniform_hash(md5(f"{seed}|{t}|{i}")) * 2 - 1`` — the same
    md5-prefix construction as ``functions.hashing.uniform_hash``, so
    an SQL oracle can reproduce every output bit."""
    def encode(texts: pd.Series) -> list:
        out = []
        for t in texts:
            vec = []
            for i in range(dim):
                h = hashlib.md5(f"{seed}|{t}|{i}".encode()).hexdigest()
                vec.append(int(h[:15], 16) / TWO_60 * 2.0 - 1.0)
            out.append(vec)
        return out
    return encode


def embed_texts(df: DataFrame, dim: int = 8,
                text_col: str = "text", id_col: str = "doc_id",
                encoder_factory: Callable[[], Callable[[pd.Series], list]] | None = None,
                batch_rows: int | None = None) -> DataFrame:
    """Attach an ``embedding array<double>`` column via Arrow-batched
    inference. ``encoder_factory`` is called once per partition (model
    load site); default is the deterministic stub at dim ``dim``.
    """
    factory = encoder_factory or (lambda: stub_text_encoder(dim))
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = f"{fields}, embedding array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encode = factory()  # once per partition: model-load amortization
        for pdf in batches:
            if batch_rows:
                for lo in range(0, len(pdf), batch_rows):
                    part = pdf.iloc[lo:lo + batch_rows].copy()
                    part["embedding"] = encode(part[text_col])
                    yield part
            else:
                pdf = pdf.copy()
                pdf["embedding"] = encode(pdf[text_col])
                yield pdf

    return df.mapInPandas(run, out_schema)


def embed_summary(df: DataFrame, dim: int = 8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Oracle-friendly projection of the stub embedding: per document
    the first and last components, bit-exact (every arithmetic step —
    int-to-double, divide by 2^60, scale, shift — is IEEE correctly
    rounded, so Spark and the SQL oracle agree to the last bit)."""
    emb = embed_texts(df, dim=dim, text_col=text_col, id_col=id_col)
    return emb.select(
        F.col(id_col),
        F.lit(dim).alias("dim"),
        F.element_at("embedding", 1).alias("e_first"),
        F.element_at("embedding", dim).alias("e_last"),
    )
