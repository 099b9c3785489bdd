"""Embedding dimensionality reduction + quantization.

- ``project_vectors`` — random projection (Johnson–Lindenstrauss)
  onto ``out_dim`` seeded Gaussian directions, then symmetric int8
  quantization with a per-vector scale. The storage/IO story for
  embedding columns at 100 TB: 64 float32 → 8 int8 + 1 float scale is
  a 32× shrink while approximately preserving pairwise distances, and
  the int8 vectors feed the same LSH/IVF machinery
  (``operators/similarity.py``).

Scale design: the projection is one Arrow-batched numpy matmul per
batch (same pattern as ``similarity._packed_signature_udf``) — no
per-row Python, no shuffle, planes re-derived from the seed inside
each executor (no closure-capture drift). Quantization is native
higher-order-function arithmetic on the projected array.

Determinism / oracle story: projected values are rounded to 6dp
(and ``+ 0.0`` normalizes ``-0.0``), the scale is derived from the
ROUNDED values, and quantization uses ``floor(x/scale + 0.5)`` —
every step is reproducible bit-identically from inlined plane
literals in ANSI SQL, so the catalog entry has an exact oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_pipeline_spark.operators.similarity import _gaussian_planes

_SCALE_FLOOR = 1e-6  # guards all-zero vectors against a 0 divisor


def _projection_udf(out_dim: int, dim: int, seed: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        import numpy as np

        P = np.asarray(_gaussian_planes(out_dim, dim, seed), dtype=np.float64)
        X = np.stack(v.to_numpy()).astype(np.float64)
        from cdc_data_pipeline_spark.functions.rounding import round_half_up
        Y = round_half_up(X @ P.T, 6)
        return pd.Series(list(Y))

    return proj


def project_vectors(df: DataFrame, dim: int, out_dim: int = 8, seed: int = 11,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Project to ``out_dim`` dims and int8-quantize.

    Returns ``id_col, proj (array<double>, 6dp), scale (double),
    q (array<int>, each in [-127, 127])``. Dequantization is
    ``q[i] * scale`` with error ≤ scale/2 per component.
    """
    proj_udf = _projection_udf(out_dim, dim, seed)
    p = df.select(F.col(id_col), proj_udf(F.col(vec_col)).alias("proj"))
    p = p.withColumn(
        "scale",
        F.greatest(
            F.round(F.array_max(F.transform("proj", lambda x: F.abs(x))) / 127.0, 6),
            F.lit(_SCALE_FLOOR)))
    return p.withColumn(
        "q",
        F.transform("proj",
                    lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int")))
