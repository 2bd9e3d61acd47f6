"""Distributed PCA over an embedding column.

The scalable linear-algebra pattern: the data-sized work is ONE pass
that reduces each Arrow batch to its Gram matrix ``X^T X`` (d×d) and
column sum (d) — NumPy BLAS per batch, nothing per row in Python — and
those tiny partials are summed elementwise in Catalyst. Only the d×d
covariance (d=64 → 32 KB) ever reaches the driver, where ``numpy.eigh``
finishes the job. At 100 TB the plan is: scan → mapInPandas (combinable
partials) → 4 096-row aggregate → driver; no shuffle touches row data.

Projection back onto the top-k components broadcasts the k×d component
matrix inside a pandas_udf — the same shape as the cosine kernel in
``operators.similarity``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("g", T.ArrayType(T.DoubleType())),
    ]
)


def _sum_array_column(partials: DataFrame, col: str) -> np.ndarray:
    """Elementwise sum of an array column via posexplode + keyed agg —
    stays in Catalyst; result height is the array length, not the data."""
    rows = (
        partials.select(F.posexplode(col).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"))
        .collect()  # model-sized: one row per vector dimension
    )
    out = np.zeros(len(rows))
    for r in rows:
        out[r["pos"]] = r["s"]
    return out


def covariance(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """(covariance d×d, mean d, n) of an ``array<float>`` column, one pass."""

    def gram(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    partials = df.select(vec_col).mapInPandas(gram, _PARTIAL_SCHEMA)
    partials = partials.persist()
    try:
        n = partials.agg(F.sum("n")).collect()[0][0]  # driver-sized: single scalar
        s = _sum_array_column(partials, "s")
        g = _sum_array_column(partials, "g")
    finally:
        partials.unpersist()
    d = len(s)
    mu = s / n
    cov = (g.reshape(d, d) - n * np.outer(mu, mu)) / (n - 1)
    return cov, mu, n


def fit_pca(df: DataFrame, vec_col: str, k: int) -> dict:
    """Top-k principal components; deterministic sign (the largest-|x|
    coordinate of each component is made positive)."""
    cov, mu, n = covariance(df, vec_col)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    evals, evecs = evals[order], evecs[:, order]
    for j in range(evecs.shape[1]):
        if evecs[np.argmax(np.abs(evecs[:, j])), j] < 0:
            evecs[:, j] = -evecs[:, j]
    return {
        "mean": mu,
        "components": evecs.T,  # k×d
        "eigenvalues": evals,
        "total_variance": float(np.trace(cov)),
        "n": n,
    }


def pca_project(df: DataFrame, vec_col: str, model: dict, out_col: str = "pc") -> DataFrame:
    """Project each vector onto the fitted components (k values per row).
    The k×d matrix rides the UDF closure — broadcast once per executor,
    one BLAS matmul per Arrow batch."""
    comp = model["components"]
    mu = model["mean"]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def proj(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64) - mu
        scores = x @ comp.T
        return pd.Series(list(scores))

    return df.withColumn(out_col, proj(F.col(vec_col)))
