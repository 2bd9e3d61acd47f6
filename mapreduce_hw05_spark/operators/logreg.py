"""Distributed logistic-regression training (batch gradient descent).

Same scalable linear-algebra pattern as :mod:`operators.pca`: each
iteration is ONE data pass that reduces every Arrow batch to its
gradient partial ``X^T (sigmoid(Xw) - y)`` (a d+1 vector) plus loss and
count scalars — NumPy BLAS per batch, nothing per row in Python — and
the tiny partials are summed elementwise in Catalyst. Only a d+1 vector
reaches the driver per iteration; the updated weights ship back to
executors inside the next pass's UDF closure (broadcast-sized). At
100 TB: scan → mapInPandas (combinable partials) → element sum →
driver update, no shuffle ever touches row data, and the training set
persists across the fixed iteration count.

Deterministic by construction: zero-init weights, fixed step and
iteration count, and per-batch partials summed through Catalyst's
float64 aggregate — differential-tested against a single-machine NumPy
implementation of the same math.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GRAD_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("loss", T.DoubleType()),
        T.StructField("grad", T.ArrayType(T.DoubleType())),
    ]
)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # Split by sign so exp never overflows (the standard stable form).
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _design(pdf: pd.DataFrame, vec_col: str, label_col: str):
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    x = np.hstack([x, np.ones((x.shape[0], 1))])  # bias column
    y = pdf[label_col].to_numpy().astype(np.float64)
    return x, y


def fit_logreg(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    n_iters: int = 20,
    lr: float = 1.0,
) -> dict:
    """Train ``sigmoid(x·w + b)`` against a {0,1} label column.

    Returns {"weights": d-array, "bias": float, "losses": [per-iter
    mean log-loss]}. ``df`` should be persisted by the caller when the
    scan is expensive — each iteration re-reads it.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError(
            f"fit_logreg: empty training set — no rows with a {vec_col!r} "
            "vector to infer the feature dimension from"
        )
    dim = int(first["d"])
    w = np.zeros(dim + 1)

    losses: list[float] = []
    for _ in range(n_iters):
        w_iter = w.copy()  # captured by value in the closure below

        def grad_pass(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if not len(pdf):
                    continue
                x, y = _design(pdf, vec_col, label_col)
                p = _sigmoid(x @ w_iter)
                eps = 1e-12
                loss = -float(
                    np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
                )
                yield pd.DataFrame(
                    {
                        "n": [len(y)],
                        "loss": [loss],
                        "grad": [x.T @ (p - y)],
                    }
                )

        partials = df.select(vec_col, label_col).mapInPandas(
            grad_pass, schema=_GRAD_SCHEMA
        )
        # Elementwise partial sum via posexplode + groupBy(position)
        # instead of d+1 separate sum(element_at(grad, i)) columns (r11):
        # the wide-agg plan cost Catalyst ~0.9 s of analysis + codegen
        # PER ITERATION at d=64 (and grows with d); this plan is O(1) in
        # the dimension. The exploded input is (#batch partials × (d+1))
        # tiny rows — noise next to the data pass. Every partial
        # contributes one row to every position group, so each group's
        # sum(n)/sum(loss) equals the global total — read them off any
        # one group instead of running a second aggregate job.
        rows = (
            partials.select(
                "n", "loss", F.posexplode("grad").alias("i", "g")
            )
            .groupBy("i")
            .agg(
                F.sum("n").alias("n"),
                F.sum("loss").alias("loss"),
                F.sum("g").alias("g"),
            )
            # model-sized: exactly d+1 rows (one per weight) by construction
            .collect()
        )
        rows.sort(key=lambda r: r["i"])
        # ADVICE r11: the position-group reduce silently assumes every
        # partial emitted exactly dim+1 gradient entries (n and loss are
        # read off group i=0 alone) — a malformed kernel batch must fail
        # loudly, not feed a silently truncated gradient into the update.
        if len(rows) != dim + 1:
            raise ValueError(
                f"fit_logreg: gradient reduce returned {len(rows)} position "
                f"groups, expected dim+1={dim + 1} — a batch partial "
                "emitted a malformed grad array"
            )
        n = int(rows[0]["n"])
        grad = np.array([r["g"] for r in rows]) / n
        losses.append(float(rows[0]["loss"]) / n)
        w = w - lr * grad

    return {"weights": w[:-1], "bias": float(w[-1]), "losses": losses}


def fit_logreg_local(
    x: np.ndarray, y: np.ndarray, n_iters: int = 20, lr: float = 1.0
) -> dict:
    """Single-machine reference of the same math (for differential tests)."""
    xb = np.hstack([x.astype(np.float64), np.ones((x.shape[0], 1))])
    yb = y.astype(np.float64)
    w = np.zeros(xb.shape[1])
    losses = []
    eps = 1e-12
    for _ in range(n_iters):
        p = _sigmoid(xb @ w)
        losses.append(
            -float(np.mean(yb * np.log(p + eps) + (1 - yb) * np.log(1 - p + eps)))
        )
        w = w - lr * (xb.T @ (p - yb)) / len(yb)
    return {"weights": w[:-1], "bias": float(w[-1]), "losses": losses}
