"""K-means over an embedding column (SURVEY §2.8 g-3).

Iterative: centroids live driver-side (k×dim floats — genuinely scalar
state, like the genre's Counters), assignment is a broadcast NumPy kernel
via ``mapInPandas`` (one BLAS call per Arrow batch), centroid update is a
distributed posexplode + groupBy-avg. No all-pairs product, no per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def label_seeded_centroids(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> np.ndarray:
    """Initial centroids = per-label mean vectors (deterministic seeding)."""
    means = (
        emb.select(F.col(label_col).cast("long").alias("cluster"), F.posexplode(vec_col))
        .groupBy("cluster", "pos")
        .agg(F.avg(F.col("col").cast("double")).alias("v"))
        .orderBy("cluster", "pos")
        .toPandas()
    )
    k = means["cluster"].nunique()
    dim = means["pos"].nunique()
    return means["v"].to_numpy().reshape(k, dim)


def assign_clusters(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to the nearest centroid (squared-L2, float64).

    Ties broken by lowest cluster id (np.argmin) — deterministic.
    """
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids.astype(np.float64))
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster", T.LongType()),
            T.StructField("sq_dist", T.DoubleType()),
        ]
    )

    def kernel(batches):
        C = bc.value  # (k, dim)
        c_sq = (C * C).sum(axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # ||v-c||² = ||v||² - 2 v·c + ||c||² ; ||v||² constant per row
            d = -2.0 * (V @ C.T) + c_sq[None, :]
            best = d.argmin(axis=1)
            v_sq = (V * V).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "cluster": best.astype(np.int64),
                    "sq_dist": v_sq + d[np.arange(len(best)), best],
                }
            )

    return emb.mapInPandas(kernel, schema=schema)


def kmeans(
    emb: DataFrame,
    k: int,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: np.ndarray | None = None,
    inertia_out: list | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's k-means; returns (final assignment DF, final centroids).

    Empty clusters keep their previous centroid. The per-iteration driver
    traffic is exactly k×dim doubles — independent of data size. Pass
    ``inertia_out=[]`` to also collect the per-iteration inertia
    (Σ sq_dist under the centroids each assignment used) — one extra
    scalar per iteration, riding the centroid-update pass as an
    Observation so no extra job runs.
    """
    from pyspark.sql import Observation

    if init is None:
        init = label_seeded_centroids(emb, vec_col=vec_col)
    centroids = init.astype(np.float64).copy()
    dim = centroids.shape[1]
    for _ in range(iterations):
        assignment = assign_clusters(emb, centroids, id_col, vec_col)
        obs = None
        if inertia_out is not None:
            obs = Observation()
            assignment = assignment.observe(
                obs, F.sum("sq_dist").alias("inertia")
            )
        upd = (
            assignment.join(emb.select(id_col, vec_col), id_col)
            .select("cluster", F.posexplode(vec_col))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("v"))
            .toPandas()
        )
        if obs is not None:
            inertia_out.append(float(obs.get["inertia"]))
        new_c = centroids.copy()
        for cluster, grp in upd.groupby("cluster"):
            new_c[int(cluster)] = grp.sort_values("pos")["v"].to_numpy()[:dim]
        centroids = new_c
    return assign_clusters(emb, centroids, id_col, vec_col), centroids
