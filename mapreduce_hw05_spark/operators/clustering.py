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
        .toPandas()  # model-sized: k x d per-label means
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


def kmeans_parallel_init(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 5,
    oversample: int | None = None,
    seed: int = 11,
) -> np.ndarray:
    """k-means|| initialization (Bahmani et al., "Scalable k-means++"):
    instead of k sequential k-means++ passes (k full scans — useless at
    scale) or random seeding (poor starts), sample ~l·rounds candidates
    in ``rounds`` passes, each point kept with probability
    l·d²(x,C)/φ, then reduce the small weighted candidate set to k
    centroids driver-side.

    Determinism (contract requirement): the Bernoulli draw uses a
    splitmix-style hash of (id, round) instead of an RNG, and the final
    reduction is greedy weighted k-means++ (argmax of weighted distance,
    no sampling) — same input ⇒ same centroids, any partitioning.
    Per-round driver traffic is the candidate batch only; distances are
    computed against a broadcast candidate matrix in one mapInPandas
    pass (the assign_clusters kernel reused with a growing C).
    """
    l = oversample if oversample is not None else 2 * k

    first_rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(1)
        .collect()  # bounded: single seed row
    )
    if not first_rows:
        raise ValueError("kmeans_parallel_init: empty input DataFrame")
    centers = np.asarray([list(first_rows[0][vec_col])], dtype=np.float64)

    for rnd in range(rounds):
        assigned = assign_clusters(emb, centers, id_col, vec_col)
        phi_row = assigned.agg(F.sum("sq_dist").alias("phi")).first()
        if phi_row["phi"] is None:
            raise ValueError(
                "kmeans_parallel_init: empty input (no assignable rows)"
            )
        phi = float(phi_row["phi"]) or 1e-300
        # Deterministic Bernoulli: uniform(id, round) < l*d²/φ.
        u = (
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + rnd)), F.lit(1_000_000_007))
            / F.lit(1_000_000_007.0)
        )
        picked_ids = (
            assigned.filter(u < F.col("sq_dist") * F.lit(float(l)) / F.lit(phi))
            .select(id_col)
        )
        new_rows = (
            emb.join(picked_ids, id_col)
            .select(vec_col)
            .collect()  # model-sized: <= l new centroid candidates per round
        )
        if new_rows:
            centers = np.unique(
                np.vstack(
                    [centers]
                    + [np.asarray(list(r[vec_col]), dtype=np.float64) for r in new_rows]
                ),
                axis=0,
            )

    # Weight candidates by how many points they currently own.
    weights_df = (
        assign_clusters(emb, centers, id_col, vec_col)
        .groupBy("cluster")
        .agg(F.count("*").alias("w"))
        .collect()  # model-sized: one weight row per candidate centroid
    )
    w = np.zeros(len(centers))
    for r in weights_df:
        w[int(r["cluster"])] = float(r["w"])

    # Greedy weighted k-means++ reduction to k centroids (driver-side,
    # candidate set is O(l·rounds) — tiny).
    chosen = [int(np.argmax(w))]
    d2 = ((centers - centers[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(centers)):
        nxt = int(np.argmax(w * d2))
        if d2[nxt] == 0.0:
            break
        chosen.append(nxt)
        d2 = np.minimum(d2, ((centers - centers[nxt]) ** 2).sum(axis=1))
    out = centers[chosen]
    if len(out) < k:  # degenerate corpus: pad by repeating (documented)
        out = np.vstack([out] * ((k // len(out)) + 1))[:k]
    return out


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
            .toPandas()  # model-sized: k x d centroid update
        )
        if obs is not None:
            inertia_out.append(float(obs.get["inertia"]))
        new_c = centroids.copy()
        for cluster, grp in upd.groupby("cluster"):
            new_c[int(cluster)] = grp.sort_values("pos")["v"].to_numpy()[:dim]
        centroids = new_c
    return assign_clusters(emb, centroids, id_col, vec_col), centroids
