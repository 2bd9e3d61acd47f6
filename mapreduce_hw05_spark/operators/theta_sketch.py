"""Theta (KMV) distinct sketch with SET OPERATIONS — union, intersection,
difference — the capability HLL does not have (HLL unions fine but cannot
intersect; "distinct users who did A AND B" needs theta/KMV).

Same distributed topology as the KLL quantile rollup
(operators/quantile_sketch.py): per-partition partials built in one
mapInPandas pass (bounded at k hashes each), an associative merge, and
only sketch blobs ever cross the wire. Estimates are |S|/θ with
RSE ≈ 1/√(k-1); set-op estimates restrict both retained sets to the
common θ first (the standard theta-sketch a-priori rule).

Hashing: values are mixed through splitmix64 (a fixed, partition-
independent 64-bit finalizer) and mapped to uniform [0,1); sketches of
the same column built anywhere therefore agree hash-for-hash, which is
what makes the merge/intersection well-defined.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Uniform [0,1) from int64 keys via the splitmix64 finalizer."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z.astype(np.float64) / float(2**64)


class ThetaSketch:
    """KMV sketch: the k smallest distinct uniform hashes + θ."""

    def __init__(self, k: int = 4096):
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.float64)  # sorted, < theta
        self.theta = 1.0

    def add_many(self, values: np.ndarray) -> None:
        h = _splitmix64(np.asarray(values, dtype=np.int64))
        h = h[h < self.theta]
        merged = np.unique(np.concatenate([self.hashes, h]))
        if len(merged) > self.k:
            self.theta = float(merged[self.k])
            merged = merged[: self.k]
        self.hashes = merged

    # -- set algebra ---------------------------------------------------
    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        out = ThetaSketch(min(self.k, other.k))
        out.theta = min(self.theta, other.theta)
        merged = np.unique(np.concatenate([self.hashes, other.hashes]))
        merged = merged[merged < out.theta]
        if len(merged) > out.k:
            out.theta = float(merged[out.k])
            merged = merged[: out.k]
        out.hashes = merged
        return out

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        out = ThetaSketch(min(self.k, other.k))
        out.theta = min(self.theta, other.theta)
        common = np.intersect1d(self.hashes, other.hashes)
        out.hashes = common[common < out.theta]
        return out

    def difference(self, other: "ThetaSketch") -> "ThetaSketch":
        out = ThetaSketch(min(self.k, other.k))
        out.theta = min(self.theta, other.theta)
        mine = self.hashes[self.hashes < out.theta]
        theirs = other.hashes[other.hashes < out.theta]
        out.hashes = np.setdiff1d(mine, theirs)
        return out

    def estimate(self) -> float:
        if self.theta >= 1.0:
            return float(len(self.hashes))  # exact below k distinct
        return len(self.hashes) / self.theta

    # -- wire format ---------------------------------------------------
    def serialize(self) -> bytes:
        import struct

        head = struct.pack("<qd", self.k, self.theta)
        return head + self.hashes.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "ThetaSketch":
        import struct

        k, theta = struct.unpack_from("<qd", blob, 0)
        sk = cls(k)
        sk.theta = theta
        sk.hashes = np.frombuffer(blob, dtype=np.float64, offset=16).copy()
        return sk


def theta_sketch_partials(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 4096,
) -> DataFrame:
    """(key..., sketch binary) PARTIALS — one sketch per (partition ×
    key), built in a single mapInPandas pass with NO shuffle. Callers
    that already merge driver-side (the streaming rollup sink) consume
    these directly; :func:`theta_sketch_by_key` adds the keyed
    distributed merge."""
    from pyspark.sql import types as T

    key_fields = [df.schema[c] for c in key_cols]
    partial_schema = T.StructType(
        list(key_fields) + [T.StructField("sketch", T.BinaryType())]
    )

    def build_partials(batches):
        acc: dict[tuple, ThetaSketch] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            # dropna=False: SQL GROUP BY keeps the null group — the
            # DuckDB oracles do; pandas' default would silently drop it.
            for key, grp in pdf.groupby(key_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                key = tuple(
                    None if (isinstance(c, float) and np.isnan(c)) else c
                    for c in key
                )
                sk = acc.get(key)
                if sk is None:
                    sk = acc[key] = ThetaSketch(k)
                sk.add_many(grp[value_col].to_numpy(dtype=np.int64))
        if acc:
            yield pd.DataFrame(
                [(*key, sk.serialize()) for key, sk in acc.items()],
                columns=[*key_cols, "sketch"],
            )

    return df.select(*key_cols, value_col).mapInPandas(
        build_partials, schema=partial_schema
    )


def theta_sketch_merge_partials(
    partials: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Merge a (key..., sketch) partials table to ONE sketch per key —
    the distributed half of the rollup: one shuffle on the key, an
    associative KMV union per group (order-independent: the result is
    always the k smallest distinct hashes under the min θ), only blobs
    of ≤ k hashes ever cross the wire. Consumed by
    :func:`theta_sketch_by_key` and by the streaming sink's
    distributed-state fallback."""
    from pyspark.sql import types as T

    key_fields = [partials.schema[c] for c in key_cols]
    out_schema = T.StructType(
        list(key_fields) + [T.StructField("sketch", T.BinaryType())]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged: ThetaSketch | None = None
        for blob in pdf["sketch"]:
            sk = ThetaSketch.deserialize(bytes(blob))
            merged = sk if merged is None else merged.union(sk)
        row = [pdf.iloc[0][c] for c in key_cols] + [merged.serialize()]
        return pd.DataFrame([row], columns=[*key_cols, "sketch"])

    return partials.groupBy(*key_cols).applyInPandas(
        merge_group, schema=out_schema
    )


def theta_sketch_by_key(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 4096,
) -> DataFrame:
    """(key..., sketch binary) — one merged theta sketch per key, built
    from per-partition partials; only O(partitions × keys) blobs of
    ≤ k hashes shuffle."""
    partials = theta_sketch_partials(df, key_cols, value_col, k)
    return theta_sketch_merge_partials(partials, key_cols)
