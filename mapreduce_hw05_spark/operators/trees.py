"""Histogram-based decision-stump training — the exact greedy split
search at the core of distributed tree learners (XGBoost/LightGBM-style
"exact" mode), expressed as Catalyst aggregates.

Per feature: one groupBy histogram of (value → rows, positives), one
window cumulative sum in value order to materialize every candidate
split's left-side counts, then a Gini-gain argmax with a deterministic
(gain DESC, feature, threshold) tiebreak. Everything that crosses an
aggregation boundary is an exact integer; the gain itself is a fixed
single-op double chain on those integers, so two engines computing the
same formula agree bit-for-bit and the argmax is stable.

Scale: the corpus-sized work is the per-feature histogram (partial-agg
friendly, |distinct values| rows out); the cumsum + argmax run on
histogram-sized data. With F features this is F scans — or one scan of
an exploded (feature, value) pair stream, which is how ``best_split``
lays it out (explode is wide but map-side, no shuffle added).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_split(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """Return the 1-row best (feature, threshold) split by Gini gain.

    ``feature_cols`` must be integer-valued columns (bucketize upstream);
    ``label_col`` is a 0/1 integer. The split is ``feature <= threshold``;
    the histogram's maximum value is excluded (an empty right child is
    not a split). Output: feature, threshold, n_left, pos_left, n_right,
    pos_right, gain.
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(c).cast("long").alias("value"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("fv"),
        F.col(label_col).cast("long").alias("y"),
    )
    # ONE corpus-sized pass: the histogram. Totals are any single
    # feature's histogram re-summed (each row contributes exactly once
    # per feature), so the totals action materializes the persisted
    # histogram instead of rescanning the corpus.
    hist = pairs.groupBy(
        F.col("fv.feature").alias("feature"), F.col("fv.value").alias("value")
    ).agg(F.count("*").alias("n"), F.sum("y").alias("pos")).persist()
    totals = (
        hist.filter(F.col("feature") == feature_cols[0])
        .agg(F.sum("n").alias("n"), F.sum("pos").alias("pos"))
        .first()
    )
    n_tot, pos_tot = int(totals["n"]), int(totals["pos"])

    w = (
        Window.partitionBy("feature")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cand = (
        hist.select(
            "feature",
            F.col("value").alias("threshold"),
            F.sum("n").over(w).alias("n_left"),
            F.sum("pos").over(w).alias("pos_left"),
        )
        .filter(F.col("n_left") < n_tot)
    )

    def gini(pos_c, n_c):
        p = pos_c / n_c
        q = (n_c - pos_c) / n_c
        return F.lit(1.0) - p * p - q * q

    n_right = F.lit(n_tot) - F.col("n_left")
    pos_right = F.lit(pos_tot) - F.col("pos_left")
    parent = gini(F.lit(pos_tot).cast("double"), F.lit(n_tot).cast("double"))
    gain = (
        parent
        - (F.col("n_left") / F.lit(n_tot)) * gini(F.col("pos_left"), F.col("n_left"))
        - (n_right / F.lit(n_tot)) * gini(pos_right, n_right)
    )
    return (
        cand.select(
            "feature",
            "threshold",
            "n_left",
            "pos_left",
            n_right.alias("n_right"),
            pos_right.alias("pos_right"),
            gain.alias("gain"),
        )
        .orderBy(F.col("gain").desc(), "feature", "threshold")
        .limit(1)
    )


_TREE_SCHEMA = (
    "node string, feature string, threshold long, n_left long, "
    "pos_left long, n_right long, pos_right long, gain double"
)


def grow_tree_depth2(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """Grow a depth-2 tree: root split, then the best split inside each
    child — the driver-chained greedy loop every distributed GBT runs
    (one row collected per node; the per-node work stays cluster-side
    histogram aggregation). Children that admit no legal split (pure or
    single-valued) simply contribute no row.
    """
    spark = df.sparkSession
    rows = []
    root = best_split(df, feature_cols, label_col).first()
    if root is not None:
        rows.append(("root", root))
        f, t = root["feature"], root["threshold"]
        for node, part in (
            ("left", df.filter(F.col(f) <= t)),
            ("right", df.filter(F.col(f) > t)),
        ):
            r = best_split(part, feature_cols, label_col).first()
            if r is not None:
                rows.append((node, r))
    return spark.createDataFrame(
        [
            (
                node,
                r["feature"],
                r["threshold"],
                r["n_left"],
                r["pos_left"],
                r["n_right"],
                r["pos_right"],
                r["gain"],
            )
            for node, r in rows
        ],
        _TREE_SCHEMA,
    )
