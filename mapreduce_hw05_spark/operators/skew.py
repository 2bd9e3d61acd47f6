"""Skew-mitigation utilities (SURVEY §4 / 100-TB design rules).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
this engine's sessions) handles most skew at runtime. The explicit
salting here is for the case AQE can't fix: a *broadcast-ineligible*
join or aggregation where one key holds a pathological share of rows
(power-law user, null-key pile-up) and you want the fan-out bounded by
construction rather than re-planned after a bad stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side to a dimension side with key salting.

    The skewed side gets a uniform random-free salt derived from a stable
    hash of its full row spread via ``monotonically_increasing_id`` — NOT
    ``rand()``, so retried tasks produce identical output (a lost-task
    retry with rand() silently duplicates/loses rows). The other side is
    replicated ``salt_buckets``× via explode. Each shuffle key becomes
    (key, salt), splitting the hot key's rows across that many reducers.

    Cost model: replicating the small side S× is the price; choose
    ``salt_buckets`` ≈ (rows of hottest key) / (rows a single task should
    hold). Only the shuffle distribution changes — results are identical
    to a plain join (tested).
    """
    salted_fact = skewed.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % salt_buckets
                   + salt_buckets) % salt_buckets
    )
    salted_dim = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_fact.join(salted_dim, [key, "__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof sum/count by key: pre-aggregate on (key, salt), then
    final-aggregate on key. Catalyst's partial aggregation already does
    this for simple aggregates; the explicit form matters for aggregates
    with large per-key state (collect_list-ish, exact distinct) where the
    map-side partial can't shrink the hot key below one reducer's worth.
    """
    salted = df.withColumn(
        "__salt", (F.xxhash64(F.col(key).cast("string")) % salt_buckets
                   + salt_buckets) % salt_buckets
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(value).alias("__psum"), F.count("*").alias("__pcnt")
    )
    return partial.groupBy(key).agg(
        F.sum("__psum").alias(f"sum_{value}"),
        F.sum("__pcnt").alias("n_rows"),
    )
