"""Shared helpers for contract-query plans.

Hash-stability conventions (see ``registry`` module docstring):
``money`` / ``ratio`` round double aggregates identically on both engines;
``lng`` pins derived integers to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_small(df: DataFrame) -> DataFrame:
    """Widen a small input before a high-fan-out transform (explode of
    n-grams/shingles, pairwise expansion).

    A table that is tiny on disk arrives in fewer splits than cores —
    locally the 5 000-doc fixture is ONE split, so an explode that
    multiplies it 100× runs on one core. One shuffle of the small raw
    input buys full-width downstream parallelism. Gated: when the scan
    already yields ≥ default-parallelism partitions (any real at-scale
    input), this is a no-op — no shuffle is added at 100 TB.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def snapshot_result(df: DataFrame) -> DataFrame:
    """Materialize a DRIVER-SIZED final result as a local DataFrame.

    Streaming contracts read their finished sink/state tables back and
    re-wrap them so the returned plan no longer references temp views or
    parquet dirs the contract cleans up. Only ever call this on a frame
    that is small BY CONSTRUCTION (grouped final state, sketch summary,
    top-k) — it is the one sanctioned result-normalization collect; the
    driver-materialization audit test allowlists this helper and bans
    bare ``collect()`` without a boundedness justification everywhere
    else.
    """
    spark = df.sparkSession
    # driver-sized: contract result normalization (small by construction)
    return spark.createDataFrame(df.collect(), schema=df.schema)


def money(col: Column) -> Column:
    """Round a currency-scale double aggregate (magnitude ≤ ~1e9).

    2 decimals leaves ~5 orders of magnitude between the rounding
    half-step and the worst-case cross-engine summation-order drift
    (~1 ulp ≈ 1e-7 at 1e9), so both engines round to the same value.
    """
    return F.round(col, 2)


def ratio(col: Column) -> Column:
    """Round a small-scale double aggregate (averages, ratios, norms)."""
    return F.round(col, 6)


def lng(col: Column) -> Column:
    """Cast a derived integer to BIGINT (DuckDB's year()/count() width)."""
    return col.cast("long")
