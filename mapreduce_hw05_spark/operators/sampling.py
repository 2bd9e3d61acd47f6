"""Deterministic sampling operators for training-mix construction.

Rates are applied per stratum (class/language/source) with a
content-hash acceptance test, never ``rand()``: a row's fate depends
only on its id, so the sample is reproducible across engines, retries,
task re-execution, and repartitioning — the only sampling that can sit
inside a correctness-checked (or resumable) pipeline.

Scale: a narrow filter over the scan — no shuffle, no state. The
acceptance test compares a fixed-width hex prefix of ``md5(id)``
against a per-stratum threshold string (fixed-width lowercase hex makes
lexicographic = numeric comparison), so the whole op stays inside
whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2 hex chars = 256 buckets → rate granularity 1/256.
_PREFIX_LEN = 2
_BUCKETS = 16**_PREFIX_LEN


def rate_threshold_hex(rate: float) -> str:
    """Hex prefix threshold accepting ~``rate`` of uniformly hashed ids."""
    buckets = max(0, min(_BUCKETS, round(rate * _BUCKETS)))
    return format(buckets, f"0{_PREFIX_LEN}x")


def hash_bucket(id_col: Column) -> Column:
    """Fixed-width hex prefix of md5(id) — uniform over ``_BUCKETS``."""
    return F.substring(F.md5(id_col.cast("string")), 1, _PREFIX_LEN)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's rate, decided by content hash.

    ``rates`` maps stratum value → sampling rate (rounded to 1/256);
    strata not listed use ``default_rate``. Row set, not an aggregate —
    callers compose (the contract query aggregates for hash stability).
    """
    threshold = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        threshold = (
            F.when(F.col(strata_col) == value, F.lit(rate_threshold_hex(rate)))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(id_col)) < threshold)


def stratified_sample_oracle_where(
    strata_col: str, id_col: str, rates: Mapping[str, float], default_rate: float
) -> str:
    """The WHERE clause of the DuckDB oracle, generated from the same
    constants as the Spark plan so the two sides cannot drift."""
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN '{rate_threshold_hex(r)}'"
        for v, r in sorted(rates.items())
    )
    return (
        f"substr(md5(CAST({id_col} AS VARCHAR)), 1, {_PREFIX_LEN}) < "
        f"(CASE {cases} ELSE '{rate_threshold_hex(default_rate)}' END)"
    )
