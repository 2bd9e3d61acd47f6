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


# 13 hex chars = 52 bits of md5 — v, v+1, and the denominator are all
# EXACTLY representable as doubles (doubles are exact only to 53 bits),
# so Spark's double(v) + 1.0 and an oracle's double(v + 1) are
# bit-identical; at 15 chars (60 bits) they differ by ~1 ulp for ~1/128
# of ids (ADVICE r3 item 1), a cross-engine flake source at rounding
# boundaries.
_U_DENOM = float(16**13 + 1)


def hash_uniform(id_col: Column) -> Column:
    """Deterministic uniform (0, 1) from md5(id) — the reproducible
    stand-in for rand() everywhere sampling must survive retries,
    repartitioning, and cross-engine checks. Never exactly 0 (the +1)
    so it is safe under log/pow."""
    v = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 13), 16, 10)
    return (v.cast("double") + F.lit(1.0)) / F.lit(_U_DENOM)


def weighted_sample_keys(
    df: DataFrame, id_col: str, weight_col: str
) -> DataFrame:
    """Attach the Efraimidis–Spirakis A-Res sampling key
    ``u^(1/w)`` (u = hash-uniform of the id, w = the row's weight):
    the k rows with the LARGEST keys are exactly a weighted random
    sample without replacement of size k (Efraimidis & Spirakis 2006,
    "Weighted random sampling with a reservoir").

    The key is rounded to 9 decimals before any ordering so the top-k
    cut is stable across engines (pow/libm drift is ~1 ulp, far below
    round-9); break remaining ties on the id. Rows with weight ≤ 0 get
    key 0 — never sampled while any positive-weight row remains (the
    standard A-Res treatment; also keeps ANSI mode from throwing on
    1/0). Scale: a narrow map over the scan plus one TakeOrdered —
    per-partition top-k then a k-row merge, no full sort, no shuffle of
    the data itself.
    """
    w = F.col(weight_col).cast("double")
    key = F.when(
        w > 0.0, F.pow(hash_uniform(F.col(id_col)), F.lit(1.0) / w)
    ).otherwise(F.lit(0.0))
    return df.withColumn("sample_key", F.round(key, 9))


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """The k-row weighted sample itself (largest keys win)."""
    return (
        weighted_sample_keys(df, id_col, weight_col)
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )
