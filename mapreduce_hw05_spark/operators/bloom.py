"""Distributed Bloom-filter join pre-filter.

The 100-TB problem: a semi-join where the build side is too big to
broadcast as ROWS but its key-set fingerprint fits in kilobytes. A Bloom
bitmap built with one hash aggregate (the filter's 64-bit words are the
groups, ``bit_or`` is the combine — map-side partial aggregation applies,
so the shuffle carries at most ``num_bits/64`` rows per task regardless
of build cardinality) is broadcast to pre-filter the probe side BEFORE
its shuffle, cutting shuffled bytes to the candidate subset. False
positives are then removed by the exact join that was going to run
anyway — the technique never changes results, only shuffle volume
(Spark's own runtime row-group filters use the same shape; here it is an
explicit, composable operator).

Everything stays in Catalyst expressions (xxhash64 / pmod / shiftleft /
bit_or run inside whole-stage codegen); no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key: F.Column, num_bits: int, num_hashes: int) -> list[F.Column]:
    """k independent bit positions via xxhash64(key, seed_i)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    build: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 3
) -> DataFrame:
    """Aggregate the build side's keys into a Bloom bitmap DataFrame of
    ``(bucket: long, mask: long)`` 64-bit words (≤ num_bits/64 rows)."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    return (
        build.select(pos)
        .groupBy(F.expr("pos DIV 64").alias("bucket"))
        .agg(F.bit_or(F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")).alias("mask"))
    )


def bloom_candidate_keys(
    probe_keys: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Filter a DISTINCT probe-key DataFrame down to keys whose every
    hash position is set in the bitmap (true members + false positives).

    Reducing to distinct keys first keeps the explode k× blowup
    proportional to key cardinality, not fact rows; the bitmap join is a
    broadcast hash join (kilobytes).
    """
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    probed = probe_keys.select(F.col(key_col), pos).select(
        key_col,
        F.expr("pos DIV 64").alias("bucket"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
    )
    # bounded: bitmap is num_bits/64 mask rows
    hits = probed.join(F.broadcast(bitmap), "bucket", "left").withColumn(
        "hit", F.coalesce(F.col("mask").bitwiseAND(F.col("bit")) != 0, F.lit(False))
    )
    return (
        hits.groupBy(key_col)
        .agg(F.min("hit").alias("all_set"))
        .filter("all_set")
        .select(key_col)
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """``probe LEFT SEMI JOIN build ON key`` with a Bloom pre-filter:
    bitmap-prune probe keys, semi-join probe to the candidates, then the
    EXACT semi-join against build removes false positives — result is
    identical to the plain semi-join by construction."""
    bitmap = bloom_build(build, key_col, num_bits, num_hashes)
    cand = bloom_candidate_keys(
        probe.select(key_col).distinct(), key_col, bitmap, num_bits, num_hashes
    )
    # bounded: ~ build-key count + fpp share of probe keys; exact semi below
    prefiltered = probe.join(F.broadcast(cand), key_col, "left_semi")
    return prefiltered.join(
        build.select(key_col).distinct(), key_col, "left_semi"
    )
