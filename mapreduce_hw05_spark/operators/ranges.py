"""Bucketized range joins: band joins and interval-overlap joins with NO
equi key, without the broadcast-nested-loop cross product.

Spark has no native range-join optimization (the equi-key path in
``q_range_join`` only works when a key carries the join): a bare
``a.val BETWEEN b.lo AND b.hi`` plans as BroadcastNestedLoopJoin —
O(|a|·|b|) compares and a mandatory broadcast, which is exactly what
cannot run at 100 TB. The standard scale rewrite (Flink interval joins,
Databricks' range-join hint) is bucketization: quantize the range
dimension into fixed-width buckets, equi-join on the bucket id, and
re-check the exact predicate as a residual. Both operators here are
EXACT (the bucket join provably covers every qualifying pair; the
residual removes false candidates) and emit NO duplicates by
construction, so no distinct pass is needed:

- :func:`band_join` — pairs with ``|lv - rv| <= band``. The build side
  owns exactly one bucket per row, the probe side explodes into the
  ≤ ``2·ceil(band/w)+1`` buckets its band can reach; a qualifying pair
  meets only in the build row's single home bucket.
- :func:`interval_overlap_join` — half-open interval pairs with
  ``ls < re AND rs < le``. Both sides explode into the buckets they
  cover; a qualifying pair is kept only in the FIRST bucket both cover
  (``floor(max(ls, rs) / w)``), which both sides provably contain.

The shuffle is an ordinary hash exchange on the bucket id — AQE-visible,
skew-splittable, broadcastable when one side is small. ``bucket_width``
is the scale knob: fan-out per row is ~(extent / width + 1), so width is
chosen near the typical band/interval extent; too-wide buckets shift
work into the residual, too-narrow ones into the explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: Column) -> Column:
    # floor-division bucket id as BIGINT; works for negative values too
    # (floor, not truncation — Spark's floor() rounds toward -inf).
    return F.floor(col / width).cast("long")


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    band: float,
    bucket_width: float | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``abs(left_on - right_on) <= band``.

    Exactness: the build (right) row lives in bucket ``floor(rv/w)``;
    the probe (left) row explodes into ``floor((lv-band)/w) ..
    floor((lv+band)/w)``. ``|lv - rv| <= band`` implies
    ``rv ∈ [lv-band, lv+band]`` and floor is monotone, so the build
    bucket is always inside the probe span — every qualifying pair is
    produced. Each pair is produced at most once because the build side
    owns exactly one bucket. The residual drops same-bucket pairs
    outside the band.

    Returns the joined frame with all columns of both inputs (callers
    project). Default ``bucket_width = band`` bounds the probe explode
    at 3 rows per left row.
    """
    w = F.lit(float(bucket_width if bucket_width is not None else band))
    lv, rv = F.col(left_on), F.col(right_on)
    probe = left.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(lv - band, w), _bucket(lv + band, w))),
    )
    build = right.withColumn("__bucket", _bucket(rv, w))
    return (
        probe.join(build, "__bucket")
        .filter(F.abs(lv - rv) <= band)
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """All (left, right) pairs of half-open integer intervals whose
    point sets intersect: ``ls < re AND rs < le`` and both intervals
    non-empty (an empty ``[s, s)`` interval overlaps nothing — the bare
    two-inequality predicate would spuriously match empties sitting
    strictly inside the other interval).

    Callers pass integer columns (epoch seconds for time intervals —
    cast timestamps with ``col.cast("long")``) and an integer
    ``bucket_width`` in the same unit. Each side explodes into the
    buckets its interval covers (``floor(s/w) .. floor((e-1)/w)``;
    empty intervals cover none and are filtered). A qualifying pair
    shares every bucket in the intersection of its spans; it is KEPT
    only where ``bucket == floor(greatest(ls, rs) / w)`` — the first
    shared bucket, which both sides contain because ``max(ls, rs)``
    lies inside both half-open intervals whenever they overlap. One
    row per qualifying pair, no distinct.

    Fan-out per row is ``(interval length / bucket_width) + 1`` —
    pick the width near the typical interval extent, and cap
    pathological long intervals upstream (split or route them through
    a broadcast side) the same way skewed keys are salted.
    """
    w = F.lit(int(bucket_width)).cast("long")
    ls, le = F.col(left_start).cast("long"), F.col(left_end).cast("long")
    rs, re = F.col(right_start).cast("long"), F.col(right_end).cast("long")

    lbuck = left.filter(le > ls).withColumn(
        "__bucket", F.explode(F.sequence(F.floor(ls / w), F.floor((le - 1) / w)))
    )
    rbuck = right.filter(re > rs).withColumn(
        "__bucket", F.explode(F.sequence(F.floor(rs / w), F.floor((re - 1) / w)))
    )
    first_shared = F.floor(F.greatest(ls, rs) / w)
    return (
        lbuck.join(rbuck, "__bucket")
        .filter((ls < re) & (rs < le) & (F.col("__bucket") == first_shared))
        .drop("__bucket")
    )
