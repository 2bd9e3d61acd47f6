"""As-of join (SURVEY §2.3 j-9): for each left row, attach the most
recent right row with ``right.ts <= left.ts`` per join key.

Physical strategy: union the two sides, then one window pass —
``last(<right payload>, ignoreNulls)`` over rows ordered by
``(ts, side)`` within each key. That is exactly one hash-partition
shuffle + sort, the same cost envelope as a sort-merge join, with no
per-key driver logic; it scales to any number of rows per key because
the running "last seen" is computed streamingly within each sorted
partition. Ties (right.ts == left.ts) match, mirroring DuckDB's
``ASOF JOIN … ON l.ts >= r.ts`` semantics (right side sorts first at
equal timestamps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_CARRY = "__asof_carry"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    carry_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before its ``ts_col`` with equal ``on`` keys (nulls if none).

    ``carry_cols`` are the right-side columns to attach; each appears in
    the output as ``<name><suffix>``, alongside ``<ts_col><suffix>``.
    """
    on = list(on)
    carry_struct = F.struct(
        F.col(ts_col).alias(ts_col + suffix),
        *[F.col(c).alias(c + suffix) for c in carry_cols],
    )
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        carry_struct.alias(_CARRY),
    )
    carry_type = r.schema[_CARRY].dataType

    left_extra = [c for c in left.columns if c not in on and c != ts_col]
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(carry_type).alias(_CARRY),
        *left_extra,
    )
    r_full = r.select(
        *on,
        ts_col,
        _SIDE,
        _CARRY,
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_extra],
    )

    w = (
        W.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = l.unionByName(r_full).withColumn(
        _CARRY, F.last(_CARRY, ignorenulls=True).over(w)
    )
    return (
        matched.filter(F.col(_SIDE) == 1)
        .select(
            *on,
            ts_col,
            *left_extra,
            F.col(f"{_CARRY}.{ts_col}{suffix}"),
            *[F.col(f"{_CARRY}.{c}{suffix}") for c in carry_cols],
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    carry_cols: Sequence[str],
    suffix: str = "_near",
) -> DataFrame:
    """NEAREST as-of join: every left row, plus the right row with the
    smallest |Δts| in either direction (ties go to the EARLIER right
    row — the backward match), nulls if the key has no right rows.
    The finance-style variant of :func:`asof_join` (backward-only):
    quote-to-trade matching and sensor alignment both want "closest",
    not "latest prior".

    Same physical strategy, still ONE shuffle+sort: union the sides,
    sort by (ts, side) per key, and read BOTH directions from the one
    sorted pass — ``last(carry, ignorenulls)`` over the preceding frame
    (right rows at equal ts sort before left, so backward ties match)
    and ``first(carry, ignorenulls)`` over the strictly-following frame.
    The winner is picked per row with exact integer microsecond gaps.
    """
    on = list(on)
    carry_struct = F.struct(
        F.col(ts_col).alias(ts_col + suffix),
        *[F.col(c).alias(c + suffix) for c in carry_cols],
    )
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        carry_struct.alias(_CARRY),
    )
    carry_type = r.schema[_CARRY].dataType
    left_extra = [c for c in left.columns if c not in on and c != ts_col]
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(carry_type).alias(_CARRY),
        *left_extra,
    )
    r_full = r.select(
        *on,
        ts_col,
        _SIDE,
        _CARRY,
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_extra],
    )
    order = [F.col(ts_col).asc(), F.col(_SIDE).asc()]
    back = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(1, W.unboundedFollowing)
    )
    u = l.unionByName(r_full)
    matched = u.withColumn(
        "__prev", F.last(_CARRY, ignorenulls=True).over(back)
    ).withColumn("__next", F.first(_CARRY, ignorenulls=True).over(fwd))
    t_us = F.unix_micros(F.col(ts_col))
    prev_ts = F.unix_micros(F.col("__prev")[ts_col + suffix])
    next_ts = F.unix_micros(F.col("__next")[ts_col + suffix])
    nearest = (
        F.when(F.col("__prev").isNull(), F.col("__next"))
        .when(F.col("__next").isNull(), F.col("__prev"))
        .when(t_us - prev_ts <= next_ts - t_us, F.col("__prev"))
        .otherwise(F.col("__next"))
    )
    return (
        matched.filter(F.col(_SIDE) == 1)
        .withColumn(_CARRY, nearest)
        .select(
            *on,
            ts_col,
            *left_extra,
            F.col(_CARRY + f".{ts_col}{suffix}").alias(ts_col + suffix),
            *[
                F.col(_CARRY + f".{c}{suffix}").alias(c + suffix)
                for c in carry_cols
            ],
        )
    )
