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
