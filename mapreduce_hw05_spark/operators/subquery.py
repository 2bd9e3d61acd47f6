"""Null-aware subquery rewrites as reusable DataFrame operators.

IN / EXISTS / NOT EXISTS rewrite cleanly to semi/anti equi-joins — plain
equality already implements their null behavior (NULL keys never match,
and NOT EXISTS keeps them). NOT IN does not: under SQL three-valued
logic a row qualifies only when its key is non-NULL, the inner set
contains no NULL, and the key equals no inner value. Hand-rewriting it
to a bare ``left_anti`` silently changes semantics the moment either
side contains a NULL — the classic decorrelation bug.

``null_safe_not_in`` implements the production-scale rewrite: one
bounded probe for an inner NULL (limit-1, short-circuits the whole
query to empty), then a plain anti equi-join over the non-NULL keys.
No null-aware nested-loop join, so it stays a hash join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def semi_in(outer: DataFrame, key: Column, inner: DataFrame, ikey: Column) -> DataFrame:
    """``outer WHERE key IN (SELECT ikey FROM inner)`` — NULL keys never
    qualify, which the semi equi-join's equality already guarantees."""
    return outer.join(inner.select(ikey.alias("__ikey")), key == F.col("__ikey"), "left_semi")


def null_safe_not_in(
    outer: DataFrame, key: Column, inner: DataFrame, ikey: Column
) -> DataFrame:
    """``outer WHERE key NOT IN (SELECT ikey FROM inner)`` with exact SQL
    three-valued-logic semantics.

    - any NULL in the inner set ⇒ empty result (checked with a bounded
      limit-1 scan of the NULL slice, not a full aggregate);
    - NULL outer keys never qualify;
    - otherwise a plain anti equi-join (hash-joinable, broadcastable —
      never a null-aware nested loop).
    """
    inner_keys = inner.select(ikey.alias("__ikey"))
    if inner_keys.filter(F.col("__ikey").isNull()).limit(1).count() > 0:
        return outer.filter(F.lit(False))
    return outer.filter(key.isNotNull()).join(
        inner_keys.filter(F.col("__ikey").isNotNull()),
        key == F.col("__ikey"),
        "left_anti",
    )
