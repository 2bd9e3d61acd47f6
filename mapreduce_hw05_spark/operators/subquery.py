"""Null-aware subquery rewrites as reusable DataFrame operators.

IN / EXISTS / NOT EXISTS rewrite cleanly to semi/anti equi-joins — plain
equality already implements their null behavior (NULL keys never match,
and NOT EXISTS keeps them). NOT IN does not: under SQL three-valued
logic a row qualifies only when its key is non-NULL, the inner set
contains no NULL, and the key equals no inner value. Hand-rewriting it
to a bare ``left_anti`` silently changes semantics the moment either
side contains a NULL — the classic decorrelation bug.

``null_safe_not_in`` implements the production-scale rewrite: a plain
anti equi-join over the non-NULL inner keys, guarded by a 1-row
aggregate of the inner table (has-NULL / is-empty) broadcast into the
plan — fully lazy, so the guard and the join always see the same
snapshot of the inner source and composing the operator costs no
driver-side job. No null-aware nested-loop join, so it stays a hash
join at 100 TB.
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

    - any NULL in the inner set ⇒ empty result;
    - NULL outer keys never qualify — EXCEPT over an empty inner set,
      where ``NOT IN`` is vacuously TRUE for every row (no comparison
      ever happens, so no UNKNOWN can arise);
    - otherwise a plain anti equi-join (hash-joinable, broadcastable —
      never a null-aware nested loop).

    Fully lazy (ADVICE r3 item 5): the inner-NULL / inner-empty facts
    are a 1-row aggregate of the inner table cross-joined (broadcast)
    into the plan, so they are evaluated in the same execution as the
    join — snapshot-consistent for non-static sources, and composing
    this operator schedules no Spark job.
    """
    inner_keys = inner.select(ikey.alias("__ikey"))
    guard = inner_keys.agg(
        F.coalesce(F.max(F.col("__ikey").isNull()), F.lit(False)).alias(
            "__inner_has_null"
        ),
        F.count(F.lit(1)).alias("__n_inner"),
    )
    # The anti join itself keeps NULL-key outer rows (NULL = x is never
    # TRUE), so the NULL-key policy is applied by the guard filter, not
    # by a pre-filter — which is what makes the empty-inner case come
    # out vacuously TRUE.
    anti = outer.join(
        inner_keys.filter(F.col("__ikey").isNotNull()),
        key == F.col("__ikey"),
        "left_anti",
    )
    return (
        # one-row: the inner-NULL / inner-empty guard aggregate
        anti.join(F.broadcast(guard), how="cross")
        .filter(
            (~F.col("__inner_has_null"))
            & (key.isNotNull() | (F.col("__n_inner") == 0))
        )
        .drop("__inner_has_null", "__n_inner")
    )
