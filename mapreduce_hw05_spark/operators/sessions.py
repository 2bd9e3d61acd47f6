"""Sessionization: gap-based session assignment as a window composition.

Batch analog of Structured Streaming's ``session_window`` (SURVEY §2.9
st-3): lag() to detect a gap > threshold, cumulative sum of the gap flags
to number sessions. One shuffle on the entity key; sort within partitions.

At 100-TB scale the only hazard is a skewed entity (one user with a huge
event history): the window sort is per-key and spills, but cannot be
split. Mitigation for pathological keys: pre-split by (user, day) when
sessions are known to be bounded, or use the streaming path with state
timeouts (mapreduce_hw05_spark.streaming.sessions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def assign_sessions(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add a ``session_id`` column: 1-based per-entity session number.

    A new session starts when the gap to the previous event (ordered by
    ``ts_col`` + tiebreaks) exceeds ``gap_seconds``.
    """
    order: list[Column] = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = W.partitionBy(entity_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    new_session = (
        F.when(prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-session rollup: event count + duration, both as the exact
    integer microseconds (``dur_us`` — what downstream aggregates should
    sum: BIGINT sums are order-free and engine-identical) and as seconds
    (``dur_secs`` — one exact-integer divide, safe per row but NOT safe
    to multi-term-sum across engines)."""
    sessions = assign_sessions(df, entity_col, ts_col, gap_seconds, tiebreak_cols)
    dur_us = F.max(F.unix_micros(F.col(ts_col))) - F.min(F.unix_micros(F.col(ts_col)))
    return sessions.groupBy(entity_col, "session_id").agg(
        F.count("*").alias("n_events"),
        dur_us.alias("dur_us"),
        (dur_us / 1_000_000.0).alias("dur_secs"),
    )
