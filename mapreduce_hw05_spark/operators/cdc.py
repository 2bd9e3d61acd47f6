"""Change-data-capture / table-maintenance operators: upsert merge and
SCD type-2 interval building.

The genre's ETL pipelines materialize a new HDFS directory per batch and
rebuild snapshots with a reduce-side join of base vs. delta files; here
both ops are single declarative plans.

Scale: ``merge_upsert`` is one full-outer shuffle join keyed on the merge
key — both sides hash-partition, AQE handles skewed keys, and nothing is
collected. ``scd2_intervals`` is one window pass (single shuffle on the
entity key); consecutive-duplicate collapse happens inside the sorted
partition, so state never leaves the executor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change feed to a base table (MERGE INTO semantics).

    ``changes`` carries the full new row image plus ``op_col`` with
    ``'U'``/``'I'`` (upsert — update if the key exists, insert if not)
    or ``'D'`` (delete). Exactly one change row per key is assumed
    (compact the feed first — e.g. latest-by-timestamp per key).

    Implemented as one full-outer join on the merge key: unmatched base
    rows pass through, matched rows take the change image, ``'D'`` rows
    drop out. Returns the base schema (without ``op_col``).
    """
    value_cols = [c for c in base.columns if c not in keys]
    # Prefix the change image so base and feed stay unambiguous even when
    # both derive from the same source DataFrame (CDC feeds often do).
    chg = changes.select(
        *keys,
        *[F.col(c).alias(f"__chg_{c}") for c in value_cols],
        F.col(op_col).alias("__op"),
    )
    joined = base.join(chg, list(keys), "full")
    picked: list[Column] = [F.col(c) for c in keys]
    for c in value_cols:
        # Change image wins when present; NULL __op means base-only row.
        picked.append(
            F.when(F.col("__op").isNotNull(), F.col(f"__chg_{c}"))
            .otherwise(F.col(c))
            .alias(c)
        )
    return joined.filter(
        F.col("__op").isNull() | (F.col("__op") != F.lit("D"))
    ).select(*picked)


def scd2_intervals(
    df: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse a per-entity change log into SCD type-2 validity rows:
    ``(key, state, valid_from, valid_to, is_current)``.

    Consecutive rows with the same ``state_col`` merge into one interval;
    ``valid_to`` is the start of the next different state (NULL while
    current). ``tiebreak`` must make ``(ts_col, tiebreak)`` unique per
    key so the interval set is deterministic and oracle-hashable.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    seq = W.partitionBy(key).orderBy(*order)
    changed = (
        df.select(key, state_col, ts_col, tiebreak)
        .withColumn("__prev", F.lag(state_col).over(seq))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
    )
    # After the filter, intervals per key are ordered by the same keys —
    # reusing the window spec costs no extra shuffle (partitioning and
    # sort order are preserved from the first window pass).
    return changed.select(
        key,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(seq).alias("valid_to"),
        F.lead(ts_col).over(seq).isNull().alias("is_current"),
    )
