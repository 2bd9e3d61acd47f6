"""Data-profiling operator: per-column quality stats in one pass.

A training-data pipeline's first question about a new 100 TB drop is
"what's in it" — null rates, cardinalities, numeric ranges per column.
The genre answers with one counting job per column; here the whole
profile is a single aggregate job over one scan, unpivoted to one row
per column.

Scale: one scan, one (global) aggregate. Exact ``count(DISTINCT)`` for
k columns makes Catalyst expand each input row k ways before the
partial aggregate — acceptable to tens of columns; pass
``approx=True`` to swap in HyperLogLog ``approx_count_distinct`` and
keep the expand away entirely, which is the default posture at cluster
scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile(
    df: DataFrame, cols: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """Profile ``cols`` (default: all) → one row per column with
    ``(col_name, n_rows, n_nonnull, n_distinct, min_num, max_num)``.

    ``min_num``/``max_num`` are populated (as DOUBLE) for numeric
    columns and NULL otherwise, keeping the output schema uniform.
    """
    cols = list(cols) if cols is not None else df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(distinct(F.col(c)).alias(f"{c}__nd"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"{c}__mn"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__mx"))
    one_row = df.agg(*aggs)

    # Unpivot the single stats row into one row per column with a stack()
    # literal table — still the same single job, no extra scan.
    stack_args: list[str] = []
    for c in cols:
        mn = f"`{c}__mn`" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"`{c}__mx`" if c in numeric else "CAST(NULL AS DOUBLE)"
        stack_args.append(f"'{c}', `{c}__nn`, `{c}__nd`, {mn}, {mx}")
    return one_row.selectExpr(
        "__n_rows AS n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) "
        "AS (col_name, n_nonnull, n_distinct, min_num, max_num)",
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_num", "max_num")
