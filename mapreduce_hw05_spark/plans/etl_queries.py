"""Table-maintenance / CDC contract queries: upsert MERGE and SCD
type-2 history building over the fixture tables.

The genre's ETL pipelines rebuild snapshots by joining yesterday's
output directory against a delta file in a reduce-side join; these are
the declarative equivalents (one full-outer join; one window pass) —
see :mod:`mapreduce_hw05_spark.operators.cdc` for the scale notes.

The change feed is derived deterministically from ``orders`` (key mod
arithmetic) so the DuckDB oracle can reconstruct it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.operators.cdc import merge_upsert, scd2_intervals
from mapreduce_hw05_spark.operators.profiling import profile
from mapreduce_hw05_spark.plans.common import lng, money
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import load_table

# --------------------------------------------------------------------------
# etl-1 (ext) — CDC upsert merge (MERGE INTO semantics)
# --------------------------------------------------------------------------


@contract(
    "q_cdc_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ), chg AS (
        SELECT o_orderkey, o_custkey,
               'M' AS o_orderstatus,
               CAST(round(CAST(o_totalprice AS DECIMAL(12,2))
                          * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
                   AS o_totalprice,
               CASE WHEN o_orderkey % 12 = 0 THEN 'D' ELSE 'U' END AS op
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_custkey
                ELSE b.o_custkey END AS o_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice
    FROM base b FULL JOIN chg c ON b.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC feed (upserts + deletes) to an orders snapshot.

    Base = even order keys; feed = keys divisible by 3, re-priced +10%
    and re-statused, with keys divisible by 12 marked for delete — so
    every MERGE path is exercised: update (matched 'U'), insert
    (unmatched 'U'), delete (matched 'D'), pass-through (unmatched
    base). Full merged row set is the contract.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        money(F.col("o_totalprice")).alias("o_totalprice"),
    )
    changes = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        # Reprice in exact decimal, not double: round(double*1.1) lands on
        # half-cent ties whose direction differs across engines.
        F.round(
            F.col("o_totalprice").cast("decimal(12,2)")
            * F.lit("1.1").cast("decimal(2,1)"),
            2,
        )
        .cast("double")
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 12 == 0, "D").otherwise("U").alias("op"),
    )
    return merge_upsert(base, changes, ["o_orderkey"])


# --------------------------------------------------------------------------
# etl-2 (ext) — SCD type-2 history from a change log
# --------------------------------------------------------------------------


@contract(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changed AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           event_type AS state,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER w) AS valid_to_us,
           CAST(lead(ts) OVER w IS NULL AS BIGINT) AS is_current
    FROM changed
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals of each user's event_type stream:
    consecutive same-state events collapse into one row with
    ``[valid_from, valid_to)`` bounds and a current flag. Timestamps are
    emitted as epoch micros (the repo's hash-stable timestamp form).
    """
    ev = load_table(spark, sf_dir, "events")
    hist = scd2_intervals(
        ev, key="user_id", state_col="event_type", ts_col="ts", tiebreak="event_id"
    )
    return hist.select(
        "user_id",
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        lng(F.col("is_current").cast("int")).alias("is_current"),
    )


# --------------------------------------------------------------------------
# etl-3 (ext) — one-pass table profiling (data-quality stats per column)
# --------------------------------------------------------------------------

_PROFILE_ORACLE_ROW = """
    SELECT '{c}' AS col_name, count(*) AS n_rows, count({c}) AS n_nonnull,
           count(DISTINCT {c}) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num
    FROM events
"""


def _profile_oracle() -> str:
    rows = []
    for c, numeric in [
        ("event_id", True),
        ("ts", False),
        ("user_id", True),
        ("event_type", False),
        ("value", True),
        ("props", False),
    ]:
        mn = f"CAST(min({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(max({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        rows.append(_PROFILE_ORACLE_ROW.format(c=c, mn=mn, mx=mx))
    return " UNION ALL ".join(rows)


@contract("q_profile_events", oracle=_profile_oracle())
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/cardinality/range profile of ``events`` computed
    in ONE aggregate over one scan (the oracle needs six) — the
    data-quality first pass a pipeline runs on every new drop."""
    ev = load_table(spark, sf_dir, "events")
    return profile(ev)
