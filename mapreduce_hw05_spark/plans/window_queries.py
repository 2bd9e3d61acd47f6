"""Window-function contract queries (SURVEY.md §2.5: w-1, w-2, w-3).

These are the genre's "secondary sort" (composite key + grouping
comparator + custom partitioner, ~150 LoC each) expressed as one-line
window specs. Every window ORDER BY carries a unique tiebreak column so
results are deterministic across engines.

Scale: a window partitioned by a high-cardinality key (customer, user)
shuffles once on that key and sorts within partitions — no global sort.
Skewed partition keys are the risk at 100 TB; AQE cannot split a window
partition, so heavy-hitter keys should be pre-aggregated or salted
upstream where semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_hw05_spark.plans.common import lng, money, ratio
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import load_table

# --------------------------------------------------------------------------
# w-1 — ranking: top-3 orders per customer
# --------------------------------------------------------------------------


@contract(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (row_number ≤ k)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", lng(F.row_number().over(w)))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# w-2 — running totals + lag
# --------------------------------------------------------------------------


@contract(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev,
           date_diff('day',
               CAST(lag(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running revenue + days since the previous order.

    This is the genre's secondary-sorted reducer holding the previous
    record; ``lag`` + a cumulative ROWS frame replace all of it.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        money(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0))).alias(
            "running_rev"
        ),
        lng(
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
            )
        ).alias("gap_days"),
    )


# --------------------------------------------------------------------------
# w-3 — explicit frame: 10-row moving average
# --------------------------------------------------------------------------


@contract(
    "q_window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS moving_avg
    FROM events
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-row moving average of events.value per user ordered by time."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    return ev.select(
        "event_id", "user_id", ratio(F.avg("value").over(w)).alias("moving_avg")
    )


# --------------------------------------------------------------------------
# w-4 (ext) — navigation functions: first/last/nth value, ntile
# --------------------------------------------------------------------------


@contract(
    "q_window_navigation",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: first/last/2nd order price + quartile.

    last_value needs the full-partition frame explicitly (the default
    frame ends at CURRENT ROW on both engines); order ties broken by
    o_orderkey so every navigation value is deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        lng(F.ntile(4).over(w)).alias("quartile"),
    )


# --------------------------------------------------------------------------
# w-3b (ext) — time-based RANGE frame: trailing-hour aggregates per user
# --------------------------------------------------------------------------


@contract(
    "q_window_time_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_hour,
           round(sum(value) OVER w, 2) AS sum_trailing_hour
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: count + sum of the same user's events in the trailing
    hour (inclusive) — a time-based RANGE frame, not a row frame.

    RANGE frames are tie-safe by construction (all rows at equal ts share
    one frame), so no tiebreak column is needed for determinism. Spark
    needs the numeric-epoch ordering form; the frame is [-3600 s, 0 s].
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        lng(F.count("*").over(w)).alias("n_trailing_hour"),
        money(F.sum("value").over(w)).alias("sum_trailing_hour"),
    )


# --------------------------------------------------------------------------
# w-6 (ext) — ntile bucketing: totalprice quartiles per order priority
# --------------------------------------------------------------------------


@contract(
    "q_ntile_quartiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(quartile AS BIGINT) AS quartile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM (
        SELECT o_orderpriority, o_totalprice,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    )
    GROUP BY o_orderpriority, quartile
    """,
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quartiles of o_totalprice within each order
    priority (ntile), summarized as count + price bounds per bucket.

    ntile needs a total order to be deterministic — o_orderkey breaks
    price ties identically on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            lng(F.ntile(4).over(w)).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n"),
            money(F.min("o_totalprice")).alias("min_price"),
            money(F.max("o_totalprice")).alias("max_price"),
        )
    )


# --------------------------------------------------------------------------
# w-7 (ext) — gaps-and-islands: consecutive-active-day streaks per user
# --------------------------------------------------------------------------


@contract(
    "q_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), numbered AS (
        SELECT user_id, day,
               CAST(day - DATE '1970-01-01' AS BIGINT)
                 - row_number() OVER (PARTITION BY user_id ORDER BY day)
                 AS grp
        FROM days
    ), islands AS (
        SELECT user_id, grp, count(*) AS len
        FROM numbered GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks per user (gaps-and-islands): the
    classic ``day_ordinal - row_number()`` grouping key is constant
    within a run of consecutive days and jumps at every gap.

    All three hops (distinct, window, two aggs) share the user_id
    shuffle key, so Catalyst plans one exchange and keeps the window
    and aggregations co-partitioned.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    numbered = days.withColumn(
        "grp",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).cast("long")
        - F.row_number().over(w),
    )
    islands = numbered.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("active_days"),
    )
