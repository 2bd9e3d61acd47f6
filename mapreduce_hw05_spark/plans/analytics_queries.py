"""Behavioral / statistical analytics contract queries (ext, beyond
SURVEY §2's genre surface): funnel conversion, cohort retention,
regression aggregates, fixed-width histograms, and IQR outlier
detection.

All are pure Catalyst plans — chained equi-joins, window-free
conditional aggregation, and two-pass bound-join shapes that scale as
ordinary shuffles (no all-pairs work, no driver loops). Each oracle
re-states the identical arithmetic in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_hw05_spark.plans.common import lng, money, ratio
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import load_table

# --------------------------------------------------------------------------
# an-1 — ordered funnel conversion (view → click → purchase)
# --------------------------------------------------------------------------


@contract(
    "q_funnel_steps",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT count(*) AS n_view_users,
           count(c.c_ts) AS n_click_users,
           count(p.p_ts) AS n_purchase_users,
           round(avg(CASE WHEN p.p_ts IS NOT NULL THEN
               (epoch_us(p.p_ts) - epoch_us(v.v_ts)) / 1000000.0 END), 6)
               AS avg_funnel_secs
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel: users whose first view precedes a
    click precedes a purchase, with the mean view→purchase latency.

    Each stage is a per-user min-timestamp aggregate equi-joined to the
    previous stage — three key-partitioned shuffles, no windows, no
    self-cross products, so the plan scales linearly in users at 100 TB
    (and the stage tables shrink monotonically down the funnel).
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    funnel = v.join(c, "user_id", "left").join(p, "user_id", "left")
    full_secs = F.when(
        F.col("p_ts").isNotNull(),
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 1000000.0,
    )
    return funnel.agg(
        F.count("*").alias("n_view_users"),
        F.count("c_ts").alias("n_click_users"),
        F.count("p_ts").alias("n_purchase_users"),
        ratio(F.avg(full_secs)).alias("avg_funnel_secs"),
    )


# --------------------------------------------------------------------------
# an-2 — weekly cohort retention
# --------------------------------------------------------------------------


@contract(
    "q_cohort_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    )
    SELECT CAST(epoch(c.cw) AS BIGINT) AS cohort_week_epoch,
           CAST((epoch(a.aw) - epoch(c.cw)) // 604800 AS BIGINT) AS week_offset,
           count(*) AS n_active_users
    FROM cohort c JOIN activity a ON c.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity week,
    counted in each subsequent week they return.

    Week offsets are exact 604800-second multiples between Monday
    truncations (UTC session, no DST), so the integer division is safe
    on both engines. Two shuffles total: the per-user min and the
    cohort×offset count.
    """
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("aw")
    ).distinct()
    joined = cohort.join(activity, "user_id")
    return joined.groupBy(
        F.unix_timestamp("cw").alias("cohort_week_epoch"),
        ((F.unix_timestamp("aw") - F.unix_timestamp("cw")) / 604800)
        .cast("long")
        .alias("week_offset"),
    ).agg(F.count("*").alias("n_active_users"))


# --------------------------------------------------------------------------
# an-3 — linear-regression / correlation aggregates
# --------------------------------------------------------------------------


@contract(
    "q_regression_stats",
    oracle="""
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n_pairs,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_pq
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of extendedprice on quantity per returnflag: slope,
    intercept, R², correlation, and sample covariance.

    These are the one-pass mergeable regression aggregates (sum, sum of
    squares, cross products) — the distributed-friendly way to fit a
    simple model at 100 TB without an ML library round-trip.
    """
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n_pairs"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        ratio(F.regr_r2(y, x)).alias("r2"),
        ratio(F.corr(y, x)).alias("corr_pq"),
        money(F.covar_samp(y, x)).alias("covar_pq"),
    )


# --------------------------------------------------------------------------
# an-4 — fixed-width histogram
# --------------------------------------------------------------------------

_BUCKET_WIDTH = 25_000
_MAX_BUCKET = 19


@contract(
    "q_histogram_totalprice",
    oracle=f"""
    SELECT least(CAST(floor(o_totalprice / {_BUCKET_WIDTH}) AS BIGINT),
                 {_MAX_BUCKET}) AS bucket,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value histogram: 25k-wide buckets with a top catch-all.

    Fixed bounds keep it a single map-side bucket expression + one
    aggregate shuffle — the scalable first look at any value
    distribution (data-dependent equi-depth bounds are q_percentiles /
    q_iqr_outliers territory).
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _BUCKET_WIDTH).cast("long"),
        F.lit(_MAX_BUCKET).cast("long"),
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# an-5 — IQR outlier detection (two-pass: exact quartiles, then flag)
# --------------------------------------------------------------------------


@contract(
    "q_iqr_outliers",
    oracle="""
    WITH bounds AS (
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25)
                     - 1.5 * (quantile_cont(l_extendedprice, 0.75)
                              - quantile_cont(l_extendedprice, 0.25)), 6) AS lo,
               round(quantile_cont(l_extendedprice, 0.75)
                     + 1.5 * (quantile_cont(l_extendedprice, 0.75)
                              - quantile_cont(l_extendedprice, 0.25)), 6) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, b.lo, b.hi,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN l.l_extendedprice < b.lo
                           OR l.l_extendedprice > b.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    GROUP BY 1, 2, 3
    """,
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers of extendedprice per returnflag: exact
    quartiles (pass 1) define [q1−1.5·IQR, q3+1.5·IQR]; pass 2 counts
    rows outside.

    The bounds table is group-cardinality-sized, so the second pass is a
    broadcast join against the fact scan — the standard two-pass shape
    for data-dependent filters at scale. Spark's exact ``percentile``
    and DuckDB's ``quantile_cont`` share linear interpolation; bounds
    are rounded on both sides before comparison so the fence itself is
    bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q1 = F.percentile("l_extendedprice", F.lit(0.25))
    q3 = F.percentile("l_extendedprice", F.lit(0.75))
    bounds = li.groupBy("l_returnflag").agg(
        F.round(q1 - 1.5 * (q3 - q1), 6).alias("lo"),
        F.round(q3 + 1.5 * (q3 - q1), 6).alias("hi"),
    )
    # label-sized: one row per l_returnflag
    joined = li.join(F.broadcast(bounds), "l_returnflag")
    is_out = (F.col("l_extendedprice") < F.col("lo")) | (
        F.col("l_extendedprice") > F.col("hi")
    )
    return joined.groupBy("l_returnflag", "lo", "hi").agg(
        F.count("*").alias("n_rows"),
        lng(F.sum(is_out.cast("int"))).alias("n_outliers"),
    )


# --------------------------------------------------------------------------
# an-6 (ext) — event transition matrix (the Sankey/Markov diagnostic)
# --------------------------------------------------------------------------


@contract(
    "q_event_transitions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov/Sankey matrix):
    one lag window ordered by the (fixture-unique) event time, then a
    tiny-domain aggregate. The window shuffles once on user_id; the
    transition matrix is |types|² rows, so the final agg collapses
    map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


# --------------------------------------------------------------------------
# an-7 (ext) — RFM quartile segmentation
# --------------------------------------------------------------------------


@contract(
    "q_rfm_segments",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               max(o_orderdate) AS recency,
               count(*) AS frequency,
               sum(o_totalprice) AS monetary
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT ntile(4) OVER (ORDER BY recency, o_custkey) AS r_q,
               ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
               ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_q
        FROM rfm
    )
    SELECT r_q, f_q, m_q, count(*) AS n_customers
    FROM scored
    GROUP BY r_q, f_q, m_q
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation of
    customers — the marketing-analytics classic. Every ntile orders by
    (metric, o_custkey) so quartile boundaries are tie-free and
    engine-identical.

    Scale note (r8): the three quartile cuts used to be unpartitioned
    ntile windows — single-reducer sorts over the ENTITY table, which
    is billions of customers at 100 TB, not "small". Each cut is now
    :func:`operators.ranks.distributed_ntile` (range shuffle +
    per-partition offsets, exact SQL ntile semantics, every stage
    partition-parallel); three cuts = three range shuffles of the
    entity aggregate, same count as the window version's three sorts
    but with no one-task stage.
    """
    from mapreduce_hw05_spark.operators.ranks import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("recency"),
        F.count("*").alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    )
    scored = rfm
    for name, col in (
        ("r_q", "recency"),
        ("f_q", "frequency"),
        ("m_q", "monetary"),
    ):
        scored = distributed_ntile(
            scored,
            4,
            [F.col(col).asc(), F.col("o_custkey").asc()],
            bucket_col=name,
        )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_customers")
    )


# --------------------------------------------------------------------------
# an-8 (ext) — rolling 7-day active users (exact distinct over a window)
# --------------------------------------------------------------------------


@contract(
    "q_rolling_dau",
    oracle="""
    WITH day_user AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events
    ), bounds AS (
        SELECT min(d) AS lo, max(d) AS hi FROM day_user
    ), contrib AS (
        SELECT DISTINCT unnest(generate_series(d, d + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY))::DATE AS w,
               user_id
        FROM day_user
    )
    SELECT CAST(epoch(w) AS BIGINT) AS day_epoch,
           count(*) AS active_users
    FROM contrib, bounds
    WHERE w <= hi
    GROUP BY day_epoch
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day, EXACT — the metric distinct-
    count windows can't express scalably. Instead of a per-day distinct
    over a 7-day self-join, each (day, user) pair is exploded to the ≤7
    window-days it contributes to, deduped, and counted: shuffles are
    keyed on (window-day, user), work is |active pairs| × 7, and no
    state ever holds a user set in memory. Days past the observed max
    are clipped so both engines agree on the calendar.
    """
    ev = load_table(spark, sf_dir, "events")
    day_user = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    hi = day_user.agg(F.max("d").alias("hi"))
    contrib = (
        day_user.select(
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.date_add(F.col("d"), 6),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("w"),
            "user_id",
        )
        .distinct()
        # one-row: global max day
        .join(F.broadcast(hi), F.col("w") <= F.col("hi"))
    )
    return contrib.groupBy(
        F.unix_timestamp(F.col("w").cast("timestamp")).alias("day_epoch")
    ).agg(F.count("*").alias("active_users"))


# --------------------------------------------------------------------------
# an-9 (ext) — skyline / Pareto frontier
# --------------------------------------------------------------------------


@contract(
    "q_skyline_pareto",
    oracle="""
    SELECT p1.p_partkey, round(p1.p_retailprice, 2) AS p_retailprice,
           p1.p_size
    FROM part p1
    WHERE NOT EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.p_retailprice < p1.p_retailprice
          AND p2.p_size > p1.p_size
    )
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts (cheaper AND bigger dominates): parts no
    other part strictly beats on both axes.

    For a 2-D skyline the frontier is computable without a self-join: a
    part is dominated iff some part with strictly larger size has
    strictly smaller price, i.e. iff ``min(price) over (size > mine)``
    < my price. Scale (r8): rather than a running min over EVERY part
    row (the old form — an unpartitioned window, i.e. a
    single-partition sort of the whole table), aggregate min(price) per
    DISTINCT size first (one map-side-combining shuffle), run the
    running min over the size DOMAIN — tens of rows for any data scale,
    a legitimately tiny window — and broadcast-join the per-size
    threshold back. Identical thresholds, and the only corpus-sized
    stages are a scan and a broadcast probe.
    """
    part = load_table(spark, sf_dir, "part")
    per_size = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("__size_min")
    )
    # global-window: distinct p_size DOMAIN (attribute-bounded, ~50
    # values), not row count
    w = (
        W.orderBy(F.col("p_size").desc())
        .rangeBetween(W.unboundedPreceding, -1)
    )
    thresholds = per_size.select(
        "p_size",
        F.min("__size_min").over(w).alias("__best_price_above"),
    )
    # label-sized: one threshold row per distinct p_size (domain ≤ ~50)
    flagged = part.select("p_partkey", "p_retailprice", "p_size").join(
        F.broadcast(thresholds), "p_size"
    )
    return (
        flagged.filter(
            F.col("__best_price_above").isNull()
            | (F.col("__best_price_above") >= F.col("p_retailprice"))
        )
        .select(
            "p_partkey",
            money(F.col("p_retailprice")).alias("p_retailprice"),
            "p_size",
        )
    )


# --------------------------------------------------------------------------
# Cumulative distinct users — growth curve without distinct-window state
# --------------------------------------------------------------------------


@contract(
    "q_cumulative_users",
    oracle="""
    WITH first_seen AS (
        SELECT event_type, user_id, min(CAST(ts AS DATE)) AS d
        FROM events GROUP BY event_type, user_id
    ), per_day AS (
        SELECT event_type, d, count(*) AS new_users
        FROM first_seen GROUP BY event_type, d
    )
    SELECT event_type,
           strftime(d, '%Y-%m-%d') AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (
               PARTITION BY event_type ORDER BY d
           ) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience growth curve: per event type, daily NEW users (first-ever
    appearance) and the running distinct-user total.

    COUNT(DISTINCT) over a running window would keep per-row distinct
    state; reducing each user to a single first-seen row first makes the
    curve an ordinary cumulative sum — the day grain keeps window
    partitions (one per event type) small no matter how many raw events
    feed them, so the plan survives a 100× scale-up.
    """
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy(
        "event_type", "user_id"
    ).agg(F.min(F.to_date("ts")).alias("d"))
    per_day = first_seen.groupBy("event_type", "d").agg(
        F.count("*").alias("new_users")
    )
    w = W.partitionBy("event_type").orderBy("d")
    return per_day.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        lng(F.col("new_users")).alias("new_users"),
        lng(F.sum("new_users").over(w)).alias("cumulative_users"),
    )


# --------------------------------------------------------------------------
# an-10 — month-over-month revenue growth (agg → lag on the aggregate)
# --------------------------------------------------------------------------


@contract(
    "q_mom_growth",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               sum(o_totalprice) AS rev,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT strftime(month, '%Y-%m') AS month,
           round(rev, 2) AS rev,
           CAST(n_orders AS BIGINT) AS n_orders,
           round(rev / lag(rev) OVER (ORDER BY month) - 1, 6) AS mom_growth
    FROM m
    """,
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month growth rate — aggregate
    first, window over the (tiny) aggregate second.

    The lag window runs on one partition, but over ~tens of monthly rows
    regardless of input scale: aggregate-then-window keeps the
    single-partition stage O(months), never O(fact).
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum("o_totalprice").alias("rev"),
        F.count("*").alias("n_orders"),
    )
    # global-window: monthly aggregate (O(months), never O(fact))
    w = W.orderBy("month")
    return monthly.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        money(F.col("rev")).alias("rev"),
        "n_orders",
        ratio(F.col("rev") / F.lag("rev").over(w) - 1).alias("mom_growth"),
    )


# --------------------------------------------------------------------------
# an-13 (ext) — A/B experiment readout (two-proportion z-test, bit-exact)
# --------------------------------------------------------------------------


@contract(
    "q_ab_test_stats",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS variant,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) >= 10
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT variant,
               count(*) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM per_user GROUP BY variant
    ), wide AS (
        SELECT
            max(CASE WHEN variant = 0 THEN n_users END) AS n0,
            max(CASE WHEN variant = 0 THEN n_converted END) AS c0,
            max(CASE WHEN variant = 1 THEN n_users END) AS n1,
            max(CASE WHEN variant = 1 THEN n_converted END) AS c1
        FROM arms
    )
    SELECT n0, c0, n1, c1,
           CAST(c0 AS DOUBLE) / n0 AS p0,
           CAST(c1 AS DOUBLE) / n1 AS p1,
           CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
               (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt(
                   (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                   * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                   * (1.0 / n0 + 1.0 / n1)
               )
           END AS z
    FROM wide
    """,
)
def q_ab_test_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test readout of a hash-split experiment
    (variant = user_id % 2, conversion = ≥10 purchase events — the
    fixture's any-purchase rate saturates at 100 %, which would zero the
    pooled variance) — the standard A/B decision statistic, emitted
    bit-exactly; z is NULL when the pooled rate is degenerate (0 or 1).

    Exactness: the arms reduce to four exact integers; every double after
    that is a single-op chain (divide / subtract / multiply / sqrt) on
    identical inputs, and IEEE arithmetic incl. sqrt is correctly rounded
    on both engines — so even the z statistic needs no rounding. One
    groupBy(user) + one 2-row aggregate + a 1-row pivot; at 100 TB the
    user aggregate is the only real shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 10
        )
        .cast("int")
        .alias("converted")
    )
    arms = per_user.groupBy(
        (F.col("user_id") % 2).cast("long").alias("variant")
    ).agg(
        F.count("*").alias("n_users"),
        lng(F.sum("converted")).alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pool = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    conv = F.col("c0") + F.col("c1")
    total = F.col("n0") + F.col("n1")
    z = F.when(
        (conv > 0) & (conv < total),
        (p1 - p0)
        / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
        ),
    )
    return wide.select(
        "n0", "c0", "n1", "c1", p0.alias("p0"), p1.alias("p1"), z.alias("z")
    )


# --------------------------------------------------------------------------
# an-14 (ext) — trailing-baseline anomaly detection on the hourly series
# --------------------------------------------------------------------------


#: shared verbatim by the batch and streaming anomaly contracts — the
#: streaming rollup lands on the identical hourly table, so both match
#: this oracle bit-for-bit.
ANOMALY_ORACLE_SQL = """
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT)
                   AS hour_epoch,
               CAST(sum(floor(value * 1000)) AS BIGINT) AS s,
               CAST(sum(floor(value * 1000) * floor(value * 1000))
                    AS BIGINT) AS s2,
               count(*) AS n
        FROM events GROUP BY event_type, hour_epoch
    ), base AS (
        SELECT event_type, hour_epoch, s, s2, n,
               CAST(sum(s)  OVER w AS DOUBLE) AS bs,
               CAST(sum(s2) OVER w AS DOUBLE) AS bs2,
               CAST(sum(n)  OVER w AS DOUBLE) AS bn,
               CAST(count(*) OVER w AS BIGINT) AS bh
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ), scored AS (
        SELECT event_type, hour_epoch,
               CASE WHEN
                   (CAST(s AS DOUBLE) / n - bs / bn)
                   * (CAST(s AS DOUBLE) / n - bs / bn) * n
                   > 9 * ((bs2 - bs * bs / bn) / bn)
               THEN 1 ELSE 0 END AS flagged
        FROM base WHERE bh >= 8
    )
    SELECT event_type,
           count(*) AS n_scored,
           CAST(sum(flagged) AS BIGINT) AS n_anomalies,
           CAST(sum(CASE WHEN flagged = 1 THEN hour_epoch END) AS BIGINT)
               AS anomaly_checksum
    FROM scored GROUP BY event_type
    """


def hourly_anomaly_stats(ev: DataFrame) -> DataFrame:
    """(event_type, hour_epoch) → exact integer (s, s2, n) with
    s = Σ⌊value·1000⌋ and s2 = Σ⌊value·1000⌋² — order-free and additive
    in all three columns, so a streaming sink can fold per-batch deltas
    and land on the identical hourly table."""
    v_ms = F.floor(F.col("value") * 1000)
    return ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
    ).agg(
        F.sum(v_ms).cast("long").alias("s"),
        F.sum(v_ms * v_ms).cast("long").alias("s2"),
        F.count("*").cast("long").alias("n"),
    )


def anomaly_from_hourly(hourly: DataFrame) -> DataFrame:
    """Finish the trailing-baseline anomaly sweep from the exact hourly
    (s, s2, n) table — shared verbatim by the batch and streaming
    contracts so their outputs are bit-identical by construction."""
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(-24, -1)
    )
    base = hourly.select(
        "event_type",
        "hour_epoch",
        "s",
        "s2",
        "n",
        F.sum("s").over(w).cast("double").alias("bs"),
        F.sum("s2").over(w).cast("double").alias("bs2"),
        F.sum("n").over(w).cast("double").alias("bn"),
        F.count("*").over(w).cast("long").alias("bh"),
    ).filter(F.col("bh") >= 8)
    m = F.col("s").cast("double") / F.col("n")
    mu = F.col("bs") / F.col("bn")
    var = (F.col("bs2") - F.col("bs") * F.col("bs") / F.col("bn")) / F.col(
        "bn"
    )
    scored = base.select(
        "event_type",
        "hour_epoch",
        ((m - mu) * (m - mu) * F.col("n") > F.lit(9.0) * var)
        .cast("int")
        .alias("flagged"),
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_scored"),
        lng(F.sum("flagged")).alias("n_anomalies"),
        lng(F.sum(F.when(F.col("flagged") == 1, F.col("hour_epoch")))).alias(
            "anomaly_checksum"
        ),
    )


@contract("q_anomaly_hours", oracle=ANOMALY_ORACLE_SQL)
def q_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose mean event value z-scores past ±3 against a trailing
    24-hour pooled baseline (≥8 baseline hours required) — the on-call
    metrics-anomaly sweep, emitted as exact per-type counts.

    Bit-exact discipline as q_ewma_hourly: per-hour Σv and Σv² over
    millisecond-quantized values are order-free BIGINTs, the trailing
    window sums integers, and the z² comparison n·(m−μ)² > 9σ² is a
    single-op double chain on identical inputs — no sqrt, no division by
    a possibly-zero σ, no rounding. The Σv² BIGINT is exact to ~3e18;
    at larger per-window volumes drop the quantization to centiunits or
    widen to DECIMAL(38) on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return anomaly_from_hourly(hourly_anomaly_stats(ev))


# --------------------------------------------------------------------------
# an-15 (ext) — decision-stump training (histogram-based exact split search)
# --------------------------------------------------------------------------


@contract(
    "q_decision_stump",
    oracle="""
    WITH base AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_c,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), pairs AS (
        SELECT 'qty' AS feature, qty AS value, y FROM base
        UNION ALL
        SELECT 'tax_c', tax_c, y FROM base
    ), hist AS (
        SELECT feature, value, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
        FROM pairs GROUP BY feature, value
    ), tot AS (
        SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS pos FROM base
    ), cand AS (
        SELECT feature, value AS threshold,
               CAST(sum(n) OVER w AS BIGINT) AS n_left,
               CAST(sum(pos) OVER w AS BIGINT) AS pos_left
        FROM hist
        WINDOW w AS (PARTITION BY feature ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        QUALIFY n_left < (SELECT n FROM tot)
    )
    SELECT feature, threshold, n_left, pos_left,
           (SELECT n FROM tot) - n_left AS n_right,
           (SELECT pos FROM tot) - pos_left AS pos_right,
           (1.0 - ((SELECT pos FROM tot) / (SELECT n FROM tot))
                * ((SELECT pos FROM tot) / (SELECT n FROM tot))
                - (((SELECT n FROM tot) - (SELECT pos FROM tot))
                       / (SELECT n FROM tot))
                * (((SELECT n FROM tot) - (SELECT pos FROM tot))
                       / (SELECT n FROM tot)))
           - (n_left / (SELECT n FROM tot))
             * (1.0 - (pos_left / n_left) * (pos_left / n_left)
                    - ((n_left - pos_left) / n_left)
                    * ((n_left - pos_left) / n_left))
           - (((SELECT n FROM tot) - n_left) / (SELECT n FROM tot))
             * (1.0
                - (((SELECT pos FROM tot) - pos_left)
                       / ((SELECT n FROM tot) - n_left))
                * (((SELECT pos FROM tot) - pos_left)
                       / ((SELECT n FROM tot) - n_left))
                - ((((SELECT n FROM tot) - n_left)
                        - ((SELECT pos FROM tot) - pos_left))
                       / ((SELECT n FROM tot) - n_left))
                * ((((SELECT n FROM tot) - n_left)
                        - ((SELECT pos FROM tot) - pos_left))
                       / ((SELECT n FROM tot) - n_left)))
               AS gain
    FROM cand
    ORDER BY gain DESC, feature, threshold
    LIMIT 1
    """,
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a decision stump predicting returned lineitems
    (l_returnflag = 'R') over integer features qty and tax-cents — the
    histogram-based exact greedy split search at the core of distributed
    gradient-boosted-tree learners, as one explode + groupBy histogram,
    one histogram-sized window cumsum, and a Gini-gain argmax.

    Every aggregation-boundary value is an exact integer; the gain is a
    fixed-shape single-op double chain on those integers, so both engines
    produce bit-identical gains and the (gain DESC, feature, threshold)
    argmax is engine-stable with no rounding.
    """
    from mapreduce_hw05_spark.operators.trees import best_split

    li = load_table(spark, sf_dir, "lineitem")
    feats = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_tax") * 100 + 0.5).cast("long").alias("tax_c"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    best = best_split(feats, ["qty", "tax_c"], "y")
    return best.select(
        "feature",
        lng(F.col("threshold")).alias("threshold"),
        lng(F.col("n_left")).alias("n_left"),
        lng(F.col("pos_left")).alias("pos_left"),
        lng(F.col("n_right")).alias("n_right"),
        lng(F.col("pos_right")).alias("pos_right"),
        "gain",
    )


# --------------------------------------------------------------------------
# an-16 (ext) — population-stability drift between two event populations
# --------------------------------------------------------------------------


#: shared verbatim by the batch and streaming PSI contracts.
PSI_ORACLE_SQL = """
    WITH b AS (
        SELECT least(CAST(floor(value / 5) AS BIGINT), 19) AS bucket,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
        FROM events GROUP BY bucket
    ), tot AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS ta,
               CAST(sum(n_b) AS BIGINT) AS tb FROM b
    )
    SELECT bucket, n_a, n_b,
           round(
               ((n_a + 1.0) / (ta + 20) - (n_b + 1.0) / (tb + 20))
               * ln(((n_a + 1.0) / (ta + 20)) / ((n_b + 1.0) / (tb + 20))),
               9
           ) AS psi_term
    FROM b CROSS JOIN tot
    ORDER BY bucket
    """


def psi_bucket_counts(ev: DataFrame) -> DataFrame:
    """(value-bucket) → exact per-population event counts — order-free
    and additive, so a streaming sink folding per-batch deltas lands on
    the identical table."""
    return ev.groupBy(
        F.least(F.floor(F.col("value") / 5), F.lit(19))
        .cast("long")
        .alias("bucket")
    ).agg(
        lng(F.sum((F.col("user_id") % 2 == 0).cast("int"))).alias("n_a"),
        lng(F.sum((F.col("user_id") % 2 == 1).cast("int"))).alias("n_b"),
    )


def psi_from_buckets(b: DataFrame) -> DataFrame:
    """Finish the Laplace-smoothed PSI terms from the bucket-count
    table — shared verbatim by the batch and streaming contracts."""
    tot = b.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    ).first()
    ta, tb = int(tot["ta"]), int(tot["tb"])
    pa = (F.col("n_a") + 1.0) / F.lit(float(ta + 20))
    pb = (F.col("n_b") + 1.0) / F.lit(float(tb + 20))
    return b.select(
        "bucket",
        "n_a",
        "n_b",
        F.round((pa - pb) * F.log(pa / pb), 9).alias("psi_term"),
    ).orderBy("bucket")


@contract("q_drift_psi", oracle=PSI_ORACLE_SQL)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms comparing the event-value
    distribution of the two user_id-parity populations over 20
    fixed-width buckets (Laplace-smoothed so empty buckets never divide
    by zero) — the standard drift monitor between a reference and a live
    window.

    Counts are exact integers off one aggregate; each PSI term is a
    fixed-shape chain on them, rounded at 9 decimals only because ln()
    is not guaranteed correctly rounded across engines (~1 ulp — the
    q_pagerank rounding discipline). The caller sums the 20 terms for
    the headline PSI.
    """
    ev = load_table(spark, sf_dir, "events")
    return psi_from_buckets(psi_bucket_counts(ev))


# --------------------------------------------------------------------------
# an-17 (ext) — depth-2 greedy tree (driver-chained recursive split search)
# --------------------------------------------------------------------------


def _tree_oracle_sql() -> str:
    """Generate the depth-2 tree oracle: the stump argmax block is
    stamped once per node, children conditioned on the ROOT's own
    SQL-computed split via scalar subqueries (no hard-coded answer)."""

    def gini(pos: str, n: str) -> str:
        return (
            f"(1.0 - ({pos} / {n}) * ({pos} / {n})"
            f" - (({n} - {pos}) / {n}) * (({n} - {pos}) / {n}))"
        )

    def block(s: str, flt: str) -> str:
        gain = (
            gini("t.pos", "t.n")
            + f" - (c.n_left / t.n) * "
            + gini("c.pos_left", "c.n_left")
            + f" - ((t.n - c.n_left) / t.n) * "
            + gini("(t.pos - c.pos_left)", "(t.n - c.n_left)")
        )
        return f"""
    , base_{s} AS (
        SELECT * FROM base WHERE {flt}
    ), pairs_{s} AS (
        SELECT 'qty' AS feature, qty AS value, y FROM base_{s}
        UNION ALL
        SELECT 'tax_c', tax_c, y FROM base_{s}
    ), hist_{s} AS (
        SELECT feature, value, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
        FROM pairs_{s} GROUP BY feature, value
    ), tot_{s} AS (
        SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS pos FROM base_{s}
    ), cand_{s} AS (
        SELECT feature, value AS threshold,
               CAST(sum(n) OVER w AS BIGINT) AS n_left,
               CAST(sum(pos) OVER w AS BIGINT) AS pos_left
        FROM hist_{s}
        WINDOW w AS (PARTITION BY feature ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        QUALIFY n_left < (SELECT n FROM tot_{s})
    ), best_{s} AS (
        SELECT '{s}' AS node, c.feature, c.threshold, c.n_left, c.pos_left,
               (t.n - c.n_left) AS n_right,
               (t.pos - c.pos_left) AS pos_right,
               {gain} AS gain
        FROM cand_{s} c CROSS JOIN tot_{s} t
        ORDER BY gain DESC, c.feature, c.threshold
        LIMIT 1
    )"""

    root_feat = "(SELECT feature FROM best_root)"
    root_thr = "(SELECT threshold FROM best_root)"
    child = (
        f"(CASE WHEN {root_feat} = 'qty' THEN qty ELSE tax_c END)"
    )
    return (
        """
    WITH base AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_c,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    )"""
        + block("root", "TRUE")
        + block("left", f"{child} <= {root_thr}")
        + block("right", f"{child} > {root_thr}")
        + """
    SELECT * FROM best_root
    UNION ALL SELECT * FROM best_left
    UNION ALL SELECT * FROM best_right
    """
    )


@contract("q_tree_depth2", oracle=_tree_oracle_sql())
def q_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 greedy Gini tree on the stump's features: the root split,
    then the best split recomputed INSIDE each child population — the
    driver-chained grow loop of a distributed GBT (per-node work is
    cluster-side histogram aggregation; only one best-split row is
    collected per node).

    The oracle re-derives the whole tree blind: the stump argmax block
    is stamped per node and the child populations are conditioned on the
    root's own SQL-computed (feature, threshold) through scalar
    subqueries, so a wrong root choice cascades into mismatched child
    rows. Same bit-exactness argument as q_decision_stump.
    """
    from mapreduce_hw05_spark.operators.trees import grow_tree_depth2

    li = load_table(spark, sf_dir, "lineitem")
    feats = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_tax") * 100 + 0.5).cast("long").alias("tax_c"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    return grow_tree_depth2(feats, ["qty", "tax_c"], "y")


# --------------------------------------------------------------------------
# an-18 (ext) — two-sample Kolmogorov–Smirnov drift statistic (bit-exact)
# --------------------------------------------------------------------------


@contract(
    "q_ks_test",
    oracle="""
    WITH pts AS (
        SELECT CAST(floor(value * 1000) AS BIGINT) AS v,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b
        FROM events GROUP BY v
    ), tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS na,
               CAST(sum(b) AS BIGINT) AS nb FROM pts
    ), ecdf AS (
        SELECT v,
               abs(CAST(sum(a) OVER w AS BIGINT) / CAST(t.na AS DOUBLE)
                   - CAST(sum(b) OVER w AS BIGINT) / CAST(t.nb AS DOUBLE))
                   AS gap
        FROM pts CROSS JOIN tot t
        WINDOW w AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT (SELECT na FROM tot) AS n_a,
           (SELECT nb FROM tot) AS n_b,
           max(gap) AS ks_d,
           CAST(min(CASE WHEN gap = (SELECT max(gap) FROM ecdf) THEN v END)
                AS BIGINT) AS argmax_v
    FROM ecdf
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the user-parity
    event-value populations (millisecond-quantized values, the PSI
    contract's split) — the distribution-free drift test next to
    q_drift_psi's binned one.

    Bit-exact: ECDF steps are ratios of exact cumulative integers, the
    gap is a two-division-one-subtract chain, and max() needs no order —
    D and its argmax location are emitted unrounded. The cumulative
    window runs over the DISTINCT-value table (quantized-value-sized,
    not event-sized); a corpus-scale exact KS would range-partition the
    cumsum (q_global_sort machinery) instead of a single-partition
    window.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    pts = ev.groupBy(
        F.floor(F.col("value") * 1000).cast("long").alias("v")
    ).agg(
        lng(F.sum((F.col("user_id") % 2 == 0).cast("int"))).alias("a"),
        lng(F.sum((F.col("user_id") % 2 == 1).cast("int"))).alias("b"),
    )
    tot = pts.agg(F.sum("a").alias("na"), F.sum("b").alias("nb")).first()
    na, nb = int(tot["na"]), int(tot["nb"])
    # global-window: ecdf over floor(value*1000) keys (≤1001 rows, key-
    # domain-bounded; a corpus-scale exact KS would range-partition)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = pts.select(
        "v",
        F.abs(
            F.sum("a").over(w).cast("long") / F.lit(float(na))
            - F.sum("b").over(w).cast("long") / F.lit(float(nb))
        ).alias("gap"),
    ).localCheckpoint()
    dmax = ecdf.agg(F.max("gap")).first()[0]
    return ecdf.agg(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.max("gap").alias("ks_d"),
        lng(
            F.min(F.when(F.col("gap") == F.lit(dmax), F.col("v")))
        ).alias("argmax_v"),
    )


# --------------------------------------------------------------------------
# an-18 (ext) — autocorrelation function of the hourly traffic series
# --------------------------------------------------------------------------


#: shared verbatim by the batch and streaming ACF contracts.
ACF_ORACLE_SQL = """
    WITH hourly AS (
        SELECT CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT)
                   AS hour_epoch,
               count(*) AS x
        FROM events GROUP BY hour_epoch
    ), idx AS (
        SELECT row_number() OVER (ORDER BY hour_epoch) AS rn, x FROM hourly
    ), totals AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS q,
               CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) / count(*) AS xbar
        FROM idx
    ), lags AS (
        SELECT unnest([1, 2, 3, 4, 5, 6]) AS lag
    ), perlag AS (
        SELECT l.lag AS lag,
               count(*) AS n_pairs,
               CAST(sum(a.x * b.x) AS BIGINT) AS c,
               CAST(sum(a.x) AS BIGINT) AS sh,
               CAST(sum(b.x) AS BIGINT) AS st
        FROM lags l
        JOIN idx a ON TRUE
        JOIN idx b ON b.rn = a.rn + l.lag
        GROUP BY l.lag
    )
    SELECT CAST(p.lag AS BIGINT) AS lag,
           p.n_pairs,
           (CAST(p.c AS DOUBLE) - t.xbar * CAST(p.sh + p.st AS DOUBLE)
                + CAST(p.n_pairs AS DOUBLE) * t.xbar * t.xbar)
           / (CAST(t.q AS DOUBLE) - CAST(t.s AS DOUBLE) * t.xbar) AS acf
    FROM perlag p CROSS JOIN totals t
    """


def hourly_type_counts(ev: DataFrame) -> DataFrame:
    """(event_type, hour_epoch) → exact event count — order-free and
    additive, the one rollup that feeds the ACF, Fano, and anomaly-rate
    finishers; a streaming sink folding per-batch deltas lands on the
    identical table."""
    return ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
    ).agg(F.count("*").cast("long").alias("x"))


def acf_from_hourly_counts(h: DataFrame) -> DataFrame:
    """Finish the lag-1..6 autocorrelation from the typed hourly-count
    table (re-aggregated to the global hourly series first) — shared
    verbatim by the batch and streaming contracts."""
    from pyspark.sql import Window

    hourly = h.groupBy("hour_epoch").agg(lng(F.sum("x")).alias("x"))
    totals = hourly.agg(
        F.count("*").alias("n"),
        lng(F.sum("x")).alias("s"),
        lng(F.sum(F.col("x") * F.col("x"))).alias("q"),
    ).select(
        "n", "s", "q",
        (F.col("s").cast("double") / F.col("n")).alias("xbar"),
    )
    # global-window: global hourly series (O(hours), time-range-bounded)
    w = Window.orderBy("hour_epoch")
    lagged = hourly.select(
        F.col("x"),
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in range(1, 7)],
    )
    pairs = lagged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"l{k}").alias("xh"),
                        F.col("x").alias("xt"),
                    )
                    for k in range(1, 7)
                ]
            )
        ).alias("p")
    ).select("p.*").filter(F.col("xh").isNotNull())
    perlag = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        lng(F.sum(F.col("xh") * F.col("xt"))).alias("c"),
        lng(F.sum("xh")).alias("sh"),
        lng(F.sum("xt")).alias("st"),
    )
    # one-row: global totals
    joined = perlag.crossJoin(F.broadcast(totals))
    acf = (
        F.col("c").cast("double")
        - F.col("xbar") * (F.col("sh") + F.col("st")).cast("double")
        + F.col("n_pairs").cast("double") * F.col("xbar") * F.col("xbar")
    ) / (F.col("q").cast("double") - F.col("s").cast("double") * F.col("xbar"))
    return joined.select("lag", "n_pairs", acf.alias("acf"))


def fano_from_hourly_counts(h: DataFrame) -> DataFrame:
    """Finish the Fano factor from the typed hourly-count table —
    shared verbatim by the batch and streaming contracts."""
    moments = h.groupBy("event_type").agg(
        F.count("*").alias("n"),
        lng(F.sum("x")).alias("s"),
        lng(F.sum(F.col("x") * F.col("x"))).alias("q"),
    )
    fano = (
        F.col("n") * F.col("q") - F.col("s") * F.col("s")
    ).cast("double") / ((F.col("n") - 1) * F.col("s")).cast("double")
    return moments.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("s").alias("n_events"),
        F.when((F.col("n") > 1) & (F.col("s") > 0), fano).alias("fano"),
    )


@contract("q_acf_lags", oracle=ACF_ORACLE_SQL)
def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series at lags
    1–6 — the seasonality/burstiness detector run before picking a
    forecasting model.

    Bit-exact: the series is exact BIGINT counts, every per-lag moment
    (Σx_t·x_{t+k}, head/tail sums) and the global moments (n, Σx, Σx²)
    are order-free integer aggregates, and the final r_k is one shared
    expression tree of IEEE ops on those exact integers — identical on
    both engines with no rounding. The six lag columns come out of ONE
    window pass (series-sized single partition: the hourly rollup is
    hours-count-sized, not event-sized; at 100 TB the rollup shuffle is
    the only data-sized exchange and the series stays tiny). Integer
    moments are exact while hourly counts stay below ~2²⁶ per hour;
    past that, widen to DECIMAL(38) on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return acf_from_hourly_counts(hourly_type_counts(ev))


# --------------------------------------------------------------------------
# an-19 (ext) — Holt linear-trend smoothing of the hourly mean-value series
# --------------------------------------------------------------------------


@contract(
    "q_holt_linear",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT)
                   AS hour_epoch,
               CAST(sum(floor(value * 1000)) AS BIGINT) AS s,
               count(*) AS n
        FROM events GROUP BY event_type, hour_epoch
    ), seq AS (
        SELECT event_type, hour_epoch, s / (1000.0 * n) AS x FROM hourly
    ), series AS (
        SELECT event_type, list(x ORDER BY hour_epoch) AS xs
        FROM seq GROUP BY event_type
    ), folded AS (
        SELECT event_type,
               CAST(len(xs) AS BIGINT) AS n_hours,
               list_reduce(
                   list_transform(xs, v -> [v, 0.0]),
                   (acc, e) -> [
                       0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                       0.25 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                               - acc[1]) + 0.75 * acc[2]
                   ]
               ) AS lb
        FROM series
    )
    SELECT event_type, n_hours,
           lb[1] AS level,
           lb[2] AS trend,
           lb[1] + 3.0 * lb[2] AS forecast_3
    FROM folded
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level α=1/2, trend β=1/4) of
    the hourly mean event value per type, with the 3-hour-ahead linear
    forecast — the trend-aware upgrade of q_ewma_hourly.

    Bit-exact by the EWMA recipe: the series is exact integer ratios,
    the smoothing constants are dyadic, and BOTH engines run the SAME
    oldest→newest fold (Spark ``aggregate`` HOF; DuckDB ``list_reduce``
    over 2-element level/trend accumulators seeded from the first
    observation) — identical IEEE ops in identical order, so level,
    trend, and forecast need no rounding. The collect_list is per-type
    hours-count-sized (series-sized, never event-sized); the hourly
    rollup is the only data-sized shuffle at 100 TB.
    """
    from mapreduce_hw05_spark.plans.events_queries import hourly_value_stats

    ev = load_table(spark, sf_dir, "events")
    seq = hourly_value_stats(ev).select(
        "event_type",
        "hour_epoch",
        (F.col("s") / (1000.0 * F.col("n"))).alias("x"),
    )
    series = seq.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("hour_epoch", "x"))),
            lambda t: t["x"],
        ).alias("xs")
    )

    def _step(acc, x):
        level = 0.5 * x + 0.5 * (acc[0] + acc[1])
        trend = (
            0.25 * ((0.5 * x + 0.5 * (acc[0] + acc[1])) - acc[0])
            + 0.75 * acc[1]
        )
        return F.array(level, trend)

    folded = series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_hours"),
        F.aggregate(
            F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
            F.array(F.element_at("xs", 1), F.lit(0.0)),
            _step,
        ).alias("lb"),
    )
    return folded.select(
        "event_type",
        "n_hours",
        F.element_at("lb", 1).alias("level"),
        F.element_at("lb", 2).alias("trend"),
        (F.element_at("lb", 1) + 3.0 * F.element_at("lb", 2)).alias(
            "forecast_3"
        ),
    )


# --------------------------------------------------------------------------
# an-20 (ext) — CUSUM change-point detection on the daily revenue series
# --------------------------------------------------------------------------


#: shared verbatim by the batch and streaming CUSUM contracts — the
#: streaming rollup lands on the identical daily table, so both match
#: this oracle bit-for-bit.
CUSUM_ORACLE_SQL = """
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(date_trunc('day', ts)) // 1000000 AS BIGINT)
                   AS day_epoch,
               CAST(sum(floor(value * 1000)) AS BIGINT) AS s
        FROM events GROUP BY event_type, day_epoch
    ), dev AS (
        SELECT event_type, day_epoch,
               count(*) OVER (PARTITION BY event_type) AS n_days,
               abs(
                   count(*) OVER (PARTITION BY event_type)
                   * CAST(sum(s) OVER (PARTITION BY event_type
                                       ORDER BY day_epoch
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT)
                   - row_number() OVER (PARTITION BY event_type
                                        ORDER BY day_epoch)
                   * CAST(sum(s) OVER (PARTITION BY event_type) AS BIGINT)
               ) AS abs_dev
        FROM daily
    ), ranked AS (
        SELECT event_type, n_days, day_epoch, abs_dev,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs_dev DESC, day_epoch)
                   AS pick
        FROM dev
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           day_epoch AS cp_day_epoch,
           abs_dev AS max_abs_dev
    FROM ranked WHERE pick = 1
    """


def daily_revenue_stats(ev: DataFrame) -> DataFrame:
    """(event_type, day_epoch) → exact integer s = Σ⌊value·1000⌋ —
    order-free and additive, so a streaming sink can fold per-batch
    deltas and land on the identical daily table."""
    return ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_epoch"),
    ).agg(lng(F.sum(F.floor(F.col("value") * 1000))).alias("s"))


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """Finish the CUSUM argmax from the exact daily table — shared
    verbatim by the batch and streaming contracts so their outputs are
    bit-identical by construction."""
    from pyspark.sql import Window

    part = Window.partitionBy("event_type")
    run = part.orderBy("day_epoch").rowsBetween(Window.unboundedPreceding, 0)
    dev = daily.select(
        "event_type",
        "day_epoch",
        F.count("*").over(part).alias("n_days"),
        F.abs(
            F.count("*").over(part) * F.sum("s").over(run).cast("long")
            - F.row_number().over(part.orderBy("day_epoch"))
            * F.sum("s").over(part).cast("long")
        ).alias("abs_dev"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("abs_dev").desc(), "day_epoch"
    )
    return (
        dev.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("day_epoch").alias("cp_day_epoch"),
            F.col("abs_dev").alias("max_abs_dev"),
        )
    )


@contract("q_cusum_changepoint", oracle=CUSUM_ORACLE_SQL)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point sweep over the daily revenue series per event
    type: the day maximizing |n·cumsum_t − t·total| — the classic
    mean-shift detector, scale-free in integers.

    Bit-exact with ZERO floating point: daily sums of ⌊value·1000⌋ are
    order-free BIGINTs, the running cumsum is integer window arithmetic
    (DuckDB's segment-tree window order cannot perturb integer sums),
    and the argmax tiebreaks on the earliest day. Windows partition by
    event_type over a days-count-sized rollup — never event-sized. The
    products n·cum and t·total stay below ~2⁶⁰ while per-type total
    quantized revenue × days < 2⁶⁰; widen to DECIMAL(38) past that.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    return cusum_from_daily(daily_revenue_stats(ev))


# --------------------------------------------------------------------------
# an-21 (ext) — Gini concentration of customer revenue per nation
# --------------------------------------------------------------------------


@contract(
    "q_gini_concentration",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nk, o.o_custkey AS cust,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT nk, cents,
               row_number() OVER (PARTITION BY nk ORDER BY cents, cust)
                   AS i
        FROM rev
    ), pernation AS (
        SELECT nk, count(*) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(i * cents) AS BIGINT) AS w
        FROM ranked GROUP BY nk
    )
    SELECT n.n_name AS n_name, p.n_customers, p.total_cents,
           CAST(2 * p.w - (p.n_customers + 1) * p.total_cents AS DOUBLE)
           / CAST(p.n_customers * p.total_cents AS DOUBLE) AS gini
    FROM pernation p JOIN nation n ON p.nk = n.n_nationkey
    """,
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue within each nation
    — the inequality/concentration readout (is revenue spread evenly or
    whale-dominated?) via the exact sorted-rank formula
    G = (2Σi·xᵢ − (n+1)Σx) / (nΣx).

    Bit-exact: revenue is cent-quantized BIGINT, ranks come from a
    per-nation window with a custkey tiebreak, both moments are
    order-free integer sums, and the single final division of exact
    integers is engine-identical. Customers with no orders don't enter
    (inner join). The rank window partitions by nation over the
    customer-sized rollup; at 100 TB the only data-sized shuffle is the
    per-customer aggregate, and Σi·x stays below 2⁶³ while
    customers/nation × total cents < 2⁶³ — widen to DECIMAL(38) past
    that.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("o_custkey").alias("cust"),
        )
        .agg(
            lng(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                )
            ).alias("cents")
        )
    )
    ranked = rev.withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("nk").orderBy("cents", "cust")
        ),
    )
    pernation = ranked.groupBy("nk").agg(
        F.count("*").alias("n_customers"),
        lng(F.sum("cents")).alias("total_cents"),
        lng(F.sum(F.col("i") * F.col("cents"))).alias("w"),
    )
    gini = (
        2 * F.col("w") - (F.col("n_customers") + 1) * F.col("total_cents")
    ).cast("double") / (F.col("n_customers") * F.col("total_cents")).cast(
        "double"
    )
    return pernation.join(
        # dim-sized: nation
        F.broadcast(nation), pernation.nk == nation.n_nationkey
    ).select(
        F.col("n_name").alias("n_name"),
        "n_customers",
        "total_cents",
        gini.alias("gini"),
    )


# --------------------------------------------------------------------------
# an-22 (ext) — association rules over co-purchased parts
# --------------------------------------------------------------------------


@contract(
    "q_association_rules",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
    ), supp AS (
        SELECT l_partkey AS item, count(*) AS s FROM items GROUP BY 1
    ), pair AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS s_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ), rules AS (
        SELECT pa AS antecedent, pb AS consequent, s_ab FROM pair
        UNION ALL
        SELECT pb, pa, s_ab FROM pair
    )
    SELECT r.antecedent, r.consequent,
           CAST(r.s_ab AS BIGINT) AS s_ab,
           CAST(r.s_ab AS DOUBLE) / sa.s AS confidence,
           CAST(r.s_ab * n.n_orders AS DOUBLE)
               / CAST(sa.s * sc.s AS DOUBLE) AS lift
    FROM rules r
    JOIN supp sa ON r.antecedent = sa.item
    JOIN supp sc ON r.consequent = sc.item
    CROSS JOIN n
    ORDER BY lift DESC, r.antecedent, r.consequent
    LIMIT 20
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 association rules a→b over co-purchased parts (pair
    support ≥ 2), ranked by lift with confidence alongside — the
    market-basket mining readout built from the same keyed per-order
    self-join as the co-purchase graph (per-order fan-out, never
    all-pairs; singleton supports are one distinct-pair aggregate).

    Bit-exact: supports are exact integers, confidence is one integer
    division, lift is one division of two exact integer products
    (s_ab·n < 2⁶³ trivially), and ties break on the (antecedent,
    consequent) pair — no rounding anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    supp = items.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").alias("s")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("s_ab"))
        .filter(F.col("s_ab") >= 2)
    )
    rules = pair.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "s_ab",
    ).unionAll(
        pair.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "s_ab",
        )
    )
    sa = supp.select(F.col("item").alias("antecedent"), F.col("s").alias("sa"))
    sc = supp.select(F.col("item").alias("consequent"), F.col("s").alias("sc"))
    scored = rules.join(sa, "antecedent").join(sc, "consequent")
    return (
        scored.select(
            "antecedent",
            "consequent",
            F.col("s_ab").cast("long").alias("s_ab"),
            (F.col("s_ab").cast("double") / F.col("sa")).alias("confidence"),
            (
                (F.col("s_ab") * F.lit(n_orders)).cast("double")
                / (F.col("sa") * F.col("sc")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(20)
    )


# --------------------------------------------------------------------------
# an-23 (ext) — MAD-based robust outlier counts per event type
# --------------------------------------------------------------------------


@contract(
    "q_mad_outliers",
    oracle="""
    WITH q AS (
        SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v
        FROM events
    ), med AS (
        SELECT event_type, median(v) AS med_v FROM q GROUP BY event_type
    ), dev AS (
        SELECT q.event_type, q.v, abs(q.v - m.med_v) AS d
        FROM q JOIN med m ON q.event_type = m.event_type
    ), mad AS (
        SELECT event_type, median(d) AS mad_v FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n,
           m.med_v,
           mm.mad_v,
           CAST(sum(CASE WHEN d.d * 0.6745 > 3.5 * mm.mad_v
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med m ON d.event_type = m.event_type
    JOIN mad mm ON d.event_type = mm.event_type
    GROUP BY d.event_type, m.med_v, mm.mad_v
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: modified z-score
    0.6745·|v−median| / MAD > 3.5 over millisecond-quantized values —
    the median-based sweep that survives the heavy tails that wreck
    mean/σ rules (q_anomaly_hours' z² cousin).

    Bit-exact without rounding: the input is exact BIGINTs, each median
    is exact-dyadic (integer or integer+½, and the even-count midpoint
    (a+b)/2 vs a+(b−a)·0.5 interpolations are BOTH exact on dyadics, so
    the engines agree bit-for-bit), deviations are exact differences,
    and the outlier test compares two single-multiply expressions.
    Exact medians are a per-group sort — the single-pass mergeable
    alternative at 100 TB is the KLL sketch (q_kll_rollup); the
    broadcast median join keeps the second pass map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type", F.floor(F.col("value") * 1000).cast("long").alias("v")
    )
    med = q.groupBy("event_type").agg(F.median("v").alias("med_v"))
    # label-sized: one row per event_type
    dev = q.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_v",
        F.abs(F.col("v") - F.col("med_v")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(F.median("d").alias("mad_v"))
    return (
        # label-sized: one row per event_type
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_v", "mad_v")
        .agg(
            F.count("*").alias("n"),
            lng(
                F.sum(
                    (F.col("d") * 0.6745 > 3.5 * F.col("mad_v")).cast("int")
                )
            ).alias("n_outliers"),
        )
        .select("event_type", "n", "med_v", "mad_v", "n_outliers")
    )


# --------------------------------------------------------------------------
# an-27 (ext) — chi-square test of independence (event type × user parity)
# --------------------------------------------------------------------------


#: shared verbatim by the batch and streaming chi-square contracts.
CHI_SQUARE_ORACLE_SQL = """
    WITH o AS (
        SELECT event_type, user_id % 2 AS par, count(*) AS obs
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(sum(obs) AS BIGINT) AS n,
               count(DISTINCT event_type) AS n_rows,
               count(DISTINCT par) AS n_cols
        FROM o
    ), rt AS (
        SELECT event_type, CAST(sum(obs) AS BIGINT) AS r FROM o GROUP BY 1
    ), ct AS (
        SELECT par, CAST(sum(obs) AS BIGINT) AS c FROM o GROUP BY 1
    ), terms AS (
        SELECT CAST(floor(
                   (o.obs - CAST(rt.r * ct.c AS DOUBLE) / t.n)
                   * (o.obs - CAST(rt.r * ct.c AS DOUBLE) / t.n)
                   / (CAST(rt.r * ct.c AS DOUBLE) / t.n)
                   * 1000000000
               ) AS BIGINT) AS q
        FROM o
        JOIN rt ON o.event_type = rt.event_type
        JOIN ct ON o.par = ct.par
        CROSS JOIN tot t
    )
    SELECT t.n AS n_events,
           CAST((t.n_rows - 1) * (t.n_cols - 1) AS BIGINT) AS dof,
           CAST(sum(terms.q) AS BIGINT) AS chi2_q9,
           sqrt(CAST(sum(terms.q) AS DOUBLE) / 1000000000
                / (t.n * least(t.n_rows - 1, t.n_cols - 1))) AS cramers_v
    FROM terms CROSS JOIN tot t
    GROUP BY t.n, t.n_rows, t.n_cols
    """


def contingency_stats(ev: DataFrame) -> DataFrame:
    """(event_type, par) → exact observed count — the additive
    contingency table a streaming sink can maintain."""
    return ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("par")
    ).agg(F.count("*").cast("long").alias("obs"))


def chi_square_from_contingency(o: DataFrame) -> DataFrame:
    """Finish the chi-square statistic from the exact contingency table
    — shared verbatim by the batch and streaming contracts."""
    tot = o.agg(
        lng(F.sum("obs")).alias("n"),
        F.countDistinct("event_type").alias("n_rows"),
        F.countDistinct("par").alias("n_cols"),
    )
    rt = o.groupBy("event_type").agg(lng(F.sum("obs")).alias("r"))
    ct = o.groupBy("par").agg(lng(F.sum("obs")).alias("c"))
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    term = (F.col("obs") - e) * (F.col("obs") - e) / e * 1000000000
    terms = (
        # label-sized: one row per event_type
        o.join(F.broadcast(rt), "event_type")
        # label-sized: one row per parity bucket
        .join(F.broadcast(ct), "par")
        # one-row: global total
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_rows",
            "n_cols",
            F.floor(term).cast("long").alias("q"),
        )
    )
    return terms.groupBy("n", "n_rows", "n_cols").agg(
        lng(F.sum("q")).alias("chi2_q9")
    ).select(
        F.col("n").alias("n_events"),
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("long")
        .alias("dof"),
        "chi2_q9",
        F.sqrt(
            F.col("chi2_q9").cast("double")
            / 1000000000
            / (F.col("n") * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1))
        ).alias("cramers_v"),
    )


@contract("q_chi_square", oracle=CHI_SQUARE_ORACLE_SQL)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    the user-parity split (the A/B assignment q_ab_test_stats uses),
    with Cramér's V — the categorical-association readout of an
    experiment-health check ("did assignment skew traffic?").

    Bit-exact: observed/marginal counts are exact integers, each cell's
    (O−E)²/E is one shared IEEE expression tree on those integers and is
    quantized to ⌊·10⁹⌋ BEFORE summing (cells sum order-free as
    BIGINTs — a raw float Σ over cells would be order-dependent), and
    Cramér's V is a deterministic single-op chain on the quantized
    statistic. One data-sized aggregate; everything after is
    cells-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    return chi_square_from_contingency(contingency_stats(ev))


# --------------------------------------------------------------------------
# an-28 (ext) — Fano factor (burstiness) of hourly traffic per type
# --------------------------------------------------------------------------


#: shared verbatim by the batch and streaming Fano contracts.
FANO_ORACLE_SQL = """
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT)
                   AS hour_epoch,
               count(*) AS x
        FROM events GROUP BY 1, 2
    ), moments AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS q
        FROM hourly GROUP BY event_type
    )
    SELECT event_type, n AS n_hours, s AS n_events,
           CASE WHEN n > 1 AND s > 0 THEN
               CAST(n * q - s * s AS DOUBLE) / CAST((n - 1) * s AS DOUBLE)
           END AS fano
    FROM moments
    """


@contract("q_fano_factor", oracle=FANO_ORACLE_SQL)
def q_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (sample variance ÷ mean) of the hourly event-count
    series per type — the burstiness index: ≈1 for Poisson traffic,
    > 1 for bursty arrivals, < 1 for regular ones.

    Bit-exact with a single division: (n·Σx² − S²) / ((n−1)·S) on
    order-free integer moments — the variance/mean ratio needs no
    intermediate floats at all. Guarded NULL for degenerate series.
    """
    ev = load_table(spark, sf_dir, "events")
    return fano_from_hourly_counts(hourly_type_counts(ev))


# --------------------------------------------------------------------------
# an-26 (ext) — Benford first-digit conformance of order totals
# --------------------------------------------------------------------------

#: log10(1 + 1/d) for d = 1..9, written as the EXACT same decimal
#: literals in the Spark plan and the DuckDB oracle — both engines parse
#: a decimal literal to the nearest IEEE double, so the constants are
#: bit-identical without either engine evaluating a log.
_BENFORD_P = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
) + " END"


@contract(
    "q_benford_digits",
    oracle=f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(count(*) AS BIGINT) AS n_obs
        FROM orders GROUP BY digit
    ), tot AS (
        SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM d
    ), e AS (
        SELECT digit, n_obs,
               CAST(n AS DOUBLE) * ({_BENFORD_CASE_SQL}) AS expected
        FROM d CROSS JOIN tot
    )
    SELECT digit, n_obs, expected,
           (CAST(n_obs AS DOUBLE) - expected)
               * (CAST(n_obs AS DOUBLE) - expected) / expected AS chi2_term
    FROM e ORDER BY digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / fraud screen: per leading digit, the observed
    count, the Benford-expected count, and the chi-square contribution
    (caller sums the ≤9 terms for the test statistic against chi²(8)).

    Bit-exact with zero rounding: digit counts are exact integers off
    one aggregate, the nine Benford probabilities are shared decimal
    LITERALS (not engine-evaluated logs — see ``_BENFORD_P``), and each
    expected/chi² value is one fixed-shape IEEE expression tree on
    those exact inputs, identical on both engines. The digit extraction
    is string-first-char of the integer part, exact on DECIMAL inputs.
    At 100 TB the plan is one map-side-combinable 9-group aggregate
    plus a broadcast of the single-row total — no data-sized shuffle
    beyond the partial-agg exchange.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    ).agg(F.count("*").cast("long").alias("n_obs"))
    tot = d.agg(lng(F.sum("n_obs")).alias("n"))
    p_case = F.when(F.col("digit") == 1, F.lit(float(_BENFORD_P[1])))
    for dig in range(2, 10):
        p_case = p_case.when(
            F.col("digit") == dig, F.lit(float(_BENFORD_P[dig]))
        )
    # one-row: global total
    e = d.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        (F.col("n").cast("double") * p_case).alias("expected"),
    )
    chi2 = (
        (F.col("n_obs").cast("double") - F.col("expected"))
        * (F.col("n_obs").cast("double") - F.col("expected"))
        / F.col("expected")
    )
    return e.select(
        "digit", "n_obs", "expected", chi2.alias("chi2_term")
    ).orderBy("digit")


# --------------------------------------------------------------------------
# an-27 (ext) — between-decile Theil index of customer revenue per nation
# --------------------------------------------------------------------------


@contract(
    "q_theil_deciles",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nk, o.o_custkey AS cust,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), bucketed AS (
        SELECT nk, cents,
               ntile(10) OVER (PARTITION BY nk ORDER BY cents, cust)
                   AS decile
        FROM rev
    ), pergroup AS (
        SELECT nk, decile, count(*) AS n_g,
               CAST(sum(cents) AS BIGINT) AS x_g
        FROM bucketed GROUP BY nk, decile
    ), pernation AS (
        SELECT nk, CAST(sum(n_g) AS BIGINT) AS n,
               CAST(sum(x_g) AS BIGINT) AS x
        FROM pergroup GROUP BY nk
    )
    SELECT nt.n_name AS n_name, g.decile,
           CAST(g.n_g AS BIGINT) AS n_customers, g.x_g AS x_g_cents,
           round((CAST(g.x_g AS DOUBLE) / p.x)
                 * ln((CAST(g.x_g AS DOUBLE) / p.x)
                      / (CAST(g.n_g AS DOUBLE) / p.n)), 9) AS theil_term
    FROM pergroup g
    JOIN pernation p ON g.nk = p.nk
    JOIN nation nt ON g.nk = nt.n_nationkey
    """,
)
def q_theil_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-decile Theil-T decomposition of per-customer order
    revenue within each nation — the additively-decomposable inequality
    index (unlike Gini): each revenue decile contributes
    (X_g/X)·ln((X_g/X)/(n_g/n)), the caller sums the 10 terms per
    nation for the between-group Theil, and a term's sign says whether
    that decile holds more or less than its population share.
    Complements [[q_gini_concentration]] on the same revenue rollup.

    Bit-exact discipline: cent-quantized BIGINT revenue, deterministic
    ntile bucketing (cents, custkey tie-break — identical SQL-standard
    ceil-first semantics on both engines), exact integer group moments,
    and one fixed-shape IEEE chain per term rounded at 9 decimals only
    for the ~1-ulp ln(). Terms are emitted per (nation, decile) rather
    than pre-summed precisely because summing rounded doubles is
    order-dependent — the PSI-terms discipline. At 100 TB the
    data-sized work is the per-customer rollup; the ntile window runs
    per nation over customer-sized rows and everything after is
    250-row-sized.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("o_custkey").alias("cust"),
        )
        .agg(
            lng(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                )
            ).alias("cents")
        )
    )
    w = Window.partitionBy("nk").orderBy("cents", "cust")
    bucketed = rev.select("nk", "cents", F.ntile(10).over(w).alias("decile"))
    pergroup = bucketed.groupBy("nk", "decile").agg(
        F.count("*").alias("n_g"), lng(F.sum("cents")).alias("x_g")
    )
    pernation = pergroup.groupBy("nk").agg(
        lng(F.sum("n_g")).alias("n"), lng(F.sum("x_g")).alias("x")
    )
    share_x = F.col("x_g").cast("double") / F.col("x")
    share_n = F.col("n_g").cast("double") / F.col("n")
    return (
        # label-sized: one aggregate row per nation
        pergroup.join(F.broadcast(pernation), "nk")
        .join(
            # dim-sized: nation
            F.broadcast(nation), F.col("nk") == F.col("n_nationkey")
        )
        .select(
            "n_name",
            "decile",
            F.col("n_g").cast("long").alias("n_customers"),
            F.col("x_g").alias("x_g_cents"),
            F.round(share_x * F.log(share_x / share_n), 9).alias(
                "theil_term"
            ),
        )
    )


# --------------------------------------------------------------------------
# an-28 (ext) — Spearman rank correlation (acctbal vs revenue) per nation
# --------------------------------------------------------------------------


@contract(
    "q_spearman_corr",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS cust,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), joined AS (
        SELECT c.c_nationkey AS nk, r.cust,
               CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
               r.cents
        FROM rev r JOIN customer c ON r.cust = c.c_custkey
    ), ranked AS (
        SELECT nk,
               row_number() OVER (PARTITION BY nk ORDER BY bal_cents, cust)
                   AS rx,
               row_number() OVER (PARTITION BY nk ORDER BY cents, cust)
                   AS ry
        FROM joined
    ), agg AS (
        SELECT nk, CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
        FROM ranked GROUP BY nk
    )
    SELECT nt.n_name AS n_name, a.n_customers, a.sum_d2,
           1.0 - CAST(6 * a.sum_d2 AS DOUBLE)
               / CAST(a.n_customers * (a.n_customers * a.n_customers - 1)
                      AS DOUBLE) AS rho
    FROM agg a JOIN nation nt ON a.nk = nt.n_nationkey
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance and
    their lifetime order revenue, per nation — the robust (monotone, not
    linear) complement to the Pearson ``corr`` in [[q_stats_moments]].
    Ranks are deterministic row_numbers with a custkey tie-break, so the
    statistic is the standard no-ties formula rho = 1 − 6·Σd²/(n(n²−1))
    computed over reproducible ranks.

    Bit-exact with ZERO rounding: cent-quantized inputs, integer ranks,
    exact BIGINT Σd² (≤ n³ ≈ 2e11 per nation at sf0.1 — far inside
    BIGINT), and the final value is one exact-int→double divide plus one
    subtract — single IEEE ops are engine-identical. At 100 TB the plan
    is a per-customer rollup plus two per-nation window ranks over
    customer-sized rows (25 nations ⇒ modest per-partition sorts; a
    skewed tenant key would want range-partitioned ranking instead).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        lng(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        ).alias("cents")
    )
    joined = rev.join(
        customer, F.col("cust") == F.col("c_custkey")
    ).select(
        F.col("c_nationkey").alias("nk"),
        "cust",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias(
            "bal_cents"
        ),
        "cents",
    )
    rx = F.row_number().over(W.partitionBy("nk").orderBy("bal_cents", "cust"))
    ry = F.row_number().over(W.partitionBy("nk").orderBy("cents", "cust"))
    ranked = joined.select("nk", rx.alias("rx"), ry.alias("ry"))
    d = F.col("rx") - F.col("ry")
    agg = ranked.groupBy("nk").agg(
        lng(F.count("*")).alias("n_customers"),
        lng(F.sum(d * d)).alias("sum_d2"),
    )
    n = F.col("n_customers")
    rho = F.lit(1.0) - (6 * F.col("sum_d2")).cast("double") / (
        n * (n * n - 1)
    ).cast("double")
    return agg.join(
        # dim-sized: nation
        F.broadcast(nation), F.col("nk") == F.col("n_nationkey")
    ).select("n_name", "n_customers", "sum_d2", rho.alias("rho"))


# --------------------------------------------------------------------------
# an-29 (ext) — mutual information between event type and hour of day
# --------------------------------------------------------------------------


@contract(
    "q_mutual_information",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS n_xy
        FROM events GROUP BY 1, 2
    ), mx AS (
        SELECT event_type, CAST(sum(n_xy) AS BIGINT) AS n_x
        FROM cells GROUP BY 1
    ), my AS (
        SELECT hr, CAST(sum(n_xy) AS BIGINT) AS n_y
        FROM cells GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells
    )
    SELECT c.event_type, c.hr, c.n_xy,
           round((CAST(c.n_xy AS DOUBLE) / t.n)
                 * ln(CAST(c.n_xy * t.n AS DOUBLE)
                      / CAST(x.n_x * y.n_y AS DOUBLE)), 9) AS mi_term
    FROM cells c
    JOIN mx x ON c.event_type = x.event_type
    JOIN my y ON c.hr = y.hr
    CROSS JOIN tot t
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; hour-of-day), emitted as one
    additive term per contingency cell — the information-theoretic twin
    of [[q_chi_square]] (chi-square measures deviation in counts, MI in
    nats; both share the same marginal-join plan). The caller sums
    ``mi_term`` for the MI; per-cell terms also localize WHICH
    type×hour cell carries the dependence.

    Bit-exact discipline (the PSI-terms pattern): all counts exact
    BIGINT, the log argument is one exact-int÷exact-int divide
    (n_xy·N ≤ 1e10·1e5 at sf0.1, inside 2⁵³), ln() is the only ~1-ulp
    op ⇒ round 9. Terms are per-cell rather than pre-summed because
    summing rounded doubles is order-dependent. At 100 TB: one
    map-side-combinable aggregate to ≤ type×24 cells, then broadcast
    marginal joins over a cell-sized frame — no data-sized shuffle
    after the first.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(lng(F.count("*")).alias("n_xy"))
    cells = cells.persist()
    mx = cells.groupBy("event_type").agg(lng(F.sum("n_xy")).alias("n_x"))
    my = cells.groupBy("hr").agg(lng(F.sum("n_xy")).alias("n_y"))
    tot = cells.agg(lng(F.sum("n_xy")).alias("n"))
    term = (F.col("n_xy").cast("double") / F.col("n")) * F.log(
        (F.col("n_xy") * F.col("n")).cast("double")
        / (F.col("n_x") * F.col("n_y")).cast("double")
    )
    return (
        # label-sized: one margin row per event_type
        cells.join(F.broadcast(mx), "event_type")
        # label-sized: one margin row per hour-of-day
        .join(F.broadcast(my), "hr")
        # one-row: global total
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type", "hr", "n_xy", F.round(term, 9).alias("mi_term")
        )
    )


# --------------------------------------------------------------------------
# an-30 (ext) — Welch's unequal-variance t-test (purchase vs view value)
# --------------------------------------------------------------------------


@contract(
    "q_welch_ttest",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
                    AS BIGINT) AS s1,
               CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)
                        * CAST(floor(value * 1000 + 0.5) AS BIGINT))
                    AS BIGINT) AS s2
        FROM events WHERE event_type IN ('purchase', 'view')
        GROUP BY 1
    ), w AS (
        SELECT
            max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
            max(CASE WHEN event_type = 'view' THEN n END) AS n2,
            max(CASE WHEN event_type = 'purchase' THEN s1 END) AS s1a,
            max(CASE WHEN event_type = 'view' THEN s1 END) AS s1b,
            max(CASE WHEN event_type = 'purchase' THEN s2 END) AS s2a,
            max(CASE WHEN event_type = 'view' THEN s2 END) AS s2b
        FROM g
    ), v AS (
        SELECT n1, n2,
            CAST(s1a AS DOUBLE) / n1 AS m1,
            CAST(s1b AS DOUBLE) / n2 AS m2,
            (CAST(n1 AS DOUBLE) * CAST(s2a AS DOUBLE)
             - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
                / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
            (CAST(n2 AS DOUBLE) * CAST(s2b AS DOUBLE)
             - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
                / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2
        FROM w
    )
    SELECT n1, n2, m1, m2,
           (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS t_stat,
           ((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
               / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                  + (v2 / n2) * (v2 / n2) / (n2 - 1)) AS welch_df
    FROM v
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test comparing mean event value between
    purchase and view events — the finite-sample counterpart to the
    normal-approximation [[q_ab_test_stats]] z-test (Welch adds the
    Satterthwaite degrees-of-freedom so the caller can use a
    t-distribution instead of the CLT).

    Bit-exact with ZERO rounding: milli-quantized BIGINT sums and
    sums-of-squares (Σx² ≈ 5e14 at sf0.1, ~5e16 at 100× — inside
    BIGINT; ANSI mode errors loudly rather than wrapping if a future
    fixture exceeds it, at which point promote s2 to DECIMAL(38,0)),
    then one FIXED-SHAPE IEEE chain — the identical sequence of
    correctly-rounded mult/sub/div/sqrt on identical doubles is
    engine-identical, so t and the Satterthwaite df need no rounding at
    all. At 100 TB the plan is a single map-side-combinable two-group
    aggregate; everything after is one row.
    """
    ev = load_table(spark, sf_dir, "events")
    q = F.floor(F.col("value") * 1000 + 0.5).cast("long")
    g = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type")
        .agg(
            lng(F.count("*")).alias("n"),
            lng(F.sum(q)).alias("s1"),
            lng(F.sum(q * q)).alias("s2"),
        )
    )
    pick = lambda col, t: F.max(  # noqa: E731 — one-row pivot
        F.when(F.col("event_type") == t, F.col(col))
    )
    w = g.agg(
        pick("n", "purchase").alias("n1"),
        pick("n", "view").alias("n2"),
        pick("s1", "purchase").alias("s1a"),
        pick("s1", "view").alias("s1b"),
        pick("s2", "purchase").alias("s2a"),
        pick("s2", "view").alias("s2b"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    v = w.select(
        "n1",
        "n2",
        (F.col("s1a").cast("double") / F.col("n1")).alias("m1"),
        (F.col("s1b").cast("double") / F.col("n2")).alias("m2"),
        (
            (
                n1d * F.col("s2a").cast("double")
                - F.col("s1a").cast("double") * F.col("s1a").cast("double")
            )
            / (n1d * (n1d - 1.0))
        ).alias("v1"),
        (
            (
                n2d * F.col("s2b").cast("double")
                - F.col("s1b").cast("double") * F.col("s1b").cast("double")
            )
            / (n2d * (n2d - 1.0))
        ).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return v.select(
        "n1",
        "n2",
        "m1",
        "m2",
        ((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2)).alias("t_stat"),
        (
            ((se1 + se2) * (se1 + se2))
            / (
                se1 * se1 / (F.col("n1") - 1)
                + se2 * se2 / (F.col("n2") - 1)
            )
        ).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# an-31 (ext) — Poisson bootstrap of the mean purchase value (B=100)
# --------------------------------------------------------------------------

#: Poisson(1) inverse-CDF thresholds P(X <= k), k = 0..5 — identical
#: decimal literals on both engines parse to identical doubles.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
)

# ``e0`` forces DuckDB to parse each threshold as DOUBLE: a bare decimal
# literal is DECIMAL(17,16) there, and the decimal→double promotion in
# the comparison can land 1 ulp off the direct double parse — enough to
# flip u < c on an unlucky dyadic u.
_POIS_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c}e0 THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    + " ELSE 6 END"
)


#: Shared oracle text for the batch and streaming bootstrap contracts.
BOOTSTRAP_ORACLE_SQL = f"""
    WITH p AS (
        SELECT event_id,
               CAST(floor(value * 1000 + 0.5) AS BIGINT) AS q
        FROM events WHERE event_type = 'purchase'
    ), drawn AS (
        SELECT b, q,
               CAST(((event_id % 100000007) * 2654435761
                     + b * 97 + 13) % 2147483648 AS DOUBLE)
                   / 2147483648.0 AS u
        FROM p CROSS JOIN (SELECT unnest(generate_series(0, 99)) AS b)
    ), weighted AS (
        SELECT b, q, {_POIS_CASE_SQL} AS w FROM drawn
    )
    SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * q) AS BIGINT) AS sum_q,
           CAST(sum(w * q) AS DOUBLE) / CAST(sum(w) AS BIGINT)
               AS boot_mean_milli
    FROM weighted GROUP BY b ORDER BY b
    """


def bootstrap_weighted_sums(ev: DataFrame) -> DataFrame:
    """b → exact integer (n_eff, sum_q) Poisson-bootstrap partials over
    purchase events. Weights are per-(event_id, b) deterministic, so the
    partials are SUM-mergeable across any row partitioning — a streaming
    sink can fold per-batch deltas and land on the identical table."""
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("q"),
    )
    drawn = p.select(
        "q",
        F.explode(F.sequence(F.lit(0), F.lit(99))).alias("b"),
        F.col("event_id"),
    ).select(
        "b",
        "q",
        (
            (
                (F.col("event_id") % 100000007) * 2654435761
                + F.col("b") * 97
                + 13
            )
            % 2147483648
        )
        .cast("double")
        .alias("m"),
    )
    u = F.col("m") / F.lit(2147483648.0)
    w = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < float(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    weighted = drawn.select("b", "q", w.cast("long").alias("w"))
    return weighted.groupBy("b").agg(
        lng(F.sum("w")).alias("n_eff"),
        lng(F.sum(F.col("w") * F.col("q"))).alias("sum_q"),
    )


def bootstrap_finish(sums: DataFrame) -> DataFrame:
    """Finish the bootstrap replicate means from the exact (n_eff,
    sum_q) table — shared verbatim by the batch and streaming contracts
    so their outputs are bit-identical by construction."""
    return sums.select(
        "b",
        "n_eff",
        "sum_q",
        (F.col("sum_q").cast("double") / F.col("n_eff")).alias(
            "boot_mean_milli"
        ),
    ).orderBy("b")


@contract("q_poisson_bootstrap", oracle=BOOTSTRAP_ORACLE_SQL)
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (B=100) of the mean purchase value — THE
    resampling scheme for distributed data (Chamandy et al., "Estimating
    uncertainty for massive data streams", Google 2012): instead of
    drawing n rows with replacement (impossible without global
    coordination), every row independently receives a Poisson(1)
    replication weight per resample, giving each replicate the right
    marginal resample distribution with one stateless map. The caller
    takes percentiles of ``boot_mean_milli`` for a CI — the
    wide-applicability upgrade over the exact-but-n-replicate
    [[q_jackknife_mean]].

    Determinism + bit-exactness: weights come from a per-(row, b)
    Knuth-multiplicative PRNG — the uniform is an exact dyadic
    (m / 2³¹, both exactly representable), the Poisson(1) inverse-CDF
    thresholds are identical decimal literals on both engines, so every
    weight is an exact integer; per-replicate Σw and Σw·q are order-free
    BIGINT sums and the mean is one exact-int divide. No rounding.
    Scale: the B× fan-out map-side-combines to B rows per partition
    before the shuffle — the whole bootstrap is ONE aggregate pass.
    """
    ev = load_table(spark, sf_dir, "events")
    return bootstrap_finish(bootstrap_weighted_sums(ev))


# --------------------------------------------------------------------------
# an-32 (ext) — hour-of-day seasonal index of mean purchase value
# --------------------------------------------------------------------------


@contract(
    "q_seasonal_index",
    oracle="""
    WITH h AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
                    AS BIGINT) AS s_h
        FROM events GROUP BY 1, 2
    ), t AS (
        SELECT event_type, CAST(sum(n_h) AS BIGINT) AS n_t,
               CAST(sum(s_h) AS BIGINT) AS s_t
        FROM h GROUP BY 1
    )
    SELECT h.event_type, h.hr, h.n_h,
           CAST(h.s_h * t.n_t AS DOUBLE)
               / CAST(h.n_h * t.s_t AS DOUBLE) AS seasonal_index
    FROM h JOIN t ON h.event_type = t.event_type
    ORDER BY h.event_type, h.hr
    """,
)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index of the mean event value per type:
    (hourly mean) / (overall mean), i.e. (s_h·n_t)/(n_h·s_t) — 1.0
    means the hour is typical, 1.3 means values run 30% hot. The
    multiplicative-seasonality profile that deseasonalizes a series
    before trend fitting (the classical-decomposition counterpart of
    the count-based [[q_fano_factor]] and the additive [[q_ewma_hourly]]
    smoothing).

    Bit-exact with ZERO rounding: both numerator and denominator are
    exact BIGINT products (≤ ~1e15 at sf0.1; BIGINT holds to ~9e18, and
    past 2⁵³ the int→double casts still round identically on both
    engines because the integers are identical), and the index is one
    IEEE divide. Scale: one map-side-combinable (type × 24)-cell
    aggregate plus a broadcast marginal join — the MI/chi-square plan
    shape.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(
        lng(F.count("*")).alias("n_h"),
        lng(
            F.sum(F.floor(F.col("value") * 1000 + 0.5).cast("long"))
        ).alias("s_h"),
    )
    h = h.persist()
    t = h.groupBy("event_type").agg(
        lng(F.sum("n_h")).alias("n_t"), lng(F.sum("s_h")).alias("s_t")
    )
    return (
        # label-sized: one row per event_type
        h.join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "hr",
            "n_h",
            (
                (F.col("s_h") * F.col("n_t")).cast("double")
                / (F.col("n_h") * F.col("s_t")).cast("double")
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "hr")
    )


# --------------------------------------------------------------------------
# an-33 (ext) — decile lift table (acctbal score vs 1995 purchase outcome)
# --------------------------------------------------------------------------


@contract(
    "q_lift_deciles",
    oracle="""
    WITH outcome AS (
        SELECT DISTINCT o_custkey AS cust FROM orders
        WHERE year(o_orderdate) = 1995
    ), scored AS (
        SELECT c.c_custkey AS cust,
               ntile(10) OVER (ORDER BY
                   CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) DESC,
                   c.c_custkey) AS decile,
               CASE WHEN o.cust IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM customer c LEFT JOIN outcome o ON c.c_custkey = o.cust
    ), per AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(hit) AS BIGINT) AS n_hits
        FROM scored GROUP BY decile
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_all,
               CAST(sum(n_hits) AS BIGINT) AS hits_all
        FROM per
    )
    SELECT p.decile, p.n, p.n_hits,
           CAST(p.n_hits AS DOUBLE) / p.n AS response_rate,
           CAST(p.n_hits * t.n_all AS DOUBLE)
               / CAST(p.n * t.hits_all AS DOUBLE) AS lift
    FROM per p CROSS JOIN tot t
    ORDER BY p.decile
    """,
)
def q_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the standard model-validation readout for a
    targeting score: customers ranked by account balance (the "model
    score") into deciles, per-decile response rate against the
    did-they-order-in-1995 outcome, and lift = decile rate / overall
    rate. Decile 1 lift ≫ 1 means the score concentrates responders —
    the campaign-analytics twin of [[q_ranking_eval]]'s IR metrics and
    [[q_nb_auc]]'s threshold-free AUC.

    Deterministic ntile (cent-quantized balance DESC, custkey
    tie-break), exact BIGINT counts, and both ratios are exact-int
    divides (lift = (hits_d·N)/(n_d·H), one IEEE op) — no rounding.
    Scale (r8): the decile assignment used to be a global ntile window —
    a SINGLE-partition sort over every customer, the one
    non-distributing stage in the plan. It is now exact ntile arithmetic
    over the distributed global row number from
    :func:`operators.ranks.global_cumsum` (range shuffle +
    per-partition offsets): SQL ntile semantics — the first N mod 10
    buckets take ceil(N/10) rows — reproduced closed-form from (rn, N),
    bit-identical to the window version
    (test_lift_deciles_ntile_arithmetic_matches_window), with every
    stage partition-parallel at 100 TB. Remaining stages: one
    semi-joinable outcome probe and a 10-row marginal join.
    """
    from mapreduce_hw05_spark.operators.ranks import distributed_ntile

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    outcome = (
        orders.filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("cust"))
        .distinct()
        .withColumn("hit_flag", F.lit(1))
    )
    scored = customer.join(
        outcome, customer.c_custkey == outcome.cust, "left"
    ).select(
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_c"),
        "c_custkey",
        F.coalesce(F.col("hit_flag"), F.lit(0)).alias("hit"),
    )
    per = (
        distributed_ntile(
            scored,
            10,
            [F.col("bal_c").desc(), F.col("c_custkey").asc()],
            bucket_col="decile",
        )
        .groupBy("decile")
        .agg(lng(F.count("*")).alias("n"), lng(F.sum("hit")).alias("n_hits"))
    )
    tot = per.agg(
        lng(F.sum("n")).alias("n_all"),
        lng(F.sum("n_hits")).alias("hits_all"),
    )
    return (
        # one-row: global total
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n")).alias(
                "response_rate"
            ),
            (
                (F.col("n_hits") * F.col("n_all")).cast("double")
                / (F.col("n") * F.col("hits_all")).cast("double")
            ).alias("lift"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# an-34 (ext) — weekly growth accounting (new / retained / resurrected)
# --------------------------------------------------------------------------


@contract(
    "q_growth_accounting",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01', ts) // 7
                    AS BIGINT) AS week
        FROM events
    ), seq AS (
        SELECT user_id, week,
               lag(week) OVER (PARTITION BY user_id ORDER BY week)
                   AS prev_week,
               lead(week) OVER (PARTITION BY user_id ORDER BY week)
                   AS next_week
        FROM active
    )
    SELECT week,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN prev_week IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN prev_week = week - 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(sum(CASE WHEN prev_week IS NOT NULL
                          AND prev_week < week - 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(sum(CASE WHEN next_week IS NULL
                          OR next_week > week + 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churning_out
    FROM seq GROUP BY week ORDER BY week
    """,
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the canonical product-analytics
    decomposition of active users: per week, how many are NEW (first
    week ever), RETAINED (also active the prior week), RESURRECTED
    (active before, but skipped ≥1 week), and CHURNING OUT (not active
    next week) — so n_active = new + retained + resurrected, and WoW
    change reconciles exactly. The state-transition complement to
    [[q_cohort_retention]]'s fixed-cohort matrix and
    [[q_rolling_dau]]'s windowed counts.

    Weeks are epoch-day // 7 (identical integer arithmetic on both
    engines — date_trunc('week') ISO conventions never enter). All
    counts exact; one distinct, one per-user lag/lead window, one
    weekly rollup. At 100 TB: the distinct and the window both key on
    user_id — a single shuffle reused by both, then the weekly
    aggregate is map-side-combinable.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    active = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) / 7
        )
        .cast("long")
        .alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    seq = active.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.lead("week").over(w).alias("next_week"),
    )
    return (
        seq.groupBy("week")
        .agg(
            lng(F.count("*")).alias("n_active"),
            lng(
                F.sum(
                    F.when(F.col("prev_week").isNull(), 1).otherwise(0)
                )
            ).alias("n_new"),
            lng(
                F.sum(
                    F.when(
                        F.col("prev_week") == F.col("week") - 1, 1
                    ).otherwise(0)
                )
            ).alias("n_retained"),
            lng(
                F.sum(
                    F.when(
                        F.col("prev_week").isNotNull()
                        & (F.col("prev_week") < F.col("week") - 1),
                        1,
                    ).otherwise(0)
                )
            ).alias("n_resurrected"),
            lng(
                F.sum(
                    F.when(
                        F.col("next_week").isNull()
                        | (F.col("next_week") > F.col("week") + 1),
                        1,
                    ).otherwise(0)
                )
            ).alias("n_churning_out"),
        )
        .orderBy("week")
    )


# --------------------------------------------------------------------------
# an-35 (ext) — bitmap-index aggregation (bit_or activity bitmaps)
# --------------------------------------------------------------------------


@contract(
    "q_bitmap_activity",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(hour(ts) AS BIGINT) AS hr,
               bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
                   AS bitmap
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(bit_count(bit_or(bitmap)) AS BIGINT) AS slots_ever,
           CAST(sum(bit_count(bitmap)) AS BIGINT) AS slot_hours,
           CAST(bit_count(bit_and(bitmap)) AS BIGINT) AS slots_always
    FROM b GROUP BY event_type ORDER BY event_type
    """,
)
def q_bitmap_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index aggregation — the roaring-bitmap pattern reduced to
    its BIGINT core: per (event_type, hour) a 63-slot user-activity
    bitmap built with ``bit_or(1 << user_id % 63)``, then re-aggregated
    per type with bit_or (slots active in ANY hour), bit_and (slots
    active in EVERY hour), and popcounts. Bitmap aggregates are how
    engines make COUNT(DISTINCT)-over-segments and audience-overlap
    queries mergeable — a bitmap is a tiny, unionable set summary,
    the exact-ID cousin of the HLL in [[q_hll_rollup]].

    Exact integer/bit arithmetic only (shift, or, and, popcount —
    identical two's-complement semantics on both engines; 63 slots
    keeps the top bit clear). Both aggregation levels are map-side
    combinable: bitmaps merge with OR like sums merge with +.
    """
    ev = load_table(spark, sf_dir, "events")
    # the DataFrame-API shiftleft only takes a literal bit count; the
    # SQL form accepts a column
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
    b = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.bit_or(bit).alias("bitmap"))
    return (
        b.groupBy("event_type")
        .agg(
            lng(F.count("*")).alias("n_hours"),
            F.bit_count(F.bit_or("bitmap")).cast("long").alias(
                "slots_ever"
            ),
            lng(F.sum(F.bit_count("bitmap"))).alias("slot_hours"),
            F.bit_count(F.bit_and("bitmap")).cast("long").alias(
                "slots_always"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# an-36 (ext) — time-bounded funnel (view → click ≤24h → purchase ≤24h)
# --------------------------------------------------------------------------


@contract(
    "q_funnel_windowed",
    oracle="""
    WITH v AS (
        SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS v_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, CAST(epoch_us(min(e.ts)) AS BIGINT) AS c_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND CAST(epoch_us(e.ts) AS BIGINT) > v.v_us
          AND CAST(epoch_us(e.ts) AS BIGINT) <= v.v_us + 86400000000
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, CAST(epoch_us(min(e.ts)) AS BIGINT) AS p_us
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND CAST(epoch_us(e.ts) AS BIGINT) > c.c_us
          AND CAST(epoch_us(e.ts) AS BIGINT) <= c.c_us + 86400000000
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_24h,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_24h,
           CAST((SELECT count(*) FROM c) AS DOUBLE)
               / (SELECT count(*) FROM v) AS view_to_click,
           CAST((SELECT count(*) FROM p) AS DOUBLE)
               / (SELECT count(*) FROM c) AS click_to_purchase
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED funnel: first view → first click within 24 h of it
    → first purchase within 24 h of that click. The unbounded
    [[q_funnel_steps]] credits conversions weeks later; real funnel
    metrics expire each step, which both shrinks the join (the time
    band is a pushdown-able predicate) and changes the answer. Exact
    integer microsecond bounds; two conversion ratios as exact-int
    divides.

    Scale: each step is one min-aggregate plus one band-predicated
    equi-join on user_id — at 100 TB the 24 h band makes these
    range-prunable where the unbounded funnel must scan a user's whole
    history.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("v_us")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("us") > F.col("v_us"))
            & (F.col("us") <= F.col("v_us") + 86400000000)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("us") > F.col("c_us"))
            & (F.col("us") <= F.col("c_us") + 86400000000)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    nv = v.agg(F.count("*").cast("long").alias("n_view"))
    nc = c.agg(F.count("*").cast("long").alias("n_click_24h"))
    np_ = p.agg(F.count("*").cast("long").alias("n_purchase_24h"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view",
            "n_click_24h",
            "n_purchase_24h",
            (
                F.col("n_click_24h").cast("double") / F.col("n_view")
            ).alias("view_to_click"),
            (
                F.col("n_purchase_24h").cast("double")
                / F.col("n_click_24h")
            ).alias("click_to_purchase"),
        )
    )
