"""Correlated-subquery contract queries (TPC-H Q4/Q17/Q18/Q21 shapes).

The MapReduce genre expresses every one of these as a reduce-side
co-group with driver-chained jobs; here each is declared as the join /
semi-join Catalyst decorrelates the subquery into, so the optimizer owns
join order and strategy (SURVEY.md §2.3, §3.2).

Scale notes: every correlated predicate below decorrelates to an equi
shuffle join on a key column (orderkey / partkey / brand), so the plans
survive a 100× scale-up as ordinary sort-merge joins; none falls back to
a nested-loop. The per-group thresholds (avg-quantity, max-price) are
computed with a partial-aggregated groupBy, never a per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_hw05_spark.plans.common import lng, money, ratio
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import dim_broadcast, load_table

# --------------------------------------------------------------------------
# sq-1 — correlated EXISTS over a non-key predicate (TPC-H Q4 shape)
# --------------------------------------------------------------------------


@contract(
    "q_exists_shiplag",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 75 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_exists_shiplag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1995 orders with any lineitem shipped >75 days after ordering,
    counted per priority — correlated EXISTS expressed as the left-semi
    join Catalyst decorrelates it to (equi on orderkey + residual date
    predicate evaluated inside the join)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# sq-2 — correlated scalar subquery: per-group average threshold (Q17 shape)
# --------------------------------------------------------------------------


@contract(
    "q_correlated_avg_qty",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small_lots
    FROM lineitem l1
    WHERE l_quantity < (SELECT round(0.5 * avg(l_quantity), 6)
                        FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q_correlated_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue locked in small lots: lineitems below half their part's
    average quantity (TPC-H Q17). The correlated scalar subquery becomes
    one groupBy(partkey) aggregate joined back to the fact — one shuffle
    each side on the same key, no per-row re-scan.

    The threshold is rounded to 6 decimals on BOTH engines before the
    comparison: avg() of doubles drifts in the last ulp with partial-agg
    order, and an unrounded threshold could flip a boundary row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy("l_partkey").agg(
        F.round(0.5 * F.avg("l_quantity"), 6).alias("__thr")
    )
    return (
        li.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("__thr"))
        .agg(
            money(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_small_lots"),
        )
    )


# --------------------------------------------------------------------------
# sq-3 — IN (grouped HAVING subquery): large-volume orders (Q18 shape)
# --------------------------------------------------------------------------


@contract(
    "q_having_in_big_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
    GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    """,
)
def q_having_in_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding orders whose total quantity exceeds 200 (TPC-H
    Q18). The IN-subquery is the same groupBy the outer query needs, so
    it is computed ONCE and reused as the driving table instead of a
    semi-join — one lineitem shuffle total."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(money(F.sum("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty")
    )


# --------------------------------------------------------------------------
# sq-4 — correlated scalar with equality: argmax rows per group
# --------------------------------------------------------------------------


@contract(
    "q_max_price_in_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM part p
    WHERE p_retailprice = (SELECT max(p2.p_retailprice)
                           FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
)
def q_max_price_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every part priced at its brand's maximum — the correlated-equality
    subquery expressed as a window max (one shuffle on brand, no join).
    The comparison is raw-double equality against a value drawn from the
    same column, so it is exact on both engines."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand")
    return (
        p.withColumn("__brand_max", F.max("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("__brand_max"))
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


# --------------------------------------------------------------------------
# sq-5 — EXISTS with inequality correlation on two tables (Q21 shape)
# --------------------------------------------------------------------------


@contract(
    "q_multi_supplier_late",
    oracle="""
    SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_late_shared
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q_multi_supplier_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: how many multi-supplier orders it shipped late into
    (TPC-H Q21 skeleton). The EXISTS-with-<> correlates on the join key
    plus an inequality; decorrelated as a left-semi join on orderkey with
    the suppkey inequality as a residual predicate. Supplier is a dim →
    broadcast."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    late = l1.join(o, l1.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    shared = late.join(
        l2,
        (F.col("l_orderkey") == F.col("__ok2"))
        & (F.col("l_suppkey") != F.col("__sk2")),
        "left_semi",
    )
    return (
        shared.join(dim_broadcast(s, sf_dir, "supplier"), shared.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(lng(F.count_distinct("l_orderkey")).alias("n_late_shared"))
    )


# --------------------------------------------------------------------------
# sq-9 (ext) — recursive CTE (Spark 4 WITH RECURSIVE, SQL entry point)
# --------------------------------------------------------------------------


@contract(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-08-01'
    )
    SELECT CAST(epoch(m) AS BIGINT) AS month_epoch,
           count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY month_epoch
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL entry point (Spark 4): generate
    the full month calendar spanning the order-date domain recursively,
    then left-join order counts onto it — months with zero orders
    survive (the dense-calendar shape q_gapfill_hourly builds with
    sequence(); here the recursion itself is the capability under
    test).

    The recursion is driver-bounded (80 rows) and the joined fact side
    is a plain shuffle join on the truncated month — recursive CTEs at
    scale are for small dimension closures (org charts, calendars, BOM
    explosions), never fact-sized state; fact-sized iteration lives in
    the checkpointed-loop operators (PageRank, CC).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_rcte_v"
    )
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01'
        )
        SELECT CAST(unix_timestamp(m) AS BIGINT) AS month_epoch,
               count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders_rcte_v
          ON date_trunc('MONTH', o_orderdate) = m
        GROUP BY month_epoch
        """
    )


# --------------------------------------------------------------------------
# sq-10 (ext) — LATERAL correlated subquery (top-n per row without window)
# --------------------------------------------------------------------------


@contract(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers by balance via a correlated LATERAL
    subquery (SQL entry point) — the same result q_window_rank computes
    with row_number, expressed as the optimizer's LateralJoin instead.
    Deterministic via the (c_acctbal DESC, c_custkey) tiebreak; the
    oracle SQL is engine-identical modulo the rounding helper.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_lat_v"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_lat_v"
    )
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS c_acctbal
        FROM nation_lat_v n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_lat_v c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """
    )


# --------------------------------------------------------------------------
# sq-8 — NOT IN under NULL keys: the three-valued-logic rewrite contract
# --------------------------------------------------------------------------


@contract(
    "q_not_in_null_semantics",
    oracle="""
    WITH o AS (
        SELECT *, nullif(o_custkey % 50, 13) AS k FROM orders
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM o
    WHERE k NOT IN (SELECT nullif(c_custkey % 50, 55) AS ik
                    FROM customer
                    WHERE c_acctbal >= 9500 AND c_custkey % 50 < 20)
    GROUP BY o_orderstatus
    """,
)
def q_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN`` with NULL-able keys on both sides, rewritten through
    :func:`operators.subquery.null_safe_not_in` — bounded inner-NULL
    probe, then a plain anti equi-join over non-NULL keys (hash-joinable
    at any scale; never a null-aware nested loop). Orders whose bucketed
    key is NULL (custkey % 50 == 13) must NOT qualify, and if the rich-
    customer inner set ever produced a NULL bucket the whole result
    would collapse to empty — exactly SQL three-valued logic, which the
    native-``NOT IN`` oracle pins. The property grammar
    (tests/test_property_differential.py) sweeps the remaining corners.
    """
    from mapreduce_hw05_spark.operators.subquery import null_safe_not_in

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "k", F.nullif(F.col("o_custkey") % 50, F.lit(13))
    )
    inner = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_acctbal") >= 9500) & (F.col("c_custkey") % 50 < 20)
    )
    kept = null_safe_not_in(
        orders, F.col("k"), inner, F.nullif(F.col("c_custkey") % 50, F.lit(55))
    )
    return kept.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("sum_price"),
    )
