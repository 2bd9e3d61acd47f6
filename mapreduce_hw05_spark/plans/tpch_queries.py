"""Canonical TPC-H query shapes adapted to the fixture star schema
(no partsupp table; no shipmode/commitdate/phone columns, so Q2/Q4/Q9/
Q11/Q12/Q16/Q20/Q21 shapes live elsewhere or are inexpressible —
the correlated-subquery family in subquery_queries covers Q4/Q17/Q18/Q21;
Q22's cntrycode is played by c_nationkey here).

These exercise the planner the way the benchmark intends: selective
dim-side filters that must push through multi-way joins (Q3/Q5/Q10),
two-sided nation filters (Q7), a conditional-share aggregate over a
6-table join (Q8), a single-row promo ratio (Q14), the disjunctive
bracket predicate (Q19), the scan-only bracket aggregate (Q6), the
filtered-outer-join distribution (Q13), the view+scalar-max pattern
(Q15), and the anti-join-over-threshold report (Q22). All pure
Catalyst; dims broadcast, facts never.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.plans.common import lng, money, ratio
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import dim_broadcast, load_table

_REV_SQL = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    # Built lazily: Column construction needs an active SparkContext,
    # and this module imports at registry-population time (no session).
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q3 — shipping priority: top-10 undelivered orders by revenue
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           round(sum({_REV_SQL}), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of BUILDING-segment orders placed before
    1996-03-15 with lines still shipping after it, top-10 by revenue.

    The segment filter reaches the customer scan, the date filters reach
    the orders/lineitem scans (PushedFilters), and the filtered customer
    side broadcasts; only lineitem⋈orders shuffles. Revenue is rounded
    before the ORDER BY so the top-10 cut is identical on both engines.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(_rev())).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: revenue per nation where customer and
# supplier share the nation, ASIA region, 1996
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name, round(sum({_REV_SQL}), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 1996 revenue per ASIA nation counting only lines
    where the supplier is in the customer's own nation.

    Six-table join where everything except orders⋈lineitem broadcasts;
    the c_nationkey = s_nationkey residual rides the supplier join. The
    region filter prunes nation/supplier/customer via the dim chain
    before any fact shuffles.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .join(
            dim_broadcast(supp, sf_dir, "supplier"),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        # dim-sized: nation
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        # dim-sized: region
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money(F.sum(_rev())).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and ship year
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(sum({_REV_SQL}), 2) AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 1996–1997 trade volume between NATION_1 and
    NATION_2, split by direction and ship year.

    The two-sided nation disjunction can't prune either fact scan alone,
    but both nation dims broadcast with their name filters pre-applied
    as a two-row IN, so the disjunction runs post-join on in-memory
    hashed dims — the plan TPC-H intends.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .join(dim_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        # dim-sized: nation-derived
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        # dim-sized: nation-derived
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            lng(F.year("l_shipdate")).alias("l_year"),
        )
        .agg(money(F.sum(_rev())).alias("volume"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share within a region for a part type, by year
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q8",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_3'
                          THEN {_REV_SQL} ELSE 0 END)
                 / sum({_REV_SQL}), 6) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue sold into
    AMERICA-region customers, per order year 1996–1997.

    A conditional-sum ratio over a 7-table join: part/customer/region
    filters prune before the fact shuffle, all dims broadcast, and the
    share is one conditional aggregate — no second pass over the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    rev = _rev()
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .join(dim_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(dim_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        # dim-sized: nation-derived
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        # dim-sized: nation-derived
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        # dim-sized: region
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .groupBy(lng(F.year("o_orderdate")).alias("o_year"))
        .agg(ratio(F.sum(nat_rev) / F.sum(rev)).alias("mkt_share"))
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by lost revenue
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           round(sum({_REV_SQL}), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-10-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue returned ('R' flag)
    on 1995-Q4 orders, with nation context.

    The quarter filter cuts orders ~25×, so the orders side of the fact
    join is small; customer and nation broadcast. Revenue rounds before
    the top-20 cut; c_custkey breaks ties.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        # dim-sized: nation
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money(F.sum(_rev())).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            money(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 — promotion effect: PROMO share of one month's revenue (single row)
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q14",
    oracle=f"""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN {_REV_SQL} ELSE 0 END)
                 / sum({_REV_SQL}), 6) AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' percentage of September-1996 shipped
    revenue — a single-row conditional-share aggregate over a broadcast
    lineitem⋈part join with the month filter pushed to the fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)
    return (
        li.join(dim_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .agg(
            ratio(F.lit(100.0) * F.sum(promo) / F.sum(_rev())).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive brand/size/quantity brackets
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q19",
    oracle=f"""
    SELECT round(sum({_REV_SQL}), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    brackets — the benchmark's test that a disjunction spanning both join
    sides still evaluates on the joined row without materializing a
    cross product. Part broadcasts; each disjunct's single-side conjuncts
    (p_brand/p_size on part, l_quantity on lineitem) are derivable by
    Catalyst as a pushed-down OR per scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & q.between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & q.between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & q.between(20, 35)
        )
    )
    return (
        li.join(dim_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(
            money(F.sum(_rev())).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: scan-only bracket aggregate
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would be gained by eliminating a
    discount bracket — a pure scan+filter+global-agg with no join at all.

    The benchmark's test that every conjunct reaches the Parquet scan:
    the plan must show all four predicates in PushedFilters and a
    4-column ReadSchema. At 100 TB this is the I/O-bound query where
    pushdown IS the performance.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer distribution: order counts with a filtered outer join
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q13",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey
           AND o_orderpriority NOT LIKE '%URGENT%'
          GROUP BY c_custkey) per_cust
    GROUP BY n_orders
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts where the
    order filter lives IN the outer-join condition (not a WHERE —
    filtering after the join would drop the zero-order customers that
    are the point of the query).

    Two aggregations: the first shuffles on c_custkey, the second on the
    tiny n_orders domain — partial aggregation collapses it map-side.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & ~F.col("o_orderpriority").like("%URGENT%"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


# --------------------------------------------------------------------------
# Q15 — top supplier: aggregate view + scalar-max equality
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey,
               round(sum({_REV_SQL}), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose Q1-1996 revenue equals the
    maximum over all suppliers.

    The max is taken as a window over the ALREADY-AGGREGATED per-
    supplier revenue, so lineitem is scanned exactly once (a broadcast-
    scalar formulation plans a second pruned fact scan — Catalyst's
    static planner doesn't reuse uncached exchanges across subtrees).
    The unpartitioned window runs over supplier-cardinality rows
    (≪ facts), the honest cost of a global argmax. Revenue is rounded
    to cents on both sides BEFORE the equality, making the float
    comparison exact.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        money(F.sum(_rev())).alias("total_revenue")
    )
    flagged = revenue.withColumn(
        "__max_rev", F.max("total_revenue").over(W.partitionBy())
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        flagged.filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(dim_broadcast(supp, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity: anti join over a scalar-avg threshold
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q22",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_custs,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of above-average-
    balance customers with no order since 2000 (cntrycode played by
    c_nationkey, "never ordered" relaxed to "dormant" — every fixture
    customer has at least one order, and the fixture has no phone
    column).

    Composition of three scale patterns: a one-row scalar-avg broadcast
    (threshold rounded to 6 dp on both engines so the float compare is
    exact — see q_correlated_avg_qty), a left-anti join against orders
    (shuffles only distinct o_custkey), and a final small-domain agg.
    """
    c = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 6).alias("__thr"))
    )
    return (
        # one-row: acctbal threshold
        c.join(F.broadcast(thr), F.col("c_acctbal") > F.col("__thr"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            money(F.sum("c_acctbal")).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q9 shape (adapted) — product-type profit by supplier nation × year
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q9_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS o_year,
           round(sum({_REV_SQL}), 2) AS profit,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(l_shipdate)
    """,
)
def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape adapted to this schema (no partsupp, so profit is
    discounted revenue): per supplier-nation × ship-year profit over
    'red' parts.

    The LIKE filter prunes part before its broadcast; supplier⋈nation
    collapses to one broadcast dim; only the lineitem probe side scans
    at fact scale — the canonical star-join profile for a 100 TB fact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(dim_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(dim_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        # dim-sized: nation
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            lng(F.year("l_shipdate")).alias("o_year"),
        )
        .agg(
            money(F.sum(_rev())).alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q16 shape (adapted) — supplier diversity per part attribute group
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q16_suppliers",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#17'
      AND p_type NOT LIKE 'ECONOMY%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted (lineitem plays partsupp as the
    part↔supplier relation; negative account balance plays the
    complaint filter): distinct suppliers per surviving (brand, type,
    size) group.

    The excluded-supplier set is a broadcast anti join (NOT IN over a
    null-free key ≡ anti join); all part predicates prune the broadcast
    dim before the fact probe; count(DISTINCT) expands to the two-level
    aggregate, both levels keyed on the group-by columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#17")
        & ~F.col("p_type").like("ECONOMY%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(dim_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(
            dim_broadcast(bad_supp, sf_dir, "supplier"),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q2 shape (adapted) — groupwise-min: cheapest EUROPE supplier per part
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q2_mincost",
    oracle="""
    WITH costs AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ), eu AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), eu_costs AS (
        SELECT c.partkey, c.suppkey, c.unit_cost, eu.s_name, eu.n_name
        FROM costs c JOIN eu ON eu.s_suppkey = c.suppkey
    )
    SELECT p.p_partkey, p.p_type,
           round(ec.unit_cost, 2) AS unit_cost,
           ec.s_name, ec.n_name
    FROM part p
    JOIN eu_costs ec ON ec.partkey = p.p_partkey
    WHERE p.p_size = 9
      AND ec.unit_cost = (
          SELECT min(ec2.unit_cost) FROM eu_costs ec2
          WHERE ec2.partkey = p.p_partkey
      )
    """,
)
def q_tpch_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted (lineitem unit prices play
    ps_supplycost): for each size-9 part, every EUROPE supplier
    achieving the minimum unit cost.

    The correlated-min subquery is realized as a groupwise-min
    aggregate joined back on (partkey, cost) — both sides derive the
    cost from the same double pipeline, so the equality matches
    exactly the argmin rows in both engines (ties keep all achievers,
    as in real Q2). Region-filtered suppliers broadcast; only the
    lineitem cost rollup shuffles at fact scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    costs = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        # dim-sized: nation
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        # dim-sized: region
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    eu_costs = costs.join(dim_broadcast(eu, sf_dir, "supplier"), costs.suppkey == eu.s_suppkey)
    min_costs = eu_costs.groupBy("partkey").agg(F.min("unit_cost").alias("min_cost"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 9)
    return (
        eu_costs.join(
            min_costs,
            (eu_costs.partkey == min_costs.partkey)
            & (eu_costs.unit_cost == min_costs.min_cost),
        )
        .drop(min_costs.partkey)
        .join(dim_broadcast(part, sf_dir, "part"), F.col("partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_type",
            money(F.col("unit_cost")).alias("unit_cost"),
            "s_name",
            "n_name",
        )
    )


# --------------------------------------------------------------------------
# Q20 shape (adapted) — nested semi-join chain: heavy red-part shippers
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q20_semi_chain",
    oracle="""
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
      AND s.s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 50
      )
    """,
)
def q_tpch_q20_semi_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted (no partsupp: shipped quantity plays
    available quantity): suppliers in three nations who shipped more
    than 50 units of 'red' parts during 1996.

    The inner block is fact-scale (lineitem filtered by the broadcast
    part dim, grouped per supplier, HAVING-cut) and collapses to a tiny
    key set before the left-semi probe of the nation-filtered supplier
    dim — the nested-IN chain Catalyst rewrites to two semi joins.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    heavy = (
        li.join(dim_broadcast(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        # dim-sized: nation
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", money(F.col("s_acctbal")).alias("s_acctbal"), "n_name")
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers: orders whose total quantity exceeds 200
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q18",
    oracle="""
    SELECT * FROM (
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        HAVING round(sum(l_quantity), 2) > 200
    )
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: top-100 large-volume orders (total quantity
    > 200) with their customer, ordered by order value.

    The fact-scale work happens ONCE: a single per-order quantity
    rollup, HAVING-cut to the qualifying tail, is both the semi-join
    key set and the sum_qty source — no second lineitem pass, unlike a
    literal transcription of the benchmark's correlated IN. No
    broadcast HINTS here, deliberately: the rollup is FACT-derived
    (HAVING-selective at fixture scale, unbounded at 100 TB) and
    customer is unfiltered, so both joins are left to AQE, which
    converts them to broadcast at runtime exactly when the build side
    is actually small. The top-100 cut is a TakeOrdered, tiebroken on
    o_orderkey so both engines slice identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(money(F.sum("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            money(F.col("o_totalprice")).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q11 shape (adapted) — important stock: per-part value above a global
# fraction-of-total threshold
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q11_important",
    oracle=f"""
    WITH value_per_part AS (
        SELECT l_partkey,
               round(sum({_REV_SQL}), 2) AS part_value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey IN (0, 1, 2)
        GROUP BY l_partkey)
    SELECT l_partkey, part_value
    FROM value_per_part
    WHERE part_value > (SELECT round(sum(part_value) * 0.001, 6)
                        FROM value_per_part)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q_tpch_q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape adapted (no partsupp: discounted lineitem revenue
    through suppliers of three nations plays ps_supplycost*ps_availqty):
    parts whose value exceeds 0.1% of the filtered total.

    The defining Q11 pattern is a HAVING threshold that is itself an
    aggregate over the SAME grouped relation. Computed as a window-total
    over the already-aggregated per-part values (one fact scan, like
    q_tpch_q15's argmax) rather than a scalar-subquery re-scan. Per-part
    values round to cents and the threshold to 6 dp on both engines
    BEFORE the comparison, so the float cut is cross-engine exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(0, 1, 2)
    )
    per_part = (
        li.join(dim_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(money(F.sum(_rev())).alias("part_value"))
    )
    from pyspark.sql import Window as W

    flagged = per_part.withColumn(
        "__thr",
        F.round(F.sum("part_value").over(W.partitionBy()) * 0.001, 6),
    )
    return (
        flagged.filter(F.col("part_value") > F.col("__thr"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# --------------------------------------------------------------------------
# Q12 shape (adapted) — shipping-class priority split: conditional
# two-way counts over a fact⋈fact join
# --------------------------------------------------------------------------


@contract(
    "q_tpch_q12_priority",
    oracle="""
    SELECT l_linestatus AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'N'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted (l_linestatus plays shipmode, the
    ship-year bracket plays the receipt bracket — the fixture has no
    shipmode/commitdate/receiptdate): per line-status counts of
    high- vs low-priority order lines shipped in 1996.

    The defining Q12 pattern: BOTH join sides are fact-scale (orders
    carries the CASE column, lineitem the filters), so this is the one
    TPC-H join that genuinely shuffles both inputs — no broadcast hint,
    and the date/returnflag filters reach the lineitem scan so the
    shuffled probe side is the pruned one. The two-way split is one
    conditional aggregate, not two passes.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            lng(F.sum(F.when(high, 1).otherwise(0))).alias("high_line_count"),
            lng(F.sum(F.when(high, 0).otherwise(1))).alias("low_line_count"),
        )
    )
