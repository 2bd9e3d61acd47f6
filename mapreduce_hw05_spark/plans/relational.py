"""Relational core contract queries (SURVEY.md §2.2–2.4, 2.6).

Covers: pf-1, pf-2 (+f-4 CASE WHEN), agg-1, agg-6, agg-7, j-1…j-8,
s-1, s-2, set-1…set-3.

Every query is declared with the DataFrame API so Catalyst owns the
physical plan: filters/projections push into the parquet scan, partial
aggregation is automatic (the genre's hand-written Combiner), join
strategy is broadcast for dims and sort-merge/shuffled-hash for facts
(AQE re-plans at runtime). Scale notes are per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.plans.common import lng, money, ratio
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import load_table

# --------------------------------------------------------------------------
# pf-1 — project + filter (the genre's map-only job)
# --------------------------------------------------------------------------


@contract(
    "q_filter_project",
    oracle="""
    SELECT count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_quantity), 6) AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped in 1996: count + sum(extendedprice) + avg(qty).

    Scale: the date range is a raw column predicate (not ``year()``), so
    it pushes down into the parquet scan and only 3 columns are read.
    Single global aggregate → map-side partial agg, one-row shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        ).agg(
            F.count("*").alias("n_items"),
            money(F.sum("l_extendedprice")).alias("sum_price"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
        )
    )


# --------------------------------------------------------------------------
# pf-2 — predicate battery (=, IN, LIKE, BETWEEN, range, NOT) + f-4 CASE WHEN
# --------------------------------------------------------------------------


@contract(
    "q_predicates",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high_value
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_totalprice BETWEEN 10000 AND 200000
      AND o_orderdate >= TIMESTAMP '1995-06-01'
      AND NOT (o_orderdate >= TIMESTAMP '2000-01-01')
      AND o_custkey IS NOT NULL
    GROUP BY o_orderstatus
    """,
)
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery over orders; CASE WHEN folded into the output."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").like("%URGENT%"))
        .filter(F.col("o_totalprice").between(10000, 200000))
        .filter(F.col("o_orderdate") >= "1995-06-01")
        .filter(~(F.col("o_orderdate") >= "2000-01-01"))
        .filter(F.col("o_custkey").isNotNull())
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("sum_price"),
            lng(F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))).alias(
                "n_high_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# agg-1 / agg-7 — TPC-H-Q1-style grouped aggregation (the flagship)
# --------------------------------------------------------------------------


@contract(
    "q_groupagg_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupagg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (flagship; SURVEY §7 r1).

    Scale: classic partial+final hash aggregate on a low-cardinality key
    (6 groups) — the shuffle moves 6 rows per task regardless of input
    size. This is the Spark-automatic version of the genre's hand-written
    Combiner.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price)).alias("sum_disc_price"),
            money(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            ratio(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# agg-6 — rollup (subtotals per nation, per nation×segment, grand total)
# --------------------------------------------------------------------------


@contract(
    "q_rollup_nation_segment",
    oracle="""
    SELECT coalesce(n_name, '__ALL__') AS nation,
           coalesce(c_mktsegment, '__ALL__') AS segment,
           count(c_custkey) AS n_customers,
           round(sum(c_acctbal), 2) AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def q_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(n_name, c_mktsegment): count + sum(acctbal) at 3 levels.

    NULL grouping keys are coalesced to a sentinel on both engines so the
    subtotal rows hash identically (fixture values are never NULL).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        # dim-sized: nation
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            money(F.sum("c_acctbal")).alias("sum_acctbal"),
        )
        .select(
            F.coalesce("n_name", F.lit("__ALL__")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("__ALL__")).alias("segment"),
            "n_customers",
            "sum_acctbal",
        )
    )


# --------------------------------------------------------------------------
# j-1 — equi inner join (the genre's reduce-side join)
# --------------------------------------------------------------------------


@contract(
    "q_join_orders_customer",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue + order count per market segment (fact ⋈ dim).

    Scale: customer is small relative to orders at any SF ratio here, but
    at 100 TB both sides are large → Catalyst picks sort-merge with AQE
    skew splitting; no hint on purpose. Aggregation keys are
    low-cardinality so the post-join agg is map-side partial.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# j-2 — broadcast (map-side) join
# --------------------------------------------------------------------------


@contract(
    "q_join_lineitem_part_bcast",
    oracle="""
    SELECT p_brand,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_lineitem_part_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue per brand; part is explicitly broadcast.

    Scale: the explicit ``F.broadcast`` replaces the genre's
    DistributedCache replicated join — zero shuffle of the fact table.
    Part at real TPC-H SF grows, but the projected (p_partkey, p_brand)
    pair stays comfortably under executor memory into the tens of GB of
    raw part data; above that, drop the hint and let AQE decide.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        # contract-scale: j-2 exercises the broadcast-join strategy itself
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
    )


# --------------------------------------------------------------------------
# j-3 — multi-way dimension chain join
# --------------------------------------------------------------------------


@contract(
    "q_join_dim_chain",
    oracle="""
    SELECT r_name,
           count(*) AS n_customers,
           round(avg(c_acctbal), 4) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_join_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region: count + avg(acctbal) per region.

    Scale: both dims broadcast; Catalyst flattens the chain into two
    broadcast hash joins inside one stage — no shuffle until the final
    5-group aggregate.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        # dim-sized: nation
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        # dim-sized: region
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# j-4 — left outer join (unmatched side kept with nulls)
# --------------------------------------------------------------------------


@contract(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order count including order-less customers (0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# j-5 / j-6 — semi and anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------


@contract(
    "q_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that have at least one order (left-semi join).

    Scale: semi join shuffles only the distinct keys of the right side —
    strictly cheaper than inner-join + distinct.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@contract(
    "q_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (left-anti join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


# --------------------------------------------------------------------------
# j-7 — cross join
# --------------------------------------------------------------------------


@contract(
    "q_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def q_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All unordered region pairs via explicit crossJoin.

    (The heavy cross-join use case is similarity search — llm-2 — which
    gates the cross product behind blocking; this query just proves the
    operator.)
    """
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("r1"))
    b = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("r2"))
    return a.crossJoin(b).filter(F.col("k1") < F.col("k2")).select("r1", "r2")


# --------------------------------------------------------------------------
# j-8 — range join (equi + band predicate) and pure theta join
# --------------------------------------------------------------------------


@contract(
    "q_range_join",
    oracle="""
    SELECT p_brand, count(*) AS n_in_band
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_extendedprice BETWEEN p_retailprice * 0.9 AND p_retailprice * 1.1
    GROUP BY p_brand
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems priced within ±10% of their part's retail price.

    Scale: the equi key carries the join (hash/broadcast); the band
    predicate is evaluated post-match, so this never degenerates into a
    nested-loop cross product.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_extendedprice >= p.p_retailprice * 0.9)
        & (li.l_extendedprice <= p.p_retailprice * 1.1)
    )
    return (
        # contract-scale: j-8 exercises the broadcast theta join (BNLJ allowlisted)
        li.join(F.broadcast(p), cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_in_band"))
    )


@contract(
    "q_theta_join",
    oracle="""
    SELECT a.s_suppkey AS s1, count(*) AS n_richer
    FROM supplier a JOIN supplier b ON b.s_acctbal > a.s_acctbal
    GROUP BY a.s_suppkey
    """,
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta self-join on a capped table: per supplier, how many
    suppliers hold a strictly larger balance.

    Scale: pure-theta is inherently O(n²) (broadcast-nested-loop) — the
    engine only allows it on bounded inputs; unbounded band joins get
    bucketized first (see operators.ranges).
    """
    s = load_table(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("s1"), F.col("s_acctbal").alias("bal1"))
    b = s.select(F.col("s_acctbal").alias("bal2"))
    return (
        # bounded: capped table per docstring - pure theta is broadcast-only here
        a.join(F.broadcast(b), F.col("bal2") > F.col("bal1"))
        .groupBy("s1")
        .agg(F.count("*").alias("n_richer"))
    )


# --------------------------------------------------------------------------
# s-1 / s-2 — global sort and top-k
# --------------------------------------------------------------------------


@contract(
    "q_global_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 slice of a global sort (range-partitioned in Spark).

    o_orderkey tiebreak makes the LIMIT set deterministic across engines.
    Spark plans this as TakeOrderedAndProject (per-partition top-k +
    driver merge) — no full global sort is materialized.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@contract(
    "q_topk_customers",
    oracle="""
    SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey
    LIMIT 10
    """,
)
def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by total order revenue.

    The ORDER BY key is the *rounded* revenue (identical on both engines)
    plus custkey, so the top-10 set is deterministic. This is the genre's
    in-mapper-TreeMap top-k pattern: Spark's TakeOrderedAndProject does
    the same per-partition heap + merge automatically.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(money(F.sum("o_totalprice")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .limit(10)
    )


@contract(
    "q_global_rank",
    oracle="""
    SELECT c_custkey,
           row_number() OVER (
               ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) DESC,
                        c_custkey
           ) AS rn
    FROM customer
    """,
)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s-4 (r8) — EXACT global row number over the whole entity table,
    the ranking primitive [[q_global_sort]]'s top-100 slice sidesteps:
    every customer gets its dense position in the
    (cent-quantized balance DESC, custkey) total order.

    A SQL engine answers this with ``row_number() OVER (ORDER BY …)``,
    which Spark physically plans as a SINGLE-partition sort — the
    one-task plan that cannot scale past one machine. The engine instead
    uses :func:`operators.ranks.global_cumsum` (range shuffle +
    per-partition offsets + counted JVM-window/Arrow routing), so the
    rank assignment is partition-parallel at any scale; the oracle keeps
    the window formulation, making this contract itself the
    Spark-vs-SQL identity check for the operator.
    """
    from mapreduce_hw05_spark.operators.ranks import global_cumsum

    c = load_table(spark, sf_dir, "customer")
    keyed = c.select(
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_c"),
        "c_custkey",
        F.lit(1).cast("long").alias("one"),
    )
    return global_cumsum(
        keyed, [F.col("bal_c").desc(), F.col("c_custkey").asc()], ["one"]
    ).select("c_custkey", F.col("cum_one").alias("rn"))


@contract(
    "q_running_total_nulls",
    oracle="""
    SELECT o_orderkey, cum_price
    FROM (
        SELECT o_orderkey,
               CAST(coalesce(
                   sum(CASE WHEN o_orderkey % 5 = 0 THEN NULL
                            ELSE CAST(floor(o_totalprice) AS BIGINT) END)
                   OVER (ORDER BY o_orderdate, o_orderkey), 0)
               AS BIGINT) AS cum_price
        FROM orders
    )
    WHERE o_orderkey % 97 = 0
    """,
)
def q_running_total_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s-4/w-2 (r10) — global running revenue total over a column WITH
    NULLS: every 5th order's price is unknown and must contribute 0 to
    the running total (never NULL-poison it), per
    :func:`operators.ranks.global_cumsum`'s null contract (ADVICE r9:
    the JVM route's per-partition window sum restarted NULL per
    partition and the Arrow route's cumsum carried NaN — both routes now
    agree with the null-skipping SQL window sum, which is exactly what
    the oracle's ``coalesce(sum(...) OVER ..., 0)`` states). Ordered by
    (o_orderdate, o_orderkey) — a total order — and thinned to every
    97th orderkey AFTER the cumsum so the output stays driver-sized
    while every retained value still depends on the full prefix.
    Integer cents-free formulation (``floor(price) AS BIGINT``) keeps
    the running sum exact on both engines at any prefix length.
    """
    from mapreduce_hw05_spark.operators.ranks import global_cumsum

    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.floor("o_totalprice").cast("long"))
        .alias("v"),
    )
    return (
        global_cumsum(
            keyed, [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()], ["v"]
        )
        .filter(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey", F.col("cum_v").alias("cum_price"))
    )


# --------------------------------------------------------------------------
# set-1 / set-2 / set-3 — union / intersect / except over event users
# --------------------------------------------------------------------------


def _users(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == event_type).select("user_id")


@contract(
    "q_union_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who click ∪ users who purchase (distinct union)."""
    return (
        _users(spark, sf_dir, "click").union(_users(spark, sf_dir, "purchase")).distinct()
    )


@contract(
    "q_intersect_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both click and purchase."""
    return _users(spark, sf_dir, "click").intersect(_users(spark, sf_dir, "purchase"))


@contract(
    "q_except_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who view but never purchase (distinct EXCEPT)."""
    return _users(spark, sf_dir, "view").subtract(_users(spark, sf_dir, "purchase"))


# --------------------------------------------------------------------------
# agg-8 (ext) — pivot: long→wide aggregation with a fixed column domain
# --------------------------------------------------------------------------


@contract(
    "q_pivot_status_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_partial,
           round(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 2) AS filled_total
    FROM orders
    GROUP BY 1
    """,
)
def q_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted to one column per status, per year.

    The pivot domain is declared explicitly (['O','F','P']) — at scale an
    undeclared domain forces an extra distinct-scan job before planning.
    One hash aggregate either way; pivot is a column-layout choice, not an
    extra shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.withColumn("order_year", lng(F.year("o_orderdate")))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("o_totalprice")).alias("total"),
        )
    )
    return wide.select(
        "order_year",
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_partial"),
        F.col("F_total").alias("filled_total"),
    )


# --------------------------------------------------------------------------
# pf-3 (ext) — scalar + correlated subqueries (Catalyst decorrelation)
# --------------------------------------------------------------------------


@contract(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_above_avg,
           round(sum(o_totalprice), 2) AS sum_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price, per status — the SQL entry
    point's scalar subquery, expressed DataFrame-side as a one-row
    broadcast join (exactly what Catalyst rewrites the subquery into)."""
    o = load_table(spark, sf_dir, "orders")
    global_avg = o.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        # one-row: global average
        o.join(F.broadcast(global_avg))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_above_avg"),
            money(F.sum("o_totalprice")).alias("sum_above_avg"),
        )
    )


# --------------------------------------------------------------------------
# agg-9 (ext) — unpivot / melt: wide→long
# --------------------------------------------------------------------------


@contract(
    "q_unpivot_metrics",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_discount), 6) AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate lineitem per returnflag, then melt the metric columns to
    (returnflag, metric, value) rows — wide→long without re-scanning.
    Unpivot is a projection (Expand node), zero extra shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        money(F.sum("l_quantity")).alias("sum_qty"),
        money(F.sum("l_extendedprice")).alias("sum_price"),
        ratio(F.avg("l_discount")).alias("avg_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# agg-6b — cube (all grouping-set combinations) with grouping_id
# --------------------------------------------------------------------------


@contract(
    "q_cube_year_status",
    oracle="""
    WITH src AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderstatus
        FROM orders
    )
    SELECT order_year,
           o_orderstatus,
           CAST(grouping(order_year) * 2 + grouping(o_orderstatus)
                AS BIGINT) AS gid,
           count(*) AS n_orders
    FROM src
    GROUP BY CUBE (order_year, o_orderstatus)
    """,
)
def q_cube_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts over CUBE(year, status): every grouping-set combo in
    one pass (Catalyst expands to a single Expand + aggregate, not four
    scans); grouping_id disambiguates NULL-as-total from NULL data."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", lng(F.year("o_orderdate")))
        .cube("order_year", "o_orderstatus")
        .agg(
            lng(F.grouping_id()).alias("gid"),
            F.count("*").alias("n_orders"),
        )
        .select("order_year", "o_orderstatus", "gid", "n_orders")
    )


# --------------------------------------------------------------------------
# agg-10 (ext) — exact interpolated percentiles
# --------------------------------------------------------------------------


@contract(
    "q_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of events.value per type (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, verified bit-equal after
    round-6). Scale note: exact percentiles sort per group; prefer
    approx_percentile (t-digest, mergeable sketches) at 100 TB — kept
    exact here because the contract needs hash equality."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        ratio(F.expr("percentile(value, 0.25)")).alias("p25"),
        ratio(F.expr("percentile(value, 0.5)")).alias("p50"),
        ratio(F.expr("percentile(value, 0.95)")).alias("p95"),
    )


# --------------------------------------------------------------------------
# f-9 (ext) — exact decimal arithmetic (no float drift by construction)
# --------------------------------------------------------------------------


@contract(
    "q_decimal_exact",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS total_exact,
           CAST(min(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS min_exact,
           CAST(max(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS max_exact,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregation in DECIMAL(18,2): sums are EXACT regardless of
    partial-aggregation order, so no rounding discipline is needed —
    the right type for financial columns at any scale (the double-based
    queries in this repo round instead because the fixtures are doubles).

    The EMITTED aggregates are cast to DOUBLE on both engines: the
    driver's value hash stringifies cells, and Spark's ``Decimal('1013.70')``
    keeps its scale-2 trailing zero while DuckDB's ``.df()`` bridge yields
    float64 ``1013.7`` — numerically identical, hash-different. Casting the
    single exact result to double is deterministic (one value, no
    order-dependent float accumulation), so the exactness property still
    holds end to end.
    """
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderstatus").agg(
        F.sum(price).cast("double").alias("total_exact"),
        F.min(price).cast("double").alias("min_exact"),
        F.max(price).cast("double").alias("max_exact"),
        F.count("*").alias("n_orders"),
    )


@contract(
    "q_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-02'
    GROUP BY ALL
    """,
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point end-to-end: the fixture registered as a temp
    view and the aggregate written in Spark SQL with the modern
    ``GROUP BY ALL`` shorthand (every non-aggregated select item groups)
    — same text a DuckDB/BigQuery user would write, parsed by Spark's
    parser into the identical Catalyst plan the DataFrame API builds.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_v"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem_v
        WHERE l_shipdate < TIMESTAMP '1998-09-02'
        GROUP BY ALL
        """
    )


# --------------------------------------------------------------------------
# j-8 (scale path) — bucketized range joins with NO equi key
# (operators.ranges: band join + interval-overlap join)
# --------------------------------------------------------------------------


@contract(
    "q_band_join_balances",
    oracle="""
    SELECT s_suppkey, c_custkey,
           round(abs(s_acctbal - c_acctbal), 2) AS bal_gap
    FROM supplier JOIN customer ON abs(s_acctbal - c_acctbal) <= 0.5
    ORDER BY s_suppkey, c_custkey
    """,
)
def q_band_join_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier/customer pairs with near-equal account balances
    (|Δ| ≤ 0.5) — a band join with NO equi key to carry it.

    The naive predicate join plans as BroadcastNestedLoopJoin
    (O(n·m) compares, mandatory broadcast); this goes through
    ``operators.ranges.band_join``: both sides bucketize on
    floor(balance / band), equi-join on the bucket id (an ordinary
    AQE-visible hash exchange), and the exact |Δ| ≤ band residual
    filters in codegen. Provably exact and duplicate-free — the build
    row owns one bucket, so no distinct pass. The plan audit asserts
    the nested-loop is gone (tests/test_ranges.py).
    """
    from mapreduce_hw05_spark.operators.ranges import band_join

    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    joined = band_join(supp, cust, "s_acctbal", "c_acctbal", 0.5)
    return (
        joined.select(
            "s_suppkey",
            "c_custkey",
            money(F.abs(F.col("s_acctbal") - F.col("c_acctbal"))).alias(
                "bal_gap"
            ),
        )
        .orderBy("s_suppkey", "c_custkey")
    )


@contract(
    "q_interval_overlap_join",
    oracle="""
    SELECT strftime(qs, '%Y-%m-%d') AS quarter_start,
           count(*) AS n_orders
    FROM orders o
    JOIN (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                        TIMESTAMP '2001-10-01',
                                        INTERVAL 3 MONTH)) AS qs) q
      ON o.o_orderdate < qs + INTERVAL 3 MONTH
     AND qs < o.o_orderdate + INTERVAL 7 DAY
    GROUP BY qs
    ORDER BY quarter_start
    """,
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per calendar quarter, how many 7-day order-fulfilment windows
    touch it — an interval-overlap join between two interval sets with
    no equi key.

    Goes through ``operators.ranges.interval_overlap_join`` on epoch
    seconds with 7-day buckets: each order window explodes into ≤ 2
    buckets, each ~91-day quarter into ~14; the join is an equi hash
    join on the bucket id and each overlapping pair is kept exactly
    once (first-shared-bucket rule), so the quarterly counts need no
    dedup. The 100-TB shape for time-range correlation when neither
    side shares a key — e.g. outage windows × request spans.
    """
    from mapreduce_hw05_spark.operators.ranges import interval_overlap_join

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .withColumn("os_sec", F.col("o_orderdate").cast("long"))
        .withColumn("oe_sec", F.col("os_sec") + 7 * 86400)
    )
    quarters = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("timestamp"),
                    F.lit("2001-10-01").cast("timestamp"),
                    F.expr("INTERVAL 3 MONTHS"),
                )
            ).alias("qs")
        )
        .withColumn("qe", F.expr("qs + INTERVAL 3 MONTHS"))
        .withColumn("qs_sec", F.col("qs").cast("long"))
        .withColumn("qe_sec", F.col("qe").cast("long"))
    )
    joined = interval_overlap_join(
        orders, quarters, "os_sec", "oe_sec", "qs_sec", "qe_sec", 7 * 86400
    )
    return (
        joined.groupBy(F.date_format("qs", "yyyy-MM-dd").alias("quarter_start"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("quarter_start")
    )
