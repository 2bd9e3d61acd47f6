"""Property-based differential testing (SURVEY §5.2 item 4): hypothesis
generates filter + group-by + aggregate specs over the fixture schema;
each spec is compiled BOTH to a DataFrame plan and to DuckDB SQL and the
results must match exactly.

This hunts the class of bug the fixed contract queries can't: operator
interactions (predicate × group-by × agg combinations) across the whole
spec grammar. Deterministic: derandomize=True, so CI never flakes.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from mapreduce_hw05_spark.sources import load_table
from tests.conftest import SF_DIR, compare_frames

# ---------------------------------------------------------------- grammar

_STATUS = ["O", "F", "P"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

predicate = st.fixed_dictionaries(
    {
        "statuses": st.sets(st.sampled_from(_STATUS), min_size=1, max_size=3),
        "price_lo": st.integers(min_value=0, max_value=200_000),
        "price_span": st.integers(min_value=10_000, max_value=400_000),
        "year_cut": st.integers(min_value=1992, max_value=1998),
        "year_op": st.sampled_from(["<", ">="]),
        "priority_like": st.one_of(st.none(), st.sampled_from(["URGENT", "HIGH", "LOW"])),
        "negate_like": st.booleans(),
    }
)

grouping = st.sampled_from(["o_orderstatus", "o_orderpriority", "order_year"])

aggs = st.sets(
    st.sampled_from(["n", "sum_price", "min_price", "max_price", "n_cust"]),
    min_size=1,
    max_size=4,
)


def _spark_query(orders, spec, group_col, agg_names):
    cond = orders["o_orderstatus"].isin(*sorted(spec["statuses"]))
    lo = float(spec["price_lo"])
    hi = float(spec["price_lo"] + spec["price_span"])
    cond &= orders["o_totalprice"].between(lo, hi)
    cut = f"{spec['year_cut']}-01-01"
    cond &= (
        orders["o_orderdate"] < cut
        if spec["year_op"] == "<"
        else orders["o_orderdate"] >= cut
    )
    if spec["priority_like"] is not None:
        like = orders["o_orderpriority"].like(f"%{spec['priority_like']}%")
        cond &= ~like if spec["negate_like"] else like
    df = orders.filter(cond).withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    agg_map = {
        "n": F.count("*").alias("n"),
        "sum_price": F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        "min_price": F.min("o_totalprice").alias("min_price"),
        "max_price": F.max("o_totalprice").alias("max_price"),
        "n_cust": F.countDistinct("o_custkey").alias("n_cust"),
    }
    return df.groupBy(group_col).agg(*[agg_map[a] for a in sorted(agg_names)])


def _oracle_sql(spec, group_col, agg_names):
    statuses = ", ".join(f"'{s}'" for s in sorted(spec["statuses"]))
    lo = float(spec["price_lo"])
    hi = float(spec["price_lo"] + spec["price_span"])
    cut = f"{spec['year_cut']}-01-01"
    preds = [
        f"o_orderstatus IN ({statuses})",
        f"o_totalprice BETWEEN {lo} AND {hi}",
        f"o_orderdate {spec['year_op']} TIMESTAMP '{cut}'",
    ]
    if spec["priority_like"] is not None:
        neg = "NOT " if spec["negate_like"] else ""
        preds.append(f"o_orderpriority {neg}LIKE '%{spec['priority_like']}%'")
    agg_sql = {
        "n": "count(*) AS n",
        "sum_price": "round(sum(o_totalprice), 2) AS sum_price",
        "min_price": "min(o_totalprice) AS min_price",
        "max_price": "max(o_totalprice) AS max_price",
        "n_cust": "count(DISTINCT o_custkey) AS n_cust",
    }
    select_group = (
        "CAST(year(o_orderdate) AS BIGINT) AS order_year"
        if group_col == "order_year"
        else group_col
    )
    cols = ", ".join(agg_sql[a] for a in sorted(agg_names))
    return (
        f"SELECT {select_group}, {cols} FROM orders "
        f"WHERE {' AND '.join(preds)} GROUP BY 1"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=predicate, group_col=grouping, agg_names=aggs)
def test_random_filter_agg_specs_match_oracle(spark, oracle, spec, group_col, agg_names):
    orders = load_table(spark, SF_DIR, "orders")
    spark_pdf = _spark_query(orders, spec, group_col, agg_names).toPandas()
    oracle_pdf = oracle.execute(_oracle_sql(spec, group_col, agg_names)).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec} {group_col} {sorted(agg_names)}: {problems}"


# ----------------------------------------------------------- join grammar

join_spec = st.fixed_dictionaries(
    {
        "how": st.sampled_from(
            ["inner", "left", "right", "full", "left_semi", "left_anti"]
        ),
        "segments": st.sets(
            st.sampled_from(
                ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
            ),
            min_size=1,
            max_size=3,
        ),
        "acctbal_min": st.integers(min_value=-1000, max_value=5000),
        "statuses": st.sets(st.sampled_from(_STATUS), min_size=1, max_size=3),
    }
)


def _spark_join(customer, orders, spec):
    c = customer.filter(
        customer["c_mktsegment"].isin(*sorted(spec["segments"]))
        & (customer["c_acctbal"] >= float(spec["acctbal_min"]))
    )
    o = orders.filter(orders["o_orderstatus"].isin(*sorted(spec["statuses"])))
    joined = c.join(o, c["c_custkey"] == o["o_custkey"], spec["how"])
    if spec["how"] in ("left_semi", "left_anti"):
        return joined.groupBy("c_mktsegment").agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def _join_oracle_sql(spec):
    segments = ", ".join(f"'{s}'" for s in sorted(spec["segments"]))
    statuses = ", ".join(f"'{s}'" for s in sorted(spec["statuses"]))
    c_pred = (
        f"c_mktsegment IN ({segments}) AND c_acctbal >= {float(spec['acctbal_min'])}"
    )
    o_pred = f"o_orderstatus IN ({statuses})"
    if spec["how"] in ("left_semi", "left_anti"):
        exists = "EXISTS" if spec["how"] == "left_semi" else "NOT EXISTS"
        return f"""
        SELECT c_mktsegment, count(*) AS n,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM customer
        WHERE {c_pred} AND {exists} (
            SELECT 1 FROM orders WHERE {o_pred} AND o_custkey = c_custkey)
        GROUP BY c_mktsegment
        """
    how = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "right": "RIGHT JOIN",  # unmatched orders land in the NULL segment group
        "full": "FULL JOIN",
    }[spec["how"]]
    return f"""
    SELECT c_mktsegment, count(*) AS n,
           count(o_orderkey) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM (SELECT * FROM customer WHERE {c_pred}) c
    {how} (SELECT * FROM orders WHERE {o_pred}) o ON c.c_custkey = o.o_custkey
    GROUP BY c_mktsegment
    """


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=join_spec)
def test_random_join_specs_match_oracle(spark, oracle, spec):
    customer = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    spark_pdf = _spark_join(customer, orders, spec).toPandas()
    oracle_pdf = oracle.execute(_join_oracle_sql(spec)).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"


# --------------------------------------------------------- window grammar

window_spec = st.fixed_dictionaries(
    {
        "partition": st.sampled_from(["o_orderstatus", "o_orderpriority"]),
        "fn": st.sampled_from(
            ["row_number", "rank", "dense_rank", "lag", "lead",
             "running_sum", "moving_avg", "range_sum", "range_cumsum",
             "percent_rank", "cume_dist", "ntile"]
        ),
        "statuses": st.sets(st.sampled_from(_STATUS), min_size=1, max_size=3),
        "window_rows": st.integers(min_value=1, max_value=9),
        "range_span": st.integers(min_value=1_000, max_value=80_000),
        "ntile_n": st.integers(min_value=2, max_value=7),
    }
)


def _spark_window(orders, spec):
    from pyspark.sql import Window as W

    # Total order inside each partition: date then unique key — without
    # the unique tiebreak every ranking/navigation fn is nondeterministic.
    w = W.partitionBy(spec["partition"]).orderBy("o_orderdate", "o_orderkey")
    fns = {
        "row_number": F.row_number().over(w).cast("long"),
        "rank": F.rank().over(w).cast("long"),
        "dense_rank": F.dense_rank().over(w).cast("long"),
        "lag": F.lag("o_totalprice").over(w),
        "lead": F.lead("o_totalprice").over(w),
        "running_sum": F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            2,
        ),
        "moving_avg": F.round(
            F.avg("o_totalprice").over(
                w.rowsBetween(-spec["window_rows"], 0)
            ),
            6,
        ),
        # RANGE frames order by the VALUE column: peers (duplicate
        # o_totalprice) share one frame, the classic ROWS-vs-RANGE trap
        "range_sum": F.round(
            F.sum("o_totalprice").over(
                W.partitionBy(spec["partition"])
                .orderBy("o_totalprice")
                .rangeBetween(-spec["range_span"], 0)
            ),
            2,
        ),
        "range_cumsum": F.round(
            F.sum("o_totalprice").over(
                W.partitionBy(spec["partition"])
                .orderBy("o_totalprice")
                .rangeBetween(W.unboundedPreceding, W.currentRow)
            ),
            2,
        ),
        "percent_rank": F.round(
            F.percent_rank().over(
                W.partitionBy(spec["partition"]).orderBy("o_totalprice")
            ),
            6,
        ),
        "cume_dist": F.round(
            F.cume_dist().over(
                W.partitionBy(spec["partition"]).orderBy("o_totalprice")
            ),
            6,
        ),
        "ntile": F.ntile(spec["ntile_n"]).over(w).cast("long"),
    }
    return orders.filter(
        orders["o_orderstatus"].isin(*sorted(spec["statuses"]))
    ).select("o_orderkey", fns[spec["fn"]].alias("v"))


def _window_oracle_sql(spec):
    statuses = ", ".join(f"'{s}'" for s in sorted(spec["statuses"]))
    over = (
        f"PARTITION BY {spec['partition']} ORDER BY o_orderdate, o_orderkey"
    )
    fn_sql = {
        "row_number": f"CAST(row_number() OVER ({over}) AS BIGINT)",
        "rank": f"CAST(rank() OVER ({over}) AS BIGINT)",
        "dense_rank": f"CAST(dense_rank() OVER ({over}) AS BIGINT)",
        "lag": f"lag(o_totalprice) OVER ({over})",
        "lead": f"lead(o_totalprice) OVER ({over})",
        "running_sum": (
            f"round(sum(o_totalprice) OVER ({over} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)"
        ),
        "moving_avg": (
            f"round(avg(o_totalprice) OVER ({over} "
            f"ROWS BETWEEN {spec['window_rows']} PRECEDING AND CURRENT ROW), 6)"
        ),
        "range_sum": (
            f"round(sum(o_totalprice) OVER (PARTITION BY {spec['partition']} "
            f"ORDER BY o_totalprice RANGE BETWEEN {spec['range_span']} "
            "PRECEDING AND CURRENT ROW), 2)"
        ),
        "range_cumsum": (
            f"round(sum(o_totalprice) OVER (PARTITION BY {spec['partition']} "
            "ORDER BY o_totalprice RANGE BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW), 2)"
        ),
        "percent_rank": (
            f"round(percent_rank() OVER (PARTITION BY {spec['partition']} "
            "ORDER BY o_totalprice), 6)"
        ),
        "cume_dist": (
            f"round(cume_dist() OVER (PARTITION BY {spec['partition']} "
            "ORDER BY o_totalprice), 6)"
        ),
        "ntile": f"CAST(ntile({spec['ntile_n']}) OVER ({over}) AS BIGINT)",
    }
    return (
        f"SELECT o_orderkey, {fn_sql[spec['fn']]} AS v FROM orders "
        f"WHERE o_orderstatus IN ({statuses})"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=window_spec)
def test_random_window_specs_match_oracle(spark, oracle, spec):
    orders = load_table(spark, SF_DIR, "orders")
    spark_pdf = _spark_window(orders, spec).toPandas()
    oracle_pdf = oracle.execute(_window_oracle_sql(spec)).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"


# ---------------------------------------------------------- set-op grammar

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

setop_spec = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["union", "intersect", "except"]),
        "types_a": st.sets(st.sampled_from(_EVENT_TYPES), min_size=1, max_size=3),
        "types_b": st.sets(st.sampled_from(_EVENT_TYPES), min_size=1, max_size=3),
        "value_cut": st.integers(min_value=0, max_value=150),
    }
)


def _spark_setop(events, spec):
    a = events.filter(
        events["event_type"].isin(*sorted(spec["types_a"]))
        & (events["value"] >= float(spec["value_cut"]))
    ).select("user_id").distinct()
    b = events.filter(
        events["event_type"].isin(*sorted(spec["types_b"]))
    ).select("user_id").distinct()
    combined = {
        "union": a.union(b).distinct(),
        "intersect": a.intersect(b),
        "except": a.exceptAll(b).distinct(),
    }[spec["op"]]
    return combined.agg(
        F.count("*").alias("n_users"),
        F.coalesce(F.sum("user_id"), F.lit(0)).alias("checksum"),
    )


def _setop_oracle_sql(spec):
    ta = ", ".join(f"'{t}'" for t in sorted(spec["types_a"]))
    tb = ", ".join(f"'{t}'" for t in sorted(spec["types_b"]))
    op_sql = {"union": "UNION", "intersect": "INTERSECT", "except": "EXCEPT"}
    return f"""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type IN ({ta}) AND value >= {float(spec["value_cut"])}),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type IN ({tb})),
         c AS (SELECT user_id FROM a {op_sql[spec["op"]]} SELECT user_id FROM b)
    SELECT count(*) AS n_users,
           CAST(coalesce(sum(user_id), 0) AS BIGINT) AS checksum
    FROM c
    """


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=setop_spec)
def test_random_setop_specs_match_oracle(spark, oracle, spec):
    events = load_table(spark, SF_DIR, "events")
    spark_pdf = _spark_setop(events, spec).toPandas()
    oracle_pdf = oracle.execute(_setop_oracle_sql(spec)).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"


# --------------------------------------------------- scalar-expr grammar

scalar_spec = st.fixed_dictionaries(
    {
        "str_fn": st.sampled_from(
            ["upper", "lower", "substr", "lpad", "reverse", "replace", "trim"]
        ),
        "sub_start": st.integers(min_value=1, max_value=6),
        "sub_len": st.integers(min_value=1, max_value=8),
        "pad_len": st.integers(min_value=5, max_value=20),
        "math_fn": st.sampled_from(
            ["round", "abs_shift", "ceil", "floor", "sqrt", "ln", "mod", "pow2"]
        ),
        "round_d": st.integers(min_value=0, max_value=4),
        "mod_k": st.integers(min_value=2, max_value=97),
        "date_fn": st.sampled_from(
            ["year", "month", "quarter", "day", "trunc_month_epoch", "unix_ts"]
        ),
    }
)


def _scalar_exprs(spec):
    """(spark Column, duckdb SQL fragment) pairs over the orders table —
    constrained to the semantics BOTH engines define identically
    (1-based substring starts, positive pads, ln on positives…)."""
    s, d = spec, spec
    str_pairs = {
        "upper": (
            F.upper("o_orderpriority"), "upper(o_orderpriority)"),
        "lower": (
            F.lower("o_orderpriority"), "lower(o_orderpriority)"),
        "substr": (
            F.substring("o_orderpriority", s["sub_start"], s["sub_len"]),
            f"substring(o_orderpriority, {s['sub_start']}, {s['sub_len']})"),
        "lpad": (
            F.lpad("o_orderstatus", s["pad_len"], "*"),
            f"lpad(o_orderstatus, {s['pad_len']}, '*')"),
        "reverse": (
            F.reverse("o_orderpriority"), "reverse(o_orderpriority)"),
        "replace": (
            F.regexp_replace("o_orderpriority", "-", "_"),
            "regexp_replace(o_orderpriority, '-', '_', 'g')"),
        "trim": (
            F.trim(F.concat(F.lit("  "), F.col("o_orderstatus"), F.lit(" "))),
            "trim('  ' || o_orderstatus || ' ')"),
    }
    math_pairs = {
        "round": (
            F.round("o_totalprice", d["round_d"]),
            f"round(o_totalprice, {d['round_d']})"),
        "abs_shift": (
            F.abs(F.col("o_totalprice") - 150000.0),
            "abs(o_totalprice - 150000.0)"),
        "ceil": (F.ceil("o_totalprice").cast("long"),
                 "CAST(ceil(o_totalprice) AS BIGINT)"),
        "floor": (F.floor("o_totalprice").cast("long"),
                  "CAST(floor(o_totalprice) AS BIGINT)"),
        "sqrt": (F.round(F.sqrt("o_totalprice"), 6),
                 "round(sqrt(o_totalprice), 6)"),
        "ln": (F.round(F.log(F.col("o_totalprice") + 1.0), 6),
               "round(ln(o_totalprice + 1.0), 6)"),
        "mod": (F.pmod(F.col("o_orderkey"), F.lit(d["mod_k"])).cast("long"),
                f"CAST(o_orderkey % {d['mod_k']} AS BIGINT)"),
        "pow2": (F.round(F.pow(F.col("o_totalprice") / 100000.0, 2), 6),
                 "round(pow(o_totalprice / 100000.0, 2), 6)"),
    }
    date_pairs = {
        "year": (F.year("o_orderdate").cast("long"),
                 "CAST(year(o_orderdate) AS BIGINT)"),
        "month": (F.month("o_orderdate").cast("long"),
                  "CAST(month(o_orderdate) AS BIGINT)"),
        "quarter": (F.quarter("o_orderdate").cast("long"),
                    "CAST(quarter(o_orderdate) AS BIGINT)"),
        "day": (F.dayofmonth("o_orderdate").cast("long"),
                "CAST(day(o_orderdate) AS BIGINT)"),
        "trunc_month_epoch": (
            F.unix_timestamp(F.date_trunc("month", "o_orderdate")),
            "CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT)"),
        "unix_ts": (F.unix_timestamp("o_orderdate"),
                    "CAST(epoch(o_orderdate) AS BIGINT)"),
    }
    return (
        str_pairs[spec["str_fn"]],
        math_pairs[spec["math_fn"]],
        date_pairs[spec["date_fn"]],
    )


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=scalar_spec)
def test_random_scalar_exprs_match_oracle(spark, oracle, spec):
    """Per-row scalar expressions must agree cell-for-cell: group by the
    three generated expressions and count, so any divergent cell shows
    up as a row-set difference."""
    (s_col, s_sql), (m_col, m_sql), (d_col, d_sql) = _scalar_exprs(spec)
    orders = load_table(spark, SF_DIR, "orders")
    spark_pdf = (
        orders.select(
            s_col.alias("sv"), m_col.alias("mv"), d_col.alias("dv")
        )
        .groupBy("sv", "mv", "dv")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    oracle_pdf = oracle.execute(
        f"SELECT {s_sql} AS sv, {m_sql} AS mv, {d_sql} AS dv, "
        "count(*) AS n FROM orders GROUP BY 1, 2, 3"
    ).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"


# ------------------------------------------- multi-level aggregation grammar

_GS_COLS = ["o_orderstatus", "o_orderpriority", "order_year"]

gs_spec = st.fixed_dictionaries(
    {
        "mode": st.sampled_from(["rollup", "cube", "sets"]),
        "cols": st.lists(
            st.sampled_from(_GS_COLS), min_size=2, max_size=3, unique=True
        ),
        # for mode="sets": indices into the powerset of cols (resolved
        # against the drawn cols; dedup + always keep at least one set)
        "set_masks": st.sets(
            st.integers(min_value=0, max_value=7), min_size=1, max_size=4
        ),
        "aggs": st.sets(
            st.sampled_from(["n", "sum_price", "min_price", "n_cust"]),
            min_size=1,
            max_size=3,
        ),
        "price_lo": st.integers(min_value=0, max_value=150_000),
    }
)

_GS_AGG_SQL = {
    "n": "count(*) AS n",
    "sum_price": "round(sum(o_totalprice), 2) AS sum_price",
    "min_price": "min(o_totalprice) AS min_price",
    "n_cust": "count(DISTINCT o_custkey) AS n_cust",
}


def _gs_group_clause(spec):
    """Returns (group-by clause, selectable columns). A column is only
    selectable if it appears in ≥1 grouping set — selecting an uncovered
    column is invalid SQL (Spark rejects it; DuckDB is laxer)."""
    cols = spec["cols"]
    if spec["mode"] == "rollup":
        return f"ROLLUP ({', '.join(cols)})", cols
    if spec["mode"] == "cube":
        return f"CUBE ({', '.join(cols)})", cols
    sets = []
    for mask in sorted(spec["set_masks"]):
        subset = [c for i, c in enumerate(cols) if mask & (1 << i)]
        if subset not in sets:
            sets.append(subset)
    covered = [c for c in cols if any(c in sub for sub in sets)]
    rendered = ", ".join(f"({', '.join(sub)})" for sub in sets)
    return f"GROUPING SETS ({rendered})", covered


def _gs_sql(spec, relation: str) -> str:
    """One SQL text for BOTH engines: multi-level aggregates with a
    per-column grouping bit vector (gid) — the null-group vs null-VALUE
    disambiguation that makes rollup results well-defined."""
    clause, covered = _gs_group_clause(spec)
    gid = (
        " + ".join(
            f"grouping({c}) * {1 << (len(covered) - 1 - i)}"
            for i, c in enumerate(covered)
        )
        or "0"
    )
    select_cols = "".join(f"{c}, " for c in covered)
    aggs = ", ".join(_GS_AGG_SQL[a] for a in sorted(spec["aggs"]))
    return (
        "WITH src AS (SELECT o_orderstatus, o_orderpriority, o_custkey, "
        "o_totalprice, CAST(year(o_orderdate) AS BIGINT) AS order_year "
        f"FROM {relation} WHERE o_totalprice >= {float(spec['price_lo'])}) "
        f"SELECT {select_cols}CAST({gid} AS BIGINT) AS gid, {aggs} "
        f"FROM src GROUP BY {clause}"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=gs_spec)
def test_random_grouping_set_specs_match_oracle(spark, oracle, spec):
    """ROLLUP / CUBE / arbitrary GROUPING SETS over random column lists,
    aggregate subsets, and filters must agree with DuckDB exactly —
    including the gid bit vector and the all-null super-aggregate rows
    (Spark compiles these to one Expand + aggregate; the grammar hunts
    Expand/null-marker interaction bugs the fixed contract can't)."""
    orders = load_table(spark, SF_DIR, "orders")
    orders.createOrReplaceTempView("pd_gs_orders")
    spark_pdf = spark.sql(_gs_sql(spec, "pd_gs_orders")).toPandas()
    oracle_pdf = oracle.execute(_gs_sql(spec, "orders")).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"


# ------------------------------------------------- as-of join grammar (j-9)

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

asof_spec = st.fixed_dictionaries(
    {
        "left_type": st.sampled_from(_EVENT_TYPES),
        "right_type": st.sampled_from(_EVENT_TYPES),
        # key cardinality knob: fewer keys → more rows per key → deeper
        # running-last state and more cross-row interaction per partition
        "key_mod": st.sampled_from([1, 5, 17, 101]),
        # timestamp truncation MAKES ties — the semantics corner where
        # as-of implementations disagree (does right.ts == left.ts match?)
        "trunc": st.sampled_from([None, "minute", "hour"]),
        "value_min": st.one_of(st.none(), st.integers(min_value=5, max_value=80)),
    }
)


def _asof_frames(spark, spec):
    """Compile the spec for the engine (operators.asof union+window) —
    the right side is pre-deduped to one row per (key, ts) via max(value)
    so the as-of pick is deterministic on both engines."""
    from mapreduce_hw05_spark.operators.asof import asof_join

    ev = load_table(spark, SF_DIR, "events")
    key = (F.col("user_id") % spec["key_mod"]).alias("k")
    ts = (
        F.date_trunc(spec["trunc"], F.col("ts")) if spec["trunc"] else F.col("ts")
    ).alias("ts")
    left = ev.filter(F.col("event_type") == spec["left_type"]).select(
        key, ts, "event_id"
    )
    right = ev.filter(F.col("event_type") == spec["right_type"])
    if spec["value_min"] is not None:
        right = right.filter(F.col("value") >= float(spec["value_min"]))
    right = (
        right.select(key, ts, "value")
        .groupBy("k", "ts")
        .agg(F.round(F.max("value"), 2).alias("rv"))
    )
    joined = asof_join(left, right, on=["k"], ts_col="ts", carry_cols=["rv"])
    return joined.groupBy("k").agg(
        F.count("*").alias("n"),
        F.count("ts_asof").alias("n_matched"),
        F.sum(F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("gap_sum"),
        F.round(F.sum("rv_asof"), 2).alias("rv_sum"),
    )


def _asof_oracle_sql(spec):
    key = f"user_id % {spec['key_mod']}"
    ts = f"date_trunc('{spec['trunc']}', ts)" if spec["trunc"] else "ts"
    v_pred = (
        f"AND value >= {float(spec['value_min'])}"
        if spec["value_min"] is not None
        else ""
    )
    return f"""
    WITH l AS (
        SELECT {key} AS k, {ts} AS ts, event_id
        FROM events WHERE event_type = '{spec["left_type"]}'
    ), r AS (
        SELECT {key} AS k, {ts} AS ts, round(max(value), 2) AS rv
        FROM events WHERE event_type = '{spec["right_type"]}' {v_pred}
        GROUP BY 1, 2
    )
    SELECT l.k, count(*) AS n,
           CAST(count(r.ts) AS BIGINT) AS n_matched,
           CAST(sum(epoch_us(l.ts) - epoch_us(r.ts)) AS BIGINT) AS gap_sum,
           round(sum(r.rv), 2) AS rv_sum
    FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
    GROUP BY l.k
    """


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=asof_spec)
def test_random_asof_specs_match_duckdb_asof(spark, oracle, spec):
    """The union+window as-of operator must agree with DuckDB's native
    ASOF LEFT JOIN across event-type pairs, key cardinalities, tie-making
    timestamp truncations, and right-side filters — including the
    tie-matches (right.ts == left.ts) and no-match-null corners."""
    spark_pdf = _asof_frames(spark, spec).toPandas()
    oracle_pdf = oracle.execute(_asof_oracle_sql(spec)).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"


# ------------------------------------------- subquery / NOT-IN null grammar

subquery_spec = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["in", "not_in", "exists", "not_exists"]),
        # NULLIF remainders inject NULL keys on either side independently
        # (0..49 hits; 50+ never fires = no nulls on that side); the
        # inner-NULL case is what breaks naive NOT IN -> anti rewrites
        "outer_null_rem": st.integers(min_value=0, max_value=60),
        "inner_null_rem": st.integers(min_value=0, max_value=60),
        "acctbal_min": st.integers(min_value=-1000, max_value=9000),
        "statuses": st.sets(st.sampled_from(_STATUS), min_size=1, max_size=3),
    }
)


def _subquery_frames(spark, spec):
    """Compile the spec through the operators.subquery rewrites: IN /
    EXISTS -> semi equi-join, NOT EXISTS -> anti equi-join, NOT IN ->
    null_safe_not_in (bounded inner-NULL probe + anti equi-join)."""
    from mapreduce_hw05_spark.operators.subquery import (
        null_safe_not_in,
        semi_in,
    )

    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderstatus").isin(*sorted(spec["statuses"]))
    )
    outer = orders.withColumn(
        "k", F.nullif(F.col("o_custkey") % 50, F.lit(spec["outer_null_rem"]))
    )
    inner = (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_acctbal") >= float(spec["acctbal_min"]))
        .withColumn(
            "ik", F.nullif(F.col("c_custkey") % 50, F.lit(spec["inner_null_rem"]))
        )
    )
    kind = spec["kind"]
    if kind == "in":
        kept = semi_in(outer, F.col("k"), inner, F.col("ik"))
    elif kind == "not_in":
        kept = null_safe_not_in(outer, F.col("k"), inner, F.col("ik"))
    elif kind == "exists":
        kept = outer.join(
            inner.select("ik"), F.col("k") == F.col("ik"), "left_semi"
        )
    else:  # not_exists: NULL outer keys have no match and are KEPT
        kept = outer.join(
            inner.select("ik"), F.col("k") == F.col("ik"), "left_anti"
        )
    return kept.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def _subquery_oracle_sql(spec):
    statuses = ", ".join(f"'{s}'" for s in sorted(spec["statuses"]))
    op = {
        "in": "k IN",
        "not_in": "k NOT IN",
        "exists": "EXISTS",
        "not_exists": "NOT EXISTS",
    }[spec["kind"]]
    inner = (
        f"SELECT nullif(c_custkey % 50, {spec['inner_null_rem']}) AS ik "
        f"FROM customer WHERE c_acctbal >= {float(spec['acctbal_min'])}"
    )
    if spec["kind"] in ("in", "not_in"):
        pred = f"{op} ({inner})"
    else:
        pred = f"{op} (SELECT 1 FROM ({inner}) WHERE ik = k)"
    return f"""
    WITH o AS (
        SELECT *, nullif(o_custkey % 50, {spec["outer_null_rem"]}) AS k
        FROM orders WHERE o_orderstatus IN ({statuses})
    )
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM o WHERE {pred}
    GROUP BY o_orderstatus
    """


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=subquery_spec)
def test_random_subquery_specs_match_oracle(spark, oracle, spec):
    """The semi/anti rewrites must reproduce native IN / NOT IN /
    EXISTS / NOT EXISTS semantics under NULL keys on either side —
    including inner-set-contains-NULL (NOT IN must return nothing) and
    NULL outer keys (dropped by IN/NOT IN/EXISTS, kept by NOT EXISTS)."""
    spark_pdf = _subquery_frames(spark, spec).toPandas()
    oracle_pdf = oracle.execute(_subquery_oracle_sql(spec)).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"


# ------------------------------------- multi-distinct aggregation grammar

_MD_DISTINCTS = {
    "nd_cust": ("o_custkey", "count(DISTINCT o_custkey)"),
    "nd_prio": ("o_orderpriority", "count(DISTINCT o_orderpriority)"),
    "nd_year": ("year(o_orderdate)", "count(DISTINCT year(o_orderdate))"),
    # floor() on both sides: DuckDB CAST(double AS INT) rounds,
    # Spark's cast truncates — floor makes the bucketing engine-neutral
    "nd_bucket": (
        "CAST(floor(o_totalprice / 50000) AS INT)",
        "count(DISTINCT CAST(floor(o_totalprice / 50000) AS INT))",
    ),
}

multi_distinct_spec = st.fixed_dictionaries(
    {
        "group_col": st.sampled_from(["o_orderstatus", "o_orderpriority"]),
        "distincts": st.sets(
            st.sampled_from(sorted(_MD_DISTINCTS)), min_size=1, max_size=4
        ),
        "having_min": st.integers(min_value=0, max_value=4000),
        "statuses": st.sets(st.sampled_from(_STATUS), min_size=1, max_size=3),
    }
)


def _md_spark(orders, spec):
    """N distinct aggregates in ONE aggregation — Catalyst compiles this
    to a single Expand (one replicated row group per distinct set), the
    plan shape this grammar hunts bugs in."""
    exprs = {
        "nd_cust": F.countDistinct("o_custkey"),
        "nd_prio": F.countDistinct("o_orderpriority"),
        "nd_year": F.countDistinct(F.year("o_orderdate")),
        "nd_bucket": F.countDistinct(
            F.floor(F.col("o_totalprice") / 50000).cast("int")
        ),
    }
    aggs = [exprs[k].alias(k) for k in sorted(spec["distincts"])]
    aggs.append(F.count("*").alias("n_rows"))
    return (
        orders.filter(orders["o_orderstatus"].isin(*sorted(spec["statuses"])))
        .groupBy(spec["group_col"])
        .agg(*aggs)
        .filter(F.col("n_rows") >= spec["having_min"])
    )


def _md_oracle_sql(spec):
    statuses = ", ".join(f"'{s}'" for s in sorted(spec["statuses"]))
    cols = ", ".join(
        f"{_MD_DISTINCTS[k][1]} AS {k}" for k in sorted(spec["distincts"])
    )
    return f"""
    SELECT {spec["group_col"]}, {cols}, count(*) AS n_rows
    FROM orders
    WHERE o_orderstatus IN ({statuses})
    GROUP BY {spec["group_col"]}
    HAVING count(*) >= {spec["having_min"]}
    """


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=multi_distinct_spec)
def test_random_multi_distinct_specs_match_oracle(spark, oracle, spec):
    """Up to four DISTINCT aggregates of mixed expressions in one
    aggregation + HAVING — the Expand-plan combinations fixed contracts
    only sample."""
    orders = load_table(spark, SF_DIR, "orders")
    spark_pdf = _md_spark(orders, spec).toPandas()
    oracle_pdf = oracle.execute(_md_oracle_sql(spec)).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{spec}: {problems}"
