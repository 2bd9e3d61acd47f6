"""Scalar-function battery contract queries (SURVEY.md §2.7: f-1, f-2, f-3).

These replace the genre's per-mapper ``java.lang.String`` /
``SimpleDateFormat`` / ``java.lang.Math`` calls with Catalyst expressions
— JVM-side, whole-stage-codegen'd, never a Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.plans.common import lng, money, ratio
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import load_table

# --------------------------------------------------------------------------
# f-1 — string functions
# --------------------------------------------------------------------------


@contract(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substring(c_name, 10, 9) AS name_digits,
           CAST(length(c_name) AS BIGINT) AS name_len,
           concat(trim(c_mktsegment), '-', c_name) AS seg_name,
           regexp_extract(c_name, '([0-9]+)$', 1) AS digits_re,
           replace(c_name, 'Customer', 'Cust') AS name_short
    FROM customer
    WHERE c_custkey < 500
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery over customer names (Customer#000000123 shaped)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        lng(F.length("c_name")).alias("name_len"),
        F.concat(F.trim(F.col("c_mktsegment")), F.lit("-"), F.col("c_name")).alias(
            "seg_name"
        ),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("digits_re"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
    )


# --------------------------------------------------------------------------
# f-2 — date/time functions
# --------------------------------------------------------------------------


@contract(
    "q_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           count(*) AS n_orders,
           round(avg(date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE))), 4) AS avg_ship_lag_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per year×quarter + average order→ship lag in days.

    Both engines cast timestamp→date before differencing so the lag is a
    whole-day count with identical semantics.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            lng(F.year("o_orderdate")).alias("order_year"),
            lng(F.quarter("o_orderdate")).alias("order_quarter"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.avg(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))), 4
            ).alias("avg_ship_lag_days"),
        )
    )


# --------------------------------------------------------------------------
# f-3 — math functions
# --------------------------------------------------------------------------


@contract(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey % 7 AS bucket,
           round(sum(sqrt(l_extendedprice)), 2) AS sum_sqrt_price,
           round(sum(ln(l_extendedprice)), 4) AS sum_ln_price,
           round(sum(pow(l_discount, 2)), 6) AS sum_disc_sq,
           round(sum(abs(l_quantity - 25.0)), 2) AS sum_abs_dev,
           CAST(sum(CAST(ceil(l_quantity / 10.0) AS BIGINT)) AS BIGINT) AS sum_ceil_bin,
           CAST(sum(CAST(floor(l_tax * 100) AS BIGINT)) AS BIGINT) AS sum_floor_tax
    FROM lineitem
    GROUP BY 1
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (sqrt/ln/pow/abs/ceil/floor/%) aggregated per key-mod bucket."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy((F.col("l_orderkey") % 7).alias("bucket"))
        .agg(
            money(F.sum(F.sqrt("l_extendedprice"))).alias("sum_sqrt_price"),
            F.round(F.sum(F.log(F.col("l_extendedprice"))), 4).alias("sum_ln_price"),
            ratio(F.sum(F.pow(F.col("l_discount"), 2))).alias("sum_disc_sq"),
            money(F.sum(F.abs(F.col("l_quantity") - 25.0))).alias("sum_abs_dev"),
            lng(F.sum(F.ceil(F.col("l_quantity") / 10.0).cast("long"))).alias(
                "sum_ceil_bin"
            ),
            lng(F.sum(F.floor(F.col("l_tax") * 100).cast("long"))).alias(
                "sum_floor_tax"
            ),
        )
    )


# --------------------------------------------------------------------------
# f-7 — map functions
# --------------------------------------------------------------------------


@contract(
    "q_map_funcs",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ), totals AS (
        SELECT user_id,
               count(*) AS n_types,
               CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN n END),
                             0) AS BIGINT) AS n_clicks
        FROM per GROUP BY 1
    )
    SELECT p.user_id, t.n_types, t.n_clicks, p.event_type, p.n
    FROM per p JOIN totals t USING (user_id)
    WHERE p.n >= 2
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType battery (f-7): per-user event_type→count maps built with
    map_from_entries, probed with map_keys/size and element_at, filtered
    with the map_filter higher-order function, and exploded back to rows.

    The map is real on the Spark side; the output is plain columns, so
    the oracle expresses the identical result relationally (DuckDB map
    syntax diverges from Spark's — the contract checks semantics, not
    syntax).
    """
    events = load_table(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    return maps.select(
        "user_id",
        F.size(F.map_keys("m")).alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("n_clicks"),
        F.explode(F.map_filter("m", lambda k, v: v >= F.lit(2))).alias(
            "event_type", "n"
        ),
    )


# --------------------------------------------------------------------------
# f-2b (ext) — calendar-function battery (month rolls, ISO week/day)
# --------------------------------------------------------------------------


@contract(
    "q_calendar_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH,
                    '%Y-%m-%d') AS due_3mo,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS day_of_year
    FROM orders
    """,
)
def q_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar battery per order: +3-month due date (month-end clamped),
    month end, ISO week number, ISO day-of-week, day-of-year.

    The cross-engine traps are pinned explicitly: both engines clamp
    add_months at month ends, weekofyear is ISO-8601 in both, and
    Spark's Sunday-first ``dayofweek`` is replaced by ``weekday()+1``
    to match DuckDB's ``isodow`` (Mon=1…Sun=7).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("due_3mo"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        lng(F.weekofyear("o_orderdate")).alias("iso_week"),
        lng(F.weekday("o_orderdate") + 1).alias("iso_dow"),
        lng(F.dayofyear("o_orderdate")).alias("day_of_year"),
    )


# --------------------------------------------------------------------------
# f-4b (ext) — null-semantics battery (nullif/coalesce/null-safe compare)
# --------------------------------------------------------------------------


@contract(
    "q_null_semantics",
    oracle="""
    WITH e AS (
        SELECT event_id,
               nullif(event_type, 'view') AS et_null,
               CASE WHEN value < 50 THEN NULL ELSE value END AS v_null
        FROM events
    )
    SELECT et_null,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(v_null) AS BIGINT) AS n_value_nonnull,
           round(avg(v_null), 6) AS avg_nonnull,
           round(avg(coalesce(v_null, 0.0)), 6) AS avg_zero_filled,
           CAST(sum(CASE WHEN v_null IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq
    FROM e GROUP BY et_null
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics battery: NULL group keys survive GROUP BY as their
    own group, count(col) skips nulls while count(*) doesn't, avg
    ignores nulls vs coalesce-zero-fill, and the null-safe comparator
    (`IS NOT DISTINCT FROM` / ``eqNullSafe``) treats NULL=NULL as true.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.nullif("event_type", F.lit("view")).alias("et_null"),
        F.when(F.col("value") < 50, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v_null"),
    )
    return e.groupBy("et_null").agg(
        F.count("*").alias("n_total"),
        F.count("v_null").alias("n_value_nonnull"),
        ratio(F.avg("v_null")).alias("avg_nonnull"),
        ratio(F.avg(F.coalesce("v_null", F.lit(0.0)))).alias("avg_zero_filled"),
        F.sum(F.col("v_null").eqNullSafe(F.lit(None).cast("double")).cast("long")).alias(
            "n_null_safe_eq"
        ),
    )


# --------------------------------------------------------------------------
# f-9 (ext) — bitwise battery (operators + bit aggregates)
# --------------------------------------------------------------------------


@contract(
    "q_bitwise_funcs",
    oracle="""
    SELECT event_type,
           CAST(bit_and(event_id & 255) AS BIGINT) AS and_low,
           CAST(bit_or(event_id & 255) AS BIGINT) AS or_low,
           CAST(bit_xor(event_id) AS BIGINT) AS xor_all,
           CAST(sum(bit_count(CAST(event_id AS BIGINT))) AS BIGINT)
               AS popcount_sum,
           CAST(max((event_id << 2) | 3) AS BIGINT) AS shifted_max
    FROM events
    GROUP BY event_type
    """,
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery per event_type: AND/OR/XOR bit aggregates (the
    primitives behind bitmap indexes and Bloom-bitmap builds), popcount,
    and shift/mask operators.
    """
    ev = load_table(spark, sf_dir, "events")
    low = F.col("event_id").bitwiseAND(F.lit(255))
    return ev.groupBy("event_type").agg(
        F.bit_and(low).alias("and_low"),
        F.bit_or(low).alias("or_low"),
        F.bit_xor("event_id").alias("xor_all"),
        F.sum(F.bit_count("event_id")).alias("popcount_sum"),
        F.max(F.shiftleft("event_id", 2).bitwiseOR(F.lit(3))).alias("shifted_max"),
    )


# --------------------------------------------------------------------------
# f-10 (ext) — binary encode/decode battery (base64 / hex / utf-8 bytes)
# --------------------------------------------------------------------------


@contract(
    "q_encoding_funcs",
    oracle="""
    SELECT p_partkey,
           base64(encode(p_name)) AS name_b64,
           lower(to_hex(hash(p_name))) = lower(to_hex(hash(p_name)))
               AS hex_selfcheck,
           CAST(octet_length(encode(p_name)) AS BIGINT) AS n_bytes,
           upper(substring(md5(p_name), 1, 8)) AS md5_prefix
    FROM part
    """,
)
def q_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encode/decode battery per part: UTF-8 byte encoding →
    base64, byte length (octet semantics, not chars), and a hex/md5
    digest slice — the binary-column plumbing every payload pipeline
    leans on.

    DuckDB's hash() and Spark's xxhash64 differ, so the hex path is
    exercised as an engine-side self-check column (constant true) while
    the value-carrying digest uses md5, which matches bit-for-bit.
    """
    p = load_table(spark, sf_dir, "part")
    utf8 = F.encode("p_name", "UTF-8")
    return p.select(
        "p_partkey",
        F.base64(utf8).alias("name_b64"),
        (F.lower(F.hex(F.xxhash64("p_name"))) == F.lower(F.hex(F.xxhash64("p_name"))))
        .alias("hex_selfcheck"),
        F.octet_length("p_name").cast("long").alias("n_bytes"),
        F.upper(F.substring(F.md5(utf8), 1, 8)).alias("md5_prefix"),
    )


# --------------------------------------------------------------------------
# f-11 (ext) — formatting / padding / variadic-compare / safe-arithmetic
# --------------------------------------------------------------------------


@contract(
    "q_format_funcs",
    oracle="""
    SELECT s_suppkey,
           printf('%08d|%s', s_suppkey, s_name) AS padded_id,
           lpad(s_name, 25, '.') AS name_lpad,
           rpad(CAST(s_nationkey AS VARCHAR), 6, '0') AS nation_rpad,
           reverse(s_name) AS name_rev,
           repeat('-', CAST(s_nationkey % 5 AS INTEGER)) AS dashes,
           round(greatest(s_acctbal, 0.0), 2) AS bal_floor0,
           round(least(s_acctbal, 5000.0), 2) AS bal_cap5k,
           TRY_CAST(s_name AS DOUBLE) AS name_as_num,
           CASE WHEN s_nationkey = 0 THEN NULL
                ELSE round(s_acctbal / s_nationkey, 6) END AS bal_per_nation
    FROM supplier
    """,
)
def q_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting/safe-arithmetic battery per supplier: printf-style
    formatting, pad/reverse/repeat, variadic greatest/least clamps,
    error-safe try_cast (non-numeric → NULL, never an exception), and
    try_divide (÷0 → NULL) — the ANSI-mode-safe arithmetic surface.
    """
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string("%08d|%s", "s_suppkey", "s_name").alias("padded_id"),
        F.lpad("s_name", 25, ".").alias("name_lpad"),
        F.rpad(F.col("s_nationkey").cast("string"), 6, "0").alias("nation_rpad"),
        F.reverse("s_name").alias("name_rev"),
        F.repeat(F.lit("-"), (F.col("s_nationkey") % 5).cast("int")).alias("dashes"),
        money(F.greatest("s_acctbal", F.lit(0.0))).alias("bal_floor0"),
        money(F.least("s_acctbal", F.lit(5000.0))).alias("bal_cap5k"),
        F.col("s_name").try_cast("double").alias("name_as_num"),
        ratio(F.try_divide("s_acctbal", "s_nationkey")).alias("bal_per_nation"),
    )


# --------------------------------------------------------------------------
# f-12 (ext) — regexp_extract_all: all-match extraction to arrays
# --------------------------------------------------------------------------


@contract(
    "q_regexp_all",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]{4,}')) AS BIGINT)
               AS n_long_words,
           array_to_string(regexp_extract_all(text, '[a-z]{4,}')[1:3], '|')
               AS first3_long,
           CAST(len(regexp_extract_all(text, 'e')) AS BIGINT) AS n_e
    FROM documents
    """,
)
def q_regexp_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-occurrence regex extraction per document: long-word count,
    the first three long words re-joined, and a single-char match count
    — ``regexp_extract_all`` returning arrays, sliced and measured
    JVM-side (same array semantics, 1-based slice, in both engines).
    """
    d = load_table(spark, sf_dir, "documents")
    longs = F.regexp_extract_all("text", F.lit("[a-z]{4,}"), F.lit(0))
    return d.select(
        "doc_id",
        F.size(longs).cast("long").alias("n_long_words"),
        F.array_join(F.slice(longs, 1, 3), "|").alias("first3_long"),
        F.size(F.regexp_extract_all("text", F.lit("e"), F.lit(0)))
        .cast("long")
        .alias("n_e"),
    )


# --------------------------------------------------------------------------
# f-13 (ext) — explode_outer: null-preserving lateral array expansion
# --------------------------------------------------------------------------


@contract(
    "q_explode_outer",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_extract_all(text, '[a-z]+'),
                           w -> len(w) >= 9) AS rare
        FROM documents
    )
    SELECT t.doc_id, u.word,
           CAST(len(t.rare) AS BIGINT) AS n_rare
    FROM t
    LEFT JOIN LATERAL (SELECT unnest(t.rare) AS word) u ON TRUE
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving lateral expansion: documents exploded over their
    rare (≥9-char) words, with documents owning NO such word kept as a
    single null row — ``explode_outer`` vs plain ``explode``'s silent
    row drop, the distinction that decides whether a downstream
    left-side aggregate still sees every parent row.
    """
    d = load_table(spark, sf_dir, "documents")
    rare = F.filter(
        F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0)),
        lambda w: F.length(w) >= 9,
    )
    return d.select(
        "doc_id",
        F.explode_outer(rare).alias("word"),
        F.size(rare).cast("long").alias("n_rare"),
    )
