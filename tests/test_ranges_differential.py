"""Differential fuzzing for the bucketized range joins (operators.ranges):
hypothesis draws band widths / bucket widths / interval grids, the same
join runs through band_join / interval_overlap_join AND DuckDB's native
inequality join, and the pair sets must agree exactly (order-independent
integer checksums, so floats never enter the comparison surface).
Deterministic (derandomize=True)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from mapreduce_hw05_spark.operators.ranges import band_join, interval_overlap_join
from mapreduce_hw05_spark.sources import load_table
from tests.conftest import SF_DIR, compare_frames

band_spec = st.fixed_dictionaries(
    {
        # band in [0.25, 40] with quarter steps; width as a multiple of it
        "band_q": st.integers(min_value=1, max_value=160),
        "width_mult": st.sampled_from([0.5, 1.0, 2.7]),
    }
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=band_spec)
def test_band_join_matches_duckdb_iejoin(spark, oracle, spec):
    band = spec["band_q"] / 4.0
    supp = load_table(spark, SF_DIR, "supplier")
    cust = load_table(spark, SF_DIR, "customer")
    got = (
        band_join(
            supp, cust, "s_acctbal", "c_acctbal", band,
            bucket_width=band * spec["width_mult"],
        )
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.col("s_suppkey") * F.lit(1000003) + F.col("c_custkey")
            ).alias("id_checksum"),
        )
    ).toPandas()
    expect = oracle.execute(
        f"""
        SELECT s_nationkey, count(*) AS n_pairs,
               sum(s_suppkey * 1000003 + c_custkey) AS id_checksum
        FROM supplier JOIN customer
          ON abs(s_acctbal - c_acctbal) <= {band}
        GROUP BY s_nationkey
        """
    ).df()
    expect["id_checksum"] = expect["id_checksum"].astype("int64")
    assert not compare_frames(got, expect)


interval_spec = st.fixed_dictionaries(
    {
        "order_days": st.integers(min_value=1, max_value=10),
        "grid_step_days": st.sampled_from([30, 45, 91]),
        "grid_len_days": st.integers(min_value=20, max_value=120),
        "bucket_days": st.sampled_from([7, 30, 91]),
    }
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=interval_spec)
def test_interval_overlap_matches_duckdb(spark, oracle, spec):
    od, step, glen, bw = (
        spec["order_days"],
        spec["grid_step_days"],
        spec["grid_len_days"],
        spec["bucket_days"],
    )
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderdate")
        .withColumn("os", F.col("o_orderdate").cast("long"))
        .withColumn("oe", F.col("os") + od * 86400)
    )
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("timestamp"),
                    F.lit("2001-10-01").cast("timestamp"),
                    F.expr(f"INTERVAL {step} DAYS"),
                )
            ).alias("ws")
        )
        .withColumn("ws_sec", F.col("ws").cast("long"))
        .withColumn("we_sec", F.col("ws_sec") + glen * 86400)
    )
    got = (
        interval_overlap_join(
            orders, grid, "os", "oe", "ws_sec", "we_sec", bw * 86400
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.col("o_orderkey") * (F.col("ws_sec") % F.lit(1000003))
            ).alias("checksum"),
        )
    ).toPandas()
    expect = oracle.execute(
        f"""
        SELECT count(*) AS n_pairs,
               sum(o_orderkey * (CAST(epoch(ws) AS BIGINT) % 1000003)) AS checksum
        FROM orders o
        JOIN (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                            TIMESTAMP '2001-10-01',
                                            INTERVAL {step} DAY)) AS ws) g
          ON o.o_orderdate < ws + INTERVAL {glen} DAY
         AND ws < o.o_orderdate + INTERVAL {od} DAY
        """
    ).df()
    for c in ("n_pairs", "checksum"):
        expect[c] = expect[c].astype("int64")
    assert not compare_frames(got, expect)
