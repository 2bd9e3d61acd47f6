"""Exactness tests for the bucketized range joins: every operator result
must equal the naive nested-loop predicate join on the same data,
including boundary hits, negative values, and degenerate intervals."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreduce_hw05_spark.operators.ranges import band_join, interval_overlap_join


def _pairs(df, c1, c2):
    return sorted((r[c1], r[c2]) for r in df.collect())


@pytest.mark.parametrize("bucket_width", [None, 0.7, 2.5])
def test_band_join_matches_nested_loop(spark, bucket_width):
    rng = np.random.default_rng(7)
    lvals = np.round(rng.uniform(-50, 50, 200), 2)
    rvals = np.round(rng.uniform(-50, 50, 150), 2)
    # force exact-boundary pairs: rv = lv ± band for a few rows
    lvals[:3] = [10.0, -20.0, 0.0]
    rvals[:6] = [11.0, 9.0, -21.0, -19.0, 1.0, -1.0]
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(lvals)], "lid long, lv double"
    )
    right = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(rvals)], "rid long, rv double"
    )
    got = band_join(left, right, "lv", "rv", 1.0, bucket_width=bucket_width)
    expect = left.crossJoin(right).filter(F.abs(F.col("lv") - F.col("rv")) <= 1.0)
    assert _pairs(got, "lid", "rid") == _pairs(expect, "lid", "rid")
    # no duplicates by construction
    assert got.count() == got.select("lid", "rid").distinct().count()


@pytest.mark.parametrize("bucket_width", [1, 3, 100])
def test_interval_overlap_matches_nested_loop(spark, bucket_width):
    rng = np.random.default_rng(11)
    def mk(n, seed_rows):
        starts = rng.integers(-40, 40, n)
        lens = rng.integers(0, 12, n)  # length 0 → empty interval
        rows = [(i, int(s), int(s + l)) for i, (s, l) in enumerate(zip(starts, lens))]
        return rows[: n - len(seed_rows)] + [
            (n - len(seed_rows) + j, a, b) for j, (a, b) in enumerate(seed_rows)
        ]

    # adjacency (no overlap for half-open), containment, exact-equal
    lrows = mk(120, [(0, 5), (10, 20), (-7, -7)])
    rrows = mk(90, [(5, 9), (12, 14), (10, 20)])
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", bucket_width)
    # set semantics: empty intervals overlap nothing (see operator docstring)
    expect = left.crossJoin(right).filter(
        (F.col("ls") < F.col("re"))
        & (F.col("rs") < F.col("le"))
        & (F.col("le") > F.col("ls"))
        & (F.col("re") > F.col("rs"))
    )
    assert _pairs(got, "lid", "rid") == _pairs(expect, "lid", "rid")
    assert got.count() == got.select("lid", "rid").distinct().count()


def test_band_join_plan_has_no_nested_loop(spark):
    left = spark.range(100).select(F.col("id").alias("lid"), (F.col("id") * 0.5).alias("lv"))
    right = spark.range(100).select(F.col("id").alias("rid"), (F.col("id") * 0.7).alias("rv"))
    plan = band_join(left, right, "lv", "rv", 2.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
