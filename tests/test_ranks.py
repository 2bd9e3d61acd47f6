"""operators.ranks.global_cumsum — the distributed exact global
prefix-sum/rank (r8): range shuffle + per-partition offsets + Arrow
cumsum with cross-batch carry, replacing the single-partition
``Window.orderBy`` anti-pattern in corpus-sized ranking consumers.

Identity discipline: every consumer rewritten onto the operator keeps a
test here proving bit-identical results against the window formulation
it replaced (the same A/B standard as the forced-route broadcast tests).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_hw05_spark.operators.ranks import global_cumsum


def _toy(spark, n=1003):
    return spark.range(n).select(
        (F.col("id") * 37 % n).alias("k"),
        (F.col("id") % 7).cast("long").alias("cnt"),
        (F.col("id") % 5 * 0.25).alias("x"),
    )


def test_global_cumsum_matches_window(spark):
    df = _toy(spark)
    got = (
        global_cumsum(
            df, [F.col("k").asc()], ["cnt", "x"],
            num_partitions=8, include_totals=True,
        )
        .orderBy("k")
        .toPandas()
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    ref = (
        df.select(
            "k",
            F.sum("cnt").over(w).alias("cum_cnt"),
            F.sum("x").over(w).alias("cum_x"),
        )
        .orderBy("k")
        .toPandas()
    )
    assert str(got["cum_cnt"].dtype) == "int64"
    assert (got["cum_cnt"].to_numpy() == ref["cum_cnt"].to_numpy()).all()
    assert np.allclose(
        got["cum_x"].to_numpy(), ref["cum_x"].to_numpy(), rtol=0, atol=1e-9
    )
    assert (got["tot_cnt"] == int(ref["cum_cnt"].iloc[-1])).all()


def test_global_cumsum_desc_and_composite_order(spark):
    df = _toy(spark, 257)
    got = (
        global_cumsum(
            df,
            [F.col("cnt").desc(), F.col("k").asc()],
            ["cnt"],
            num_partitions=5,
        )
        .orderBy("k")
        .toPandas()
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("k").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = df.select("k", F.sum("cnt").over(w).alias("cum_cnt")).orderBy(
        "k"
    ).toPandas()
    assert (got["cum_cnt"].to_numpy() == ref["cum_cnt"].to_numpy()).all()


def test_global_cumsum_empty_and_single_row(spark):
    df = _toy(spark, 50)
    assert (
        global_cumsum(df.filter("k < 0"), [F.col("k")], ["cnt"]).count() == 0
    )
    one = (
        global_cumsum(
            df.limit(1), [F.col("k")], ["cnt"], include_totals=True
        )
        .toPandas()
    )
    assert len(one) == 1
    assert one["cum_cnt"].iloc[0] == one["tot_cnt"].iloc[0]


def test_global_cumsum_forced_arrow_route_matches_jvm(spark, monkeypatch):
    """Counted routing (JVM window under JVM_WINDOW_PARTITION_ROWS,
    Arrow cumsum past it) must be result-identical — forced-route test,
    same discipline as the broadcast-gate identity tests."""
    from mapreduce_hw05_spark.operators import ranks

    df = _toy(spark, 601)
    jvm = (
        global_cumsum(df, [F.col("k")], ["cnt", "x"], num_partitions=6,
                      include_totals=True)
        .orderBy("k")
        .toPandas()
    )
    monkeypatch.setattr(ranks, "JVM_WINDOW_PARTITION_ROWS", 0)
    arrow = (
        global_cumsum(df, [F.col("k")], ["cnt", "x"], num_partitions=6,
                      include_totals=True)
        .orderBy("k")
        .toPandas()
    )
    assert (jvm["cum_cnt"].to_numpy() == arrow["cum_cnt"].to_numpy()).all()
    # while a partition fits one Arrow batch, float running sums
    # accumulate in the same sequential order on both routes —
    # bit-identical, not just close (cross-batch case pinned below)
    assert (jvm["cum_x"].to_numpy() == arrow["cum_x"].to_numpy()).all()
    assert (jvm["tot_cnt"].to_numpy() == arrow["tot_cnt"].to_numpy()).all()


def test_global_cumsum_float_input_emits_double_on_both_routes(
    spark, monkeypatch
):
    """ADVICE r8: FloatType sum_cols must not make output schema/precision
    depend on the routing threshold — both routes upcast to DOUBLE and
    accumulate in float64."""
    from mapreduce_hw05_spark.operators import ranks

    df = _toy(spark, 401).withColumn("xf", F.col("x").cast("float"))
    jvm = (
        global_cumsum(df, [F.col("k")], ["xf"], num_partitions=4,
                      include_totals=True)
        .orderBy("k")
        .toPandas()
    )
    monkeypatch.setattr(ranks, "JVM_WINDOW_PARTITION_ROWS", 0)
    arrow = (
        global_cumsum(df, [F.col("k")], ["xf"], num_partitions=4,
                      include_totals=True)
        .orderBy("k")
        .toPandas()
    )
    assert str(jvm["cum_xf"].dtype) == "float64"
    assert str(arrow["cum_xf"].dtype) == "float64"
    # x is multiples of 0.25 (exactly representable) so even the float32
    # input sums exactly — both routes bit-identical here
    assert (jvm["cum_xf"].to_numpy() == arrow["cum_xf"].to_numpy()).all()
    assert (jvm["tot_xf"].to_numpy() == arrow["tot_xf"].to_numpy()).all()


def test_global_cumsum_cross_arrow_batch_carry(spark, monkeypatch):
    """ADVICE r8: once a partition spans multiple Arrow batches the Arrow
    route associates double additions as (per-batch cumsum)+carry, not
    the JVM's whole-partition running sum+offset — values may differ in
    the last ulps. Pin that tolerance with a forced 64-row batch size
    (601 rows / 2 partitions ≈ 5 batches each) and non-representable
    summands; integer sums stay exact regardless."""
    from mapreduce_hw05_spark.operators import ranks

    df = _toy(spark, 601).withColumn("xr", F.col("k") * 0.1)
    jvm = (
        global_cumsum(df, [F.col("k")], ["cnt", "xr"], num_partitions=2)
        .orderBy("k")
        .toPandas()
    )
    monkeypatch.setattr(ranks, "JVM_WINDOW_PARTITION_ROWS", 0)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        arrow = (
            global_cumsum(df, [F.col("k")], ["cnt", "xr"], num_partitions=2)
            .orderBy("k")
            .toPandas()
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    assert (jvm["cum_cnt"].to_numpy() == arrow["cum_cnt"].to_numpy()).all()
    a, b = jvm["cum_xr"].to_numpy(), arrow["cum_xr"].to_numpy()
    assert np.allclose(a, b, rtol=1e-12, atol=0)


def test_global_cumsum_partition_count_invariance(spark):
    """Boundary placement must not affect values: offsets absorb
    whatever the range sampler chose."""
    df = _toy(spark, 311)
    frames = [
        global_cumsum(df, [F.col("k")], ["cnt"], num_partitions=p)
        .orderBy("k")
        .toPandas()["cum_cnt"]
        .to_numpy()
        for p in (1, 3, 32)
    ]
    assert (frames[0] == frames[1]).all()
    assert (frames[0] == frames[2]).all()


def _ntile_window(scored):
    w = Window.orderBy(F.col("bal_c").desc(), "c_custkey")
    return scored.select(
        F.ntile(10).over(w).cast("long").alias("decile"), "hit"
    )


def _ntile_arith(scored):
    from mapreduce_hw05_spark.operators.ranks import distributed_ntile

    return distributed_ntile(
        scored,
        10,
        [F.col("bal_c").desc(), F.col("c_custkey").asc()],
        num_partitions=7,
        bucket_col="decile",
    ).select("decile", "hit")


def test_lift_deciles_ntile_arithmetic_matches_window(spark):
    """The closed-form ntile(10) from (rn, N) must reproduce SQL ntile
    semantics (first N mod 10 buckets take ceil(N/10) rows) at awkward
    sizes: N<10 (q=0 edge), N%10==0, N%10!=0."""
    for n in (7, 100, 1003):
        scored = spark.range(n).select(
            (F.col("id") * 13 % 97).alias("bal_c"),
            F.col("id").alias("c_custkey"),
            (F.col("id") % 3 == 0).cast("long").alias("hit"),
        )
        ref = _ntile_window(scored).orderBy("c_custkey").toPandas()
        got = _ntile_arith(scored).orderBy("c_custkey").toPandas()
        assert (
            got["decile"].to_numpy() == ref["decile"].to_numpy()
        ).all(), f"N={n}"


def test_nb_auc_matches_window_formulation(spark):
    """q_nb_auc's distributed-midrank rewrite is bit-identical to the
    single-partition window formulation it replaced."""
    from tests.conftest import SF_DIR as sf_dir

    from mapreduce_hw05_spark.operators.naive_bayes import nb_fit, nb_score
    from mapreduce_hw05_spark.operators.text import tokenize
    from mapreduce_hw05_spark.plans import QUERIES
    from mapreduce_hw05_spark.plans.common import lng
    from mapreduce_hw05_spark.sources import load_table

    got = QUERIES["q_nb_auc"](spark, sf_dir).toPandas()

    docs = load_table(spark, sf_dir, "documents")
    train = tokenize(
        docs.filter(F.col("doc_id") % 5 != 0), "text", "doc_id", "lang"
    ).select("doc_id", F.col("lang").alias("label"), "token")
    priors, lik = nb_fit(train)
    test = tokenize(docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id")
    scores = (
        nb_score(test, priors, lik)
        .filter(F.col("label") == "en")
        .select("doc_id", F.round("score", 6).alias("s"))
    )
    labeled = scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        "s", (F.col("lang") == "en").cast("int").alias("y")
    )
    midrank = (
        F.rank().over(Window.orderBy("s"))
        + (F.count("*").over(Window.partitionBy("s")) - 1) / 2.0
    )
    ranked = labeled.select("y", midrank.alias("midrank"))
    n_pos, n_neg = F.sum("y"), F.sum(1 - F.col("y"))
    ref = ranked.agg(
        lng(n_pos).alias("n_pos"),
        lng(n_neg).alias("n_neg"),
        (
            (
                F.sum(
                    F.when(F.col("y") == 1, F.col("midrank")).otherwise(0.0)
                )
                - n_pos * (n_pos + 1.0) / 2
            )
            / (n_pos * n_neg.cast("double"))
        ).alias("auc"),
    ).toPandas()

    assert int(got["n_pos"][0]) == int(ref["n_pos"][0])
    assert int(got["n_neg"][0]) == int(ref["n_neg"][0])
    assert float(got["auc"][0]) == float(ref["auc"][0])  # bit-identical


def test_global_cumsum_null_inputs_route_identical(spark, monkeypatch):
    """ADVICE r9: null sum_col values must contribute 0 on BOTH routes.
    Before the fix the JVM route emitted NULL at a null-prefix row
    (partition-local ``sum() over w`` restarts NULL per __pid — wrong
    even vs a single-partition SQL window mid-stream) and the Arrow
    route's pandas cumsum turned one NaN into a poisoned carry for the
    rest of the partition. Both routes must now agree with the
    null-skipping SQL window sum at every row past the first non-null,
    and emit 0 (not NULL) on an all-null prefix."""
    from mapreduce_hw05_spark.operators import ranks

    # k=0,1 rows carry NULLs (an all-null global prefix), plus scattered
    # interior NULLs — exercises null-prefix partitions AND null carries
    df = _toy(spark, 601).select(
        "k",
        F.when((F.col("k") < 2) | (F.col("k") % 13 == 0), None)
        .otherwise(F.col("cnt"))
        .alias("cnt"),
        F.when((F.col("k") < 2) | (F.col("k") % 11 == 0), None)
        .otherwise(F.col("x"))
        .alias("x"),
    )
    jvm = (
        global_cumsum(df, [F.col("k")], ["cnt", "x"], num_partitions=6)
        .orderBy("k")
        .toPandas()
    )
    monkeypatch.setattr(ranks, "JVM_WINDOW_PARTITION_ROWS", 0)
    arrow = (
        global_cumsum(df, [F.col("k")], ["cnt", "x"], num_partitions=6)
        .orderBy("k")
        .toPandas()
    )
    # no NULL/NaN anywhere in the outputs, either route
    for out in (jvm, arrow):
        assert not out["cum_cnt"].isna().any()
        assert not out["cum_x"].isna().any()
    assert (jvm["cum_cnt"].to_numpy() == arrow["cum_cnt"].to_numpy()).all()
    assert (jvm["cum_x"].to_numpy() == arrow["cum_x"].to_numpy()).all()
    # ground truth: the null-skipping running sum, nulls-as-0
    pdf = df.orderBy("k").toPandas()
    want_cnt = pdf["cnt"].fillna(0).astype("int64").cumsum().to_numpy()
    assert (jvm["cum_cnt"].to_numpy() == want_cnt).all()
    # all-null prefix (k=0,1) reads 0, not NULL
    assert jvm["cum_cnt"].iloc[0] == 0 and jvm["cum_x"].iloc[0] == 0.0


def test_global_cumsum_rejects_non_finite_on_both_routes(
    spark, monkeypatch
):
    """r10 review: NaN is a DATA value, not a NULL — the JVM window sum
    would propagate it but Spark's pandas serializer encodes NaN as
    NULL on the mapInPandas RETURN path (measured: an identity
    mapInPandas turns NaN into None), so no implementation can make the
    routes agree. The operator must therefore fail fast on non-finite
    input — identically on both routes — rather than silently produce
    route-dependent results."""
    import pytest

    from mapreduce_hw05_spark.operators import ranks

    for bad in (float("nan"), float("inf")):
        df = spark.createDataFrame(
            [(0, 1.0), (1, None), (2, bad), (3, 2.0)],
            "k long, x double",
        )
        with pytest.raises(ValueError, match="non-finite"):
            global_cumsum(df, [F.col("k")], ["x"], num_partitions=2)
        monkeypatch.setattr(ranks, "JVM_WINDOW_PARTITION_ROWS", 0)
        with pytest.raises(ValueError, match="non-finite"):
            global_cumsum(df, [F.col("k")], ["x"], num_partitions=2)
        monkeypatch.undo()


def test_global_cumsum_nullable_long_stays_exact_past_2_53(
    spark, monkeypatch
):
    """r10 review: a NULLABLE long column reaches pandas as float64,
    silently rounding values past 2**53 — the JVM-side coalesce into a
    non-null long temp must keep the Arrow route exact int64 end-to-end
    and bit-identical to the JVM window sum."""
    from mapreduce_hw05_spark.operators import ranks

    big = 9_007_199_254_740_993  # 2**53 + 1: not representable in float64
    df = spark.createDataFrame(
        [(0, None), (1, big), (2, 5)], "k long, v long"
    )

    def run():
        return (
            global_cumsum(df, [F.col("k")], ["v"], num_partitions=2)
            .orderBy("k")
            .toPandas()["cum_v"]
            .tolist()
        )

    jvm = run()
    monkeypatch.setattr(ranks, "JVM_WINDOW_PARTITION_ROWS", 0)
    arrow = run()
    assert jvm == arrow == [0, big, big + 5]  # exact, no float rounding
