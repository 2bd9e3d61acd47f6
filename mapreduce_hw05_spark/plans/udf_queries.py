"""UDF/UDAF/UDTF surface contract queries (SURVEY §2.10 u-1…u-5).

Each query exists to prove one Python-extension mechanism; the oracles
are pure SQL. Production guidance stands: built-in expressions first,
Arrow-vectorized pandas UDFs when Python is unavoidable, row-at-a-time
UDFs only as an API-compatibility demonstration (u-1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_hw05_spark.plans.common import lng, money, ratio
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import load_table

# --------------------------------------------------------------------------
# u-1 — scalar row-at-a-time Python UDF (price-band classification)
# --------------------------------------------------------------------------


@contract(
    "q_udf_python",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS price_band,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-band classification via a scalar Python UDF (slow path, here
    to prove the mechanism; the CASE-expression equivalent is the oracle)."""

    @F.udf(T.StringType())
    def price_band(p: float) -> str:
        if p < 50000:
            return "low"
        if p < 200000:
            return "mid"
        return "high"

    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("price_band", price_band("o_totalprice"))
        .groupBy("price_band")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# u-2 — vectorized scalar pandas UDF (cosine against a fixed axis)
# --------------------------------------------------------------------------


@contract(
    "q_pandas_udf_cosine",
    oracle="""
    SELECT vec_id,
           round(CAST(embedding[1] AS DOUBLE)
                 / sqrt(list_sum(list_transform(embedding,
                                 x -> CAST(x AS DOUBLE) * x))), 6) AS cos_axis0
    FROM embeddings
    WHERE vec_id < 200
    """,
)
def q_pandas_udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of each embedding against basis axis e₀ via an Arrow-batched
    pandas UDF (float64 NumPy math, no per-row Python)."""

    @F.pandas_udf(T.DoubleType())
    def cos_axis0(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(mat[:, 0] / np.sqrt((mat * mat).sum(axis=1)))

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return emb.select(
        "vec_id", F.round(cos_axis0("embedding"), 6).alias("cos_axis0")
    )


# --------------------------------------------------------------------------
# u-3 — grouped-map applyInPandas (per-group z-score)
# --------------------------------------------------------------------------


@contract(
    "q_grouped_map_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
)
def q_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score of events.value within each event_type via applyInPandas.

    Scale: grouped-map materializes each group as one pandas frame — fine
    for bounded group sizes; unbounded groups should use the window-
    function formulation (which is also the oracle here).
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": z.round(6),
            }
        )

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, zscore double"
    )


# --------------------------------------------------------------------------
# u-4 — grouped-aggregate pandas UDF (geometric mean)
# --------------------------------------------------------------------------


@contract(
    "q_udaf_geomean",
    oracle="""
    SELECT o_orderstatus,
           round(exp(avg(ln(o_totalprice))), 2) AS geomean_price,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of o_totalprice per status via a GROUPED_AGG pandas
    UDF; oracle is the exp(avg(ln x)) identity."""

    @F.pandas_udf(T.DoubleType())
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))

    @F.pandas_udf(T.LongType())
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
        # aggregates in one agg(), so the count is a pandas UDAF too.
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        money(geomean("o_totalprice")).alias("geomean_price"),
        n_rows("o_orderkey").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# u-5 — Python UDTF (tokenizer, lateral join)
# --------------------------------------------------------------------------


@contract(
    "q_udtf_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 30
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer as a Python UDTF (Spark 4), applied via LATERAL join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.split(" "):
                yield (tok,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_src")
    return spark.sql(
        """
        SELECT t.token, count(*) AS n
        FROM documents_udtf_src, LATERAL tokenize_udtf(text) t
        GROUP BY t.token
        ORDER BY n DESC, t.token
        LIMIT 30
        """
    )
