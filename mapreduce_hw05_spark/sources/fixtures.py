"""Fixture (TPC-H-ish + events/documents/embeddings) parquet readers.

All contract queries load their inputs through :func:`load_table` so the
nanos-timestamp shim lives in exactly one place.

Scale note: these are plain ``spark.read.parquet`` scans — Catalyst keeps
predicate pushdown / column pruning / partition pruning intact because the
shim below is a projection, not an opaque UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical-type quirks.

    ``events.ts`` is Parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as int64
    nanoseconds and is cast to a microsecond TIMESTAMP here. The cast uses
    integer division (``ts DIV 1000``): float division would round through
    a double whose ulp at ~1.7e18 ns is ~256 ns and corrupt microseconds.
    The fixture's timestamps are µs-aligned (verified), so this cast is
    lossless and hash-stable against the DuckDB oracle.
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every fixture table as a temp view (for the SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
