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

    ``events.ts`` has shipped as two physical types across fixture
    generations; both are normalized to a microsecond TIMESTAMP (LTZ,
    session zone UTC) so downstream arithmetic (``unix_micros``,
    ``window``) is uniform:

    - Parquet TIMESTAMP(NANOS): with
      ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as int64
      nanoseconds and is cast here with integer division (``ts DIV
      1000``) — float division would round through a double whose ulp at
      ~1.7e18 ns is ~256 ns and corrupt microseconds.
    - Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): read as LTZ via
      ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` (session
      conf); if a caller-built session pinned that conf statically and a
      TIMESTAMP_NTZ still surfaces, the cast below rebinds the same wall
      clock to UTC — value-identical to the oracle's naive timestamps.
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every fixture table as a temp view (for the SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
