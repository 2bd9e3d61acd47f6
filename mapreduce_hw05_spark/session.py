"""SparkSession factory and per-session config shims.

The engine is designed for a multi-executor cluster; locally it runs on
``local[N]``. Two configs are load-bearing for the fixture data
(FIXTURES.md gotchas):

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — ``events.ts`` is
  Parquet TIMESTAMP(NANOS), which PySpark 4.x otherwise refuses with
  ``[PARQUET_TYPE_ILLEGAL]``.
- ``spark.sql.session.timeZone=UTC`` — keeps timestamp arithmetic and
  pandas conversion aligned with the (UTC-naive) DuckDB oracle.

Both are runtime-settable SQL confs, so :func:`ensure_runtime_confs` can
repair a session the caller built without them (the correctness driver
passes in its own session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are safe to (re)apply to an existing session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs the engine relies on.

    Idempotent; call at the top of every public entry point so the engine
    works with sessions it did not create.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on this build — the factory below sets it at
            # construction; a foreign session without it will fail loudly
            # at read time, which is the right signal.
            pass
    return spark


def get_spark(app_name: str = "mapreduce_hw05_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local parallelism and shuffle partitioning come from
    ``SPARK_GRAFT_CPUS`` (default: all cores). On a real cluster the same
    code runs unchanged — only ``master`` and memory sizing differ.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_confs(spark)
