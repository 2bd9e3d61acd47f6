"""Fixture (TPC-H-ish + events/documents/embeddings) parquet readers.

All contract queries load their inputs through :func:`load_table` so the
nanos-timestamp shim lives in exactly one place.

Scale note: these are plain ``spark.read.parquet`` scans — Catalyst keeps
predicate pushdown / column pruning / partition pruning intact because the
shim below is a projection, not an opaque UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.session import ensure_runtime_confs

#: On-disk parquet cap for a dim-table broadcast hint: 128 MiB of
#: parquet inflates to roughly 0.5–1 GiB of in-memory rows —
#: comfortably inside a default executor and far under Spark's 8 GiB
#: broadcast hard limit. Module-level so tests can monkeypatch it to 0
#: and prove the shuffled route is result-identical.
MAX_BROADCAST_DIM_BYTES = 128 * 1024 * 1024

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


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk parquet footprint of one fixture table — a pure
    filesystem stat, no Spark action. Returns -1 when the path cannot
    be stat'ed locally (remote filesystems), which callers must treat
    as "unknown, assume big"."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(path)
                for f in files
            )
        return os.path.getsize(path)
    except OSError:
        return -1


def dim_broadcast(
    df: DataFrame, sf_dir: str, name: str, limit_bytes: int | None = None
) -> DataFrame:
    """Metadata-cheap counted broadcast hint for frames DERIVED from one
    fixture table (a filtered/projected dimension side): stat the source
    table's on-disk parquet footprint — zero Spark actions — and attach
    the hint only while the WHOLE table fits under ``limit_bytes``
    (default :data:`MAX_BROADCAST_DIM_BYTES`, read at call time). The
    derived frame never exceeds its source table, so the gate is
    conservative-correct; an unstat-able path (remote FS) counts as
    "too big". Past the cap the SAME join runs planner-chosen
    (sort-merge / AQE) — identical results, one extra exchange.

    This replaces the r6 `contract-scale` tags on TPC-H's proportional
    dimension hints (customer/supplier/part): at bench scale the stat is
    kilobytes-to-megabytes and the hint attaches exactly as before; at
    cluster scale the stat exceeds the cap and no hint can force an
    executor-OOM broadcast — no code edit required, unlike a tag."""
    limit = MAX_BROADCAST_DIM_BYTES if limit_bytes is None else limit_bytes
    size = table_bytes(sf_dir, name)
    # bounded: file-stat gated — the hint only attaches under the cap
    return F.broadcast(df) if 0 <= size <= limit else df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every fixture table as a temp view (for the SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
