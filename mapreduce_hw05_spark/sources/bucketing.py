"""Bucketed-table sink (SURVEY §4 / 100-TB design rules): pre-shuffle a
fact table once on its join key so every later join/aggregate on that key
is shuffle-free (co-located, and with sortBy, merge-ready).

This is the Spark-native replacement for the genre's hand-rolled
``Partitioner``: the partitioning is persisted in the table's metadata,
so Catalyst proves the exchange away instead of the user re-sharding per
job. At 100 TB, bucketing the biggest facts on their dominant join key is
the single largest shuffle saving available — pay the shuffle once at
ingest, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by ``key``.

    With ``path`` the table is external (data lives at ``path``, not in
    the session warehouse); the table entry is dropped first so a stale
    registration pointing elsewhere can't shadow the write.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved table; bucketing metadata rides along automatically."""
    return spark.table(table)
