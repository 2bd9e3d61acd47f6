"""File-replay streaming source: feed a batch DataFrame to a streaming
query chunk by chunk with deterministic micro-batch boundaries.

This is the local stand-in for Kafka: tests write chunk *k*, call
``processAllAvailable()``, then write chunk *k+1* — so late-data
scenarios are reproducible. On a cluster the same queries read Kafka or
cloud-storage file drops; only the source swaps.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


class ChunkList(list):
    """A chunk list that carries the total replayed row count, so replay
    consumers can size state-store shuffle partitions to the data volume
    instead of a constant (the r3 scale cliff: a fixed partition count
    that speeds sf0.01 serializes the shuffle at sf0.1+)."""

    total_rows: int | None = None

    def __add__(self, other):  # keep the count through `chunks + [flush]`
        out = ChunkList(list.__add__(self, other))
        out.total_rows = self.total_rows
        return out


class FileReplay:
    """Writes pre-split chunks into a watched directory one at a time."""

    def __init__(self, spark: SparkSession, chunks: list[DataFrame], root: str):
        self.spark = spark
        self.chunks = chunks
        #: Total rows across chunks when known (ChunkList), else None —
        #: consumers fall back to a small constant partition count.
        self.total_rows = getattr(chunks, "total_rows", None)
        self.dir = os.path.join(root, "stream_in")
        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.dir, exist_ok=True)
        self._next = 0

    def stream(self, schema: T.StructType = EVENTS_STREAM_SCHEMA) -> DataFrame:
        return self.spark.readStream.schema(schema).parquet(self.dir)

    def push_next(self) -> bool:
        """Write the next chunk into the watched dir; False when done."""
        if self._next >= len(self.chunks):
            return False
        self.chunks[self._next].coalesce(1).write.mode("append").parquet(self.dir)
        self._next += 1
        return True


def time_ordered_chunks(df: DataFrame, ts_col: str, n_chunks: int) -> list[DataFrame]:
    """Split into n time-ordered chunks → arrival order == event-time order.

    Test-scale helper (global ntile window); production replay reads an
    already-partitioned log.
    """
    from pyspark.sql import Window as W

    chunked = df.withColumn(
        # global-window: replay harness over a test fixture (see docstring)
        "_chunk", F.ntile(n_chunks).over(W.orderBy(ts_col))
    ).localCheckpoint()  # sort once; the per-chunk filters reread it
    chunks = ChunkList(
        chunked.filter(F.col("_chunk") == i + 1).drop("_chunk")
        for i in range(n_chunks)
    )
    # count() on the localCheckpoint is a cheap cached-block scan; the
    # count sizes downstream state-store partitioning (see ChunkList).
    chunks.total_rows = chunked.count()
    return chunks
