"""Public entry points (SURVEY §3.2): one facade over the three ways into
the engine — SQL strings, the DataFrame builder API, and streaming.

All three converge on the same Catalyst pipeline; the facade adds no
execution machinery of its own (that would fight the optimizer), it only
binds the fixture catalog to a session:

    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT ... FROM lineitem JOIN part ON ...")   # SQL entry
    eng.table("lineitem").filter(...).groupBy(...)         # DataFrame entry
    eng.run("q_groupagg_pricing")                          # named contract query
    eng.stream_events(...)                                 # streaming entry
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_hw05_spark.session import ensure_runtime_confs, get_spark
from mapreduce_hw05_spark.sources import TABLES, load_table


class Engine:
    """Session + catalog binding for one fixture directory."""

    def __init__(self, sf_dir: str, spark: SparkSession | None = None,
                 view_prefix: str = ""):
        self.spark = ensure_runtime_confs(spark or get_spark())
        self.sf_dir = sf_dir
        self._prefix = view_prefix
        self._views_registered = False

    # ---------------------------------------------------------- catalog

    def table(self, name: str) -> DataFrame:
        """DataFrame entry point: a fixture table, type-normalized."""
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        """Expose every fixture table as a temp view (idempotent)."""
        if self._views_registered:
            return
        for name in TABLES:
            self.table(name).createOrReplaceTempView(self._prefix + name)
        self._views_registered = True

    # ------------------------------------------------------ entry points

    def sql(self, query: str) -> DataFrame:
        """SQL entry point → Spark SQL parser → the same Catalyst plan the
        DataFrame API produces. Views register on first use."""
        self.register_views()
        return self.spark.sql(query)

    def run(self, contract_name: str) -> DataFrame:
        """Run a named contract query from the registry (SURVEY §2)."""
        from mapreduce_hw05_spark.plans import QUERIES

        return QUERIES[contract_name](self.spark, self.sf_dir)

    def stream_events(self, chunks, scratch_root: str):
        """Streaming entry point: replay the events fixture as a file
        stream (see streaming.replay.FileReplay for the chunk protocol)."""
        from mapreduce_hw05_spark.streaming.replay import FileReplay

        return FileReplay(self.spark, chunks, scratch_root)
