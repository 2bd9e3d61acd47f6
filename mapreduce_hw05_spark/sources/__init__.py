from mapreduce_hw05_spark.sources.fixtures import (
    MAX_BROADCAST_DIM_BYTES,
    TABLES,
    dim_broadcast,
    load_table,
    register_views,
    table_bytes,
)

__all__ = [
    "MAX_BROADCAST_DIM_BYTES",
    "TABLES",
    "dim_broadcast",
    "load_table",
    "register_views",
    "table_bytes",
]
