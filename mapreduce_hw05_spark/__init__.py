"""PySpark-native analytics engine with the query/data-processing
capabilities of ``JiangtaoXu93/mapReduce-HW05`` (reference checkout was
empty at survey time — see SURVEY.md §0; the binding spec is SURVEY.md §2).

Layout
------
- ``session``    — SparkSession factory with the configs the fixtures need.
- ``sources``    — fixture/parquet/csv/json readers + streaming sources.
- ``operators``  — reusable DataFrame -> DataFrame operators (sessionize,
                   top-k, dedup, minhash-LSH, cosine top-k, pagerank, ...).
- ``functions``  — scalar/UDF surface (pandas UDFs, UDTFs, text analysis).
- ``plans``      — the contract queries from SURVEY.md §2 bound to the
                   fixture tables, each with a DuckDB oracle SQL string.
- ``streaming``  — Structured Streaming variants of the stateful operators.

Everything is DataFrame-first: operators take and return DataFrames so
Catalyst sees one logical plan end-to-end (predicate pushdown, column
pruning, broadcast selection, AQE all apply).
"""

__version__ = "0.1.0"
