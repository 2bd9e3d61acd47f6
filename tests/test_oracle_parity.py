"""Differential tests: every contract query with a DuckDB oracle must
match on row count, schema (column names), and values at sf0.01 — the
local replica of the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest

from mapreduce_hw05_spark.plans import ORACLES, QUERIES
from tests.conftest import run_contract


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, oracle, name):
    problems = run_contract(spark, oracle, name)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, oracle, name):
    """Rows-only contracts must at least execute with a stable schema."""
    df = QUERIES[name](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert df.columns, name
    assert rows is not None
