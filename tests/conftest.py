"""Shared fixtures: one SparkSession, one DuckDB oracle connection, and a
comparator that replicates the driver's check (row count + schema +
order-insensitive value comparison, columns sorted by name).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_hw05_spark.session import get_spark
from mapreduce_hw05_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns,
    timestamps as int64 epochs, floats left as float64."""
    out = pdf[sorted(pdf.columns)].copy()
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.astype("int64")
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            out[col] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64")
        elif s.dtype == object:
            # decimal.Decimal (DuckDB HUGEINT/DECIMAL) or str
            try:
                out[col] = pd.to_numeric(s)
            except (ValueError, TypeError):
                out[col] = s.astype(str)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return [
            f"column sets differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        ]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s = normalize(spark_pdf)
    o = normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.astype("float64").to_numpy()
            oa = ov.astype("float64").to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            exact = (sa == oa) | both_nan
            if not exact.all():
                bad = np.where(~exact)[0][:5]
                problems.append(
                    f"float column {col!r}: {(~exact).sum()} mismatches, e.g. "
                    + "; ".join(f"[{i}] spark={sa[i]!r} oracle={oa[i]!r}" for i in bad)
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = eq[~eq].index[:5]
                problems.append(
                    f"column {col!r}: {(~eq).sum()} mismatches, e.g. "
                    + "; ".join(f"[{i}] spark={sv[i]!r} oracle={ov[i]!r}" for i in bad)
                )
    return problems


def run_contract(spark, oracle, name: str) -> list[str]:
    """Execute one contract query on both engines and diff."""
    from mapreduce_hw05_spark.plans import ORACLES, QUERIES

    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = oracle.execute(ORACLES[name]).df()
    return compare_frames(spark_pdf, oracle_pdf)
