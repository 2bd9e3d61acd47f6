"""Self-tests for the local comparator: it must fail exactly where the
driver's stringified value hash would fail (VERDICT r1 item 4 — the r1
comparator coerced Decimal→float64 and passed a query the driver failed).
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from tests.conftest import compare_frames


def test_decimal_vs_float_mismatch():
    """Numerically-equal Decimal('1013.70') vs float 1013.7 must FAIL:
    the driver hashes the strings '1013.70' and '1013.7' differently."""
    spark_side = pd.DataFrame({"k": ["a"], "v": [Decimal("1013.70")]})
    oracle_side = pd.DataFrame({"k": ["a"], "v": [1013.7]})
    problems = compare_frames(spark_side, oracle_side)
    assert problems, "Decimal-vs-float drift must be reported"
    assert any("type-kind mismatch" in p for p in problems)


def test_decimal_scale_drift_mismatch():
    """Same numeric value, different decimal scale → different canonical
    string → mismatch (matches driver stringification)."""
    spark_side = pd.DataFrame({"v": [Decimal("10.50")]})
    oracle_side = pd.DataFrame({"v": [Decimal("10.5")]})
    problems = compare_frames(spark_side, oracle_side)
    assert problems, "decimal scale drift must be reported"


def test_matching_decimals_pass():
    spark_side = pd.DataFrame({"v": [Decimal("10.50"), Decimal("3.00")]})
    oracle_side = pd.DataFrame({"v": [Decimal("3.00"), Decimal("10.50")]})
    assert compare_frames(spark_side, oracle_side) == []


def test_int_vs_float_mismatch():
    """'5' vs '5.0' hash differently — int64 vs float64 must FAIL."""
    spark_side = pd.DataFrame({"v": pd.array([5], dtype="int64")})
    oracle_side = pd.DataFrame({"v": pd.array([5.0], dtype="float64")})
    problems = compare_frames(spark_side, oracle_side)
    assert problems, "int-vs-float kind drift must be reported"


def test_matching_floats_pass():
    spark_side = pd.DataFrame({"v": [1.5, float("nan")]})
    oracle_side = pd.DataFrame({"v": [float("nan"), 1.5]})
    assert compare_frames(spark_side, oracle_side) == []
