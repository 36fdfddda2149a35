"""Regression tests for tools/parity.py's cell canonicalizer — the
round-10 lesson: ``_canon`` used to collapse ``decimal.Decimal`` to
float64, so a decimal error past the 53-bit mantissa (the
grid_morans_i (19,6)x(19,6) silent precision-loss rounding, wrong at
the 19th significant digit) passed local parity while failing the
driver's full-digit-string hash.  These tests pin the comparator to
digit-exact decimal semantics so that class of failure is caught
locally before it ships — while a float column matching a DECIMAL
oracle column still compares equal when values are exactly equal
(CORRECTNESS_r10 shows the driver does both: grid_ingest_nc passed
with Spark float lat vs DuckDB DECIMAL lat; grid_morans_i failed on
the digit diff).
"""

from __future__ import annotations

import decimal

from tools.parity import _canon, normalize

# The actual wrong-vs-right pair from the round-10 driver failure
# (CORRECTNESS_r10: grid_morans_i hash_match=false): identical at
# float64 (relative diff ~1e-18 < 2^-52), different digit strings.
SPARK_WRONG = decimal.Decimal("3436570607.396387593000")
ORACLE_RIGHT = decimal.Decimal("3436570607.396387589592")


def test_one_ulp_at_scale_12_fails():
    # Precondition making the test meaningful: the pair IS
    # float64-identical, so the old float() canon could not see it.
    assert float(SPARK_WRONG) == float(ORACLE_RIGHT)
    assert _canon(SPARK_WRONG) != _canon(ORACLE_RIGHT)


def test_minimal_last_digit_diff_fails():
    a = decimal.Decimal("1.000000000001")
    b = decimal.Decimal("1.000000000002")
    assert _canon(a) != _canon(b)


def test_equal_decimals_still_equal():
    assert _canon(decimal.Decimal("42.123456")) == _canon(decimal.Decimal("42.123456"))


def test_float_vs_decimal_exact_equality():
    # The grid_ingest_nc shape: Spark float32 lat vs oracle DECIMAL
    # lat — equal exactly when the values are (Python numeric-exact
    # cross-type semantics, what the driver's hash observably does).
    assert _canon(42.0) == _canon(decimal.Decimal("42.0"))
    assert _canon(-82.0) == _canon(decimal.Decimal("-82.0"))
    # ...but NOT merely float64-close: 0.1 (binary float) is not 1/10.
    assert _canon(0.1) != _canon(decimal.Decimal("0.1"))


def test_normalize_surfaces_decimal_diff():
    cols = ["time", "num"]
    _, a = normalize(cols, [("d1", SPARK_WRONG)])
    _, b = normalize(cols, [("d1", ORACLE_RIGHT)])
    assert a != b


def test_normalize_sorts_mixed_numeric_columns():
    # Row sorting must pair a float column on one engine with a
    # DECIMAL column on the other (one shared numeric sort order).
    cols = ["v"]
    _, a = normalize(cols, [(2.5,), (1.0,)])
    _, b = normalize(cols, [(decimal.Decimal("1.0"),), (decimal.Decimal("2.5"),)])
    assert a == b
