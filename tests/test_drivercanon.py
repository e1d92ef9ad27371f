"""Regression tests for the driver-faithful comparator's schema pass.

Round 4 shipped `stream_sliding_window` with an oracle whose
`to_timestamp(...)` DuckDB-types as TIMESTAMPTZ; drivercanon PASSed it
("7800 rows exact") while the driver failed it on schema, because the tool
compared values but not pandas dtypes. These tests pin the fix: a dtype
split (tz-awareness, int-vs-float, datetime unit) must FAIL compare()
locally the way it fails at the driver, and specifically the pre-fix
sliding-window oracle shape must fail.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tools.drivercanon import compare, dtype_mismatch


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_tz_aware_vs_naive_is_mismatch(con):
    tz = con.execute("SELECT to_timestamp(0) AS t").df()
    naive = con.execute("SELECT CAST(to_timestamp(0) AS TIMESTAMP) AS t").df()
    assert dtype_mismatch(naive["t"].dtype, tz["t"].dtype) == "tz-awareness"
    assert dtype_mismatch(naive["t"].dtype, naive["t"].dtype) is None


def test_int_vs_float_is_mismatch():
    assert dtype_mismatch(pd.Series([1]).dtype, pd.Series([1.0]).dtype) == "int vs float"
    # int width/signedness is NOT a driver split
    assert dtype_mismatch(pd.Series([1], dtype="int32").dtype, pd.Series([1]).dtype) is None


def test_datetime_unit_is_not_a_mismatch():
    """Empirical driver behavior (r4): stream_tumbling_window was
    driver-GREEN with Spark datetime64[ns] vs DuckDB datetime64[us], so
    resolution must NOT fail the local gate — only tz-awareness does."""
    us = pd.Series(pd.to_datetime(["2020-01-01"])).astype("datetime64[us]").dtype
    ns = pd.Series(pd.to_datetime(["2020-01-01"])).astype("datetime64[ns]").dtype
    assert dtype_mismatch(us, ns) is None
    assert dtype_mismatch(us, us) is None


def test_prefix_sliding_oracle_shape_fails(con, capsys):
    """The exact r4 red: equal values, naive Spark side vs TIMESTAMPTZ
    oracle side. compare() must now return False (it returned True
    pre-fix)."""
    oracle = con.execute(
        "SELECT to_timestamp(g * 300) AS window_start, g + 1 AS n_events "
        "FROM generate_series(0, 9) s(g)"
    ).df()
    sparkish = con.execute(
        "SELECT CAST(to_timestamp(g * 300) AS TIMESTAMP) AS window_start, "
        "g + 1 AS n_events FROM generate_series(0, 9) s(g)"
    ).df()
    assert not compare("prefix_sliding", sparkish, oracle)
    assert "tz-awareness" in capsys.readouterr().out
    # and the fixed shape (both naive) passes
    assert compare("fixed_sliding", sparkish.copy(), sparkish.copy())


def test_object_vs_concrete_not_flagged():
    # Spark surfaces date32 as object in some paths; the value pass decides
    assert dtype_mismatch(pd.Series(["x"]).dtype, pd.Series([1.0]).dtype) is None
