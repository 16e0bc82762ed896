"""Unit tests for operators/timeseries.py (the linear method's arithmetic
parity is covered by the resample_linear_daily oracle)."""
from __future__ import annotations

import datetime as dt

import pytest

from snowflake_iceberg_cld_bcdr_demo_spark.operators import timeseries


def _obs(spark):
    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10),
        ("a", d(2024, 1, 4), 40),
        ("a", d(2024, 1, 6), 20),
        ("b", d(2024, 1, 2), 5),
        ("b", d(2024, 1, 3), 7),
    ]
    return spark.createDataFrame(rows, "g string, day date, n long")


def test_resample_linear(spark):
    out = {
        (r.g, r.day.isoformat()): r
        for r in timeseries.resample(
            _obs(spark), "day", "n", ["g"], method="linear"
        ).collect()
    }
    assert len(out) == 8  # a: 6 days, b: 2 days
    assert out[("a", "2024-01-02")].filled == 20.0  # 10 + (40-10) * 1/3
    assert out[("a", "2024-01-03")].filled == 30.0
    assert out[("a", "2024-01-05")].filled == 30.0  # midpoint of 40 and 20
    assert out[("a", "2024-01-04")].filled == 40.0 and not out[("a", "2024-01-04")].imputed
    assert out[("a", "2024-01-02")].imputed and out[("a", "2024-01-02")].observed is None
    assert out[("b", "2024-01-02")].filled == 5.0 and out[("b", "2024-01-03")].filled == 7.0


def test_resample_locf_and_zero(spark):
    locf = {
        (r.g, r.day.isoformat()): r.filled
        for r in timeseries.resample(_obs(spark), "day", "n", ["g"], method="locf").collect()
    }
    assert locf[("a", "2024-01-02")] == 10.0 == locf[("a", "2024-01-03")]
    assert locf[("a", "2024-01-05")] == 40.0
    zero = {
        (r.g, r.day.isoformat()): r.filled
        for r in timeseries.resample(_obs(spark), "day", "n", ["g"], method="zero").collect()
    }
    assert zero[("a", "2024-01-02")] == 0.0 and zero[("a", "2024-01-04")] == 40.0


def test_resample_rejects_unknown_method(spark):
    with pytest.raises(ValueError, match="unknown resample method"):
        timeseries.resample(_obs(spark), "day", "n", ["g"], method="spline")
