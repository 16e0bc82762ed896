"""Unit tests for operators/asof.py (the oracle query covers the
union-then-window plan; these cover parameter semantics)."""
from __future__ import annotations

import datetime as dt

from snowflake_iceberg_cld_bcdr_demo_spark.operators import asof


def _frames(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    trades = spark.createDataFrame(
        [
            (1, "A", base + dt.timedelta(seconds=10)),
            (2, "A", base + dt.timedelta(seconds=70)),
            (3, "B", base + dt.timedelta(seconds=5)),
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", base, 100.0),
            ("A", base + dt.timedelta(seconds=60), 101.0),
            ("B", base + dt.timedelta(seconds=5), 200.0),
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_and_equal_ts_tie(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade_id: r
        for r in asof.asof_join(
            trades, quotes, on=["sym"], right_cols=["px"]
        ).collect()
    }
    assert out[1].asof_px == 100.0
    assert out[2].asof_px == 101.0
    assert out[3].asof_px == 200.0  # equal ts matches (non-strict)
    strict = {
        r.trade_id: r
        for r in asof.asof_join(
            trades, quotes, on=["sym"], right_cols=["px"], strict=True
        ).collect()
    }
    assert strict[3].asof_px is None  # equal ts rejected under strict


def test_asof_tolerance_rejects_stale_matches(spark):
    trades, quotes = _frames(spark)
    out = {
        r.trade_id: r
        for r in asof.asof_join(
            trades, quotes, on=["sym"], right_cols=["px"], tolerance=15.0
        ).collect()
    }
    assert out[1].asof_px == 100.0  # 10s old: within tolerance
    assert out[2].asof_px == 101.0  # 10s old quote wins over 70s-old one
    assert out[3].asof_px == 200.0  # same instant
    tight = {
        r.trade_id: r
        for r in asof.asof_join(
            trades, quotes, on=["sym"], right_cols=["px"], tolerance=5.0
        ).collect()
    }
    assert tight[1].asof_px is None  # 10s old: too stale now


def test_asof_tolerance_numeric_keys(spark):
    left = spark.createDataFrame([(1, 100), (2, 200)], "id long, seq long")
    right = spark.createDataFrame([(95, "a"), (150, "b")], "seq long, tag string")
    out = {
        r.id: r
        for r in asof.asof_join(
            left, right, on=[], left_ts="seq", right_ts="seq",
            right_cols=["tag"], tolerance=10,
        ).collect()
    }
    assert out[1].asof_tag == "a"      # gap 5 <= 10
    assert out[2].asof_tag is None     # gap 50 > 10
