"""Sessionization: batch/stream agreement and stateful streaming
semantics (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from snowflake_iceberg_cld_bcdr_demo_spark.operators import sessions

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _events(spark):
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = []
    eid = 0
    for user in (1, 2):
        # session A: 3 events 5 min apart; gap 45 min; session B: 2 events
        for off in (0, 5, 10, 55, 60):
            rows.append((eid, base + dt.timedelta(minutes=off), user, "view", 1.5))
            eid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_batch_sessionize_gap_split(spark):
    out = sessions.sessionize(_events(spark), gap_s=30 * 60).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    for user, sess in per_user.items():
        assert len(sess) == 2
        s1, s2 = sorted(sess, key=lambda r: r.session_seq)
        assert s1.n_events == 3 and s2.n_events == 2
        assert s1.total_value == 4.5 and s2.total_value == 3.0
        assert s1.session_end < s2.session_start


def test_stream_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    _events(spark).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA).parquet(src)
    )
    q = (
        sessions.sessionize_stream(stream, gap_s=30 * 60)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # A stateful availableNow query idles in-state awaiting event-time
    # timeouts after processing all input, so a bare awaitTermination
    # burns its FULL timeout (measured: this one test was 182s of the
    # suite — all of it in that wait).  The two gap-closed sessions are
    # emitted by the data batches themselves; poll for them, keep the
    # same 180s ceiling as the correctness deadline.
    import time as _time

    _deadline = _time.time() + 180
    while _time.time() < _deadline:
        if q.awaitTermination(2):
            break
        if spark.table("sess_out").count() >= 2:
            break
    q.stop()  # stateful availableNow can idle awaiting timeouts — don't
    # leak an active query (a later same-name registration would fail)
    closed = spark.table("sess_out").collect()
    # one batch → the first (gap-closed) session per user is emitted;
    # the trailing session stays open in state awaiting timeout
    assert {(r.user_id, r.n_events, r.total_value, r.closed_by) for r in closed} == {
        (1, 3, 4.5, "gap"),
        (2, 3, 4.5, "gap"),
    }
    batch = sessions.sessionize(_events(spark), gap_s=30 * 60)
    first = {
        (r.user_id, r.n_events, r.total_value)
        for r in batch.filter(F.col("session_seq") == 1).collect()
    }
    assert {(r.user_id, r.n_events, r.total_value) for r in closed} == first
