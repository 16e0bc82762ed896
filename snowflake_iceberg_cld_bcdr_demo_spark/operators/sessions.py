"""Sessionization: gap-based user sessions over an event stream.

Batch form (the oracle-checked baseline): pure window functions —
``lag`` to detect gaps, a cumulative ``sum`` of gap flags as the session
index, then one groupBy for per-session rollups.  Two shuffles, both
partitioned by ``user_id`` (Catalyst reuses the window partitioning for
the aggregation when keys align).

Streaming form: ``applyInPandasWithState`` keeps one open session per
user in state, emits sessions closed by the gap timeout or watermark —
the custom-stateful-operator pattern Structured Streaming is built for
(the reference has no streaming, SURVEY §2.8; this is north-star
territory).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_S = 30 * 60


def sessionize(
    events: DataFrame,
    gap_s: int = SESSION_GAP_S,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user gap-based sessions with per-session rollups.

    Deterministic ordering: (ts, event_id) tie-break inside each user
    partition.  Session id = cumulative count of gap-starts — stable and
    dense per user."""
    order = [F.col(ts_col), F.col("event_id")]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # exact integer microseconds (unix_micros ≡ DuckDB epoch_us); a
    # seconds-level unix_timestamp would truncate sub-second gaps
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_micros = F.unix_micros(prev_ts.cast("timestamp"))
    new_session = F.when(
        prev_ts.isNull() | (micros - prev_micros > F.lit(gap_s * 1_000_000)), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.withColumn("session_seq", F.sum(new_session).over(wcum))
    return (
        flagged.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_seq").cast("int").alias("session_seq"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )


STREAM_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("closed_by", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", TimestampType()),
        StructField("end", TimestampType()),
        StructField("n", IntegerType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_s: int = SESSION_GAP_S,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming sessionization: one open session per user held
    in state; a session closes when a later event arrives past the gap, or
    when the processing-time timeout fires with no new events.

    State is O(active users); the watermark bounds late data.  Emits only
    CLOSED sessions (append mode)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, end, n, total = state.get
                closed.append((user_id, start, end, int(n), float(total), "timeout"))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            if state.exists:
                start, end, n, total = state.get
            else:
                start = end = None
                n, total = 0, 0.0
            for ts, value in zip(rows["ts"], rows["value"]):
                ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
                if start is not None and (ts - end).total_seconds() > gap_s:
                    closed.append((user_id, start, end, int(n), float(total), "gap"))
                    start = end = None
                    n, total = 0, 0.0
                if start is None:
                    start = ts
                end = ts
                n += 1
                total += float(value)
            state.update((start, end, int(n), float(total)))
            state.setTimeoutDuration(gap_s * 1000)
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "total_value",
                "closed_by",
            ],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=STREAM_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
