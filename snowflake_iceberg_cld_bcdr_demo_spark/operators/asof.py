"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join, expressed as compositions of existing DataFrame ops so
Catalyst/Tungsten run them JVM-side (no UDFs, no driver loops).

Neither appears in the reference workload (SURVEY.md §2.3 notes the
reference uses only equi joins), but both are table-stakes for the
time-series side of a large-scale data pipeline (trade↔quote alignment,
context windows around anomalies), so the engine ships them as
first-class operators with oracle-checked specs.

Scale notes:
- ``asof_join`` is the union-then-window pattern: tag both sides, union,
  one shuffle on the key, per-key sort by (ts, side), and a running
  ``last(..., ignorenulls)`` picks each left row's most recent right row.
  No range self-join, no per-row subquery — cost is one sort-shuffle of
  |left|+|right|, the optimal distributed as-of.
- ``interval_join`` buckets time so the inequality predicate becomes an
  equi-join on (keys…, bucket) plus a cheap residual filter: work is
  proportional to true matches per bucket, never |left|×|right|.  Pick
  ``bucket_seconds`` ≈ the typical interval length so each left row
  explodes into O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    strict: bool = False,
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) within the same key —
    backward as-of, the trade↔quote alignment semantic.

    Returns all left columns plus ``{prefix}{c}`` for each requested right
    column (NULL when no right row precedes).  Ties on the timestamp are
    resolved by the union ordering: non-strict sorts right rows before
    left rows at equal ts (so an equal-ts right row matches), strict sorts
    them after (so it does not).

    ``tolerance`` (pandas ``merge_asof`` parity) rejects matches too far
    in the past: seconds for timestamp keys, raw units for numeric keys
    — stale quotes read NULL instead of silently joining.  Same single
    shuffle; the staleness check is one more window column.
    """
    right_cols = right_cols or [c for c in right.columns if c not in on]
    payload = F.struct(*[F.col(c) for c in right_cols])
    left_side, right_side = (0, 1) if strict else (1, 0)
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        payload.alias("__payload"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{t}" for c, t in left.dtypes) + ">"
        ).alias("__left"),
    )
    l = left.select(  # noqa: E741
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType.simpleString()).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        merged = merged.withColumn(
            "__match_ts",
            F.last(
                F.when(F.col("__side") == right_side, F.col("__ts")),
                ignorenulls=True,
            ).over(w),
        )
        if dict(left.dtypes).get(left_ts, "").startswith("timestamp"):
            gap = (
                F.unix_micros(F.col("__ts").cast("timestamp"))
                - F.unix_micros(F.col("__match_ts").cast("timestamp"))
            ) / 1_000_000.0
        else:
            gap = F.col("__ts") - F.col("__match_ts")
        merged = merged.withColumn(
            "__match", F.when(gap <= F.lit(tolerance), F.col("__match"))
        )
    out_left = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return merged.filter(F.col("__side") == left_side).select(*out_left, *out_right)


def _bucket(ts_col: str, bucket_seconds: int):
    return F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(bucket_seconds * 1_000_000))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_ts: str,
    bucket_seconds: int,
    include_start: bool = True,
    include_end: bool = True,
) -> DataFrame:
    """Inner join of right *events* to left *intervals*:
    ``left_start (<|<=) right_ts (<|<=) left_end`` within the same key.

    The inequality is rewritten as an equi-join on (keys…, time bucket):
    each interval explodes into the buckets it covers, each event lands in
    exactly one bucket, so every true match is produced exactly once and
    no cross-bucket pairs are ever materialized.  Column name collisions
    between the two sides must be resolved by the caller beforehand.
    """
    lb = (
        left.withColumn("__bs", _bucket(left_start, bucket_seconds))
        .withColumn("__be", _bucket(left_end, bucket_seconds))
        .withColumn("__bucket", F.explode(F.sequence(F.col("__bs"), F.col("__be"))))
        .drop("__bs", "__be")
    )
    rb = right.withColumn("__bucket", _bucket(right_ts, bucket_seconds))
    start_ok = (
        F.col(right_ts) >= F.col(left_start)
        if include_start
        else F.col(right_ts) > F.col(left_start)
    )
    end_ok = (
        F.col(right_ts) <= F.col(left_end)
        if include_end
        else F.col(right_ts) < F.col(left_end)
    )
    return lb.join(rb, [*on, "__bucket"]).filter(start_ok & end_ok).drop("__bucket")
