"""Time-series regularization: resample a sparse per-group series onto a
dense calendar grid and impute the gaps (LOCF / linear interpolation /
zero fill).

The reference's dashboards assume dense daily rollups (the
`scripts/15_create_prod_database.sql` `v_*_daily` views); real telemetry
and finance series arrive sparse.  This is the missing step between them.

Scale: the spine is GENERATED per group from that group's own [min, max]
observation range (``sequence`` + ``explode`` — no driver-side calendar),
the observation join is per (group, ts) on already-aggregated rows, and
every imputation method is a window over the group partition — the only
shuffle is the group hash, and state per group is O(days in range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    method: str = "linear",
) -> DataFrame:
    """Dense per-group daily grid over ``df`` (one row per (group, date)
    observation), with gaps imputed by ``method``:

    - ``locf``  — last observation carried forward
    - ``zero``  — missing days read 0.0
    - ``linear`` — straight line between the surrounding observations
      (boundary gaps fall back to the nearest observation)

    Output: group cols, ``ts_col``, ``observed`` (original value, NULL on
    imputed days), ``filled`` (double), ``imputed`` flag."""
    if method not in ("locf", "zero", "linear"):
        raise ValueError(f"unknown resample method {method!r}")
    spine = (
        df.groupBy(*group_cols)
        .agg(F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1"))
        .select(
            *group_cols,
            F.explode(F.sequence(F.col("_t0"), F.col("_t1"))).alias(ts_col),
        )
    )
    obs = df.select(*group_cols, ts_col, F.col(value_col).alias("_v"))
    j = spine.join(obs, [*group_cols, ts_col], "left")
    asc = (
        Window.partitionBy(*group_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    desc = (
        Window.partitionBy(*group_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col("_v")
    ts = F.col(ts_col)
    prev_v = F.last(v, ignorenulls=True).over(asc).cast("double")
    prev_t = F.last(F.when(v.isNotNull(), ts), ignorenulls=True).over(asc)
    next_v = F.first(v, ignorenulls=True).over(desc).cast("double")
    next_t = F.first(F.when(v.isNotNull(), ts), ignorenulls=True).over(desc)
    if method == "locf":
        filled = F.coalesce(v.cast("double"), prev_v)
    elif method == "zero":
        filled = F.coalesce(v.cast("double"), F.lit(0.0))
    else:
        frac = F.datediff(ts, prev_t).cast("double") / F.datediff(
            next_t, prev_t
        ).cast("double")
        filled = (
            F.when(v.isNotNull(), v.cast("double"))
            .when(prev_t.isNull(), next_v)
            .when(next_t.isNull(), prev_v)
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
    return j.select(
        *group_cols,
        ts_col,
        v.alias("observed"),
        filled.alias("filled"),
        v.isNull().alias("imputed"),
    )
