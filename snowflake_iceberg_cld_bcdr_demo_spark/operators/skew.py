"""Skew-handling utilities for 100 TB-scale shuffles.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's session) handles most join skew at runtime.  Two
cases it does NOT cover:

1. **Skewed aggregation keys** — one hot group key (a viral campaign_id, an
   empty-string doc fingerprint) lands one reducer with most of the data.
   AQE cannot split a hash-aggregate partition.  :func:`salted_agg`
   two-stages it: group by (key, salt) first — partial results spread over
   ``salt_buckets`` reducers — then re-aggregate by key.  Works for any
   algebraic aggregate (sum/count/min/max, and avg via sum+count).
2. **Broadcast-averse skewed joins** — a big⋈big join where specific keys
   are hot and the small side is too large to broadcast.
   :func:`salted_join` salts the big side and explodes the other side
   ``salt_buckets`` ways, so a hot key's rows split across reducers.
   (Use only on measured skew: the explode multiplies the replicated
   side's shuffle volume by ``salt_buckets``.)

Both are pure column-expression rewrites — no UDFs, no collect — so they
compose with everything else in the plan and stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(
    df: DataFrame,
    salt_buckets: int,
    *,
    deterministic_by: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Add a salt column in [0, salt_buckets).  Deterministic (hash of a
    column) when given; otherwise seeded-uniform per row — seeded so
    salted runs are reproducible and plan-cache friendly (spread is all
    that matters for skew, and a fixed seed spreads just as well)."""
    if deterministic_by is not None:
        salt = F.pmod(F.xxhash64(F.col(deterministic_by)), F.lit(salt_buckets)).cast("int")
    else:
        salt = (F.rand(seed) * salt_buckets).cast("int")
    return df.withColumn(SALT_COL, salt)


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps output name → (stage1_agg_expr, stage2_reagg_expr_on_name),
    e.g. ``{"total": (F.sum("x"), F.sum("total")), "n": (F.count(F.lit(1)),
    F.sum("n"))}``.  Stage 1 groups by (keys + salt) — the hot key's rows
    spread across ``salt_buckets`` reducers; stage 2 folds the (few)
    partials per key.
    """
    stage1_aggs = [expr.alias(name) for name, (expr, _) in aggs.items()]
    stage2_aggs = [re_expr.alias(name) for name, (_, re_expr) in aggs.items()]
    salted = with_salt(df, salt_buckets, deterministic_by=salt_source)
    partial = salted.groupBy(*group_cols, SALT_COL).agg(*stage1_aggs)
    return partial.groupBy(*group_cols).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side randomly, replicate the
    other side across all salt values (explode), join on (key, salt).

    Equivalent to ``big.join(skewed_small, on, how)`` for inner/left joins
    keyed on ``on``; the hot key's probe rows now hash to ``salt_buckets``
    different reducers instead of one."""
    big_salted = with_salt(big, salt_buckets)
    replicated = skewed_small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = big_salted.join(replicated, [on, SALT_COL], how)
    return out.drop(SALT_COL)


def skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Measure before salting: per-key row counts for the heaviest keys
    plus their share of the table — the evidence that justifies (or
    rules out) a salted rewrite."""
    total = df.count()
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share_pct", F.round(F.col("rows") * 100.0 / F.lit(float(total)), 3))
        .orderBy(F.col("rows").desc())
        .limit(top_n)
    )
