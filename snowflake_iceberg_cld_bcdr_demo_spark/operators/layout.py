"""Multi-dimensional data layout: exact-quantized Z-order (Morton) keys.

Two z-order paths live in this repo, on purpose:

- the PRODUCTION clustering rewrite (`sources.lakehouse.LakehouseCatalog.
  compact(cluster_by=...)`) rank-normalizes each column into quantile
  buckets before interleaving — skew-proof (a hot key can't swallow the
  curve), but `approxQuantile` cut points are not replayable in an
  external SQL engine;
- THIS module quantizes with exact affine integer arithmetic
  (``(x - min) * 2**bits  div  (max - min + 1)``) so the whole key
  derivation — quantization AND bit interleave — is reproducible
  bit-for-bit in the DuckDB oracle.  That makes the Morton kernel
  (`sources.lakehouse._zorder_value`, shared by both paths)
  hash-certifiable, not just pytest-covered.

Why z-order at all: range-partitioning + sorting by the interleaved value
co-locates rows that are close in EVERY clustered dimension, so per-file
min/max bounds are tight on all of them at once — a filter on ANY of the
dimensions skips most files.  A linear sort gives that for its first
column only.  This is the Spark-side analog of the reference keeping
campaign data clustered for its scan patterns (Iceberg partition-spec
setup, `/root/reference/scripts/03_load_iceberg_aws.py:140-150`): layout
is chosen once at write time and amortized over every subsequent query —
the standard answer to "which files can hold a=X AND b=Y" at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.lakehouse import _zorder_value


def zorder_keys(df: DataFrame, cols: list[str], bits: int = 4) -> DataFrame:
    """Append exact-quantized per-column bucket ids (``q0, q1, …``, each
    in ``[0, 2**bits)``) and the Morton-interleaved ``zvalue`` to ``df``.

    Quantization is affine over the column's own [min, max] span with
    pure integer arithmetic — ``(x - min) * 2**bits div (max - min + 1)``
    — so every step (and therefore the z-value) is deterministic and
    replayable in ANSI SQL; no floating point, no sampled quantiles.
    Columns must be integral (cast dates/timestamps to epoch numbers
    first; for skewed production layouts prefer the quantile-bucketed
    ``LakehouseCatalog.compact(cluster_by=...)``).

    Scale: the min/max span is ONE scalar aggregate broadcast back
    (map-side combined, one row), and key derivation is a narrow
    codegen'd projection — no shuffle beyond whatever the caller does
    with the key (typically ``repartitionByRange``)."""
    if not cols:
        raise ValueError("zorder_keys: cols is empty")
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError(
            f"zorder_keys: bits*len(cols) = {bits * len(cols)} "
            "must fit a signed 64-bit value"
        )
    scale = 1 << bits
    stats = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"_mn{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("long")).alias(f"_mx{i}") for i, c in enumerate(cols)],
    )
    prepared = df.join(F.broadcast(stats)).select(
        "*",
        *[
            ((F.col(c).cast("long") - F.col(f"_mn{i}")) * F.lit(scale)).alias(
                f"_num{i}"
            )
            for i, c in enumerate(cols)
        ],
        *[
            (F.col(f"_mx{i}") - F.col(f"_mn{i}") + F.lit(1)).alias(f"_den{i}")
            for i in range(len(cols))
        ],
    )
    qcols = [
        F.expr(f"_num{i} div _den{i}").alias(f"q{i}") for i in range(len(cols))
    ]
    keyed = prepared.select("*", *qcols).select(
        *df.columns,
        *[f"q{i}" for i in range(len(cols))],
        _zorder_value([F.col(f"q{i}") for i in range(len(cols))], bits).alias(
            "zvalue"
        ),
    )
    return keyed


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 8,
) -> DataFrame:
    """Re-lay ``df`` along the z-order curve: range-partition + sort by
    the exact-quantized Morton key, then drop the helper columns.  Each
    written file then covers a compact curve segment, i.e. a small
    hyper-rectangle of the clustered dimensions — tight per-file min/max
    on ALL of them (see the pruning assertion in tests).  Use
    ``LakehouseCatalog.compact(cluster_by=...)`` for managed tables /
    skewed data; this is the standalone frame-level form."""
    keyed = zorder_keys(df, cols, bits)
    return (
        keyed.repartitionByRange(num_partitions, "zvalue")
        .sortWithinPartitions("zvalue")
        .select(*df.columns)
    )


def zorder_cell_profile(
    df: DataFrame, cols: list[str], bits: int = 4
) -> DataFrame:
    """Per-curve-cell occupancy and bounds: group rows by their z-value
    and report the row count plus each clustered column's min/max inside
    the cell.  This is the certifiable witness of the layout property —
    with ``bits=4`` over two columns there are at most 256 cells and each
    cell's bounds span ≈ 1/16 of either column's range, exactly the
    tightness a z-ordered file inherits.  One scalar-agg broadcast + one
    grouped aggregation (map-side combined, ≤ 4**bits groups)."""
    keyed = zorder_keys(df, cols, bits)
    return keyed.groupBy("zvalue").agg(
        # bucket ids are constant within a cell (the z-value is their
        # interleave) — carrying them certifies the quantization and the
        # interleave separately
        *[F.min(f"q{i}").alias(f"q{i}") for i in range(len(cols))],
        F.count(F.lit(1)).alias("n_rows"),
        *[
            a
            for i, c in enumerate(cols)
            for a in (
                F.min(F.col(c).cast("long")).alias(f"c{i}_min"),
                F.max(F.col(c).cast("long")).alias(f"c{i}_max"),
            )
        ],
    )
