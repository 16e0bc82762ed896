"""Vector (embedding) column helpers over ``array<float>`` columns.

Dot products and norms are computed with ``F.zip_with`` / ``F.aggregate``
higher-order functions — JVM-side, sequential (deterministic) accumulation
in double precision.  No Python UDFs: at 100 TB the brute-force scorer is a
narrow map over the scan followed by a top-k, and the LSH/IVF variants turn
it into a bucketed shuffle join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (deterministic left-to-right fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-scale a vector (zero vectors pass through unchanged).  On unit
    vectors squared-L2 and cosine rank identically (||a-b||² = 2 − 2cosθ),
    which is what lets L2-trained quantizers (PQ/IVF) serve cosine
    retrieval."""
    n = norm(a)
    return F.when(n == 0, a).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )
