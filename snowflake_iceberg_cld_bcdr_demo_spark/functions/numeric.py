"""Cross-engine deterministic numeric aggregation helpers.

The driver's correctness gate hash-compares Spark results against a DuckDB
oracle, so every aggregate value must be **bit-identical** across engines.
Two float hazards make naive ``ROUND(SUM(double))`` formulations flaky:

1. **Order-dependence**: IEEE double addition is not associative; Spark
   (partition/shuffle order) and DuckDB (sequential scan) sum in different
   orders, so a sum can land one ulp either side of a rounding boundary.
2. **Round-of-double divergence**: Spark rounds doubles via the shortest
   decimal string (Java ``BigDecimal.valueOf``) while DuckDB scales the
   binary value, so ``round(x, n)`` itself can disagree at ``.xx5``
   boundaries even for identical inputs.

Contract used by every query spec in :mod:`..plans`:

- Monetary/measure inputs are exact 2-decimal values stored as doubles, so
  ``CAST(x AS DECIMAL(18,2))`` is unambiguous in both engines.  All
  products and sums stay in decimal (exact, order-independent), ``ROUND``
  happens in decimal (HALF_UP == half-away-from-zero for the positive
  values here), and only the final value is cast to double — the
  decimal→double conversion is correctly rounded, hence bit-identical.
- Averages/ratios are an exact decimal or integer numerator and
  denominator combined by **one final double division** (IEEE division of
  identical operands is deterministic).  Doubles are never rounded.
- Aggregates over irrational doubles (e.g. L2 norms) use only
  order-independent folds (MIN/MAX), never SUM/AVG.

This is engine-agnostic numeric hygiene (same scheme any differential
tester needs), not an oracle-specific hack: at 100 TB the decimal sums are
still single map-side-combined hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for the testdata's money columns (≤ 1e7, 2 dp)
#: while leaving product headroom: (18,2)×(19,2)→(38,4) stays exact.
MONEY = "decimal(18,2)"


def dec(col: Column | str) -> Column:
    """Exact decimal view of a 2-decimal-valued double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dec_sum(expr: Column, scale: int = 2) -> Column:
    """Order-independent money sum: SUM in decimal, ROUND in decimal,
    emitted as double.  SQL twin:
    ``CAST(ROUND(SUM(<expr>), {scale}) AS DOUBLE)`` with decimal inputs."""
    return F.round(F.sum(expr), scale).cast("double")


def dec_avg(expr: Column) -> Column:
    """Order-independent mean: exact decimal sum, one double division.
    SQL twin: ``CAST(SUM(<expr>) AS DOUBLE) / COUNT(*)`` (no rounding)."""
    return F.sum(expr).cast("double") / F.count(F.lit(1))


def one_minus(col: Column | str) -> Column:
    """``(1 - x)`` in decimal, for discount-style factors."""
    return F.lit(1).cast(MONEY) - dec(col)


def one_plus(col: Column | str) -> Column:
    """``(1 + x)`` in decimal, for tax-style factors."""
    return F.lit(1).cast(MONEY) + dec(col)
