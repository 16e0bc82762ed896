"""Data-quality expectations: declarative table constraints checked in
bulk, Deequ/dbt-test style.

The reference validates its stack with hand-written count/comparison
queries (`/root/reference/scripts/90_validation_queries.sql:21-142`); this
module generalizes that into reusable rules a pipeline can assert per
batch: NOT NULL, uniqueness, accepted values, ranges, referential
integrity, and arbitrary predicate expectations — each reported as a
(rule, violations, pass) row, so a scheduler can gate publishes on
``all(pass)`` (pairs with the lakehouse WAP flow: stage → check → publish).

Scale: all ROW-LOCAL rules (not-null / accepted / range / predicate)
evaluate in ONE conditional aggregation over a single scan — adding a rule
adds a counter, not a pass.  ``unique`` adds one groupBy on its key;
``foreign_key`` one anti-join per referenced table.  Nothing collects to
the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- rule constructors ------------------------------------------------------


def not_null(col: str) -> dict:
    return {"rule": f"not_null({col})", "kind": "row", "violation": F.col(col).isNull()}


def accepted_values(col: str, values: list) -> dict:
    return {
        "rule": f"accepted_values({col})",
        "kind": "row",
        # NULL is not a value violation — pair with not_null to forbid it
        "violation": F.col(col).isNotNull() & ~F.col(col).isin(values),
    }


def in_range(col: str, lo=None, hi=None) -> dict:
    conds = []
    if lo is not None:
        conds.append(F.col(col) < lo)
    if hi is not None:
        conds.append(F.col(col) > hi)
    if not conds:
        raise ValueError("in_range: need lo and/or hi")
    return {
        "rule": f"in_range({col})",
        "kind": "row",
        "violation": reduce(lambda a, b: a | b, conds),
    }


def expect(name: str, predicate: Column | str) -> dict:
    """Arbitrary row expectation: violation = predicate NOT satisfied
    (NULL counts as a violation — expectations must hold provably)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return {
        "rule": f"expect({name})",
        "kind": "row",
        "violation": ~pred.eqNullSafe(F.lit(True)),
    }


def unique(cols: list[str]) -> dict:
    return {"rule": f"unique({','.join(cols)})", "kind": "unique", "cols": list(cols)}


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> dict:
    """Referential integrity: every non-NULL ``col`` exists in
    ``ref[ref_col]`` (SQL FK semantics: NULLs are exempt)."""
    return {
        "rule": f"foreign_key({col})",
        "kind": "fk",
        "col": col,
        "ref": ref,
        "ref_col": ref_col,
    }


# -- checker ----------------------------------------------------------------


def check(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate all rules; returns one row per rule:
    ``(rule, n_rows, n_violations, passed)``.

    Row-local rules share ONE aggregation pass; each ``unique`` rule adds
    a groupBy on its key; each ``foreign_key`` adds an anti-join reduced
    to a count.  The result is O(rules) rows."""
    if not rules:
        raise ValueError("check: no rules given")
    pieces: list[DataFrame] = []

    row_rules = [r for r in rules if r["kind"] == "row"]
    if row_rules:
        aggs = [
            F.sum(r["violation"].cast("long")).alias(f"v{i}")
            for i, r in enumerate(row_rules)
        ]
        one = df.agg(F.count(F.lit(1)).alias("n"), *aggs)
        stacked = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r["rule"]).alias("rule"),
                            F.col("n").alias("n_rows"),
                            F.coalesce(F.col(f"v{i}"), F.lit(0)).alias("n_violations"),
                        )
                        for i, r in enumerate(row_rules)
                    ]
                )
            ).alias("s")
        ).select("s.rule", "s.n_rows", "s.n_violations")
        pieces.append(stacked)

    for r in rules:
        if r["kind"] == "unique":
            dup = (
                df.groupBy(*r["cols"])
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias("n_violations"),
                    F.coalesce(F.sum("_c"), F.lit(0)).alias("n_rows"),
                )
                .select(F.lit(r["rule"]).alias("rule"), "n_rows", "n_violations")
            )
            pieces.append(dup)
        elif r["kind"] == "fk":
            col = r["col"]
            orphans = (
                df.filter(F.col(col).isNotNull())
                .join(
                    r["ref"].select(F.col(r["ref_col"]).alias(col)).distinct(),
                    col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
            )
            total = df.agg(F.count(F.lit(1)).alias("n_rows"))
            pieces.append(
                total.join(orphans).select(
                    F.lit(r["rule"]).alias("rule"), "n_rows", "n_violations"
                )
            )

    out = reduce(lambda a, b: a.unionByName(b), pieces)
    return out.select(
        "rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def enforce(df: DataFrame, rules: list[dict]) -> None:
    """Assert-all: raises ``ValueError`` listing every failed rule (the
    WAP audit gate form).  One job; the report stays executor-side until
    the O(rules)-row collect."""
    failed = [
        (r.rule, r.n_violations)
        for r in check(df, rules).collect()
        if not r.passed
    ]
    if failed:
        raise ValueError(
            "data-quality check failed: "
            + "; ".join(f"{name} ({n} violations)" for name, n in failed)
        )
