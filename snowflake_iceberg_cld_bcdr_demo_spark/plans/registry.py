"""Driver-contract query registry.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the equivalent
ANSI SQL that DuckDB runs on the same parquet tables (the driver's
correctness oracle).  Column aliases match exactly on both sides — the
driver sorts columns by name before hashing values.

Specs live in :mod:`.relational` (SURVEY.md §2 operator inventory mapped to
the testdata star schema) and :mod:`.pipeline` (training-data-pipeline
operators: dedup, similarity search, text analysis).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One named query: Spark builder + DuckDB oracle SQL (None → rows-only)."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def _collect() -> dict[str, QuerySpec]:
    from . import olap, pipeline, relational, tpch_ext

    ordered = [*relational.SPECS, *tpch_ext.SPECS, *olap.SPECS, *pipeline.SPECS]
    seen = set()
    for spec in ordered:
        if spec.name in seen:
            raise ValueError(f"duplicate query name {spec.name!r}")
        seen.add(spec.name)
    # Oracle-bearing specs first: the driver records a bounded prefix of
    # queries() in CORRECTNESS_r{N}.json, so hash-checkable queries must
    # not be crowded out by rows-only (approximate) ones.
    return {
        spec.name: spec
        for spec in [
            *(s for s in ordered if s.oracle is not None),
            *(s for s in ordered if s.oracle is None),
        ]
    }


QUERY_SPECS: dict[str, QuerySpec] = _collect()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in QUERY_SPECS.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in QUERY_SPECS.items()
        if spec.oracle is not None
    }
