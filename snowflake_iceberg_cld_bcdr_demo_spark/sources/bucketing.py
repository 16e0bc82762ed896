"""Bucketed table layout for co-located (shuffle-free) joins and aggs.

At 100 TB the dominant cost of the fact-to-fact shapes (orders⋈lineitem,
order_performance's two lineitem rollups) is the shuffle of both inputs
onto the join key.  Writing the facts bucketed by that key moves the
shuffle to WRITE time, once, and every subsequent join/aggregation on the
key runs with zero exchanges: Spark's scan reports the bucket hash
partitioning, so sort-merge join and hash aggregation consume the scan
partitioning directly (``EnsureRequirements`` inserts no Exchange).

This is the Spark analog of the reference warehouse keeping campaign data
clustered by campaign_id (Iceberg bucket partition transforms,
``scripts/03_load_iceberg_aws.py:140-150`` partition-spec setup): layout
chosen once at load, amortized across every downstream query.

Rules of thumb encoded here:
- bucket BOTH sides of a recurring join with the SAME bucket count on the
  SAME key (differing counts still shuffle the smaller side),
- also ``sortBy`` the bucket key so sort-merge join skips its sort step,
- bucket counts sized so one bucket ≈ one task's worth of data at target
  scale (hundreds/thousands at 100 TB; tests use small counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed parquet
    table.  Bucketing metadata lives in the session catalog, which is how
    the scan later advertises its partitioning to the planner."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table_name)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the (pre-AQE) physical
    plan — the metric bucketing is supposed to drive to zero.  Counts
    ``Exchange hashpartitioning`` / ``rangepartitioning`` nodes only, not
    broadcast exchanges (broadcasts are cheap by design)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
