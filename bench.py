#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line with per-query wall
seconds.

Each query executes through Spark's built-in ``noop`` sink, which
materializes every output column on the executors without collecting to
the driver — the closest local analog of a cluster job writing results.
(A plain ``count()`` would let Catalyst prune the computed columns and
under-measure map-heavy queries.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: the flagship + the heaviest relational shapes + one of
#: each pipeline family (dedup / similarity / text).
HEADLINE = [
    "order_performance",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "fanout_count_distinct",
    "minhash_near_dup_pairs",
    "ann_cosine_topk",
    "text_quality",
    "dedup_exact_groups",
    "window_topk_per_group",
    "asof_click_to_view",
    "corpus_pipeline_report",
    "stats_corr_by_flag",
    "session_window_rollup",
    "html_extract_stats",
    "resample_linear_daily",
]


def main() -> None:
    from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS
    from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not session startup.
    QUERY_SPECS["scalar_row_counts"].build(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERY_SPECS[name]
        t0 = time.perf_counter()
        spec.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
