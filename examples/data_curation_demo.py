#!/usr/bin/env python
"""Data-curation flow, end to end — now a thin driver over the CERTIFIED
composed pipeline (`operators.corpus.curated_corpus`, round 9): collapse
→ boilerplate removal → NB quality filter → lexical + embedding
decontamination → token-budgeted mixture → group-aware split, each gate
consuming the previous gate's text.  The same chain is hash-verified
against a DuckDB oracle by the driver (`curated_corpus_decisions` /
`curated_corpus_report`); this demo just runs it and prints the one-row
report plus a small decision-trail sample.

Run: ``python examples/data_curation_demo.py [sf_dir]``
(default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="data-curation-demo")
    spark.sparkContext.setLogLevel("ERROR")

    shares = {f"src{i}": s for i, s in enumerate(
        [0.20, 0.15, 0.15, 0.10, 0.10, 0.06, 0.06, 0.06, 0.06, 0.06])}
    decisions = corpus.curated_corpus(
        table(spark, sf_dir, "documents"),
        table(spark, sf_dir, "embeddings"),
        F.col("source").isin("src0", "src1"),
        20_000,
        shares,
    )

    report_row = QUERY_SPECS["curated_corpus_report"].build(spark, sf_dir).collect()[0]
    print(json.dumps({"report": report_row.asDict()}, indent=2, default=str))

    print("\nSample decision trail (5 curated, 5 rejected):")
    for r in decisions.filter("curated").limit(5).collect():
        print(" +", r.asDict())
    for r in decisions.filter("NOT curated AND NOT is_eval").limit(5).collect():
        print(" -", r.asDict())


if __name__ == "__main__":
    main()
