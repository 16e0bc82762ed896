#!/usr/bin/env python
"""Daily admission lifecycle, end to end — build the corpus's PERSISTED
ADMISSION INDEX once (`operators.corpus.admission_state`: fingerprints,
banded MinHash signatures, consumed tokens, frozen NB model + operating
points), save it as lakehouse tables, then gate incoming batches two
ways:

1. a one-shot batch admit via `curated_incremental_admit(state=...,
   existing_docs=None)` — the corpus is NEVER rescanned, and
2. the same gates as a continuous ingest
   (`streaming.curation.stream_curated_admission`) over two file-stream
   waves, showing batch-2 duplicates of batch-1 ADMISSIONS being
   rejected through the incrementally-maintained state tables.

The admit math itself is hash-verified against a DuckDB oracle by the
driver (`curated_incremental_admit`); this demo runs the production
wiring around it.

Run: ``python examples/admission_demo.py [sf_dir]``
(default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (  # noqa: E402
    LakehouseCatalog,
)
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.streaming import curation  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.streaming.events import (  # noqa: E402
    read_file_stream,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="admission-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp(prefix="admission-demo-"))
    cat = LakehouseCatalog(spark, str(work / "wh"))

    docs = table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    shares = {f"src{i}": 0.05 for i in range(20)}

    # 1. ship time: build + persist the admission index (one corpus pass)
    state = corpus.admission_state(existing, F.col("source").isin("src0", "src1"))
    curation.save_admission_state(cat, "db", "adm", state)
    cat.create_table("db", "corpus", existing.select("doc_id", "source", "text"))
    print("admission index:", {
        k: cat.load("db", f"adm_{k}").count() for k in curation.STATE_TABLES
    })

    # 2. daily batch: gate WITHOUT the corpus
    trail = corpus.curated_incremental_admit(
        batch, None, None, 25_000, shares,
        state=curation.load_admission_state(cat, "db", "adm"),
    )
    agg = trail.agg(
        F.count("*").alias("batch_docs"),
        F.sum((~F.col("e_keep")).cast("int")).alias("exact_dups"),
        F.sum((~F.col("nd_keep")).cast("int")).alias("near_dups"),
        F.sum((~F.col("nb_keep")).cast("int")).alias("below_quality_cut"),
        F.sum(F.col("admitted").cast("int")).alias("admitted"),
        F.sum("n_mix_tokens").alias("admitted_tokens"),
    ).collect()[0]
    print("one-shot admit:", agg.asDict())

    # 3. the same gates as a continuous ingest (two waves; wave 2 contains
    #    exact copies of wave 1's docs — rejected via the UPDATED state)
    src, ckpt = str(work / "stream_src"), str(work / "ckpt")
    wave1 = batch.limit(50).select("doc_id", "text", "source")
    wave1.write.mode("append").parquet(src)
    curation.stream_curated_admission(
        read_file_stream(spark, src, wave1.schema), cat, "db", "corpus",
        "adm", ckpt, token_budget=25_000, shares=shares,
    ).awaitTermination(300)
    n1 = cat.load("db", "corpus").count()
    wave1.withColumn("doc_id", F.col("doc_id") + 1_000_000).write.mode(
        "append"
    ).parquet(src)  # same text, new ids -> exact dups of wave-1 admissions
    curation.stream_curated_admission(
        read_file_stream(spark, src, wave1.schema), cat, "db", "corpus",
        "adm", ckpt, token_budget=25_000, shares=shares,
    ).awaitTermination(300)
    n2 = cat.load("db", "corpus").count()
    print(f"stream: corpus {n1} rows after wave 1, {n2} after duplicate "
          f"wave 2 (delta {n2 - n1} — duplicates rejected)")
    curation.compact_consumed_log(cat, "db", "adm")
    print("consumed (compacted):", {
        r.source: r.consumed
        for r in cat.load("db", "adm_consumed").orderBy("source").limit(5).collect()
    })
    spark.stop()


if __name__ == "__main__":
    main()
