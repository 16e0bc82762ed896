#!/usr/bin/env python
"""Round-8 data-curation flow, end to end: datasheet → intra-doc
repetition collapse → boilerplate removal → NB quality filter →
near-dup decontamination (text + embedding space) → token-budgeted
mixture → group-aware leakage-free split.

Every stage here is a certified registry operator (hash-verified
against a DuckDB oracle by the driver); this demo just composes them
the way a corpus build would and prints one JSON report.

Run: ``python examples/data_curation_demo.py [sf_dir]``
(default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_iceberg_cld_bcdr_demo_spark.operators import (  # noqa: E402
    corpus,
    dedup,
    extract,
    similarity,
    textops,
)
from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="data-curation-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    report: dict = {}

    # 0. datasheet of the raw corpus (one-row global aggregate)
    sheet = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
    ).collect()[0]
    report["datasheet"] = {
        "n_docs": sheet.n_docs,
        "total_chars": int(sheet.total_chars),
        "n_distinct_texts": sheet.n_distinct_texts,
    }

    # 1. intra-doc repetition collapse (row-local, zero shuffles)
    rep = textops.collapse_repetitions(docs)
    report["repetition_collapse"] = {
        "docs_touched": rep.filter(F.col("n_collapsed") > 0).count(),
        "tokens_dropped": int(
            rep.agg(F.sum("n_collapsed")).collect()[0][0] or 0
        ),
    }

    # 2. boilerplate n-gram removal (per-source shared 5-grams)
    boiler = extract.remove_boilerplate_ngrams(docs, n=5, min_docs=3)
    report["boilerplate_removal"] = {
        "docs_touched": boiler.filter(F.col("n_dropped_tokens") > 0).count()
    }

    # 3. NB quality filter trained curated-vs-pool
    nb = corpus.nb_quality_scores(
        docs, F.col("source").isin("src0", "src1"), buckets=256
    )
    report["nb_quality_filter"] = {
        "pool_kept": nb.filter(~F.col("is_target") & F.col("keep")).count(),
        "pool_dropped": nb.filter(~F.col("is_target") & ~F.col("keep")).count(),
    }

    # 4. decontamination vs the eval split, text space + embedding space
    train = docs.filter(F.col("doc_id") % 10 != 0)
    evald = docs.filter(F.col("doc_id") % 10 == 0)
    txt = dedup.neardup_decontaminate(train, evald)
    emb = table(spark, sf_dir, "embeddings")
    sem = similarity.embedding_decontaminate(
        emb.filter(F.col("vec_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
        threshold=0.9,
    )
    report["decontamination"] = {
        "text_flagged": txt.filter("contaminated").count(),
        "embedding_flagged": sem.filter("leaked").count(),
    }

    # 5. token-budgeted mixture (20k BPE pieces, curated upweighted)
    shares = {f"src{i}": s for i, s in enumerate(
        [0.20, 0.15, 0.15, 0.10, 0.10, 0.06, 0.06, 0.06, 0.06, 0.06])}
    mix = corpus.mixture_token_budget(docs, 20_000, shares)
    report["token_budget_mixture"] = {
        "docs_admitted": mix.count(),
        "tokens_admitted": int(mix.agg(F.sum("n_tokens")).collect()[0][0] or 0),
    }

    # 6. group-aware split: no source straddles train/val/test
    split = corpus.group_split(docs)
    report["group_split"] = {
        r.split: r.n for r in
        split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
