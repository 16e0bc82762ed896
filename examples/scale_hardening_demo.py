#!/usr/bin/env python
"""Scale-hardening demo: the operators that keep a 100 TB corpus run
from falling over — skew-safe near-dup (exact-dup collapse before LSH
banding), winnowing span fingerprints (certain detection of copied
runs), per-source quota caps, inverted-index postings, and the
HyperLogLog sketch-vs-exact audit — composed over the driver testdata
``documents`` table.

Run: ``python examples/scale_hardening_demo.py [sf_dir]``
(default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus, dedup, textops  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session, cluster_conf  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="scale-hardening-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    report: dict = {}

    # 1. skew-safe near-dup: exact dups collapse BEFORE the band join,
    # so no hot bucket can go quadratic; the dup-pair count each
    # canonical pair stands for stays symbolic in pair_weight
    pairs = dedup.neardup_skewsafe(docs)
    report["neardup"] = {
        "canonical_pairs": pairs.count(),
        "represented_doc_pairs": pairs.agg(
            F.sum("pair_weight").cast("long").alias("w")
        ).collect()[0].w,
    }

    # 2. winnowing: certain detection of any copied run >= 23 chars
    prof = dedup.winnow_span_profile(docs)
    report["winnowing"] = {
        "docs_with_shared_spans": prof.filter("n_shared > 0").count(),
        "mostly_shared": prof.filter("mostly_shared").count(),
    }

    # 3. source balancing: deterministic per-source quota
    q = corpus.source_quota(docs, per_source=100)
    report["quota"] = {
        r.source: r.kept
        for r in q.groupBy("source")
        .agg(F.sum(F.col("kept").cast("long")).alias("kept"))
        .orderBy("source")
        .limit(5)
        .collect()
    }

    # 4. inverted index: postings for decontamination/search
    idx = corpus.term_postings(docs, min_df=5)
    report["postings"] = {
        "indexed_terms": idx.count(),
        "max_df": idx.agg(F.max("df").alias("m")).collect()[0].m,
    }

    # 5. sketch audits: trust HLL counts and t-digest quantiles before
    # relying on them at scale
    audit = corpus.approx_distinct_audit(docs)
    report["sketch_audit_max_rel_error"] = float(
        audit.agg(F.max("rel_error").alias("m")).collect()[0].m
    )
    paudit = corpus.approx_percentile_audit(docs, value_col="n_chars")
    report["percentile_audit_max_rel_err_p99"] = float(
        paudit.agg(F.max("rel_err_p99").alias("m")).collect()[0].m
    )

    # 5b. LM quality floor: the perplexity-style ranking signal
    lm = textops.unigram_logprob(docs)
    report["lm_scores"] = {
        "scored_docs": lm.filter("avg_logprob IS NOT NULL").count(),
        "min_avg_logprob": float(
            lm.agg(F.min("avg_logprob").alias("m")).collect()[0].m
        ),
    }

    # 5c. exact-substring block removal: duplicated tiles dropped, the
    # cleaned corpus rebuilt (the acting counterpart of the profile)
    removed = dedup.remove_duplicate_blocks(docs)
    br = removed.agg(
        F.sum((F.col("n_dup_blocks") > 0).cast("long")).alias("touched"),
        F.sum("n_dup_blocks").alias("blocks"),
        F.sum("clean_len").alias("chars"),
    ).collect()[0]  # one job, one pass
    report["block_removal"] = {
        "docs_touched": int(br.touched),
        "blocks_removed": int(br.blocks),
        "surviving_chars": int(br.chars),
    }

    # 5d. SemDeDup: embedding-space dedup — k-means cells bound the
    # pair join (n^2/K); the fixed-point trainer is bit-reproducible
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cents, _ = similarity.kmeans_centroids(emb, k=8, iters=2)
    sd = similarity.semdedup(emb, cents, threshold=0.4).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("is_kept")).cast("long")).alias("d"),
    ).collect()[0]  # one job
    report["semdedup"] = {"vectors": int(sd.n), "dropped": int(sd.d)}

    # 6. the conf this pipeline would ship with on a real cluster
    report["cluster_conf_example"] = {
        k: v
        for k, v in cluster_conf(executors=1000, dataset_tb=100.0).items()
        if k.startswith("spark.sql")
    }

    print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
