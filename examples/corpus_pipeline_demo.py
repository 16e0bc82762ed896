#!/usr/bin/env python
"""End-to-end training-corpus preparation demo: quality gate → exact +
near-dup dedup → PII scrub → eval-set decontamination → token chunking →
sequence packing, over the driver testdata ``documents`` table.

Run: ``python examples/corpus_pipeline_demo.py [sf_dir]``
(default sf_dir: /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus, dedup  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="corpus-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    report = {"input_docs": docs.count()}

    # 1-3. quality ∩ exact-dedup ∩ near-dup-dedup, then PII scrub
    pairs = dedup.minhash_similarity(docs, k=8, num_hashes=16, bands=4).filter(
        F.col("est_jaccard") >= 0.5
    )
    clean, flags = corpus.prepare_corpus(docs, pairs)
    agg = flags.agg(
        F.sum((~F.col("q_keep")).cast("long")).alias("quality_fail"),
        F.sum((~F.col("e_keep")).cast("long")).alias("exact_dups"),
        F.sum((~F.col("c_keep")).cast("long")).alias("near_dups"),
    ).collect()[0]
    report.update(
        quality_fail=agg.quality_fail,
        exact_dups=agg.exact_dups,
        near_dups=agg.near_dups,
        survivors=clean.count(),
        emails_redacted=clean.agg(F.sum("n_email")).collect()[0][0],
        numbers_redacted=clean.agg(F.sum("n_long_number")).collect()[0][0],
    )

    # 4. decontamination vs the held-out split (doc_id % 10 == 0)
    decon = corpus.decontaminate(docs, n=3, eval_mod=10, threshold=0.2)
    report["contaminated_train_docs"] = decon.filter("contaminated").count()

    # 5. chunk survivors for a 40-token context with 10-token overlap
    survivors = docs.join(clean.select("doc_id"), "doc_id")
    chunks = corpus.chunk_documents(survivors, chunk_tokens=40, stride=30)
    report["chunks"] = chunks.count()

    # 6. pack survivors into 512-token training sequences (both layouts)
    contiguous = corpus.pack_contiguous(survivors, budget_tokens=512)
    report["contiguous_bins"] = contiguous.agg(
        (F.max("bin_id") + 1).alias("n")
    ).collect()[0].n
    greedy = corpus.pack_greedy(survivors, budget_tokens=512, num_shards=16)
    report["greedy_bins"] = greedy.select("bin_id").distinct().count()

    # 7. round-3 additions: tokenizer training, markup extraction,
    # unicode hygiene, substring-dup + drift governance
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import (
        dedup as dd,
        extract,
        textclean,
        textops,
    )

    merges = textops.bpe_train(survivors, n_merges=6)
    report["bpe_merges"] = ["".join(m) for m in merges]
    vocab = textops.build_vocab(survivors, max_size=100)
    enc = textops.encode_tokens(survivors, vocab)
    report["oov_rate"] = round(
        enc.agg(F.sum("n_unk") / F.sum("n_tokens")).collect()[0][0], 4
    )
    report["boilerplate_docs"] = (
        extract.boilerplate_share(docs).filter("is_templated").count()
    )
    report["denormalized_docs"] = (
        textclean.unicode_clean(docs).filter("was_denormalized").count()
    )
    spans = dd.duplicate_spans(docs)
    report["mostly_duplicated_docs"] = spans.filter("mostly_duplicated").count()

    print(json.dumps(report, indent=2, default=int))


if __name__ == "__main__":
    main()
