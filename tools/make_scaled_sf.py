"""Deterministically scale the sf0.1 testdata 10x for the bench's
sf1 spot-check (no sf1 directory ships with the driver).

Every row is replicated once per ``copy`` in 0..mult-1 with primary and
foreign keys remapped ``key*mult + copy`` on BOTH sides of each join
edge, so the join graph replicates exactly mult-fold — query output
grows linearly and per-query time can be compared against
mult x the sf0.1 time.

``documents.text`` is word-shuffled per copy (deterministic xxhash64
order; copy 0 keeps the original) so shingle-based operators (MinHash
LSH, span dedup) see genuinely distinct documents instead of mult
verbatim copies — otherwise near-dup pair counts would grow
quadratically by construction and the linearity check would be
meaningless.  Dims (region, nation) are not replicated.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEYED = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def _shuffle_words(text, copy):
    """Deterministic per-copy word shuffle + per-word copy prefix;
    copy 0 keeps the original.  The prefix touches EVERY character
    shingle, so copies of the same document are NOT near-duplicates of
    each other (cross-copy Jaccard ~ 0) — without it, word-internal
    shingles survive the shuffle and near-dup pair counts grow
    quadratically in the copy count by construction, poisoning the
    linearity check."""
    words = F.split(text, " ")
    keyed = F.transform(
        words,
        lambda w, i: F.struct(
            F.xxhash64(w, i, copy).alias("k"),
            F.concat(copy.cast("string"), F.lit("~"), w).alias("w"),
        ),
    )
    shuffled = F.concat_ws(
        " ", F.transform(F.array_sort(keyed), lambda s: s["w"])
    )
    return F.when(copy == 0, text).otherwise(shuffled)


def make_scaled(
    spark: SparkSession, src_dir: str, out_dir: str, mult: int = 10
) -> None:
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

    os.makedirs(out_dir, exist_ok=True)
    for name in DIMS:
        df = table(spark, src_dir, name)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    copies = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("_copy")
    for name, keys in KEYED.items():
        df: DataFrame = table(spark, src_dir, name).select("*", copies)
        c = F.col("_copy")
        for k in keys:
            df = df.withColumn(k, (F.col(k) * mult + c).cast(dict(df.dtypes)[k]))
        if name == "documents":
            df = df.withColumn("text", _shuffle_words(F.col("text"), c))
            df = df.withColumn("n_chars", F.length("text").cast("long"))
        # Write SPLITTABLE output: the sf0.1 source tables are single
        # files with ONE parquet row group, so an unrepartitioned write
        # inherits that layout and every sf1 scan becomes a one-task
        # stage — the spot then measures a single core against 10x the
        # data instead of the engine's scaling.  A real table at this
        # size (let alone 100 TB) is many files/row groups; round-robin
        # into one file per core reproduces that (deterministic content,
        # layout only).
        df.drop("_copy").repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session

    spark = build_session(app_name="make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_sf1"
    make_scaled(spark, src, out, mult=10)
    print(f"scaled {src} x10 -> {out}")
