"""Deduplication operators over a document corpus.

Exact dedup is a hash-groupBy (one shuffle on a 128-bit digest — uniform
key distribution, no skew).  Near-dup (MinHash+LSH, SimHash, n-gram
Jaccard) shingles documents, computes signatures with md5-based hash
families (portable: the DuckDB oracle reproduces them bit-for-bit), and
joins only within LSH bands so the candidate-pair join stays sub-quadratic
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def _parallelize_scan(df: DataFrame) -> DataFrame:
    """Scan-parallelism guard for CPU-heavy row-local stages (shingle /
    k-gram hashing): when the incoming plan has fewer partitions than the
    session's parallelism (a single small local file — one parquet row
    group is unsplittable), redistribute round-robin so the per-character
    hashing uses every core.  With a real multi-file corpus the scan is
    already parallel and this is a no-op; the redistribution only
    triggers when it at least DOUBLES parallelism (31 partitions on 32
    cores is not worth shuffling the corpus for).  Streaming frames
    pass through untouched (no ``.rdd`` on an unbounded plan;
    micro-batch parallelism is the source's concern)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() * 2 <= sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group documents by content hash; emit per-group copy count and the
    keeper (min id).  Downstream, `n_copies > 1` rows are the dup sets.

    Scale: single shuffle on md5(text) — 32-byte keys, uniformly
    distributed, map-side partial agg keeps shuffle volume ≈ |distinct|.
    """
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.col(id_col)).alias("keeper_doc_id"),
    )


def dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus dedup summary (total / distinct / duplicate docs)."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col(text_col))))
        .cast("long")
        .alias("n_duplicates"),
    )


def char_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    dedup_shingles: bool = True,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each doc into its character k-shingles of the normalized
    text → (id, shingle).  Built-ins only: sequence + explode + substring;
    the explode is a narrow op (no shuffle).

    ``dedup_shingles=False`` skips the distinct: MIN-based MinHash is
    duplicate-insensitive, and dropping the distinct removes the single
    biggest shuffle (the multiset is ~2× the set size but shuffle-free).

    The shingle ARRAY is built row-locally (one ``transform`` pass per
    doc) and only then exploded: exploding positions first would make the
    Generate node copy the full ``norm_text`` into every one of the
    |text| output rows before the substring projection — measured 28%
    slower at sf0.1 from that row-width alone.

    ``carry_cols`` are doc-level attributes (functionally dependent on
    the id) threaded through the explode so downstream aggregations can
    recover them with ``first()`` instead of a second join back to
    ``docs`` — a few bytes per shingle row vs another consumer branch of
    the input plan."""
    norm = normalized_text(F.col(text_col))
    out = (
        _parallelize_scan(docs)
        .select(F.col(id_col).alias("doc_id"), *carry_cols, norm.alias("norm_text"))
        .filter(F.length("norm_text") >= k)
        .select(
            "doc_id",
            *carry_cols,
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(norm_text) - {k - 1}), "
                    f"i -> substring(norm_text, i, {k}))"
                )
            ).alias("shingle"),
        )
    )
    return out.distinct() if dedup_shingles else out


def _hash_pair(shingle: Column) -> tuple[Column, Column]:
    """Two independent 32-bit integer hashes from ONE md5 (hex halves) —
    the portable base of a Kirsch-Mitzenmacher family ``h_i = h1 + i·h2``.
    One digest per shingle instead of one per family member (16× less
    hashing); the DuckDB oracle reproduces the integers exactly via
    ``CAST(('0x' || substring(md5(s), …, 8)) AS BIGINT)``."""
    d = F.md5(shingle)
    h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return h1, h2


def minhash_signatures(
    shingled: DataFrame,
    num_hashes: int = 16,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, h0..h{n-1}) MinHash signature matrix.

    One groupBy(doc_id) computes all family members as MIN aggregates —
    a single shuffle regardless of signature width, with map-side partial
    MINs doing almost all the work in the scan stage.  ``carry_cols``
    (doc-level attributes threaded through :func:`char_shingles`) are
    recovered with ``first()`` in the same aggregation — no extra join."""
    h1, h2 = _hash_pair(F.col("shingle"))
    aggs = [
        F.min(F.pmod(h1 + F.lit(i) * h2, F.lit(1 << 32))).alias(f"h{i}")
        for i in range(num_hashes)
    ] + [F.first(c).alias(c) for c in carry_cols]
    return shingled.groupBy("doc_id").agg(*aggs)


def minhash_signatures_rowlocal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc_id, h0..h{n-1}) MinHash signatures with ZERO shuffles: the
    shingle digests and all ``num_hashes`` running MINs fold row-locally
    inside one projection (``aggregate`` over the shingle positions),
    so the signature stage never exchanges a byte — docs are already one
    row each.  Bit-identical to :func:`minhash_signatures` over
    :func:`char_shingles` (same md5 halves, same Kirsch-Mitzenmacher
    ``h1 + i*h2 mod 2^32`` family, MIN over the same multiset) —
    asserted in ``tests/test_corpus.py``.

    Trade-off vs the explode+groupBy shape, MEASURED at sf0.1: the fold
    runs as an interpreted higher-order function and is ~5x slower than
    the codegen'd explode path (16.6s vs 2.9s), while the exchange it
    removes is tiny (map-side partial MINs shrink the shuffle to
    n_docs x 16 longs).  :func:`minhash_similarity` therefore keeps the
    explode+groupBy shape; this variant exists for exchange-starved
    topologies and as an independent cross-check of the signature
    values."""
    mod = F.lit(1 << 32).cast("long")
    norm = normalized_text(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), norm.alias("nt")).filter(
        F.length("nt") >= k
    )
    shingle_digests = F.expr(
        f"transform(sequence(1, length(nt) - {k - 1}), "
        f"i -> md5(substring(nt, i, {k})))"
    )
    init = F.array_repeat(mod, num_hashes)

    def step(acc, d):
        h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
        return F.transform(
            acc,
            lambda m, i: F.least(m, F.pmod(h1 + i.cast("long") * h2, mod)),
        )

    sig = F.aggregate(shingle_digests, init, step)
    return base.select(
        "doc_id", *[sig[i].alias(f"h{i}") for i in range(num_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Band the signature into `bands` groups of `num_hashes//bands` rows;
    docs sharing any band key become candidate pairs (doc_a < doc_b).

    Scale: the join is per-band-key (self-join on md5 band digest), so
    work is proportional to collisions, not |docs|².  The residual skew
    risk is a HOT BUCKET: one band key shared by B docs yields B²/2
    pairs — a boilerplate page duplicated 10⁶ times would emit 5·10¹¹
    pairs from a single key.  ``max_band_bucket`` drops band keys with
    more than that many members before the self-join (such mega-groups
    are near-certain exact-duplicate clusters, which
    :func:`neardup_skewsafe` handles by collapsing them FIRST and
    keeping the quadratic term symbolic); ``None`` keeps the exact
    all-collisions contract the oracle checks."""
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + i}") for i in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("key"))
        )
    banded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key"))
    return (
        banded_self_join(banded, max_band_bucket)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def banded_self_join(
    banded: DataFrame,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """THE shared LSH candidate-pair shape: hot-bucket-capped self-join
    of a banded table (``doc_id``, ``band``, ``band_key``, plus any
    carried columns) on ``(band, band_key)`` with ``a.doc_id <
    b.doc_id``.  Returns the RAW aliased join — sides ``a``/``b`` — so
    callers project pairs / signature agreement / carried columns
    themselves (:func:`lsh_candidate_pairs`, :func:`minhash_similarity`,
    and the within-corpus gate of
    :func:`..operators.corpus.curated_corpus` all consume it; one
    guarded implementation instead of per-caller inline copies of the
    cap).

    ``max_band_bucket`` drops band keys with more members BEFORE the
    self-join (a B-doc bucket yields B²/2 pairs — the LSH skew
    guard); the bucket-size count rides the same (band, key)
    partitioning the join needs, so the cap adds no extra shuffle.
    ``None`` keeps the exact all-collisions contract."""
    if max_band_bucket is not None:
        if max_band_bucket < 2:
            # a bucket needs >= 2 members to pair at all — a smaller cap
            # silently disables candidate generation entirely
            raise ValueError(
                f"banded_self_join: max_band_bucket must be >= 2, got {max_band_bucket}"
            )
        from pyspark.sql import Window

        # bucket-size count rides the same (band, key) partitioning the
        # self-join needs — no extra shuffle
        n = F.count(F.lit(1)).over(Window.partitionBy("band", "band_key"))
        banded = banded.withColumn("_bn", n).filter(
            F.col("_bn") <= max_band_bucket
        ).drop("_bn")
    a = banded.alias("a")
    b = banded.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )


def _banded_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    num_hashes: int = 16,
    bands: int = 4,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shingle → signature → band explode, signatures carried: one row
    per (doc, band) holding the band join key, ALL signature columns
    (so a downstream join needs no signature-table join-back), and any
    ``carry_cols``.  Shared by the self-join (:func:`minhash_similarity`)
    and bipartite (:func:`neardup_decontaminate`) LSH shapes."""
    sh = char_shingles(
        docs, text_col, id_col, k, dedup_shingles=False, carry_cols=carry_cols
    )
    sig = minhash_signatures(sh, num_hashes, carry_cols=carry_cols)
    rows = num_hashes // bands
    hcols = [f"h{i}" for i in range(num_hashes)]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col(f"h{b * rows + i}") for i in range(rows)])
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return (
        sig.select(
            "doc_id", *hcols, *carry_cols,
            F.explode(F.array(*band_structs)).alias("bk"),
        )
        .select(
            "doc_id", *hcols, *carry_cols,
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("band_key"),
        )
    )


def minhash_similarity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    num_hashes: int = 16,
    bands: int = 4,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """MinHash+LSH near-dup pipeline: shingle → signature → band →
    candidate pairs → estimated Jaccard (fraction of agreeing signature
    rows).

    The signature matrix is CARRIED through the band explode (16 longs
    = ~128 bytes per banded row) so the band self-join emits both sides'
    signatures directly — no join-back to a signature table and, unlike
    the pre-r8 shape, NO persisted intermediate: the expensive shingle
    scan is consumed exactly once and the library leaves no cache behind
    (``spark.catalog.clearCache()`` contract gone).  The duplicate
    candidates a multi-band collision produces are collapsed by the
    final ``distinct`` — est_jaccard and ``carry_cols`` are functions of
    the id pair, so distinct-over-the-row equals distinct-over-the-pair.

    ``carry_cols``: doc-level columns of ``docs`` (e.g. a copy count)
    emitted per pair as ``{c}_a`` / ``{c}_b`` — how
    :func:`neardup_skewsafe` gets its weights without re-consuming its
    canonical table."""
    banded = _banded_signatures(
        docs, text_col, id_col, k, num_hashes, bands, carry_cols
    )
    agree = sum(
        F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        banded_self_join(banded)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(agree / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry_cols],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry_cols],
        )
        .distinct()
    )


def neardup_skewsafe(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Skew-safe near-dup pipeline: collapse EXACT duplicates to one
    canonical document (min id per content hash) BEFORE MinHash+LSH, so
    a page duplicated a million times contributes ONE row to the band
    join instead of a 10¹²-pair hot bucket — the quadratic term stays
    symbolic as ``pair_weight = copies_a × copies_b`` (how many
    underlying doc pairs each canonical pair represents).

    This is the composition a 100 TB corpus actually runs: exact dedup
    is a cheap uniform-key groupBy; near-dup then only sees distinct
    texts, whose band buckets are collision-sized, not popularity-sized.

    Output: (doc_a, doc_b, est_jaccard, copies_a, copies_b,
    pair_weight) over canonical ids.

    The canonical table is consumed exactly ONCE and built in ONE
    shuffle: the exact-collapse groupBy carries a representative text
    with ``first(text)`` — every member of a content-hash group has
    the SAME normalized text, and the downstream shingling normalizes
    again, so any member's raw text is equivalent (map-side partial
    ``first`` means the shuffle ships ~one text per distinct content
    per partition, the same volume the old docs-join-back shipped,
    minus the join's second exchange).  ``n_copies`` then rides the
    near-dup pipeline as a :func:`minhash_similarity` ``carry_col``,
    so the old copies-join-back branches — and the persist that kept
    the content-hash groupBy from replaying per branch (measured then:
    21 shuffles unpersisted vs 10 persisted) — are gone.  The library
    leaves no cache behind; no ``clearCache()`` contract for
    callers."""
    th = F.md5(normalized_text(F.col(text_col)))
    cdocs = docs.groupBy(th.alias("th")).agg(
        F.min(F.col(id_col)).alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.first(F.col(text_col)).alias("text"),
    )
    sim = minhash_similarity(
        cdocs.select("doc_id", "n_copies", "text"),
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        carry_cols=("n_copies",),
    )
    return sim.select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        F.col("n_copies_a").alias("copies_a"),
        F.col("n_copies_b").alias("copies_b"),
        (F.col("n_copies_a") * F.col("n_copies_b")).cast("long").alias("pair_weight"),
    )


def neardup_decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """NEAR-duplicate decontamination of a training corpus against an
    eval/benchmark split (Lee et al. 2022 §6: test-set passages leak
    into web corpora in paraphrased/partial form the exact n-gram
    check misses): MinHash signatures for both sides, and a BIPARTITE
    LSH band join — train rows probe eval band buckets, never each
    other — scoring est_jaccard from the carried signatures.

    Output: one row per TRAIN doc (coverage-complete):
    ``(train_doc_id, n_eval_matches, max_est_jaccard, contaminated)``
    where matches are distinct eval docs sharing any band.

    Scale — the key asymmetry: eval sets are FIXED-SIZE (thousands of
    docs) while the corpus is 100 TB, so the eval side's banded
    signatures BROADCAST and the training side is never shuffled by
    band at all — decontamination degenerates to a map-side hash probe
    over the corpus scan, one doc_id rollup, nothing quadratic.  Same
    signature family as :func:`minhash_similarity`, so the DuckDB
    oracle replays both sides bit-exactly."""
    tb = _banded_signatures(train_docs, text_col, id_col, k, num_hashes, bands)
    eb = _banded_signatures(eval_docs, text_col, id_col, k, num_hashes, bands)
    t, e = tb.alias("t"), eb.alias("e")
    agree = sum(
        F.when(F.col(f"t.h{i}") == F.col(f"e.h{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    scored = (
        t.join(
            F.broadcast(e),
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.band_key") == F.col("e.band_key")),
        )
        .select(
            F.col("t.doc_id").alias("train_doc_id"),
            F.col("e.doc_id").alias("eval_doc_id"),
            F.round(agree / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
        )
        .distinct()
    )
    prof = scored.groupBy("train_doc_id").agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("est_jaccard").alias("max_est_jaccard"),
    )
    return (
        train_docs.select(F.col(id_col).alias("train_doc_id"))
        .distinct()
        .join(prof, "train_doc_id", "left")
        .select(
            "train_doc_id",
            F.coalesce("n_eval_matches", F.lit(0).cast("long")).alias(
                "n_eval_matches"
            ),
            F.coalesce("max_est_jaccard", F.lit(0.0)).alias("max_est_jaccard"),
            F.coalesce(
                F.col("max_est_jaccard") >= threshold, F.lit(False)
            ).alias("contaminated"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage after
    LSH): |A∩B| via shingle co-join, |A∪B| = |A|+|B|−|A∩B|."""
    sh = char_shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        candidate_pairs.join(a, candidate_pairs.doc_a == F.col("a.doc_id"))
        .join(
            b,
            (candidate_pairs.doc_b == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("n_shingles", "n_a"), inter.doc_a == sizes.doc_id)
        .drop("doc_id")
        .join(
            sizes.withColumnRenamed("n_shingles", "n_b").withColumnRenamed("doc_id", "doc_id_b"),
            F.col("doc_b") == F.col("doc_id_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def shingle_containment_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    subsume_threshold: float = 0.9,
) -> DataFrame:
    """Containment verification for candidate pairs (Broder 1997's
    second resemblance measure): ``|A∩B| / min(|A|, |B|)`` over the
    k-shingle sets.  Jaccard misses SUBSUMED documents — a short doc
    fully contained in a much longer one scores a low union-normalized
    Jaccard but containment ≈ 1 — which is exactly the quote/excerpt/
    wrapper-page duplication pattern corpus dedup needs to catch.
    Emits both measures plus which doc is the contained one
    (``contained_doc`` = the smaller shingle set, NULL when below
    ``subsume_threshold``).

    Scale: identical profile to :func:`ngram_jaccard_pairs` — the exact
    shingle co-join is paid only on the (sub-quadratic) candidate set,
    sizes come from one shingle aggregation, everything keyed on doc
    ids or 8-char shingles (uniform)."""
    sh = char_shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        candidate_pairs.join(a, candidate_pairs.doc_a == F.col("a.doc_id"))
        .join(
            b,
            (candidate_pairs.doc_b == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    containment = F.col("n_common") / F.least("n_a", "n_b").cast("double")
    jaccard = F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(jaccard, 6).alias("jaccard"),
            F.round(containment, 6).alias("containment"),
            F.when(
                containment >= subsume_threshold,
                F.when(F.col("n_a") <= F.col("n_b"), F.col("doc_a")).otherwise(
                    F.col("doc_b")
                ),
            ).alias("contained_doc"),
        )
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """Per-doc SimHash over whitespace tokens using portable md5-derived
    bit planes: bit_j = sign(Σ_tokens (md5_bit_j ? +1 : −1)).

    Implemented as explode(tokens) → per-(doc,bit) vote sum → bit assembly;
    two shuffles, both on doc_id (co-partitioned)."""
    from ..functions.text import tokens

    tok = (
        _parallelize_scan(docs)
        .select(F.col(id_col).alias("doc_id"), tokens(F.lower(F.col(text_col))).alias("toks"))
        .select("doc_id", F.explode("toks").alias("token"))
    )
    # md5 hex → first `bits` bits via conv(hex_slice, 16, 10); 8 hex chars
    # per 32-bit word keeps conv inside long range.
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
    votes = tok.select("doc_id", h.alias("hv"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = votes.groupBy("doc_id").agg(*bit_aggs)
    sim = sum(
        F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    )
    return per_doc.select("doc_id", sim.alias("simhash"))


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id),
    cluster_id = min doc_id reachable (singletons cluster with themselves).

    This turns pairwise near-dup evidence into dedup *decisions*: one
    canonical doc per cluster (the min id), everything else a removable
    duplicate — the last stage of a MinHash/LSH dedup pipeline.

    Scale: the pair list is usually TINY relative to the corpus (LSH
    collisions only), so when it fits ``driver_edge_threshold`` rows the
    components resolve with one collect + union-find on the driver
    (exact same min-label result, zero iterative Spark jobs — the
    one-collect BPE-trainer precedent; 1M bigint edges ≈ 16 MB).  The
    row budget auto-shrinks 8x for non-integral id types (URL/hash
    string ids carry ~8-16x the bytes per row), and the probe counts
    BEFORE it collects, so the over-threshold case ships zero rows to
    the driver whatever the id width.  Above the
    threshold: iterative min-label propagation, the standard distributed
    CC, restricted to EDGE-TOUCHED vertices only — documents in no
    candidate pair never enter the loop and are stitched back as their
    own singleton cluster with one final left join, so per-round shuffle
    is ∝ |pair endpoints|, not |corpus|.  Each round is one join +
    groupBy on the edge list; change detection rides the checkpointed
    round result (a ``_chg`` column counted off the materialized RDD —
    no extra old-vs-new join).  Rounds needed ∝ the longest path in a
    component (tiny dense clusters → a handful); ``localCheckpoint``
    truncates lineage every round; early-exits when no label changes.
    The two paths are bit-equality-asserted against each other in
    ``tests/test_corpus.py``.
    """
    if driver_edge_threshold:
        # persist BEFORE probing: if the threshold is exceeded, the
        # distributed loop below reuses whatever partitions the probe
        # already materialized instead of recomputing the (expensive)
        # candidate-pair plan from scratch
        from pyspark.storagelevel import StorageLevel

        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        # The threshold is a ROW budget sized for ~16 MB of bigint pairs;
        # wide ids (URL/hash strings) carry ~8-16x more bytes per row, so
        # shrink the budget for non-integral id types to keep the driver
        # probe bounded regardless of id width.
        id_type = docs.schema[id_col].dataType.simpleString()
        narrow = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
        eff_threshold = (
            driver_edge_threshold
            if id_type in narrow
            else max(1, driver_edge_threshold // 8)
        )
        probe = pairs.select("doc_a", "doc_b").limit(eff_threshold + 1)
        # count first — the over-threshold case decides WITHOUT shipping a
        # single pair row to the driver; the under-threshold collect then
        # reads the partitions the count already cached
        head = probe.collect() if probe.count() <= eff_threshold else None
    else:
        head = None
        eff_threshold = 0
    if head is not None and len(head) <= eff_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in head:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN label: a root is always its component's min
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(x, find(x)) for x in parent]
        # id type follows the input (the distributed path is generic too)
        id_type = docs.schema[id_col].dataType.simpleString()
        labels_df = docs.sparkSession.createDataFrame(
            rows, schema=f"doc_id {id_type}, cluster_id {id_type}"
        ) if rows else None
        pairs.unpersist()  # labels live in driver memory now
        base = docs.select(F.col(id_col).alias("doc_id"))
        if labels_df is None:
            return base.select("doc_id", F.col("doc_id").alias("cluster_id"))
        return base.join(F.broadcast(labels_df), "doc_id", "left").select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    if driver_edge_threshold:
        # the labels checkpoint just scanned (and cached) every edges
        # partition — the probe cache would only double-cache the same
        # edge set for the whole CC loop; drop it now
        pairs.unpersist()
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        folded = F.least(
            labels.cluster_id, F.coalesce(F.col("nbr_min"), labels.cluster_id)
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.dst, "left")
            .select(
                labels.doc_id,
                folded.alias("cluster_id"),
                (folded != labels.cluster_id).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    edges.unpersist()
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )


def dedup_corpus(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply cluster decisions to the corpus: every doc tagged with its
    cluster and an ``is_canonical`` flag (true for the cluster's min id).
    Filtering ``is_canonical`` yields the deduplicated corpus."""
    return docs.join(clusters, on=id_col).withColumn(
        "is_canonical", (F.col(id_col) == F.col("cluster_id"))
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    window: int = 8,
) -> DataFrame:
    """Winnowing fingerprint selection (the MOSS algorithm; Schleimer,
    Wilkerson & Aiken, SIGMOD 2003): hash every character k-gram of the
    normalized text, then keep the MINIMUM hash of each ``window``
    consecutive k-gram hashes.  Emits (doc_id, fingerprint) with the
    per-doc distinct selected hashes.

    Guarantee (why winnowing beats stride sampling, cf.
    :func:`duplicate_spans`): any substring shared between two documents
    of length >= k + window - 1 produces at least one IDENTICAL selected
    fingerprint in both — detection is certain, not probabilistic —
    while only ~2/(window+1) of positions are kept.

    Scale: ENTIRELY row-local selection — no per-character shuffle.
    The k-gram hash array is materialized ONCE behind a Generate
    barrier (``explode(array(transform(...)))``): CollapseProject
    cannot inline a producer expression through a Generate, so the
    consumer lambda below references a real attribute instead of
    re-evaluating every md5 per window position (the naive collapsed
    form measured 27x slower — Catalyst lambdas do no loop-invariant
    hoisting).  Sliding minima are then a row-local
    ``transform(j -> least(hs[j..j+w-1]))`` (a least-chain, no
    per-position slice allocation) followed by a row-local
    ``array_distinct``, so the ONLY shuffle in the whole operator is
    the final DISTINCT over the ~2/(window+1) selected
    fingerprint-sized rows — previously this was a
    Window.partitionBy(doc) sort shuffle of one 16+-byte row PER
    CHARACTER of corpus, a >=10x-corpus-bytes exchange at 100 TB.
    The scan-parallelism guard redistributes the (doc_id, text)
    projection round-robin only when the incoming plan has fewer
    partitions than the session's parallelism (single small local
    file); with a real multi-file corpus the scan is already parallel
    and the guard is a no-op.  Hashes are md5-u32s, bit-reproducible
    in the DuckDB oracle."""
    norm = normalized_text(F.col(text_col))
    min_len = k + window - 1
    base = (
        _parallelize_scan(docs)
        .select(F.col(id_col).alias("doc_id"), norm.alias("nt"))
        .filter(F.length("nt") >= min_len)
    )
    hashed = base.select(
        "doc_id",
        F.explode(
            F.array(
                F.expr(
                    f"transform(sequence(1, length(nt) - {k - 1}), "
                    f"i -> cast(conv(substring(md5(substring(nt, i, {k})), 1, 8), "
                    f"16, 10) as bigint))"
                )
            )
        ).alias("hs"),
    )
    if window == 1:  # degenerate: every k-gram hash is selected
        mins = "array_distinct(hs)"
    else:
        least_chain = ", ".join(f"element_at(hs, j + {d})" for d in range(window))
        mins = (
            f"array_distinct(transform(sequence(1, size(hs) - {window - 1}), "
            f"j -> least({least_chain})))"
        )
    return (
        hashed.select(
            "doc_id",
            F.explode(F.expr(mins)).alias("fingerprint"),
        )
        .distinct()
    )


def winnow_span_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    window: int = 8,
) -> DataFrame:
    """Per-document shared-span profile over winnowing fingerprints:
    how many of a doc's selected fingerprints also appear in another
    document (certain detection of any shared run >= k+window-1 chars).
    One row per doc_id (zero-filled for docs too short to fingerprint).

    Scale: the fingerprint table is consumed in ONE pass — per-print
    doc counts come from a ``count() over (partition by fingerprint)``
    window instead of the old aggregate-then-join-back shape (the rows
    are distinct per (doc, fingerprint), so the partition row count IS
    the distinct-doc count), so the expensive winnowing scan runs once
    with no persisted intermediate and the library leaves no cache
    behind.  Same two shuffles as before (fingerprint, then doc_id);
    the coverage base is the distinct id set (cheap, same join key)."""
    from pyspark.sql import Window

    fp = winnow_fingerprints(docs, text_col, id_col, k, window)
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
    prof = (
        fp.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.count(F.when(F.col("n_docs") > 1, 1)).alias("n_shared"),
        )
    )
    frac = F.col("n_shared").cast("double") / F.col("n_fingerprints")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(prof, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_fingerprints", F.lit(0).cast("long")).alias(
                "n_fingerprints"
            ),
            F.coalesce("n_shared", F.lit(0).cast("long")).alias("n_shared"),
            F.round(frac, 6).alias("shared_fraction"),
            F.coalesce(frac >= 0.5, F.lit(False)).alias("mostly_shared"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    window: int = 50,
    stride: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-duplication profile (the ExactSubstr dedup signal,
    "Deduplicating Training Data Makes Language Models Better"): slide a
    ``window``-char window every ``stride`` chars over the normalized
    text, hash each window, and flag windows whose hash occurs in MORE
    THAN ONE document.  Per doc: sampled window count, how many are
    cross-doc duplicated, and the duplicated fraction — the gate for
    "this doc is largely copied prose" that near-dup (whole-doc) signals
    miss when only a long passage is shared.

    Docs shorter than ``window`` (after normalization) still get a row —
    ``n_windows = 0``, NULL ``dup_fraction``, ``mostly_duplicated``
    false — so downstream coverage joins never silently lose them.

    Scale: windows are built row-locally then exploded (narrow); the
    ONLY shuffle is the (hash → distinct-doc count) aggregation, and the
    join back rides the same hash partitioning (AQE reuse).  Stride
    trades recall for cost exactly like winnowing; md5 collisions at
    128 bits are negligible."""
    norm = normalized_text(F.col(text_col))
    win = (
        _parallelize_scan(docs)
        .select(F.col(id_col).alias("doc_id"), norm.alias("nt"))
        .filter(F.length("nt") >= window)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(nt) - {window - 1}, {stride}),"
                    f" i -> md5(substring(nt, i, {window})))"
                )
            ).alias("h"),
        )
    )
    cross = (
        win.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
    profile = (
        win.join(cross, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count(F.col("n_docs")).alias("n_dup_windows"),
        )
    )
    frac = F.col("n_dup_windows").cast("double") / F.col("n_windows")
    # distinct coverage base: preserves the one-row-per-doc_id output
    # contract even if ids repeat in the input (rides the same join
    # partitioning, so the distinct is cheap)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(profile, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0).cast("long")).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0).cast("long")).alias(
                "n_dup_windows"
            ),
            F.round(frac, 6).alias("dup_fraction"),
            F.coalesce(frac >= 0.5, F.lit(False)).alias("mostly_duplicated"),
        )
    )

def remove_duplicate_blocks(
    docs: DataFrame,
    block: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring dedup REMOVAL — the acting counterpart of
    :func:`duplicate_spans`' profile (the ExactSubstr idea of
    "Deduplicating Training Data Makes Language Models Better",
    restricted to a NON-OVERLAPPING ``block``-char tiling so removal
    needs no interval merging): tile the normalized text, drop every
    tile whose exact content occurs in MORE THAN ONE document, and
    reassemble the survivors in document order.  Boilerplate passages
    shared across pages disappear while unique prose survives.

    Output per doc: ``n_blocks``, ``n_dup_blocks``, the reassembled
    ``clean_text``, its length, and ``clean_hash`` (md5 of the clean
    text — what the SQL oracle compares, full text being impractical to
    hash-diff by eye).  Docs too short to tile (empty normalized text)
    keep a zero row with an empty clean text.

    Scale: tiles build row-locally and explode as 32-byte HASHES only
    (narrow); the wide stages are the tile-hash → distinct-doc count
    (row-locally deduped, map-side combined), a per-doc rollup of
    flagged POSITIONS (ints — never tile text), and ONE doc-level join
    of those position sets back to the corpus rows, where the
    surviving text reassembles row-locally from the doc's own tiling.
    Tile text itself never crosses an exchange (the pre-r13 shape
    shuffled every tile string through a join and a collect_list
    rebuild — two corpus-sized shuffles).  The branches re-derive the
    tiling from the (pruned) corpus scan instead of sharing a persisted
    tile table: the tiling is row-local and md5-per-50-chars cheap,
    while a cached tile table is CORPUS-SIZED TEXT — at 100 TB a
    second column-pruned parquet scan beats materializing 60 TB of
    cache (and long-lived sessions no longer need a ``clearCache()``
    contract; see :func:`...session.cache_scope` for operators that do
    cache).
    The tiling trade-off vs true suffix-array ExactSubstr: a
    duplicated passage is only removed where tile boundaries align,
    which the profile's strided windows (:func:`duplicate_spans`)
    quantify and :func:`remove_duplicate_blocks_overlap` halves.

    Determinism caveat (standard Spark recomputation rule): because the
    dup-count and reassembly branches re-derive the tiling from the
    input plan independently, ``docs`` must be DETERMINISTIC — a plan
    containing ``sample``/``limit``/shuffle-order-dependent ids can
    present divergent corpora to the two branches; checkpoint or persist
    such inputs upstream first."""
    norm = normalized_text(F.col(text_col))
    base = _parallelize_scan(docs).select(
        F.col(id_col).alias("doc_id"), norm.alias("nt")
    )
    nonempty = base.filter(F.length("nt") >= 1)
    tile_hashes = F.expr(
        f"transform(sequence(1, length(nt), {block}), "
        f"i -> md5(substring(nt, i, {block})))"
    )
    # a tile is duplicated when its content occurs in MORE THAN ONE doc:
    # row-local dedup -> count(*) IS the distinct-doc count
    dup = (
        nonempty.select(F.explode(F.array_distinct(tile_hashes)).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("h")
    )
    drops = (
        nonempty.select("doc_id", F.posexplode(tile_hashes).alias("pos", "h"))
        .join(dup, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("ps"))
    )
    # one row per input row straight off base: empty-normalized docs
    # take the empty-tiling arm inline (zero row, empty clean text)
    return (
        base.join(drops, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN nt IS NULL OR length(nt) < 1 THEN array() "
                f"ELSE transform(sequence(1, length(nt), {block}), "
                f"i -> substring(nt, i, {block})) END"
            ).alias("tiles"),
            F.coalesce("ps", F.expr("array()")).alias("ps"),
        )
        .select(
            "doc_id",
            F.size("tiles").cast("long").alias("n_blocks"),
            F.size("ps").cast("long").alias("n_dup_blocks"),
            F.expr(
                "concat_ws('', filter(tiles, (x, i) -> NOT array_contains(ps, i)))"
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_dup_blocks",
            "clean_text",
            F.length("clean_text").cast("long").alias("clean_len"),
            F.md5("clean_text").alias("clean_hash"),
        )
    )


def window_hashes(
    docs: DataFrame,
    block: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ExactSubstr gate's FROZEN CORPUS STATE: the DISTINCT md5
    hashes of every ``block``-char window at stride ``block/2`` of the
    normalized corpus text — one ``h`` column.  An incremental batch
    cut against this set (:func:`remove_duplicate_blocks_overlap`
    ``known_hashes``) removes any batch passage that already exists
    ANYWHERE in the corpus, even once: a single corpus occurrence plus
    the batch copy IS a duplicate.  Persist it as its own compacted
    lakehouse artifact at corpus-build time (32-byte uniform keys,
    ~2 rows per block of corpus text)."""
    if block < 2 or block % 2 != 0:
        raise ValueError(
            f"window_hashes: block must be an even int >= 2, got {block}"
        )
    hb = block // 2
    norm = normalized_text(F.col(text_col))
    return (
        _parallelize_scan(docs)
        .select(norm.alias("nt"))
        .filter(F.length("nt") >= 1)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(nt), {hb}), "
                    f"i -> md5(substring(nt, i, {block})))"
                )
            ).alias("h")
        )
        .distinct()
    )


def remove_duplicate_blocks_overlap(
    docs: DataFrame,
    block: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    known_hashes: DataFrame | None = None,
) -> DataFrame:
    """Two-phase ExactSubstr block removal — closes (half of) the
    boundary-straddle blind spot of :func:`remove_duplicate_blocks`
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): the single-phase tiling only removes a duplicated
    passage where it happens to contain a whole aligned tile, so a
    passage shorter than ``2·block−1`` chars can straddle a boundary
    and survive.  Here the detector scans ``block``-char windows at
    stride ``block/2`` — phase A (offset 0) plus phase B (offset
    block/2) — and a phase-A tile is dropped when ANY duplicated
    window overlaps it, so the guaranteed-detection length falls from
    ``2·block−1`` to ``1.5·block`` (straddle windows align at the
    half-tile).  Removal granularity stays whole phase-A tiles (no
    interval merging); a duplicated straddling window therefore drops
    BOTH tiles it touches — slightly more aggressive removal in
    exchange for the recall.

    Output schema identical to :func:`remove_duplicate_blocks`
    (``n_dup_blocks`` = tiles dropped, which the two-phase flagging
    makes a superset of the single-phase count on the same corpus —
    asserted in tests).

    Scale: windows explode row-locally at 2× the single-phase tile
    count (still narrow); the wide stages are the window-hash count
    (32-byte uniform keys, map-side combined), a doc-sized
    dropped-index ``collect_set`` (indices only, bounded by
    chars/block per doc), and ONE corpus-text shuffle joining those
    index sets back to the documents — where the surviving text is
    reassembled ROW-LOCALLY from the doc's own tiling (no
    tile-level reassembly shuffle, unlike the single-phase shape).

    The normalized text is computed ONCE behind a lazy lineage cut and
    both the detector and reassembly branches read the materialized
    form, so the operator is deterministic regardless of the input
    plan (the pre-r13 shape re-derived the normalization per branch
    and required a deterministic upstream).

    ``known_hashes`` FREEZES the detector state: instead of mining
    cross-document duplicated windows within ``docs``, a window is
    flagged when its hash exists in the given one-column ``h`` table
    (:func:`window_hashes` of the shipped corpus) — the
    incremental-admission posture, where a batch passage that already
    exists anywhere in the corpus is cut from the batch copy."""
    if block < 2 or block % 2 != 0:
        # block=1 would make the stride-hb sequence step 0; any odd block
        # breaks the window→tile index mapping (the j*hb arithmetic below
        # assumes 2*hb == block) and silently drops the wrong tiles.
        raise ValueError(
            f"remove_duplicate_blocks_overlap: block must be an even int >= 2, got {block}"
        )
    hb = block // 2
    norm = normalized_text(F.col(text_col))
    base = _parallelize_scan(docs).select(
        F.col(id_col).alias("doc_id"), norm.alias("nt")
    )
    if not base.isStreaming:
        # ONE normalization pass feeds both the window detector and the
        # tile reassembly (and, in mining mode, the duplicate counter):
        # the lazy cut materializes it once per action and makes the
        # branches read identical bits by construction
        base = base.localCheckpoint(eager=False)
    nonempty = base.filter(F.length("nt") >= 1)
    wins = nonempty.select(
        "doc_id",
        F.length("nt").alias("ln"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(nt), {hb}), "
                f"i -> md5(substring(nt, i, {block})))"
            )
        ).alias("j", "h"),
    )
    if known_hashes is not None:
        dup = known_hashes.select("h")
    else:
        # ROW-LOCALLY deduped windows per doc -> count(*) IS the
        # distinct-doc count: one map-side-combined shuffle of partial
        # counts instead of count_distinct's (h, doc_id) pair shuffle
        dup = (
            nonempty.select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"array_distinct(transform(sequence(1, length(nt), {hb}), "
                        f"i -> md5(substring(nt, i, {block}))))"
                    )
                ).alias("h"),
            )
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > 1)
            .select("h")
        )
    flagged = wins.join(dup, "h", "left_semi")
    # window j starts at char j*hb (0-based): it always overlaps tile
    # j div 2; an odd-j (half-aligned) window also overlaps the next
    # tile iff it extends past that tile's start, i.e. ln > (j+1)*hb
    dropped = flagged.select(
        "doc_id",
        F.explode(
            F.expr(
                f"filter(array(CAST(j DIV 2 AS BIGINT), "
                f"CASE WHEN j % 2 = 1 AND ln > (j + 1) * {hb} "
                f"THEN CAST((j + 1) DIV 2 AS BIGINT) END), "
                f"x -> x IS NOT NULL)"
            )
        ).alias("t"),
    )
    drops = dropped.groupBy("doc_id").agg(F.collect_set("t").alias("ts"))
    # the reassembly keeps ONE ROW PER INPUT ROW straight off base —
    # empty/NULL-normalized docs (which the window branches skip) take
    # the empty-tiling arm inline, so no distinct-id frame and no
    # corpus-text re-join is needed to restore their zero rows
    return (
        base.join(drops, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN nt IS NULL OR length(nt) < 1 THEN array() "
                f"ELSE transform(sequence(1, length(nt), {block}), "
                f"i -> substring(nt, i, {block})) END"
            ).alias("tiles"),
            F.coalesce("ts", F.expr("array()")).alias("ts"),
        )
        .select(
            "doc_id",
            F.size("tiles").cast("long").alias("n_blocks"),
            F.expr(
                "concat_ws('', filter(tiles, "
                "(x, i) -> NOT array_contains(ts, CAST(i AS BIGINT))))"
            ).alias("clean_text"),
            F.size("ts").cast("long").alias("n_dup_blocks"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_dup_blocks",
            "clean_text",
            F.length("clean_text").cast("long").alias("clean_len"),
            F.md5("clean_text").alias("clean_hash"),
        )
    )
