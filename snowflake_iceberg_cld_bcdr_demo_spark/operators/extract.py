"""Text extraction for raw web-ish corpora: HTML → clean text and
template/boilerplate detection.

The reference corpus (`/root/reference/scripts/03_load_iceberg_aws.py`
documents table loads) assumes pre-cleaned text; a real 100 TB training
pipeline starts one step earlier, at markup-laden crawl output.  Both
operators here are pure built-in column expressions (regexp_replace /
array ops) — zero Python in the row path, fully inside whole-stage
codegen, and narrow until the single aggregation each needs.

Regex dialect note: every pattern is written in the RE2-compatible
subset (no backreferences, no lookaround) so the DuckDB oracle runs the
byte-identical expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decode order: named entities first, ``&amp;`` LAST — the standard
#: single-pass decode (``&amp;lt;`` → ``&lt;`` as text, not ``<``).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(html: Column) -> Column:
    """Strip HTML to whitespace-normalized text: drop script/style/comment
    blocks (content included), drop tags, decode the common entities,
    collapse whitespace.  A deterministic, heuristic extractor — the
    trafilatura/jusText role in a pipeline, expressed as five
    ``regexp_replace`` passes that Catalyst fuses into one projection."""
    s = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        s = F.regexp_replace(s, ent, ch)
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def html_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document extraction record: cleaned text plus audit counts
    (markup size, tags and entities removed) — the columns a crawl-
    ingest job persists so downstream quality filters can gate on
    markup density."""
    html = F.col(html_col)
    clean = html_to_text(html)
    return df.select(
        id_col,
        clean.alias("clean_text"),
        F.length(html).alias("html_chars"),
        F.length(clean).alias("text_chars"),
        F.regexp_count(html, F.lit(r"<[^>]*>")).alias("n_tags"),
        F.regexp_count(html, F.lit(r"&(amp|lt|gt|quot|nbsp|#39);")).alias(
            "n_entities"
        ),
    )


def boilerplate_share(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Template/boilerplate detection (the CCNet shared-line idea lifted
    to word ``n``-grams, since crawl 'lines' don't survive text
    normalization): an n-gram is boilerplate within a source when it
    appears in at least ``min_docs`` distinct documents of that source;
    each document reports what fraction of its distinct n-grams are
    boilerplate — headers, navigation, legal footers score high.

    Scale: grams are deduped ROW-LOCALLY (``array_distinct`` before the
    explode, so rows are unique per (doc, gram) and a plain ``count()
    over (partition by source, gram)`` window IS the distinct-doc count
    — no countDistinct expand, no aggregate-then-join-back: the gram
    table is consumed in ONE pass, r8's winnow rewrite applied here),
    then the doc rollup is O(docs)."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"\S+"), 0
    ).alias("_toks")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_toks")) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("_toks"), i + j) for j in range(n)]
            ),
        )
    )
    from .dedup import _parallelize_scan

    grams = (
        _parallelize_scan(docs)
        .select(id_col, group_col, toks)
        .filter(F.size("_toks") >= n)
        .select(id_col, group_col, F.explode(grams_arr).alias("gram"))
    )
    from pyspark.sql import Window

    n_docs = F.count(F.lit(1)).over(Window.partitionBy(group_col, "gram"))
    ratio = F.col("n_boiler").cast("double") / F.col("n_grams")
    return (
        grams.withColumn("n_docs", n_docs)
        .groupBy(id_col, group_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("n_docs") >= min_docs).cast("long")).alias("n_boiler"),
        )
        .select(
            id_col,
            group_col,
            "n_grams",
            "n_boiler",
            ratio.alias("boiler_ratio"),
            (ratio >= 0.5).alias("is_templated"),
        )
    )


def boilerplate_grams(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """The boilerplate gate's FROZEN CORPUS STATE: the ``(source, gram)``
    table of word n-grams appearing in at least ``min_docs`` distinct
    documents of the same source — exactly the set
    :func:`remove_boilerplate_ngrams` mines internally, exported so an
    incremental batch can be cleaned against the gram table of the
    build that shipped the corpus (persist it as its own lakehouse
    artifact at corpus-build time; pass it back via the ``grams``
    parameter).  One (source, gram) map-side-combined count over
    row-locally deduped grams."""
    from .dedup import _parallelize_scan

    toks_col = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"\S+"), 0
    ).alias("t")
    base = _parallelize_scan(docs).select(
        F.col(group_col).alias("source"), toks_col
    )
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(F.col("t"), i + j) for j in range(n)]
    )
    grams_arr = F.transform(F.sequence(F.lit(1), F.size("t") - (n - 1)), gram)
    return (
        base.filter(F.size("t") >= n)
        .select("source", F.explode(F.array_distinct(grams_arr)).alias("gram"))
        .groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("source", "gram")
    )


def remove_boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    grams: DataFrame | None = None,
) -> DataFrame:
    """ACTING counterpart of :func:`boilerplate_share` (the
    CCNet/RefinedWeb boilerplate-removal step, not just its profile):
    every token covered by a boilerplate word n-gram — one appearing in
    at least ``min_docs`` distinct documents of the same source — is
    dropped, and the surviving tokens are reassembled in order.
    Navigation menus, legal footers, and shared headers disappear from
    every document at once while unique prose survives.

    Output per doc: ``(id, n_tokens, n_dropped_tokens, clean_text,
    clean_hash)``; ``clean_text`` is in NORMALIZED token form
    (lowercased, single-spaced — the same canonicalization the dedup
    family uses).  Docs with fewer than ``n`` tokens pass through
    normalized but untouched; empty docs keep a zero row.

    Scale: three wide stages, none quadratic — (1) the (source, gram)
    frequency count over ROW-LOCALLY deduped grams (count(*) IS the
    distinct-doc count, no countDistinct expand), (2) the flagged-gram
    join back to positioned grams on the same (source, gram) key
    (each hit explodes to its n covered token positions), and (3) a
    per-doc rollup of covered POSITIONS ONLY (a set of ints — never
    the tokens) joined back to the token arrays at doc granularity;
    the reassembly itself is a row-local array ``filter`` keeping
    uncovered positions in order.  The corpus text crosses exactly one
    exchange (the doc-level join); tokens are never exploded into rows
    (the r12 shape shuffled every token twice — once into the
    coverage join and once into a collect_list rebuild).

    ``grams`` FREEZES the gram state: a ``(source, gram)`` table (from
    :func:`boilerplate_grams` at corpus-build time) is used instead of
    mining this corpus — the incremental-admission posture, where a
    daily batch is cleaned against the boilerplate set of the build
    that shipped the corpus (``min_docs`` is then the state producer's
    concern and ignored here)."""
    from .dedup import _parallelize_scan

    toks_col = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"\S+"), 0
    ).alias("t")
    base = _parallelize_scan(docs).select(
        F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp"), toks_col
    )
    if not base.isStreaming:
        # the token arrays feed THREE plan branches (gram counting, gram
        # positioning, reassembly); a lazy lineage cut materializes the
        # tokenization once per action instead of re-running the regexp
        # scan — and everything upstream of it — per branch
        base = base.localCheckpoint(eager=False)
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(F.col("t"), i + j) for j in range(n)]
    )
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size("t") - (n - 1)), gram
    )
    if grams is not None:
        boiler = grams.select(F.col("source").alias("grp"), "gram")
    else:
        # counting side: row-local dedup -> count(*) per (source, gram)
        # is the distinct-doc count (boilerplate_share's trick)
        counts = (
            base.filter(F.size("t") >= n)
            .select("grp", F.explode(F.array_distinct(grams_arr)).alias("gram"))
            .groupBy("grp", "gram")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        boiler = counts.filter(F.col("n_docs") >= min_docs).select("grp", "gram")
    # marking side: positioned grams (1-based start) joined to the
    # boilerplate set; each hit covers token positions [pos, pos+n)
    gp = (
        base.filter(F.size("t") >= n)
        .select("doc_id", "grp", F.posexplode(grams_arr).alias("p0", "gram"))
        .select("doc_id", "grp", (F.col("p0") + 1).alias("pos"), "gram")
    )
    # covered POSITIONS rolled up per doc — the shuffle carries only
    # (doc_id, int-set), never tokens; collect_set dedups overlapping
    # gram hits exactly like the former (doc, position) distinct
    covered = (
        gp.join(boiler, ["grp", "gram"])
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("cpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("cpos").alias("cps"))
    )
    # doc-level join back to the token arrays (the ONE exchange the
    # corpus text crosses), then a row-local positional filter rebuild:
    # token at 1-based position p survives iff p is not covered
    cps = F.coalesce(F.col("cps"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("t"), lambda tok, i: ~F.array_contains(cps, i + F.lit(1))
    )
    return base.join(covered, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.size("t"), F.lit(0)).cast("long").alias("n_tokens"),
        F.size(cps).cast("long").alias("n_dropped_tokens"),
        F.concat_ws(" ", kept).alias("clean_text"),
        F.md5(F.concat_ws(" ", kept)).alias("clean_hash"),
    )
