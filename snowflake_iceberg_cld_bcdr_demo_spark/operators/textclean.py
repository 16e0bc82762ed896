"""Unicode hygiene and compression-based quality signals for raw text.

Crawl text arrives in mixed normalization forms (decomposed accents,
control characters, exotic whitespace); training corpora standardize on
NFC + printable before anything downstream hashes or tokenizes —
otherwise visually-identical documents dedup as distinct.

Spark has no NFC builtin, so :func:`unicode_clean` is the repo's one
legitimately Python-core text op — Arrow-batched ``mapInPandas``
(vectorized transfer, no row-at-a-time UDF), with the DuckDB
``nfc_normalize`` oracle confirming the normalization agrees across
engines byte-for-byte.  :func:`compression_signals` (zlib ratio +
character entropy) is the classic cheap junk detector: boilerplate and
generated spam compress far better than natural prose, binary-ish noise
far worse.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: control characters stripped AFTER NFC normalization (C0 except \t \n,
#: plus DEL) — the same class the oracle strips with a regex
_CTRL_RE = r"[\x00-\x08\x0B-\x1F\x7F]"


def unicode_clean(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """NFC-normalize, strip control characters, collapse whitespace —
    with audit columns (chars before/after, whether normalization
    changed anything).

    Scale: one Arrow-batched narrow stage (``mapInPandas``); zero
    shuffles; the Python cost is a vectorized ``str`` pass per batch."""
    import re
    import unicodedata

    ctrl = re.compile(_CTRL_RE)
    ws = re.compile(r"\s+")

    def clean_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf[text_col].fillna("")
            nfc = raw.map(lambda s: unicodedata.normalize("NFC", s))
            cleaned = nfc.map(
                lambda s: ws.sub(" ", ctrl.sub(" ", s)).strip()
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "clean_text": cleaned,
                    "n_chars_raw": raw.str.len().astype("int64"),
                    "n_chars_clean": cleaned.str.len().astype("int64"),
                    "was_denormalized": (nfc != raw),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        clean_batches,
        schema=(
            f"{id_col} long, clean_text string, n_chars_raw long, "
            "n_chars_clean long, was_denormalized boolean"
        ),
    )


def compression_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document zlib compression ratio and character entropy — the
    cheap junk detectors (RefinedWeb/Gopher-style): templated or
    repetitive text compresses unusually well (low ratio), random noise
    unusually badly (ratio near 1, entropy high); natural prose sits in
    a stable band.

    Scale: Arrow-batched narrow stage, zero shuffles.  Rows-only by
    design (zlib has no SQL twin); semantics are unit-tested against
    hand-computed values."""
    import math
    import zlib

    def signal_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf[text_col].fillna("")

            def ratio(s: str) -> float:
                b = s.encode("utf-8")
                if not b:
                    return 1.0
                return len(zlib.compress(b, 6)) / len(b)

            def entropy(s: str) -> float:
                if not s:
                    return 0.0
                counts: dict[str, int] = {}
                for ch in s:
                    counts[ch] = counts.get(ch, 0) + 1
                n = len(s)
                return -sum(c / n * math.log2(c / n) for c in counts.values())

            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "compression_ratio": raw.map(ratio),
                    "char_entropy": raw.map(entropy),
                    "n_chars": raw.str.len().astype("int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        signal_batches,
        schema=(
            f"{id_col} long, compression_ratio double, char_entropy double, "
            "n_chars long"
        ),
    )


#: repr(math.log(2)) — interpolated identically into the SQL oracle so
#: the bits-per-char conversion divides by the same double.
LN2 = 0.6931471805599453


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-entropy junk signal, pure Catalyst (the SQL-replayable
    half of :func:`compression_signals` — zlib stays Python-side by
    nature): per document, Shannon entropy of the character
    distribution in bits, ``-Σ p·ln(p) / ln 2``, folded over the
    per-doc character counts IN CHARACTER ORDER on both engines
    (sorted-struct fold here, ``sum(... ORDER BY c)`` in DuckDB) so the
    doubles match bit-for-bit.  Low entropy = repetitive/templated
    text; near-log2(charset) = random noise.

    Scale: one (doc, char) map-side-combined count shuffle (output
    bounded by |docs| × charset) and one doc rollup whose per-doc state
    is O(distinct chars) — alphabet-bounded, never document-length-
    bounded.  Empty docs report 0.0."""
    from .dedup import _parallelize_scan

    base = _parallelize_scan(docs).select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.explode(F.split(F.col(text_col), "")).alias("c"),
    ).filter(F.col("n_chars") > 0)
    counts = base.groupBy("doc_id", "n_chars", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    def term(x):
        px = x["cnt"].cast("double") / F.col("n_chars").cast("double")
        return px * F.log(px)

    folded = counts.groupBy("doc_id", "n_chars").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col("c"), F.col("cnt")))),
            F.lit(0.0),
            lambda acc, x: acc + term(x),
        ).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(folded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0).cast("long")).alias("n_chars"),
            F.coalesce("n_distinct_chars", F.lit(0).cast("long")).alias(
                "n_distinct_chars"
            ),
            F.coalesce(
                F.round(-F.col("_s") / F.lit(LN2), 8), F.lit(0.0)
            ).alias("char_entropy_bits"),
        )
    )
