"""Custom operators the reference lacks but a 100 TB training-data pipeline
needs: deduplication, similarity search, text analysis, corpus preparation,
temporal joins, skew utilities, sessionization.

All are compositions of built-in DataFrame ops (exact dedup, LSH banding,
brute-force ANN) — Pandas UDFs appear only where semantics genuinely require
sequential or byte-level work (greedy packing, prefix-sum cumsum, multimodal
decode — the latter stubbed in this container)."""

from . import (
    asof,
    corpus,
    dedup,
    extract,
    quality,
    retrieval,
    sessions,
    similarity,
    skew,
    textclean,
    textops,
    timeseries,
)

__all__ = [
    "asof", "corpus", "dedup", "extract", "quality", "retrieval",
    "sessions", "similarity", "skew", "textclean", "textops", "timeseries",
]
