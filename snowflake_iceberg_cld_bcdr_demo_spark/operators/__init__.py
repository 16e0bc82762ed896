"""Custom operators the reference lacks but a 100 TB training-data pipeline
needs: deduplication, similarity search, text analysis, multimodal plumbing.

All are compositions of built-in DataFrame ops (exact dedup, LSH banding,
brute-force ANN) — Pandas UDFs appear only where semantics genuinely require
Python (multimodal decode, which is stubbed in this container)."""
