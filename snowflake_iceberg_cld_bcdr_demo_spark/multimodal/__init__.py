"""Multimodal (image/audio/video) column processing.

Media are opaque ``binary`` columns with a typed metadata struct; all
per-asset compute runs as Arrow-batched pandas transforms over
``mapInPandas`` — the only layer of this engine where Python touches row
data, because byte-level decode genuinely can't be expressed in Catalyst.
Decode itself is stubbed behind an import-gate (no image/audio libs ship
in this environment); everything around it — schemas, batch iteration,
partitioning, feature extraction on raw bytes — is real and tested.
"""

from .media import (
    MEDIA_SCHEMA,
    audio_segment_plan,
    byte_features,
    decode_images,
    frame_sample_plan,
    pack_shards,
    resize_images,
    synthesize_assets,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_segment_plan",
    "byte_features",
    "decode_images",
    "frame_sample_plan",
    "pack_shards",
    "resize_images",
    "synthesize_assets",
]
