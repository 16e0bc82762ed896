"""Multimodal (image/audio/video) column processing.

Media are opaque ``binary`` columns with a typed metadata struct.  The
*metadata* path is fully real and JVM-side: container headers (PNG IHDR,
JPEG SOFn, GIF, BMP, RIFF/WAVE) are parsed with Catalyst expressions
(:func:`image_header` / :func:`wav_sample_rate`) — no Python, no codec
libraries.  Per-asset *pixel* compute runs as Arrow-batched pandas
transforms over ``mapInPandas`` — the only layer of this engine where
Python touches row data, because byte-level pixel decode genuinely can't
be expressed in Catalyst.  Uncompressed 24-bit BMPs decode/resize to
REAL pixels with NumPy alone (:func:`synthesize_decodable_images`
generates such assets); compressed formats (PNG/JPEG/GIF) are gated on
Pillow — strict mode reports them ``undecoded``/raises rather than
faking pixel values.  Everything around it — schemas, batch iteration,
partitioning, feature extraction on raw bytes — is real and tested.
"""

from .media import (
    MEDIA_SCHEMA,
    audio_segment_plan,
    byte_features,
    decode_images,
    encode_image_header,
    frame_sample_plan,
    image_byte_stats,
    image_dimensions,
    image_header,
    pack_shards,
    resize_images,
    synthesize_assets,
    synthesize_decodable_images,
    wav_sample_rate,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_segment_plan",
    "byte_features",
    "decode_images",
    "encode_image_header",
    "frame_sample_plan",
    "image_byte_stats",
    "image_dimensions",
    "image_header",
    "pack_shards",
    "resize_images",
    "synthesize_assets",
    "synthesize_decodable_images",
    "wav_sample_rate",
]
