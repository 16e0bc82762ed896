"""Media-asset operators over ``binary`` columns.

Design (north-star multimodal spec):

- **Schema**: ``content binary`` + typed ``metadata`` struct — media stay
  opaque to Catalyst; only metadata participates in pruning/filters, so a
  `WHERE media_type = 'image' AND metadata.width > 512` prunes before any
  byte moves to Python.
- **Compute**: Arrow-batched ``mapInPandas`` (one Python worker round per
  batch, zero-copy byte transfer).  Each transform declares its output
  schema explicitly so downstream plans stay fully typed.
- **Decode**: uncompressed formats (24-bit BI_RGB BMP — what
  :func:`synthesize_decodable_images` emits) decode to REAL pixels with
  NumPy alone (:func:`_np_decode_bmp`); compressed formats (PNG/JPEG/GIF)
  need Pillow.  Without Pillow, ``strict=True`` means "real pixels or
  nothing": ``decode_images`` returns NULL ``mean_luma`` with
  ``decoder='undecoded'`` for formats it cannot truly decode (never a
  byte-statistic masquerading as luma — byte statistics live in
  :func:`image_byte_stats` under honest ``mean_byte`` names), and
  ``resize_images(strict=True)`` raises ``ValueError`` on undecodable
  content instead of fabricating bytes.
- **Scale**: assets are independent rows → ``repartition`` by asset id
  before heavy decode stages spreads work; batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it low for
  multi-MB assets so a batch fits executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# JVM-side container-header codecs (no Python, no Pillow): integer helpers
# over the raw binary column, then per-format width/height/sample-rate
# extraction.  These make the *metadata* path of image/audio handling real
# even where no codec library is installed — Pillow is needed only for
# pixel work (`decode_images` / `resize_images`).
# ---------------------------------------------------------------------------


def _u8(c, pos):
    """Unsigned byte at 1-based ``pos`` (``pos`` may be a Column)."""
    return F.conv(F.hex(F.substring(c, pos, 1)), 16, 10).cast("int")


def _ube(c, pos, nbytes):
    """Big-endian unsigned int of ``nbytes`` at 1-based ``pos``."""
    return F.conv(F.hex(F.substring(c, pos, nbytes)), 16, 10).cast("int")


def _ule(c, pos, nbytes):
    """Little-endian unsigned int: reverse the hex byte pairs then conv."""
    pairs = [F.hex(F.substring(c, pos + i, 1)) for i in range(nbytes)]
    return F.conv(F.concat(*reversed(pairs)), 16, 10).cast("int")


def _magic(c, pos, hexstr):
    return F.hex(F.substring(c, pos, len(hexstr) // 2)) == hexstr.upper()


_PNG_SIG = "89504E470D0A1A0A"
_JPEG_SOF_MARKERS = [
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
]  # SOF0..SOF15 minus DHT/JPG/DAC
_JPEG_MAX_SEGMENTS = 24


def _jpeg_dims(c):
    """Walk the JPEG segment chain to the first SOFn and read its
    height/width — a bounded Catalyst ``aggregate`` fold (state =
    (offset, w, h)), entirely JVM-side.  Layout per segment: FF marker at
    ``off``, 2-byte big-endian length at ``off+2`` (length counts itself
    but not the marker), so the next segment starts at ``off+2+len``.
    SOFn payload: precision(1), height(2), width(2)."""
    init = F.struct(
        F.lit(3).cast("int").alias("off"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
    )

    def step(acc, _):
        off = acc["off"]
        marker = _u8(c, off + 1)
        seglen = _ube(c, off + 2, 2)
        halted = (
            acc["w"].isNotNull()
            | (off + 8 > F.length(c))
            | (_u8(c, off) != 0xFF)
            | (marker == 0xDA)  # SOS: entropy-coded data begins, no SOF seen
        )
        is_sof = marker.isin(_JPEG_SOF_MARKERS)
        return (
            F.when(halted, acc)
            .when(
                is_sof,
                F.struct(
                    off.alias("off"),
                    _ube(c, off + 7, 2).alias("w"),
                    _ube(c, off + 5, 2).alias("h"),
                ),
            )
            .otherwise(
                F.struct(
                    (off + 2 + seglen).alias("off"),
                    acc["w"].alias("w"),
                    acc["h"].alias("h"),
                )
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_JPEG_MAX_SEGMENTS)), init, step
    )


def image_header(content) -> F.Column:
    """``struct(format, width, height)`` parsed from the container header
    of a binary column — PNG (IHDR), JPEG (SOFn segment walk), GIF
    (logical screen descriptor), BMP (BITMAPINFOHEADER).  Unknown or
    truncated content yields NULL fields.  Pure Catalyst: usable in
    filters and pruned like any other expression."""
    c = F.col(content) if isinstance(content, str) else content
    jpeg = _jpeg_dims(c)
    fmt = (
        F.when(_magic(c, 1, _PNG_SIG), F.lit("png"))
        .when(_magic(c, 1, "FFD8"), F.lit("jpeg"))
        .when(_magic(c, 1, "474946"), F.lit("gif"))
        .when(_magic(c, 1, "424D"), F.lit("bmp"))
        .otherwise(F.lit(None).cast("string"))
    )
    width = (
        F.when(fmt == "png", _ube(c, 17, 4))
        .when(fmt == "jpeg", jpeg["w"])
        .when(fmt == "gif", _ule(c, 7, 2))
        .when(fmt == "bmp", _ule(c, 19, 4))
    )
    height = (
        F.when(fmt == "png", _ube(c, 21, 4))
        .when(fmt == "jpeg", jpeg["h"])
        .when(fmt == "gif", _ule(c, 9, 2))
        .when(fmt == "bmp", _ule(c, 23, 4))
    )
    return F.struct(fmt.alias("format"), width.alias("width"), height.alias("height"))


def wav_sample_rate(content) -> F.Column:
    """Sample rate from a RIFF/WAVE header (LE u32 at byte 25), NULL for
    non-WAV content — the audio twin of :func:`image_header`."""
    c = F.col(content) if isinstance(content, str) else content
    is_wav = _magic(c, 1, "52494646") & _magic(c, 9, "57415645")  # RIFF…WAVE
    return F.when(is_wav, _ule(c, 25, 4))


def image_dimensions(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-asset parsed header columns (format/width/height) for image
    rows — the REAL metadata path (no Pillow, no Python): one narrow
    projection, codegen'd, prunable."""
    hdr = image_header(content_col)
    return df.filter(F.col("media_type") == "image").select(
        "asset_id",
        hdr["format"].alias("format"),
        hdr["width"].alias("width"),
        hdr["height"].alias("height"),
    )


METADATA_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("metadata", METADATA_SCHEMA),
    ]
)


def _be_bytes(col, nbytes):
    """Big-endian byte encoding of an int column."""
    return F.unhex(F.lpad(F.hex(col), nbytes * 2, "0"))


def _le_bytes(col, nbytes):
    """Little-endian byte encoding of an int column."""
    col = col if not isinstance(col, int) else F.lit(col)
    pairs = [
        F.lpad(
            F.hex(F.pmod(F.floor(col / F.lit(256**i)).cast("long"), F.lit(256))),
            2,
            "0",
        )
        for i in range(nbytes)
    ]
    return F.unhex(F.concat(*pairs))


def encode_image_header(fmt, width, height) -> F.Column:
    """Valid container-header bytes for (format, width, height) — the
    encoder dual of :func:`image_header`, also pure Catalyst.  Used by the
    synthetic generator and the oracle round-trip query (encode → parse
    must be the identity)."""
    png_hdr = F.concat(
        F.unhex(F.lit(_PNG_SIG + "0000000D" + "49484452")),  # sig + IHDR len/tag
        _be_bytes(width, 4),
        _be_bytes(height, 4),
        F.unhex(F.lit("0806000000" + "00000000")),  # bit depth/color + crc slot
    )
    jpeg_hdr = F.concat(
        # SOI + APP0/JFIF (len 0x10) — the SOFn walker must skip this
        F.unhex(F.lit("FFD8" + "FFE00010" + "4A46494600010100000100010000")),
        F.unhex(F.lit("FFC00011" + "08")),  # SOF0, len 0x11, precision 8
        _be_bytes(height, 2),
        _be_bytes(width, 2),
        F.unhex(F.lit("03" + "011100" + "021101" + "031101")),  # 3 components
    )
    gif_hdr = F.concat(
        F.unhex(F.lit("474946383961")),  # GIF89a
        _le_bytes(width, 2),
        _le_bytes(height, 2),
        F.unhex(F.lit("F70000")),
    )
    bmp_hdr = F.concat(
        F.unhex(F.lit("424D")),  # BM
        _le_bytes(128, 4),  # file size
        F.unhex(F.lit("00000000")),  # reserved
        _le_bytes(54, 4),  # pixel-array offset
        _le_bytes(40, 4),  # BITMAPINFOHEADER size
        _le_bytes(width, 4),
        _le_bytes(height, 4),
    )
    return (
        F.when(fmt == "png", png_hdr)
        .when(fmt == "jpeg", jpeg_hdr)
        .when(fmt == "gif", gif_hdr)
        .when(fmt == "bmp", bmp_hdr)
    )


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL container headers:
    image content starts with a valid PNG/JPEG/GIF/BMP header encoding the
    metadata dimensions, audio with a RIFF/WAVE header encoding the sample
    rate, video with an MP4 ``ftyp`` box — so the JVM-side codecs
    (:func:`image_header`, :func:`wav_sample_rate`) round-trip for real.
    The remainder is a seeded md5-chain payload (opaque, incompressible);
    every asset is exactly 128 bytes.  Spark-native (`spark.range` +
    exprs), so it scales like any other generator in this repo."""
    idx = F.col("id")
    h = F.md5(F.concat(F.lit(f"{seed}#media#"), idx.cast("string")))
    # 128 bytes of deterministic payload: 8 chained md5 digests
    chain = F.concat(
        *[F.unhex(F.md5(F.concat(h, F.lit(str(i))))) for i in range(8)]
    )
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(h), F.lit(3)) + 1).cast("int"),
    )
    width = (F.pmod(F.xxhash64(h, F.lit("w")), F.lit(1920)) + 1).cast("int")
    height = (F.pmod(F.xxhash64(h, F.lit("h")), F.lit(1080)) + 1).cast("int")
    sample_rate = F.lit(16000)
    img_fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("gif"), F.lit("bmp")),
        (F.pmod(F.xxhash64(h, F.lit("f")), F.lit(4)) + 1).cast("int"),
    )

    wav_hdr = F.concat(
        F.unhex(F.lit("52494646")),  # RIFF
        _le_bytes(120, 4),
        F.unhex(F.lit("57415645" + "666D7420")),  # WAVE + "fmt "
        _le_bytes(16, 4),  # fmt chunk size
        _le_bytes(1, 2),  # PCM
        _le_bytes(1, 2),  # mono
        _le_bytes(sample_rate, 4),
    )
    mp4_hdr = F.concat(_be_bytes(F.lit(128), 4), F.unhex(F.lit("66747970" + "69736F6D")))

    header = (
        F.when(mtype == "audio", wav_hdr)
        .when(mtype == "video", mp4_hdr)
        .otherwise(encode_image_header(img_fmt, width, height))
    )
    content = F.substring(F.concat(header, chain), 1, 128)

    meta = F.struct(
        F.when(mtype == "image", width).otherwise(F.lit(None).cast("int")).alias("width"),
        F.when(mtype == "image", height).otherwise(F.lit(None).cast("int")).alias("height"),
        F.when(mtype == "audio", sample_rate)
        .otherwise(F.lit(None).cast("int"))
        .alias("sample_rate"),
        F.when(
            mtype != "image",
            (F.pmod(F.xxhash64(h, F.lit("d")), F.lit(600)) + 1).cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("duration_s"),
        F.when(mtype == "image", img_fmt)
        .when(mtype == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
    )
    return spark.range(n).select(
        F.format_string("ASSET-%06d", idx.cast("int")).alias("asset_id"),
        mtype.alias("media_type"),
        content.cast("binary").alias("content"),
        meta.alias("metadata"),
    )


def synthesize_decodable_images(spark: SparkSession, n: int, seed: int = 7) -> DataFrame:
    """Deterministic synthetic images that are GENUINELY pixel-decodable
    without any codec library: each asset is a complete, valid
    uncompressed 24-bit BI_RGB BMP — BITMAPFILEHEADER + 40-byte
    BITMAPINFOHEADER + a bottom-up, 4-byte-row-padded pixel array filled
    from a seeded md5 chain.  Dimensions are small (2..9 per side) so
    every file is fully materialized (no truncated pixel arrays, unlike
    :func:`synthesize_assets`' 128-byte header-only payloads).  Pure
    Catalyst, so it scales like any generator here; the NumPy decoder
    (:func:`_np_decode_bmp`) and any external BMP reader agree on the
    pixels.  Every derivation (dims + payload) is md5-based so a SQL
    oracle can reproduce the exact file bytes — the
    ``resized_image_profile`` registry query hash-verifies the full
    generate → decode → resize → re-encode chain against DuckDB."""
    idx = F.col("id")
    h = F.md5(F.concat(F.lit(f"{seed}#bmp#"), idx.cast("string")))

    def dim(salt: str) -> F.Column:
        u32 = F.conv(F.substring(F.md5(F.concat(h, F.lit(salt))), 1, 8), 16, 10)
        return (F.pmod(u32.cast("long"), F.lit(8)) + 2).cast("int")

    width, height = dim("w"), dim("h")
    row_size = (F.floor((width * 3 + 3) / 4) * 4).cast("int")
    image_size = (row_size * height).cast("int")
    header = F.concat(
        F.unhex(F.lit("424D")),  # BM
        _le_bytes(image_size + 54, 4),  # file size
        F.unhex(F.lit("00000000")),  # reserved
        _le_bytes(54, 4),  # pixel-array offset
        _le_bytes(40, 4),  # BITMAPINFOHEADER size
        _le_bytes(width, 4),
        _le_bytes(height, 4),  # positive → bottom-up rows
        _le_bytes(1, 2),  # planes
        _le_bytes(24, 2),  # bits per pixel
        _le_bytes(0, 4),  # BI_RGB (uncompressed)
        _le_bytes(image_size, 4),
        _le_bytes(2835, 4),  # 72 DPI
        _le_bytes(2835, 4),
        _le_bytes(0, 4),
        _le_bytes(0, 4),
    )
    # 9x9 @ 3bpp padded → ≤ 28*9 = 252 pixel bytes; 16 chained digests = 256
    chain = F.concat(
        *[F.unhex(F.md5(F.concat(h, F.lit(str(i))))) for i in range(16)]
    )
    content = F.concat(header, F.substring(chain, 1, image_size))
    meta = F.struct(
        width.alias("width"),
        height.alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("double").alias("duration_s"),
        F.lit("bmp").alias("format"),
    )
    return spark.range(n).select(
        F.format_string("BMP-%06d", idx.cast("int")).alias("asset_id"),
        F.lit("image").alias("media_type"),
        content.cast("binary").alias("content"),
        meta.alias("metadata"),
    )


def synthesize_decodable_wavs(spark: SparkSession, n: int, seed: int = 11) -> DataFrame:
    """Deterministic synthetic audio that is GENUINELY sample-decodable
    without any codec library — the audio twin of
    :func:`synthesize_decodable_images`: each asset is a complete,
    valid PCM16 mono WAV (RIFF header + canonical 16-byte fmt chunk +
    data chunk) whose samples come from a seeded md5 chain.  Sample
    counts are small (8..24) so every file is fully materialized; the
    NumPy decoder (:func:`_np_decode_wav`) and any external WAV reader
    agree on the samples.  Pure Catalyst, md5-derived throughout, so a
    SQL oracle reproduces the exact int16 samples — the
    ``audio_waveform_profile`` registry query hash-verifies the full
    generate → decode → waveform-statistics chain against DuckDB."""
    idx = F.col("id")
    h = F.md5(F.concat(F.lit(f"{seed}#wav#"), idx.cast("string")))

    def u32(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(h, F.lit(salt))), 1, 8), 16, 10
        ).cast("long")

    n_samples = (F.pmod(u32("n"), F.lit(17)) + 8).cast("int")
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.pmod(u32("r"), F.lit(3)) + 1).cast("int"),
    )
    data_size = (n_samples * 2).cast("int")
    header = F.concat(
        F.unhex(F.lit("52494646")),            # RIFF
        _le_bytes(data_size + 36, 4),          # riff chunk size
        F.unhex(F.lit("57415645" + "666D7420")),  # WAVE + "fmt "
        _le_bytes(16, 4),                      # fmt chunk size
        _le_bytes(1, 2),                       # PCM
        _le_bytes(1, 2),                       # mono
        _le_bytes(rate, 4),
        _le_bytes(rate * 2, 4),                # byte rate
        _le_bytes(2, 2),                       # block align
        _le_bytes(16, 2),                      # bits per sample
        F.unhex(F.lit("64617461")),            # "data"
        _le_bytes(data_size, 4),
    )
    # 24 samples -> 48 bytes; 4 chained digests = 64 bytes of payload
    chain = F.concat(
        *[F.unhex(F.md5(F.concat(h, F.lit(str(i))))) for i in range(4)]
    )
    content = F.concat(header, F.substring(chain, 1, data_size))
    meta = F.struct(
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        rate.alias("sample_rate"),
        (n_samples.cast("double") / rate).alias("duration_s"),
        F.lit("wav").alias("format"),
    )
    return spark.range(n).select(
        F.format_string("WAV-%06d", idx.cast("int")).alias("asset_id"),
        F.lit("audio").alias("media_type"),
        content.cast("binary").alias("content"),
        meta.alias("metadata"),
    )


def _np_decode_wav(b: bytes):
    """Decode a canonical-layout PCM16 mono WAV (RIFF + 16-byte fmt at
    offset 12 + data chunk at offset 36) with NumPy alone.  Returns
    ``(sample_rate, int16 ndarray)`` or None when the bytes are not
    that exact shape (other codecs, extra chunks, truncated data) —
    callers treat None as "needs a real codec library"."""
    import numpy as np

    if len(b) < 44 or bytes(b[:4]) != b"RIFF" or bytes(b[8:16]) != b"WAVEfmt ":
        return None
    fmt_size = int.from_bytes(b[16:20], "little")
    audio_fmt = int.from_bytes(b[20:22], "little")
    channels = int.from_bytes(b[22:24], "little")
    rate = int.from_bytes(b[24:28], "little")
    bits = int.from_bytes(b[34:36], "little")
    if fmt_size != 16 or audio_fmt != 1 or channels != 1 or bits != 16:
        return None
    if bytes(b[36:40]) != b"data":
        return None
    data_size = int.from_bytes(b[40:44], "little")
    if len(b) < 44 + data_size or data_size % 2:
        return None
    samples = np.frombuffer(b, np.dtype("<i2"), count=data_size // 2, offset=44)
    return rate, samples


WAVEFORM_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sumsq", LongType()),
        StructField("zero_crossings", IntegerType()),
        StructField("peak_abs", IntegerType()),
        StructField("decoder", StringType()),
    ]
)


def audio_waveform_features(df: DataFrame, strict: bool = True) -> DataFrame:
    """REAL waveform statistics from raw WAV bytes via the NumPy PCM16
    decoder — the audio analog of :func:`decode_images`: per asset the
    sample count, the EXACT integer sum of squared samples (callers
    derive RMS with one float division + sqrt, keeping doubles
    bit-identical cross-engine), sign changes (zero crossings), and the
    peak absolute sample.  Assets the strict decoder rejects emit NULL
    stats with ``decoder='undecoded'`` (never fabricated); with
    ``strict=False`` a byte-derived stand-in labeled ``'fake'``
    exercises the plumbing.

    Scale: one Arrow-batched narrow stage, no shuffles; binary payloads
    cross into Python only inside this kernel."""

    audio = df.filter(F.col("media_type") == "audio").select("asset_id", "content")

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stats(b):
            dec = _np_decode_wav(bytes(b))
            if dec is not None:
                rate, s = dec
                s64 = s.astype("int64")
                zc = int(((s64[:-1] < 0) != (s64[1:] < 0)).sum()) if len(s) > 1 else 0
                return (
                    int(rate),
                    int(len(s)),
                    int((s64 * s64).sum()),
                    zc,
                    int(abs(s64).max()) if len(s) else 0,
                    "numpy-pcm16",
                )
            if strict:
                return None, None, None, None, None, "undecoded"
            bb = bytes(b)
            return None, len(bb), None, None, None, "fake"

        for pdf in batches:
            rows = [stats(b) for b in pdf["content"]]
            out = pd.DataFrame(
                rows,
                columns=[
                    "sample_rate", "n_samples", "sumsq",
                    "zero_crossings", "peak_abs", "decoder",
                ],
            )
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return audio.mapInPandas(features, WAVEFORM_SCHEMA)


def synthesize_decodable_videos(spark: SparkSession, n: int, seed: int = 13) -> DataFrame:
    """Deterministic synthetic video that is GENUINELY frame-decodable
    without any codec library — completing the image/audio/video
    real-kernel set: each asset is a raw uncompressed container
    (magic ``RVID`` + width/height/n_frames/fps as LE uint16 + raw
    top-down BGR24 frames, no padding) filled from a seeded md5 chain.
    Real codecs need external libraries this environment doesn't ship;
    a raw container keeps every byte of the frame path REAL (decode,
    frame sampling, pixel statistics) instead of stubbing it.  Pure
    Catalyst, md5-derived throughout, so the ``video_frame_profile``
    oracle reproduces the exact pixels."""
    idx = F.col("id")
    h = F.md5(F.concat(F.lit(f"{seed}#vid#"), idx.cast("string")))

    def u32(salt: str) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(h, F.lit(salt))), 1, 8), 16, 10
        ).cast("long")

    width = (F.pmod(u32("w"), F.lit(4)) + 2).cast("int")    # 2..5
    height = (F.pmod(u32("h"), F.lit(4)) + 2).cast("int")   # 2..5
    n_frames = (F.pmod(u32("f"), F.lit(4)) + 3).cast("int")  # 3..6
    fps = F.element_at(
        F.array(F.lit(10), F.lit(24), F.lit(30)),
        (F.pmod(u32("p"), F.lit(3)) + 1).cast("int"),
    )
    payload = (width * height * 3 * n_frames).cast("int")   # <= 450 bytes
    header = F.concat(
        F.unhex(F.lit("52564944")),  # RVID
        _le_bytes(width, 2),
        _le_bytes(height, 2),
        _le_bytes(n_frames, 2),
        _le_bytes(fps, 2),
    )
    chain = F.concat(
        *[F.unhex(F.md5(F.concat(h, F.lit(str(i))))) for i in range(29)]
    )
    content = F.concat(header, F.substring(chain, 1, payload))
    meta = F.struct(
        width.alias("width"),
        height.alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        (n_frames.cast("double") / fps).alias("duration_s"),
        F.lit("rvid").alias("format"),
    )
    return spark.range(n).select(
        F.format_string("VID-%06d", idx.cast("int")).alias("asset_id"),
        F.lit("video").alias("media_type"),
        content.cast("binary").alias("content"),
        meta.alias("metadata"),
    )


def _np_decode_rvid(b: bytes):
    """Decode the raw RVID container with NumPy alone: returns
    ``(fps, frames)`` where frames is a (n_frames, height, width, 3)
    top-down BGR uint8 array, or None for anything that is not a
    complete RVID payload."""
    import numpy as np

    if len(b) < 12 or bytes(b[:4]) != b"RVID":
        return None
    w = int.from_bytes(b[4:6], "little")
    h = int.from_bytes(b[6:8], "little")
    nf = int.from_bytes(b[8:10], "little")
    fps = int.from_bytes(b[10:12], "little")
    need = w * h * 3 * nf
    if w <= 0 or h <= 0 or nf <= 0 or len(b) < 12 + need:
        return None
    frames = np.frombuffer(b, np.uint8, count=need, offset=12).reshape(nf, h, w, 3)
    return fps, frames


FRAME_PROFILE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("n_sampled", IntegerType()),
        StructField("luma_millis", LongType()),
        StructField("decoder", StringType()),
    ]
)


def video_frame_profile(df: DataFrame, stride: int = 2, strict: bool = True) -> DataFrame:
    """REAL frame sampling + pixel statistics from raw video bytes —
    the video analog of :func:`decode_images`: every ``stride``-th
    frame of each asset is decoded and its EXACT integer ITU-R 601
    luma-millis (``sum(299·R + 587·G + 114·B)`` over all pixels)
    accumulated per asset; callers derive mean luma with one float
    division.  Strict assets the decoder rejects emit NULL stats with
    ``decoder='undecoded'``; ``strict=False`` labels a byte-derived
    stand-in ``'fake'``.

    Scale: one Arrow-batched narrow stage (a video row IS its asset, so
    even the per-asset aggregation is kernel-local) — no shuffles."""
    videos = df.filter(F.col("media_type") == "video").select("asset_id", "content")

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stats(b):
            dec = _np_decode_rvid(bytes(b))
            if dec is not None:
                fps, frames = dec
                nf, h, w = frames.shape[:3]
                sampled = frames[::stride].astype("int64")
                lm = int(
                    (
                        299 * sampled[..., 2]
                        + 587 * sampled[..., 1]
                        + 114 * sampled[..., 0]
                    ).sum()
                )
                return w, h, nf, int(fps), sampled.shape[0], lm, "numpy-rvid"
            if strict:
                return None, None, None, None, None, None, "undecoded"
            return None, None, None, None, None, len(bytes(b)), "fake"

        for pdf in batches:
            rows = [stats(b) for b in pdf["content"]]
            out = pd.DataFrame(
                rows,
                columns=[
                    "width", "height", "n_frames", "fps",
                    "n_sampled", "luma_millis", "decoder",
                ],
            )
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return videos.mapInPandas(profile, FRAME_PROFILE_SCHEMA)


def _np_decode_bmp(b: bytes):
    """Decode an uncompressed 24-bit BI_RGB BMP with NumPy alone.
    Returns a top-down (height, width, 3) uint8 array in BGR channel
    order (BMP's storage order), or None when the bytes are not a
    complete uncompressed 24-bit BMP (wrong magic, compressed, other
    bit depth, or truncated pixel array) — callers treat None as
    "needs a real codec library"."""
    import numpy as np

    if len(b) < 54 or bytes(b[:2]) != b"BM":
        return None
    off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if hdr_size < 40 or bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    top_down, h_abs = height < 0, abs(height)
    row_size = ((width * 3 + 3) // 4) * 4
    if len(b) < off + row_size * h_abs:
        return None
    arr = (
        np.frombuffer(b, np.uint8, count=row_size * h_abs, offset=off)
        .reshape(h_abs, row_size)[:, : width * 3]
        .reshape(h_abs, width, 3)
    )
    return arr if top_down else arr[::-1]


def _np_encode_bmp(arr) -> bytes:
    """Encode a top-down (h, w, 3) uint8 BGR array as an uncompressed
    24-bit BI_RGB BMP — the byte-exact dual of :func:`_np_decode_bmp`."""
    import numpy as np

    h, w = arr.shape[:2]
    row_size = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 3] = arr.reshape(h, w * 3)
    px = rows[::-1].tobytes()  # bottom-up storage
    header = (
        b"BM"
        + (54 + len(px)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(px).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + px


def _np_luma(arr) -> float:
    """Mean ITU-R 601 luma of a top-down BGR uint8 array (the same
    299/587/114 weights Pillow's ``convert("L")`` uses, computed in
    float — deterministic, order-free)."""
    b = arr[..., 0].astype("float64")
    g = arr[..., 1].astype("float64")
    r = arr[..., 2].astype("float64")
    return float((0.299 * r + 0.587 * g + 0.114 * b).mean())


def _np_resize_nn(arr, width: int, height: int):
    """Nearest-neighbor resize of a (h, w, C) array via integer index
    maps — ``src_y = floor(dst_y * h / height)`` — the deterministic,
    library-free kernel."""
    import numpy as np

    h, w = arr.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return arr[yi][:, xi]


BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha256", StringType()),
        StructField("mean_byte", DoubleType()),
        StructField("entropy_proxy", DoubleType()),
    ]
)


def byte_features(df: DataFrame) -> DataFrame:
    """Real (non-stub) per-asset features from raw bytes — size, digest,
    mean byte value, distinct-byte ratio — via Arrow-batched mapInPandas.
    This is the dedup/quality front line for media corpora."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len),
                    "sha256": content.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "mean_byte": content.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "entropy_proxy": content.map(
                        lambda b: len(set(b)) / 256.0 if len(b) else 0.0
                    ),
                }
            )

    return df.mapInPandas(compute, BYTE_FEATURES_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("decoder", StringType()),
    ]
)


def _byte_array(col) -> F.Column:
    """The binary payload as an ``array<int>`` of byte values, derived
    entirely in Catalyst: hex → 2-char groups → base-16 conv.  Keeps
    byte-level statistics JVM-side (codegen'd regexp + higher-order
    functions) — no Python worker, no codec library."""
    return F.transform(
        F.regexp_extract_all(F.hex(col), F.lit(".."), 0),
        lambda x: F.conv(x, 16, 10).cast("int"),
    )


BYTE_STATS_SCHEMA_DOC = (
    "asset_id, n_bytes, mean_byte, distinct_byte_ratio, segment_means"
)


def image_byte_stats(df: DataFrame, segments: int = 4) -> DataFrame:
    """Pure-JVM byte-statistic decode proxy: per asset, REAL statistics
    of the encoded payload computed wholly in Catalyst — total byte
    mean, distinct-byte ratio (entropy proxy: compressed formats sit
    near 1.0, flat/synthetic payloads much lower), and per-``segments``
    scan-segment means (byte-distribution drift across the file — e.g.
    header-heavy vs data-heavy regions).  Header-parsed width/height
    ride along from :func:`image_header`.

    This is the no-Pillow answer for pixel-adjacent signals: nothing is
    faked — every number is a true function of the stored bytes, and
    the whole plan is one codegen'd projection (no Python workers, no
    shuffle), so it runs at scan speed on 100 TB of assets."""
    hdr = image_header("content")
    ba = _byte_array(F.col("content"))
    n = F.size(ba)
    seg_len = F.greatest(F.floor(n / segments).cast("int"), F.lit(1))
    mean_of = lambda arr: (  # noqa: E731
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
        / F.greatest(F.size(arr), F.lit(1))
    )
    seg_means = F.transform(
        F.sequence(F.lit(0), F.lit(segments - 1)),
        lambda i: F.round(mean_of(F.slice(ba, i * seg_len + 1, seg_len)), 4),
    )
    return df.filter(F.col("media_type") == "image").select(
        "asset_id",
        hdr["format"].alias("format"),
        hdr["width"].alias("width"),
        hdr["height"].alias("height"),
        n.alias("n_bytes"),
        F.round(mean_of(ba), 4).alias("mean_byte"),
        F.round(
            F.size(F.array_distinct(ba)) / F.lit(256.0), 4
        ).alias("distinct_byte_ratio"),
        seg_means.alias("segment_means"),
    )


def decode_images(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode image assets to pixel statistics.

    Dimensions are REAL either way — parsed JVM-side from the container
    header (:func:`image_header`) before any byte reaches Python.
    Decoder resolution per asset: NumPy FIRST for complete uncompressed
    24-bit BMPs (:func:`_np_decode_bmp` — real pixels,
    ``decoder='numpy-bmp'``; what :func:`synthesize_decodable_images`
    emits — deterministic and library-independent, so results don't
    change when Pillow appears) → Pillow for compressed formats when
    installed → otherwise:

    - ``strict=True`` emits NULL ``mean_luma`` with
      ``decoder='undecoded'`` — strict means real pixel statistics or
      nothing; a byte mean of compressed payload is statistically
      unrelated to luminance and must not be consumable as it (byte
      statistics live in :func:`image_byte_stats` as ``mean_byte``).
    - ``strict=False`` keeps the byte-derived stand-in, clearly labeled
      ``decoder='fake'``, exercising the batching/schema plumbing."""
    has_pil = _pil_available()
    hdr = image_header("content")
    images = df.filter(F.col("media_type") == "image").select(
        "asset_id",
        "content",
        hdr["width"].alias("_w"),
        hdr["height"].alias("_h"),
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if has_pil:
            import io

            from PIL import Image

        def stats(b, w, h):
            arr = _np_decode_bmp(b)
            if arr is not None:
                ph, pw = arr.shape[:2]
                return pw, ph, pw * ph, _np_luma(arr), "numpy-bmp"
            if has_pil:
                img = Image.open(io.BytesIO(b)).convert("L")
                pw, ph = img.size
                data = list(img.getdata())
                return pw, ph, pw * ph, float(sum(data)) / max(len(data), 1), "pillow"
            pw = int(w) if pd.notna(w) else 0
            ph = int(h) if pd.notna(h) else 0
            if strict:
                return pw, ph, pw * ph, None, "undecoded"
            fake = float(sum(b)) / len(b) if len(b) else 0.0
            return pw, ph, pw * ph, fake, "fake"

        for pdf in batches:
            rows = [
                stats(b, w, h)
                for b, w, h in zip(pdf["content"], pdf["_w"], pdf["_h"])
            ]
            out = pd.DataFrame(
                rows, columns=["width", "height", "n_pixels", "mean_luma", "decoder"]
            )
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return images.mapInPandas(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resizer", StringType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int, strict: bool = False) -> DataFrame:
    """Resize image assets to (width, height).

    Decoder resolution per asset: NumPy FIRST for complete uncompressed
    24-bit BMPs (:func:`_np_decode_bmp` → nearest-neighbor
    :func:`_np_resize_nn` → re-encode :func:`_np_encode_bmp`; real
    pixels end to end, ``resizer='numpy-bmp'`` — deterministic and
    library-independent, so the ``resized_image_profile`` oracle holds
    whether or not Pillow is installed) → Pillow for compressed formats
    when installed (PNG output) → otherwise ``strict=True`` raises
    ``ValueError`` naming the asset (strict means real pixels or an
    error — never fabricated bytes), while ``strict=False`` emits
    deterministic correctly-shaped stand-in bytes labeled
    ``resizer='fake'`` so downstream plumbing can be exercised."""
    has_pil = _pil_available()
    images = df.filter(F.col("media_type") == "image")
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if has_pil:
            import io

            from PIL import Image

        def do(asset_id, b):
            arr = _np_decode_bmp(b)
            if arr is not None:
                return _np_encode_bmp(_np_resize_nn(arr, width, height)), "numpy-bmp"
            if has_pil:
                img = Image.open(io.BytesIO(b)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue(), "pillow"
            if strict:
                raise ValueError(
                    f"strict resize: asset {asset_id!r} is not an uncompressed "
                    "24-bit BMP and Pillow is not installed — cannot produce "
                    "real pixels"
                )
            fake = (hashlib.sha256(b).digest() * (target // 32 + 1))[:target]
            return fake, "fake"

        for pdf in batches:
            done = [do(a, b) for a, b in zip(pdf["asset_id"], pdf["content"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": [c for c, _ in done],
                    "width": width,
                    "height": height,
                    "resizer": [t for _, t in done],
                }
            )

    return images.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_PLAN_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("frame_no", IntegerType()),
        StructField("timestamp_s", DoubleType()),
    ]
)


def frame_sample_plan(df: DataFrame, every_s: float = 10.0) -> DataFrame:
    """Frame-sampling plan for video assets: one row per frame to
    extract, from metadata alone — pure Catalyst (sequence + explode), no
    Python, no decode.  The actual frame decode would be a mapInPandas
    over (asset_id, timestamp_s) with the codec lib import-gated exactly
    like :func:`decode_images`."""
    videos = df.filter(F.col("media_type") == "video")
    n_frames = F.floor(F.col("metadata.duration_s") / every_s).cast("int")
    return (
        videos.filter(F.col("metadata.duration_s").isNotNull())
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_no"),
        )
        .select(
            "asset_id",
            "frame_no",
            (F.col("frame_no").cast("double") * every_s).alias("timestamp_s"),
        )
    )


def pack_shards(
    df: DataFrame,
    target_shard_bytes: int = 1 << 20,
    num_writers: int = 16,
    id_col: str = "asset_id",
    content_col: str = "content",
) -> DataFrame:
    """Assign assets to size-bounded output shards (the WebDataset/tar
    sharding step of a multimodal export): within each writer partition,
    assets are scanned in id order and appended to the current shard
    until it would exceed ``target_shard_bytes``; oversized assets get a
    shard of their own.

    Only (id, nbytes) enters the Python worker — the binary payload never
    leaves the JVM; a downstream writer joins the assignment back and
    writes shard files with ``partitionBy("shard_id")``.  Writers pack
    independently (shard ids are ``writer * 2^32 + seq``), so the scan
    parallelizes across the cluster exactly like greedy sequence packing
    (`operators/corpus.py::pack_greedy` — same first-fit contract)."""
    writer = (F.crc32(F.col(id_col).cast("string")) % num_writers).cast("int")
    base = df.select(
        F.col(id_col),
        writer.alias("writer"),
        F.length(F.col(content_col)).alias("nbytes"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        shards, fill, cur = [], 0, 0
        for nb in pdf["nbytes"]:
            if fill > 0 and fill + nb > target_shard_bytes:
                cur += 1
                fill = 0
            shards.append(cur)
            fill += nb
        pdf["shard_id"] = pdf["writer"].astype("int64") * (1 << 32) + pd.Series(shards)
        return pdf[[id_col, "nbytes", "shard_id"]]

    return base.groupBy("writer").applyInPandas(
        pack, f"{id_col} string, nbytes long, shard_id long"
    )


def audio_segment_plan(
    df: DataFrame, segment_s: float = 30.0, overlap_s: float = 5.0
) -> DataFrame:
    """Segmentation plan for audio assets: one row per (start, end)
    window to transcribe/embed, computed from metadata alone — pure
    Catalyst, no decode, mirroring :func:`frame_sample_plan`.  Windows
    advance by ``segment_s - overlap_s`` (ASR-style overlap so no speech
    is lost at boundaries); the final window is clamped to the clip end.
    The actual resample/transcode would be a mapInPandas over
    (asset_id, start_s, end_s) with the codec import-gated like
    :func:`decode_images`."""
    if overlap_s >= segment_s:
        raise ValueError("overlap_s must be smaller than segment_s")
    stride = segment_s - overlap_s
    audio = df.filter(
        (F.col("media_type") == "audio") & F.col("metadata.duration_s").isNotNull()
    )
    last_seg = F.floor(
        F.greatest(F.col("metadata.duration_s") - overlap_s, F.lit(0.0)) / stride
    ).cast("int")
    start = F.col("segment_no").cast("double") * stride
    return (
        audio.select(
            "asset_id",
            F.col("metadata.duration_s").alias("_dur"),
            F.explode(F.sequence(F.lit(0), last_seg)).alias("segment_no"),
        )
        .filter(start < F.col("_dur"))
        .select(
            "asset_id",
            "segment_no",
            start.alias("start_s"),
            F.least(start + segment_s, F.col("_dur")).alias("end_s"),
        )
    )


MEDIA_SIMHASH_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("media_type", StringType()),
        StructField("simhash", LongType()),
        StructField("n_windows", IntegerType()),
    ]
)


def media_simhash(df: DataFrame, window: int = 8) -> DataFrame:
    """64-bit SimHash over rolling byte windows — near-dup fingerprints
    for media that need NO decoder: re-muxed/metadata-tweaked copies of
    the same payload share most windows, so their fingerprints sit a few
    bits apart while unrelated assets are ~32 bits apart.

    Compute: vectorized numpy per Arrow batch (sliding windows → FNV-1a
    per window → per-bit majority vote); bytes never leave the worker."""
    import numpy as np

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_hash, out_n = [], []
            for b in pdf["content"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size < window:
                    out_hash.append(0)
                    out_n.append(0)
                    continue
                win = np.lib.stride_tricks.sliding_window_view(arr, window)
                # vectorized FNV-1a over each window
                h = np.full(win.shape[0], 1469598103934665603, dtype=np.uint64)
                for j in range(window):
                    h = (h ^ win[:, j].astype(np.uint64)) * np.uint64(
                        1099511628211
                    )
                bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = bits.sum(axis=0)
                sim = int(
                    ((votes * 2 > win.shape[0]).astype(np.uint64)
                     << np.arange(64, dtype=np.uint64)).sum()
                )
                out_hash.append(sim - (1 << 64) if sim >= (1 << 63) else sim)
                out_n.append(int(win.shape[0]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "simhash": pd.Series(out_hash, dtype="int64"),
                    "n_windows": pd.Series(out_n, dtype="int32"),
                }
            )

    return df.select("asset_id", "media_type", "content").mapInPandas(
        fingerprint, MEDIA_SIMHASH_SCHEMA
    )


def media_neardup_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    bands: int | None = None,
    bits: int = 64,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Near-dup asset pairs from SimHash fingerprints: candidates form
    only when at least one band matches exactly, then the exact Hamming
    distance filters via ``bit_count(xor)`` — all JVM.

    Recall contract: ``bands`` defaults to ``max_hamming + 1`` so the
    pigeonhole guarantee is EXACT — any pair within ``bands − 1``
    differing bits must share one unchanged band, so every pair at
    distance ≤ max_hamming is emitted.  The guarantee only exists for
    ``max_hamming <= 31`` (64-bit hashes cap bands at 32 — each band
    needs ≥ 2 bits); a larger default request raises rather than
    silently voiding the contract.  Passing ``bands <= max_hamming``
    explicitly trades recall for fewer candidates (a distance-d pair
    whose d differing bits land in d distinct bands is missed) and is
    allowed but no longer the default.

    Scale: the candidate stage routes through the SAME hot-bucket-capped
    self-join the text LSH path uses (:func:`..operators.dedup.
    banded_self_join`) — a band value shared by B assets yields B²/2
    pairs, so at corpus scale a boilerplate asset (one logo duplicated
    10⁶ times) would detonate an uncapped join.  ``max_band_bucket``
    drops band keys with more members BEFORE the self-join (the count
    rides the join's own (band, value) partitioning — no extra
    shuffle); ``None`` keeps the exact all-collisions contract the
    oracles certify.  Production near-dup mining at 100 TB should pass
    a cap and treat dropped mega-buckets as exact-duplicate clusters
    (the :func:`..operators.dedup.neardup_skewsafe` discipline)."""
    from ..operators.dedup import banded_self_join

    if bands is None:
        if max_hamming + 1 > bits // 2:
            raise ValueError(
                f"max_hamming={max_hamming}: exact recall needs "
                f"bands=max_hamming+1 <= {bits // 2} ({bits}-bit hashes) — "
                "pass bands explicitly to accept approximate recall"
            )
        # min 2 keeps every band at least 2 bits wide
        bands = max(max_hamming + 1, 2)
    width = bits // bands
    if width < 16 and max_band_bucket is None:
        import warnings

        # r12 review: 16-bit audio hashes at 2 bands gave 2^8 band-key
        # values — every bucket ~n/256 assets, quadratic at corpus scale
        warnings.warn(
            f"media_neardup_pairs: {bits}-bit hashes over {bands} bands give "
            f"only 2^{width} band-key values — buckets grow O(n) and the "
            "pair join degenerates quadratic at corpus scale; pass "
            "max_band_bucket (or use >= 32-bit fingerprints)",
            RuntimeWarning,
            stacklevel=2,
        )
    mask = (1 << width) - 1
    banded = fingerprints.select(
        F.col("asset_id").alias("doc_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bv.band").alias("band"),
        F.col("bv.val").alias("band_key"),
    )
    return (
        banded_self_join(banded, max_band_bucket)
        .select(
            F.col("a.doc_id").alias("asset_a"),
            F.col("b.doc_id").alias("asset_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def media_validity(
    assets: DataFrame,
    doc_col: str = "doc_id",
    min_dim: int = 1,
    max_dim: int = 8192,
    min_duration_s: float = 0.0,
    max_duration_s: float = 3600.0,
) -> DataFrame:
    """Per-DOCUMENT media validity verdict — the curation pipeline's
    media gate (:func:`..operators.corpus.curated_corpus`
    ``media_assets``): a document is ``media_ok`` iff EVERY asset
    attached to it (rows ``(doc_col, media_type, content)``) passes its
    container check:

    - ``image``: header parses (PNG/JPEG/GIF/BMP magic + dimension
      fields, :func:`image_header`) and both dimensions sit in
      ``[min_dim, max_dim]``,
    - ``audio``: canonical RIFF/WAVE header with positive rate /
      channels / bit depth, and the PCM duration (payload bytes over
      rate x channels x bytes-per-sample) in
      ``[min_duration_s, max_duration_s]``,
    - ``video``: RVID container with positive header fields, a COMPLETE
      frame payload (truncation = decode failure), and duration
      ``n_frames / fps`` within the same bounds,
    - any other ``media_type``: invalid (unknown container).

    Pure Catalyst header arithmetic — no Python anywhere in the verdict
    path — then one ``groupBy(doc)`` AND-fold (``min`` over booleans).
    Docs with no asset rows are simply absent (the pipeline treats
    absent media as pass).  The duration floor defaults to 0 (bounds
    are opt-in; container validity alone gates by default — synthetic
    fixtures are millisecond-scale)."""
    c = F.col("content")
    hdr = image_header(c)
    img_ok = (
        hdr["format"].isNotNull()
        & hdr["width"].between(min_dim, max_dim)
        & hdr["height"].between(min_dim, max_dim)
    )
    rate = wav_sample_rate(c)
    channels = _ule(c, 23, 2)
    bits = _ule(c, 35, 2)
    bytes_per_s = rate * channels * (bits.cast("double") / F.lit(8.0))
    wav_dur = (F.length(c) - 44).cast("double") / bytes_per_s
    aud_ok = (
        rate.isNotNull()
        & (rate > 0)
        & (channels > 0)
        & (bits > 0)
        & wav_dur.between(min_duration_s, max_duration_s)
    )
    is_rvid = _magic(c, 1, "52564944")
    vw, vh = _ule(c, 5, 2), _ule(c, 7, 2)
    vf, vfps = _ule(c, 9, 2), _ule(c, 11, 2)
    vid_ok = (
        is_rvid
        & (vw > 0)
        & (vh > 0)
        & (vf > 0)
        & (vfps > 0)
        & (F.length(c) >= F.lit(12) + vw * vh * 3 * vf)
        & (vf.cast("double") / vfps).between(min_duration_s, max_duration_s)
    )
    ok = (
        F.when(F.col("media_type") == "image", img_ok)
        .when(F.col("media_type") == "audio", aud_ok)
        .when(F.col("media_type") == "video", vid_ok)
        .otherwise(F.lit(False))
    )
    return assets.groupBy(F.col(doc_col).alias("doc_id")).agg(
        F.min(F.coalesce(ok, F.lit(False))).alias("media_ok")
    )


def image_ahash(
    df: DataFrame,
    grid: int = 8,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """PIXEL-domain perceptual fingerprint (average hash / aHash) for
    uncompressed 24-bit BMP assets — the decoder-free complement of
    :func:`media_simhash`: the byte-window SimHash catches re-muxed
    copies of the same BYTES, while aHash lives in pixel space, so it is
    exactly invariant under uniform brightness shifts (every sample and
    the mean move together — pytest-pinned) and tolerant of small pixel
    edits.

    Mechanics, pure Catalyst (no decoder, no Python worker): the
    ``grid × grid`` nearest-neighbor samples are read straight out of
    the BMP pixel array (bottom-up rows, 4-byte padding — the
    `resized_image_profile` byte math), each sample scored with integer
    ITU-R 601 luma-millis, and bit ``gy·grid+gx`` is set iff
    ``n·luma > Σ luma`` (the multiply form avoids a division, keeping
    the comparison exact integer arithmetic) — so the whole hash is
    replayable in the DuckDB oracle.  Non-BMP or truncated content
    yields a NULL hash (the general decode path is
    :func:`decode_images`; this operator is the certified fast path for
    the uncompressed layout).

    Scale: one narrow codegen'd projection — no shuffle, no Arrow
    stage; pair mining reuses :func:`media_neardup_pairs` with
    ``bits=grid*grid`` (banded hamming join, sub-quadratic).  The
    default is ``grid=8`` — the standard 64-bit aHash — because band
    keys carved from a 16-bit hash (``grid=4``) take only 2¹⁶ values
    at best and FAR fewer in practice, so at corpus scale every bucket
    degenerates toward n/|values| members and the banded join is
    all-pairs in disguise; 64 bits keeps buckets sparse."""
    if not 2 <= grid <= 8:
        raise ValueError(f"image_ahash: grid must be in [2, 8], got {grid}")
    hdr = image_header(F.col(content_col))
    # staged projections: derive the byte array (a regexp transform over
    # the hex payload) and each sampled luma ONCE as named columns —
    # inlining them would re-expand the whole derivation inside every
    # element_at and blow the expression tree (codegen minutes, not ms)
    staged = df.select(
        F.col(id_col),
        _byte_array(F.col(content_col)).alias("_ba"),
        hdr["width"].alias("_w"),
        hdr["height"].alias("_h"),
        (hdr["format"] == F.lit("bmp")).alias("_ok"),
    ).select(
        id_col,
        "_ba",
        "_w",
        "_h",
        "_ok",
        (F.floor((F.col("_w").cast("double") * 3 + 3) / 4) * 4)
        .cast("int")
        .alias("_row"),
    )

    n = grid * grid

    def samp(i: F.Column) -> F.Column:
        # bit index i = gy*grid + gx; nearest-neighbor sample position
        # sy = (gy*h) div grid, sx = (gx*w) div grid — same exact
        # integer arithmetic the DuckDB oracle replays
        gy = F.floor(i / F.lit(grid)).cast("int")
        gx = (i % F.lit(grid)).cast("int")
        sy = F.floor(
            gy.cast("double") * F.col("_h") / F.lit(float(grid))
        ).cast("int")
        sx = F.floor(
            gx.cast("double") * F.col("_w") / F.lit(float(grid))
        ).cast("int")
        base = F.lit(54) + (F.col("_h") - 1 - sy) * F.col("_row") + F.lit(3) * sx
        # try_element_at: malformed headers produce wild offsets; the
        # contract is NULL hash, not an ANSI index error
        bb = F.try_element_at(F.col("_ba"), base + 1)
        gg = F.try_element_at(F.col("_ba"), base + 2)
        rr = F.try_element_at(F.col("_ba"), base + 3)
        return F.lit(299) * rr + F.lit(587) * gg + F.lit(114) * bb

    # the n samples live in ONE array via transform — the per-sample
    # code generates once as a loop, not n inlined copies of the
    # derivation (the 64-sample named-column form blew janino's method
    # limit and fell back to interpreted evaluation)
    lumed = staged.select(
        id_col,
        "_w",
        "_h",
        "_ok",
        F.transform(F.sequence(F.lit(0), F.lit(n - 1)), samp).alias("_ls"),
    ).withColumn(
        # a NULL sample (truncated pixel array) nulls the sum and so the
        # hash — the contract for undecodable content
        "_tot",
        F.aggregate("_ls", F.lit(0).cast("long"), lambda a, x: a + x),
    )
    # hash accumulates in LONG — grid >= 6 sets bits >= 32, and bit 63
    # (grid=8) is the sign bit: shiftleft(1L, 63) wraps to Long.MIN,
    # which is exactly the two's-complement encoding the xor/bit_count
    # pair mining needs (an int cast here silently wrapped bits >= 31).
    # Bit weights ride as a literal long array (shiftleft needs a
    # literal shift, so it can't sit inside the lambda).
    weights = F.array(*[F.shiftleft(F.lit(1).cast("long"), i) for i in range(n)])
    ahash = F.aggregate(
        F.zip_with(
            F.col("_ls"),
            weights,
            lambda l, w: F.when(F.lit(n) * l > F.col("_tot"), w).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return lumed.select(
        F.col(id_col),
        # _tot NULL = some sample fell off a truncated pixel array: the
        # zip_with's otherwise(0) must not let that surface as hash 0
        F.when(F.col("_ok") & F.col("_tot").isNotNull(), ahash)
        .cast("long")
        .alias("ahash"),
        F.when(F.col("_ok"), F.col("_w")).cast("int").alias("width"),
        F.when(F.col("_ok"), F.col("_h")).cast("int").alias("height"),
    )


def audio_ahash(
    df: DataFrame,
    n_bits: int = 64,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """PIXEL-domain dedup's AUDIO twin: a perceptual average-hash over
    PCM16 mono WAV waveforms, pure Catalyst (no decoder).  ``n_bits``
    nearest-neighbor sample positions are read straight from the data
    chunk (LE int16 at byte 44+2i of the canonical RIFF layout), scored
    by ABSOLUTE amplitude, and bit k is set iff ``n·|s_k| > Σ|s_j|`` —
    exact integer arithmetic, replayable in the DuckDB oracle, and
    exactly invariant under uniform GAIN scaling (every sample and the
    mean scale together — pytest-pinned), the audio analog of
    :func:`image_ahash`'s brightness invariance.

    Non-WAV or truncated content yields a NULL hash.  Pair mining
    reuses :func:`media_neardup_pairs` with ``bits=n_bits``.  The
    64-bit default mirrors :func:`image_ahash`'s r12 scale fix: a
    16-bit hash gives the banded join only 2⁸ band-key values at
    hamming ≤ 1, so at corpus scale every bucket holds ~n/256 assets
    and the join degenerates quadratic — 64 bits keeps buckets sparse
    (pass a smaller ``n_bits`` only for toy fixtures, with a
    ``max_band_bucket`` cap on the mining side).  Scale: one narrow
    projection, no shuffle; cut lineage before a self-join (the
    image-aHash ProjectCollapsing lesson)."""
    if not 4 <= n_bits <= 64:
        raise ValueError(f"audio_ahash: n_bits must be in [4, 64], got {n_bits}")
    c = F.col(content_col)
    staged = df.select(
        F.col(id_col),
        _byte_array(c).alias("_ba"),
        (
            _magic(c, 1, "52494646")
            & _magic(c, 9, "57415645")
            & (F.length(c) >= 46)
        ).alias("_ok"),
        (_ule(c, 41, 4) / 2).cast("int").alias("_n"),
    )

    def samp(k: F.Column) -> F.Column:
        pos = F.floor(
            k.cast("double") * F.col("_n") / F.lit(float(n_bits))
        ).cast("int")
        # try_element_at: junk content yields wild _n; contract is NULL
        lo = F.try_element_at(F.col("_ba"), F.lit(45) + 2 * pos)
        hi = F.try_element_at(F.col("_ba"), F.lit(46) + 2 * pos)
        v = lo + F.lit(256) * hi
        signed = F.when(v >= 32768, v - 65536).otherwise(v)
        return F.abs(signed)

    # samples as ONE transform array (codegen loop, not n_bits inlined
    # trees — the image_ahash janino lesson); NULL sample -> NULL total
    # -> NULL hash
    lumed = staged.select(
        id_col,
        "_ok",
        F.transform(F.sequence(F.lit(0), F.lit(n_bits - 1)), samp).alias("_ss"),
    ).withColumn(
        "_tot", F.aggregate("_ss", F.lit(0).cast("long"), lambda a, x: a + x)
    )
    # LONG accumulation for the same reason as image_ahash: n_bits >= 32
    # sets bits past int range, and bit 63 is the sign bit
    weights = F.array(
        *[F.shiftleft(F.lit(1).cast("long"), k) for k in range(n_bits)]
    )
    ahash = F.aggregate(
        F.zip_with(
            F.col("_ss"),
            weights,
            lambda s, w: F.when(
                F.lit(n_bits) * s > F.col("_tot"), w
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return lumed.select(
        F.col(id_col),
        F.when(F.col("_ok") & F.col("_tot").isNotNull(), ahash)
        .cast("long")
        .alias("ahash"),
    )


def video_ahash(
    df: DataFrame,
    t_slots: int = 8,
    s_slots: int = 8,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """FRAME-domain video near-dup fingerprint — the video member of the
    perceptual-dedup trio (:func:`image_ahash` / :func:`audio_ahash`):
    a ``t_slots × s_slots`` average hash over the raw RVID container,
    pure Catalyst (no decoder).  Bit ``ti·s_slots + si`` samples the
    nearest-neighbor frame ``(ti·n_frames) div t_slots`` at pixel
    ``(si·w·h) div s_slots`` (BGR24, top-down — the
    `video_frame_profile` byte math), scores it with integer ITU-R 601
    luma-millis, and sets the bit iff ``n·luma > Σ luma`` — exact
    integer arithmetic, replayable in the DuckDB oracle, and exactly
    invariant under a uniform brightness shift (no saturation), like
    its image twin.  The temporal axis makes it robust to what
    re-encodes actually perturb: a few edited frames damage only their
    own time slots.

    Defaults give the standard 64-bit hash — the corpus-scale choice
    (small hashes starve the banded join's key space; see
    :func:`media_neardup_pairs`).  Non-RVID or truncated content
    yields a NULL hash.  Scale: one narrow codegen'd projection, no
    shuffle; cut lineage before the self-join (the image-aHash
    ProjectCollapsing lesson)."""
    n = t_slots * s_slots
    if not 2 <= t_slots <= 8 or not 2 <= s_slots <= 8:
        raise ValueError(
            f"video_ahash: t_slots/s_slots must be in [2, 8], got "
            f"{t_slots}x{s_slots}"
        )
    c = F.col(content_col)
    w, h, nf = _ule(c, 5, 2), _ule(c, 7, 2), _ule(c, 9, 2)
    ok = (
        _magic(c, 1, "52564944")
        & (w > 0)
        & (h > 0)
        & (nf > 0)
        # LONG arithmetic: junk headers parse to uint16s whose product
        # overflows int under ANSI mode
        & (
            F.length(c).cast("long")
            >= F.lit(12)
            + w.cast("long") * h.cast("long") * F.lit(3) * nf.cast("long")
        )
    )
    staged = df.select(
        F.col(id_col),
        _byte_array(c).alias("_ba"),
        ok.alias("_ok"),
        # dims NULL unless ok: the transform below still evaluates for
        # junk rows, and NULL offsets propagate to the NULL-hash
        # contract without overflowing the int sample math
        F.when(ok, w).alias("_w"),
        F.when(ok, h).alias("_h"),
        F.when(ok, nf).alias("_nf"),
    ).withColumn("_px", F.col("_w") * F.col("_h"))

    def samp(k: F.Column) -> F.Column:
        ti = F.floor(k / F.lit(s_slots)).cast("int")
        si = (k % F.lit(s_slots)).cast("int")
        fr = F.floor(
            ti.cast("double") * F.col("_nf") / F.lit(float(t_slots))
        ).cast("int")
        px = F.floor(
            si.cast("double") * F.col("_px") / F.lit(float(s_slots))
        ).cast("int")
        base = F.lit(12) + (fr * F.col("_px") + px) * 3
        # try_element_at: junk headers give wild offsets; contract = NULL
        bb = F.try_element_at(F.col("_ba"), base + 1)
        bg = F.try_element_at(F.col("_ba"), base + 2)
        br = F.try_element_at(F.col("_ba"), base + 3)
        return F.lit(299) * br + F.lit(587) * bg + F.lit(114) * bb

    lumed = staged.select(
        id_col,
        "_ok",
        F.transform(F.sequence(F.lit(0), F.lit(n - 1)), samp).alias("_ls"),
    ).withColumn(
        "_tot", F.aggregate("_ls", F.lit(0).cast("long"), lambda a, x: a + x)
    )
    # LONG accumulation + literal weight array: same codegen/sign-bit
    # reasoning as image_ahash (bit 63 wraps to Long.MIN — correct
    # two's-complement for the xor/bit_count pair mining)
    weights = F.array(*[F.shiftleft(F.lit(1).cast("long"), i) for i in range(n)])
    ahash = F.aggregate(
        F.zip_with(
            F.col("_ls"),
            weights,
            lambda l, w: F.when(F.lit(n) * l > F.col("_tot"), w).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return lumed.select(
        F.col(id_col),
        F.when(F.col("_ok") & F.col("_tot").isNotNull(), ahash)
        .cast("long")
        .alias("ahash"),
    )
