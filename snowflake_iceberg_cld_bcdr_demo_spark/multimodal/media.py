"""Media-asset operators over ``binary`` columns.

Design (north-star multimodal spec):

- **Schema**: ``content binary`` + typed ``metadata`` struct — media stay
  opaque to Catalyst; only metadata participates in pruning/filters, so a
  `WHERE media_type = 'image' AND metadata.width > 512` prunes before any
  byte moves to Python.
- **Compute**: Arrow-batched ``mapInPandas`` (one Python worker round per
  batch, zero-copy byte transfer).  Each transform declares its output
  schema explicitly so downstream plans stay fully typed.
- **Decode**: gated on Pillow.  Absent (this environment), ``strict=True``
  raises NotImplementedError at plan-build time — a clearly-marked stub —
  and ``strict=False`` produces a deterministic byte-derived fake so the
  full pipeline (schema, batching, partitioning) is exercised end-to-end.
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


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: content bytes are seeded
    md5-chains (opaque, incompressible — realistic for the planner), and
    metadata is hash-derived.  Spark-native (`spark.range` + exprs), so it
    scales like any other generator in this repo."""
    idx = F.col("id")
    h = F.md5(F.concat(F.lit(f"{seed}#media#"), idx.cast("string")))
    # 128 bytes of deterministic content: 8 chained md5 digests
    chain = F.concat(
        *[F.unhex(F.md5(F.concat(h, F.lit(str(i))))) for i in range(8)]
    )
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(h), F.lit(3)) + 1).cast("int"),
    )
    meta = F.struct(
        F.when(mtype == "image", (F.pmod(F.xxhash64(h, F.lit("w")), F.lit(1920)) + 1).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(mtype == "image", (F.pmod(F.xxhash64(h, F.lit("h")), F.lit(1080)) + 1).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(mtype == "audio", F.lit(16000)).otherwise(F.lit(None).cast("int")).alias(
            "sample_rate"
        ),
        F.when(
            mtype != "image",
            (F.pmod(F.xxhash64(h, F.lit("d")), F.lit(600)) + 1).cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("duration_s"),
        F.when(mtype == "image", F.lit("png"))
        .when(mtype == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
    )
    return spark.range(n).select(
        F.format_string("ASSET-%06d", idx.cast("int")).alias("asset_id"),
        mtype.alias("media_type"),
        chain.cast("binary").alias("content"),
        meta.alias("metadata"),
    )


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


def decode_images(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode image assets to pixel statistics.

    STUB: real pixel decode needs Pillow, which this environment lacks.
    ``strict=True`` raises ``NotImplementedError`` (the clearly-marked
    stub path); otherwise a deterministic byte-derived fake stands in so
    the plumbing — metadata filter pushdown, Arrow batching, typed output
    — runs for real.  With Pillow installed the same code decodes
    actual pixels (see the import-gated branch)."""
    has_pil = _pil_available()
    if strict and not has_pil:
        raise NotImplementedError(
            "image decode requires Pillow; install it or use strict=False "
            "for the deterministic fake decoder"
        )
    images = df.filter(F.col("media_type") == "image")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if has_pil:
                import io

                from PIL import Image

                def stats(b):
                    img = Image.open(io.BytesIO(b)).convert("L")
                    w, h = img.size
                    data = list(img.getdata())
                    return w, h, w * h, float(sum(data)) / max(len(data), 1), "pillow"

                rows = [stats(b) for b in pdf["content"]]
            else:
                # deterministic fake: "pixels" are the raw bytes tiled to
                # the metadata dimensions
                rows = [
                    (
                        int(w or 0),
                        int(h or 0),
                        int((w or 0) * (h or 0)),
                        float(sum(b)) / len(b) if len(b) else 0.0,
                        "fake",
                    )
                    for b, w, h in zip(
                        pdf["content"],
                        pdf["metadata"].map(lambda m: m["width"]),
                        pdf["metadata"].map(lambda m: m["height"]),
                    )
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

    STUB decode (as :func:`decode_images`); the fake path re-derives
    deterministic bytes of the target size so downstream consumers see
    correctly-shaped binary output."""
    has_pil = _pil_available()
    if strict and not has_pil:
        raise NotImplementedError("image resize requires Pillow")
    images = df.filter(F.col("media_type") == "image")
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if has_pil:
                import io

                from PIL import Image

                def do(b):
                    img = Image.open(io.BytesIO(b)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    return buf.getvalue()

                content = [do(b) for b in pdf["content"]]
                tag = "pillow"
            else:
                content = [
                    (hashlib.sha256(b).digest() * (target // 32 + 1))[:target]
                    for b in pdf["content"]
                ]
                tag = "fake"
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": content,
                    "width": width,
                    "height": height,
                    "resizer": tag,
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
