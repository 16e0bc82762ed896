"""Multimodal plumbing tests: binary columns + typed metadata through
Arrow-batched mapInPandas, stub gating, metadata-only frame planning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    return M.synthesize_assets(spark, 60).cache()


def test_media_schema_and_determinism(spark, assets):
    # same field names and types (generated columns are non-null, so
    # nullability flags legitimately differ from the declared schema)
    assert [(f.name, f.dataType.simpleString()) for f in assets.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in M.MEDIA_SCHEMA.fields
    ]
    assert assets.count() == 60
    again = M.synthesize_assets(spark, 60)
    a = assets.agg(F.sum(F.length("content")), F.count(F.lit(1))).collect()[0]
    b = again.agg(F.sum(F.length("content")), F.count(F.lit(1))).collect()[0]
    assert tuple(a) == tuple(b)
    # every asset carries 128 opaque bytes + type-appropriate metadata
    assert assets.filter(F.length("content") != 128).count() == 0
    assert assets.filter(
        (F.col("media_type") == "image") & F.col("metadata.width").isNull()
    ).count() == 0
    assert assets.filter(
        (F.col("media_type") == "video") & F.col("metadata.duration_s").isNull()
    ).count() == 0


def test_byte_features_real_compute(assets):
    feats = M.byte_features(assets)
    rows = feats.collect()
    assert len(rows) == 60
    by_id = {r.asset_id: r for r in rows}
    assert all(r.n_bytes == 128 for r in rows)
    assert all(len(r.sha256) == 64 for r in rows)
    assert all(0.0 <= r.mean_byte <= 255.0 for r in rows)
    # digests differ per asset (content is genuinely distinct)
    assert len({r.sha256 for r in rows}) == 60
    # feature values are deterministic
    again = {r.asset_id: r for r in M.byte_features(assets).collect()}
    assert all(again[k].sha256 == v.sha256 for k, v in by_id.items())


def test_decode_images_strict_never_fakes_luma(assets):
    """Without Pillow, the 128-byte header-only assets are NOT truly
    decodable (truncated pixel arrays / compressed formats): strict mode
    must emit NULL mean_luma labeled 'undecoded' — a byte statistic
    masquerading as luminance would be indistinguishable from a real
    decode downstream.  Non-strict keeps the clearly-labeled 'fake'
    stand-in for plumbing tests."""
    strict = M.decode_images(assets, strict=True)
    srows = {r.asset_id: r for r in strict.collect()}
    n_images = assets.filter(F.col("media_type") == "image").count()
    assert len(srows) == n_images
    assert all(r.decoder == "undecoded" for r in srows.values())
    assert all(r.mean_luma is None for r in srows.values())
    # header-parsed dims are still real
    assert all(r.width > 0 and r.height > 0 for r in srows.values())

    decoded = M.decode_images(assets, strict=False)
    rows = decoded.collect()
    assert len(rows) == n_images
    assert all(r.decoder == "fake" for r in rows)
    assert all(r.n_pixels == r.width * r.height for r in rows)


def _ref_decode_bmp(b: bytes):
    """Independent pure-Python BMP reference decoder for the tests: a
    top-down list of (bgr) rows, no NumPy shared with the operator."""
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    row = ((w * 3 + 3) // 4) * 4
    rows = [
        [tuple(b[off + r * row + 3 * x : off + r * row + 3 * x + 3]) for x in range(w)]
        for r in range(abs(h))
    ]
    return rows if h < 0 else rows[::-1]


def test_decodable_bmp_assets_real_pixels(spark):
    """synthesize_decodable_images emits complete valid BMPs; the NumPy
    decoder recovers the exact pixel bytes (cross-checked against an
    independent pure-Python reference decode) and strict decode_images
    reports a real 299/587/114 luma from them."""
    bmps = M.synthesize_decodable_images(spark, 20).cache()
    rows = {r.asset_id: r for r in bmps.collect()}
    assert len(rows) == 20
    decoded = {r.asset_id: r for r in M.decode_images(bmps, strict=True).collect()}
    for aid, a in rows.items():
        ref = _ref_decode_bmp(bytes(a.content))
        d = decoded[aid]
        assert d.decoder == "numpy-bmp"
        assert (d.height, d.width) == (len(ref), len(ref[0]))
        assert (d.width, d.height) == (a.metadata.width, a.metadata.height)
        want = sum(
            0.299 * px[2] + 0.587 * px[1] + 0.114 * px[0]
            for row in ref
            for px in row
        ) / (d.width * d.height)
        assert abs(d.mean_luma - want) < 1e-9


def test_strict_resize_numpy_real_pixels(spark):
    """resize_images(strict=True) without Pillow: decode → nearest
    neighbor → re-encode, all real bytes.  Resized output is itself a
    valid BMP whose pixels equal the reference nearest-neighbor
    selection of the source pixels."""
    bmps = M.synthesize_decodable_images(spark, 12).cache()
    src = {r.asset_id: _ref_decode_bmp(bytes(r.content)) for r in bmps.collect()}
    out = {r.asset_id: r for r in M.resize_images(bmps, 4, 3, strict=True).collect()}
    assert set(out) == set(src)
    for aid, r in out.items():
        assert r.resizer == "numpy-bmp"
        got = _ref_decode_bmp(bytes(r.content))
        ref = src[aid]
        h0, w0 = len(ref), len(ref[0])
        want = [
            [ref[(y * h0) // 3][(x * w0) // 4] for x in range(4)] for y in range(3)
        ]
        assert got == want
    # round-trip: the resized BMPs decode again through the same operator
    redecoded = M.decode_images(
        spark.createDataFrame(
            [(r.asset_id, "image", bytes(r.content)) for r in out.values()],
            "asset_id string, media_type string, content binary",
        ),
        strict=True,
    ).collect()
    assert all(r.decoder == "numpy-bmp" for r in redecoded)
    assert all((r.width, r.height) == (4, 3) for r in redecoded)


def test_strict_resize_raises_on_undecodable(assets):
    """Strict resize must error on content it cannot truly decode, not
    fabricate bytes."""
    import pyspark.errors

    with pytest.raises(Exception, match="strict resize"):
        M.resize_images(
            assets.filter(F.col("media_type") == "image"), 4, 4, strict=True
        ).collect()


def test_image_byte_stats_pure_catalyst(assets, spark):
    """Scan-segment byte statistics: all-JVM plan, exact values on a
    known payload."""
    stats = M.image_byte_stats(assets, segments=4)
    plan = stats._jdf.queryExecution().analyzed().toString()
    assert "mapInPandas" not in plan and "pythonUDF" not in plan.lower()
    rows = stats.collect()
    assert rows and all(r.n_bytes > 0 for r in rows)
    assert all(0.0 <= r.distinct_byte_ratio <= 1.0 for r in rows)
    assert all(len(r.segment_means) == 4 for r in rows)

    # hand-checked payload: bytes 0..3 -> mean 1.5, 4 distinct, segment
    # means [0, 1, 2, 3]
    one = spark.createDataFrame(
        [("x", "image", bytes([0, 1, 2, 3]))],
        "asset_id string, media_type string, content binary",
    )
    r = M.image_byte_stats(one, segments=4).collect()[0]
    assert r.n_bytes == 4
    assert abs(r.mean_byte - 1.5) < 1e-9
    assert abs(r.distinct_byte_ratio - round(4 / 256, 4)) < 1e-9
    assert list(r.segment_means) == [0.0, 1.0, 2.0, 3.0]


def test_resize_images_output_shape(assets):
    resized = M.resize_images(assets, width=8, height=8)
    rows = resized.collect()
    assert all(len(r.content) == 64 for r in rows)
    assert all(r.width == 8 and r.height == 8 for r in rows)
    # deterministic output bytes
    again = M.resize_images(assets, width=8, height=8).collect()
    assert {r.asset_id: bytes(r.content) for r in rows} == {
        r.asset_id: bytes(r.content) for r in again
    }


def test_frame_sample_plan_metadata_only(assets):
    plan = M.frame_sample_plan(assets, every_s=30.0)
    rows = plan.collect()
    videos = {
        r.asset_id: r.metadata.duration_s
        for r in assets.filter(F.col("media_type") == "video").collect()
    }
    assert {r.asset_id for r in rows} == set(videos)
    for r in rows:
        assert r.timestamp_s == r.frame_no * 30.0
        assert r.timestamp_s <= videos[r.asset_id]
    # pure Catalyst: no Python eval in the plan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.explain(extended=False)
    assert "mapInPandas" not in buf.getvalue()
    assert "BatchEvalPython" not in buf.getvalue()


def test_metadata_filter_prunes_before_python(assets):
    """The image filter must sit below mapInPandas in the plan (no bytes
    cross to Python for non-image assets)."""
    decoded = M.decode_images(assets)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decoded.explain(extended=False)
    plan = buf.getvalue()
    assert "MapInPandas" in plan
    assert "media_type" in plan  # filter present in the scan stage


def test_pack_shards_bounds_and_coverage(spark):
    assets = M.synthesize_assets(spark, 60, seed=3)
    target = 4096
    packed = M.pack_shards(assets, target_shard_bytes=target, num_writers=4).cache()
    # every asset assigned exactly once
    assert packed.count() == 60
    assert packed.select("asset_id").distinct().count() == 60
    fills = packed.groupBy("shard_id").agg(
        F.sum("nbytes").alias("fill"), F.count(F.lit(1)).alias("n")
    )
    # a shard only exceeds the target if it holds one oversized asset
    assert fills.filter((F.col("fill") > target) & (F.col("n") > 1)).count() == 0
    # nbytes matches the true payload size (JVM-side length, no bytes in Python)
    truth = assets.select("asset_id", F.length("content").alias("want"))
    assert (
        packed.join(truth, "asset_id").filter(F.col("nbytes") != F.col("want")).count()
        == 0
    )


def test_audio_segment_plan_covers_duration(assets):
    segs = M.audio_segment_plan(assets, segment_s=30.0, overlap_s=5.0).cache()
    rows = segs.collect()
    assert rows, "testdata contains audio assets"
    durs = {
        r.asset_id: r.metadata.duration_s
        for r in assets.filter(F.col("media_type") == "audio").collect()
    }
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, ss in by_asset.items():
        ss.sort(key=lambda r: r.segment_no)
        assert ss[0].start_s == 0.0
        assert abs(ss[-1].end_s - durs[aid]) < 1e-9  # last window reaches the end
        for a, b in zip(ss, ss[1:]):
            assert b.start_s - a.start_s == 25.0  # stride = segment - overlap
            assert a.end_s > b.start_s or a.end_s == durs[aid]  # overlap maintained
        for r in ss:
            assert r.end_s - r.start_s <= 30.0 + 1e-9

    with pytest.raises(ValueError):
        M.audio_segment_plan(assets, segment_s=5.0, overlap_s=5.0)


def test_image_header_roundtrip_all_formats(spark, assets):
    """The JVM header parser recovers exactly the dims the generator
    encoded — across png/jpeg/gif/bmp."""
    images = assets.filter(F.col("media_type") == "image")
    parsed = images.select(
        "asset_id",
        F.col("metadata.format").alias("want_fmt"),
        F.col("metadata.width").alias("want_w"),
        F.col("metadata.height").alias("want_h"),
        M.image_header("content").alias("hdr"),
    ).collect()
    assert len(parsed) > 0
    fmts = {r.hdr.format for r in parsed}
    assert fmts == {"png", "jpeg", "gif", "bmp"}  # all four codecs exercised
    for r in parsed:
        assert r.hdr.format == r.want_fmt, r.asset_id
        assert r.hdr.width == r.want_w, r.asset_id
        assert r.hdr.height == r.want_h, r.asset_id
    # non-image content parses to NULLs, not garbage
    other = assets.filter(F.col("media_type") != "image").select(
        M.image_header("content").alias("hdr")
    )
    assert other.filter(F.col("hdr.format").isNotNull()).count() == 0


def test_image_header_real_world_png(spark):
    """Parse an actual PNG file (canonical 1x1 transparent pixel), not
    one produced by our own encoder — guards against a symmetric
    encode/decode bug."""
    import base64

    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
        "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    df = spark.createDataFrame([("one", png_1x1)], "asset_id string, content binary")
    r = df.select(M.image_header("content").alias("h")).collect()[0].h
    assert (r.format, r.width, r.height) == ("png", 1, 1)
    # truncated / junk bytes → NULL fields, no error
    junk = spark.createDataFrame(
        [("j", b"\x89PN"), ("k", b"hello world")], "asset_id string, content binary"
    )
    rows = junk.select(M.image_header("content").alias("h")).collect()
    assert all(r.h.format is None for r in rows)


def test_wav_sample_rate_parse(spark, assets):
    audio = assets.filter(F.col("media_type") == "audio")
    rows = audio.select(
        F.col("metadata.sample_rate").alias("want"),
        M.wav_sample_rate("content").alias("got"),
    ).collect()
    assert len(rows) > 0
    assert all(r.got == r.want for r in rows)
    non_audio = assets.filter(F.col("media_type") != "audio")
    assert (
        non_audio.select(M.wav_sample_rate("content").alias("sr"))
        .filter(F.col("sr").isNotNull())
        .count()
        == 0
    )


def test_image_dimensions_pure_catalyst(spark, assets):
    """The metadata path runs with no Python stage and no Pillow —
    strict-mode metadata is real (VERDICT r2 item 3)."""
    import contextlib
    import io

    dims = M.image_dimensions(assets)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dims.explain(extended=False)
    plan = buf.getvalue()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    rows = dims.collect()
    want = {
        r.asset_id: (r.metadata.format, r.metadata.width, r.metadata.height)
        for r in assets.filter(F.col("media_type") == "image").collect()
    }
    assert {r.asset_id: (r.format, r.width, r.height) for r in rows} == want


def test_media_simhash_neardup_pairs(spark):
    """Byte-flipped copies of the same payload land a few Hamming bits
    apart; unrelated assets don't pair."""
    import random

    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal import media as M

    rng = random.Random(11)
    base = bytes(rng.randrange(256) for _ in range(4000))
    tweaked = bytearray(base)
    for pos in rng.sample(range(4000), 3):  # 3 byte flips
        tweaked[pos] ^= 0xFF
    other = bytes(rng.randrange(256) for _ in range(4000))
    df = spark.createDataFrame(
        [
            ("a", "image", base),
            ("a2", "image", bytes(tweaked)),
            ("b", "image", other),
        ],
        "asset_id string, media_type string, content binary",
    )
    fp = M.media_simhash(df)
    rows = {r.asset_id: r for r in fp.collect()}
    assert rows["a"].n_windows == 4000 - 7
    assert rows["a"].simhash != rows["b"].simhash

    pairs = M.media_neardup_pairs(fp, max_hamming=8).collect()
    assert [(p.asset_a, p.asset_b) for p in pairs] == [("a", "a2")]
    assert pairs[0].hamming <= 8

    # determinism: identical content -> identical fingerprint, hamming 0
    dup = spark.createDataFrame(
        [("x", "image", base), ("y", "image", base)],
        "asset_id string, media_type string, content binary",
    )
    p2 = M.media_neardup_pairs(M.media_simhash(dup), max_hamming=0).collect()
    assert [(p.asset_a, p.asset_b, p.hamming) for p in p2] == [("x", "y", 0)]

def test_media_neardup_default_banding_guard(spark):
    """Defaulted bands with max_hamming >= 32 cannot honor the exact
    pigeonhole recall contract on a 64-bit hash — must raise; explicit
    bands opt into approximate recall."""
    import pytest

    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal import media as M

    df = spark.createDataFrame(
        [("a", "image", b"\x00" * 64)],
        "asset_id string, media_type string, content binary",
    )
    fp = M.media_simhash(df)
    with pytest.raises(ValueError, match="exact recall"):
        M.media_neardup_pairs(fp, max_hamming=32)
    # explicit bands: allowed (approximate) — runs fine; the narrow
    # 4-bit band keys draw the keyspace warning unless capped
    assert (
        M.media_neardup_pairs(
            fp, max_hamming=32, bands=16, max_band_bucket=1000
        ).count()
        == 0
    )


def test_media_neardup_hot_bucket_cap(spark):
    """A planted mega-bucket (one fingerprint duplicated B times — the
    boilerplate-logo scenario) yields B(B-1)/2 pairs uncapped; with
    ``max_band_bucket`` the hot band keys drop BEFORE the self-join
    (the shared :func:`operators.dedup.banded_self_join` guard), so the
    quadratic term never materializes while pairs from cold buckets
    survive untouched."""
    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal import media as M

    hot = [(f"HOT-{i:03d}", 0x0F0F0F0F) for i in range(100)]
    cold = [("C-1", 1 << 40), ("C-2", (1 << 40) | 1)]  # hamming 1 apart
    fp = spark.createDataFrame(hot + cold, "asset_id string, simhash long")

    uncapped = M.media_neardup_pairs(fp, max_hamming=1)
    assert uncapped.count() == 100 * 99 // 2 + 1

    capped = M.media_neardup_pairs(fp, max_hamming=1, max_band_bucket=10)
    rows = {(r.asset_a, r.asset_b, r.hamming) for r in capped.collect()}
    # the 100-member bucket dropped; the cold pair (bucket size 2) kept
    assert rows == {("C-1", "C-2", 1)}


def test_image_ahash_long_hash_bits_past_int(spark):
    """grid=8 (the default) packs 64 bits — the hash column must be
    LONG and bit 63 must survive: an image whose LAST grid sample is
    the only above-mean one hashes to exactly Long.MIN (1<<63 in two's
    complement), which an int cast would have mangled."""
    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal import media as M

    assets = M.synthesize_decodable_images(spark, 8)
    out = M.image_ahash(assets)  # default grid=8
    assert dict(out.dtypes)["ahash"] == "bigint"
    hs = [r.ahash for r in out.collect()]
    assert all(h is not None for h in hs)
    # 64-bit occupancy: at least one hash outside int32 range on real
    # synthesized pixels (grid=8 sets bits >= 32 whenever any of the
    # last 32 samples is above the mean — astronomically certain here)
    assert any(h < -(1 << 31) or h >= (1 << 31) for h in hs)


def test_wav_decode_roundtrip_and_strictness(spark):
    """The PCM16 chain is real end to end: synthesized WAV bytes decode
    with the NumPy codec to exactly n_samples int16 samples at the
    header's rate (and the JVM-side wav_sample_rate parse agrees);
    non-WAV bytes yield NULL stats under strict (never fabricated)."""
    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal import media

    assets = media.synthesize_decodable_wavs(spark, 12)
    rows = assets.select(
        "asset_id", "content",
        F.col("metadata.sample_rate").alias("rate"),
        media.wav_sample_rate("content").alias("jvm_rate"),
    ).collect()
    for r in rows:
        assert r.jvm_rate == r.rate  # JVM header parse agrees
        dec = media._np_decode_wav(bytes(r.content))
        assert dec is not None
        rate, samples = dec
        assert rate == r.rate
        assert samples.dtype.str == "<i2"
        assert 8 <= len(samples) <= 24
    feats = {r.asset_id: r for r in
             media.audio_waveform_features(assets, strict=True).collect()}
    assert all(f.decoder == "numpy-pcm16" for f in feats.values())
    assert all(f.sumsq >= 0 and f.peak_abs <= 32768 for f in feats.values())
    junk = spark.createDataFrame(
        [("J-1", "audio", bytearray(b"not a wav at all, definitely"))],
        "asset_id string, media_type string, content binary",
    )
    jf = media.audio_waveform_features(junk, strict=True).collect()[0]
    assert jf.decoder == "undecoded" and jf.sumsq is None and jf.n_samples is None


def test_video_decode_roundtrip_and_sampling(spark):
    """RVID frames are real end to end: decode recovers (nf, h, w, 3)
    uint8 frames matching the metadata; stride-2 sampling counts
    ceil(nf/2); junk bytes yield NULL stats under strict."""
    import numpy as np

    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal import media

    assets = media.synthesize_decodable_videos(spark, 10)
    rows = assets.select(
        "asset_id", "content",
        F.col("metadata.width").alias("w"),
        F.col("metadata.height").alias("h"),
    ).collect()
    for r in rows:
        dec = media._np_decode_rvid(bytes(r.content))
        assert dec is not None
        fps, frames = dec
        assert frames.dtype == np.uint8
        assert frames.shape[1] == r.h and frames.shape[2] == r.w
        assert 3 <= frames.shape[0] <= 6 and fps in (10, 24, 30)
    prof = {p.asset_id: p for p in
            media.video_frame_profile(assets, stride=2).collect()}
    for p in prof.values():
        assert p.decoder == "numpy-rvid"
        assert p.n_sampled == (p.n_frames + 1) // 2
        assert 0 <= p.luma_millis <= 1000 * 255 * p.n_sampled * p.width * p.height
    junk = spark.createDataFrame(
        [("J-1", "video", bytearray(b"RVIDxx"))],
        "asset_id string, media_type string, content binary",
    )
    jp = media.video_frame_profile(junk).collect()[0]
    assert jp.decoder == "undecoded" and jp.luma_millis is None


def test_image_ahash_perceptual_properties(spark):
    """The pixel-domain aHash contract: (1) EXACT invariance under a
    uniform brightness shift (no saturation) — every sample and the
    mean move together; (2) a single-pixel edit moves the hash at most
    a few bits while an unrelated image sits far away; (3) a planted
    content duplicate is found by the banded hamming join; (4) non-BMP
    content yields a NULL hash."""
    import numpy as np

    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal.media import (
        _np_encode_bmp,
        image_ahash,
        media_neardup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(20, 200, size=(8, 8, 3), dtype=np.uint8)
    brighter = (base + 30).astype(np.uint8)          # no channel saturates
    one_px = base.copy()
    one_px[3, 4] = [255, 255, 255]                    # single-pixel edit
    other = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [
        ("base", "image", _np_encode_bmp(base)),
        ("bright", "image", _np_encode_bmp(brighter)),
        ("onepx", "image", _np_encode_bmp(one_px)),
        ("dup", "image", _np_encode_bmp(base)),
        ("other", "image", _np_encode_bmp(other)),
        ("junk", "image", b"\x00" * 64),
    ]
    df = spark.createDataFrame(
        rows, "asset_id string, media_type string, content binary"
    )
    hs = {r.asset_id: r.ahash for r in image_ahash(df, grid=4).collect()}
    assert hs["junk"] is None
    assert hs["bright"] == hs["base"]                 # exact invariance
    assert hs["dup"] == hs["base"]
    ham = lambda a, b: bin(hs[a] ^ hs[b]).count("1")
    assert ham("onepx", "base") <= 3                  # local edit, local damage
    assert ham("other", "base") >= 4                  # unrelated stays far

    # pair mining over the materialized hashes (the registry query cuts
    # lineage the same way — ProjectCollapsing would otherwise inline
    # the 48-sample derivation into both join sides)
    fp = spark.createDataFrame(
        [(k, v) for k, v in hs.items() if v is not None],
        "asset_id string, simhash int",
    )
    pairs = {
        (r.asset_a, r.asset_b)
        for r in media_neardup_pairs(
            fp, max_hamming=1, bits=16, max_band_bucket=50
        ).collect()
    }
    assert ("base", "dup") in pairs and ("base", "bright") in pairs
    assert ("base", "other") not in pairs

    with pytest.raises(ValueError, match="grid"):
        image_ahash(df, grid=1)


def test_audio_ahash_perceptual_properties(spark):
    """The waveform aHash contract: exact invariance under uniform gain
    (no clipping), locality under a single-sample edit, planted
    duplicates found by the banded join, non-WAV content → NULL."""
    import io
    import struct as pystruct

    import numpy as np

    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal.media import (
        audio_ahash,
        media_neardup_pairs,
    )

    def wav(samples):
        data = b"".join(pystruct.pack("<h", int(s)) for s in samples)
        hdr = (
            b"RIFF" + pystruct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + pystruct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + pystruct.pack("<I", len(data))
        )
        return hdr + data

    rng = np.random.default_rng(3)
    base = rng.integers(-8000, 8000, size=24).tolist()
    louder = [s * 3 for s in base]                     # uniform gain, no clip
    one_edit = list(base)
    one_edit[5] = 30000
    other = rng.integers(-30000, 30000, size=24).tolist()
    rows = [
        ("base", "audio", wav(base)),
        ("gain", "audio", wav(louder)),
        ("edit", "audio", wav(one_edit)),
        ("dup", "audio", wav(base)),
        ("other", "audio", wav(other)),
        ("junk", "audio", b"\x01" * 64),
    ]
    df = spark.createDataFrame(
        rows, "asset_id string, media_type string, content binary"
    )
    hs = {r.asset_id: r.ahash for r in audio_ahash(df).collect()}
    assert hs["junk"] is None
    assert hs["gain"] == hs["base"]                    # exact gain invariance
    assert hs["dup"] == hs["base"]
    ham = lambda a, b: bin(hs[a] ^ hs[b]).count("1")
    # one edited sample damages its own ~64/24 bit positions plus the
    # handful of near-mean samples the shifted total flips — local, far
    # below the ~32-bit expectation for unrelated waveforms
    assert ham("edit", "base") <= 16
    assert ham("other", "base") > ham("edit", "base")
    fp = spark.createDataFrame(
        [(k, v) for k, v in hs.items() if v is not None],
        "asset_id string, simhash bigint",
    )
    pairs = {
        (r.asset_a, r.asset_b)
        for r in media_neardup_pairs(fp, max_hamming=1, bits=64).collect()
    }
    assert ("base", "dup") in pairs and ("base", "gain") in pairs

    with pytest.raises(ValueError, match="n_bits"):
        audio_ahash(df, n_bits=2)


def test_video_ahash_perceptual_properties(spark):
    """The frame-sampled video aHash contract: exact invariance under a
    uniform brightness shift (no saturation), locality under an edit
    confined to one frame, planted duplicates found by the banded join,
    non-RVID content → NULL."""
    import struct as pystruct

    import numpy as np

    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal.media import (
        media_neardup_pairs,
        video_ahash,
    )

    def rvid(frames):  # frames: (nf, h, w, 3) uint8 top-down BGR
        nf, h, w = frames.shape[:3]
        return (
            b"RVID"
            + pystruct.pack("<HHHH", w, h, nf, 24)
            + frames.astype(np.uint8).tobytes()
        )

    rng = np.random.default_rng(9)
    base = rng.integers(20, 200, size=(4, 3, 3, 3), dtype=np.uint8)
    brighter = (base + 30).astype(np.uint8)           # no channel saturates
    one_frame = base.copy()
    one_frame[2] = 255 - one_frame[2]                 # invert frame 2 only
    other = rng.integers(0, 256, size=(4, 3, 3, 3), dtype=np.uint8)
    rows = [
        ("base", "video", rvid(base)),
        ("bright", "video", rvid(brighter)),
        ("fedit", "video", rvid(one_frame)),
        ("dup", "video", rvid(base)),
        ("other", "video", rvid(other)),
        ("junk", "video", b"\x07" * 64),
        ("trunc", "video", rvid(base)[:20]),
    ]
    df = spark.createDataFrame(
        rows, "asset_id string, media_type string, content binary"
    )
    hs = {r.asset_id: r.ahash for r in video_ahash(df).collect()}
    assert hs["junk"] is None and hs["trunc"] is None
    assert hs["bright"] == hs["base"]                 # exact invariance
    assert hs["dup"] == hs["base"]
    ham = lambda a, b: bin(hs[a] ^ hs[b]).count("1")
    # frame 2 owns 2 of the 8 time slots (16 bits) plus whatever the
    # shifted mean flips elsewhere — localized, below unrelated noise
    assert ham("fedit", "base") <= 32
    assert ham("fedit", "base") < ham("other", "base") + 16
    fp = spark.createDataFrame(
        [(k, v) for k, v in hs.items() if v is not None],
        "asset_id string, simhash bigint",
    )
    pairs = {
        (r.asset_a, r.asset_b)
        for r in media_neardup_pairs(fp, max_hamming=1, bits=64).collect()
    }
    assert ("base", "dup") in pairs and ("base", "bright") in pairs

    with pytest.raises(ValueError, match="t_slots"):
        video_ahash(df, t_slots=1)


def test_video_ahash_matches_numpy_decoder(spark):
    """Cross-kernel parity: the pure-Catalyst byte math of video_ahash
    must reproduce the hash computed from the REAL NumPy-decoded frames
    (the same decoder video_frame_profile trusts) — pinning the
    frame/pixel offset arithmetic against an independent implementation
    on the synthesized corpus."""
    import numpy as np

    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal.media import (
        _np_decode_rvid,
        synthesize_decodable_videos,
        video_ahash,
    )

    vids = synthesize_decodable_videos(spark, 40)
    got = {r.asset_id: r.ahash for r in video_ahash(vids).collect()}
    for row in vids.collect():
        fps, frames = _np_decode_rvid(bytes(row.content))
        nf, h, w = frames.shape[:3]
        lumas = []
        for k in range(64):
            fr = (k // 8) * nf // 8
            px = (k % 8) * (w * h) // 8
            b, g, r = frames[fr].reshape(-1, 3)[px].astype(int)
            lumas.append(299 * r + 587 * g + 114 * b)
        tot = sum(lumas)
        expect = sum(
            (1 << k) for k, l in enumerate(lumas) if 64 * l > tot
        )
        expect = expect - (1 << 64) if expect >= (1 << 63) else expect
        assert got[row.asset_id] == expect, row.asset_id


def test_media_neardup_warns_on_tiny_band_keyspace(spark):
    """16-bit fingerprints at 2 bands = 2^8 band-key values: quadratic
    at corpus scale (r12 review) — uncapped mining must warn."""
    from snowflake_iceberg_cld_bcdr_demo_spark.multimodal.media import (
        media_neardup_pairs,
    )

    fp = spark.createDataFrame(
        [("a", 3), ("b", 3)], "asset_id string, simhash bigint"
    )
    with pytest.warns(RuntimeWarning, match="band-key values"):
        media_neardup_pairs(fp, max_hamming=1, bits=16)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # capped or wide-banded: no warning
        media_neardup_pairs(fp, max_hamming=1, bits=16, max_band_bucket=50)
        media_neardup_pairs(fp, max_hamming=1, bits=64)
