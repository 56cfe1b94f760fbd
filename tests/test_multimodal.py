"""Multimodal plumbing: binary payload schema, mapInPandas featurization,
stub boundary behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeshack_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    base = spark.range(20).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
    )
    return base.select(
        "media_id",
        "kind",
        mm.fake_media_col(F.col("media_id"), "media").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(100).alias("n_frames"),
        ).alias("meta"),
    )


def test_extract_features_shape_and_determinism(spark, media):
    feats = mm.extract_features(media, feature_dim=8).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["n_bytes"] > len(b"LSFAKE1:")
        assert len(r["checksum"]) == 16
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    again = mm.extract_features(media, feature_dim=8).collect()
    assert {r["media_id"]: r["checksum"] for r in feats} == {
        r["media_id"]: r["checksum"] for r in again
    }


def test_decode_boundary_rejects_compressed_media(spark):
    with pytest.raises(NotImplementedError):
        mm._decode_payload(b"\x89PNG\r\n\x1a\n....")


# ------------------------------------------------ real codec boundary


def test_ppm_round_trip_and_header_variants():
    pixels = bytes(range(4 * 2 * 3))
    data = mm.encode_ppm(4, 2, pixels)
    assert mm.decode_ppm(data) == (4, 2, pixels)
    # netpbm allows comments and arbitrary header whitespace
    commented = b"P6\n# a comment\n 4\t2 # another\n255\n" + pixels
    assert mm.decode_ppm(commented) == (4, 2, pixels)
    with pytest.raises(ValueError):
        mm.decode_ppm(data[:-1])  # truncated raster
    with pytest.raises(ValueError):
        mm.encode_ppm(4, 2, pixels[:-1])
    with pytest.raises(NotImplementedError):
        mm.decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)  # 16-bit


def test_wav_round_trip_and_chunk_walk():
    samples = [0, 1, -1, 32767, -32768, 1234]
    data = mm.encode_wav_pcm16(16000, samples)
    assert mm.decode_wav_pcm16(data) == (16000, 1, samples)
    # extra chunk before data must be skipped (chunk walk, not offsets)
    import struct

    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = data[:12] + extra + data[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert mm.decode_wav_pcm16(patched) == (16000, 1, samples)
    with pytest.raises(NotImplementedError):
        # fmt tag 2 = ADPCM (compressed) — behind the codec boundary
        bad = bytearray(data)
        bad[20] = 2
        mm.decode_wav_pcm16(bytes(bad))


def test_decode_media_dispatch():
    img = mm.encode_ppm(2, 1, b"abcdef")
    d = mm.decode_media(img)
    assert (d["format"], d["width"], d["height"], d["content"]) == (
        "ppm", 2, 1, b"abcdef"
    )
    wav = mm.encode_wav_pcm16(8000, [7, -7])
    d = mm.decode_media(wav)
    assert d["format"] == "wav" and d["samples"] == [7, -7]
    assert mm.decode_media(b"LSFAKE1:xyz")["content"] == b"xyz"


def test_image_stats_real_decode_end_to_end(spark):
    """payload→pixels→features with no stub anywhere: plant PPMs from
    ids, decode through the netpbm parser, check channel sums against a
    pure-Python recomputation of the md5-derived pixels."""
    import hashlib

    media = mm.plant_ppm_media(spark.range(25), "id", width=4, height=3)
    rows = {r["media_id"]: r for r in mm.image_stats(media).collect()}
    assert len(rows) == 25
    for mid in range(25):
        digest = hashlib.md5(str(mid).encode()).digest()
        pix = (digest * 3)[:36]
        sums = [0, 0, 0]
        for i, b in enumerate(pix):
            sums[i % 3] += b
        r = rows[mid]
        assert (r["width"], r["height"], r["n_pixels"]) == (4, 3, 12)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(sums)
        assert r["mean_r"] == sums[0] / 12
    # extract_features (the generic path) also crosses the real decoder:
    # checksum is over the decoded RASTER, not the encoded payload
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    digest = hashlib.sha256((hashlib.md5(b"0").digest() * 3)[:36]).digest()
    assert feats[0]["checksum"] == digest.hex()[:16]


def test_audio_stats_real_decode_end_to_end(spark):
    """The audio twin: plant PCM16 WAVs from ids, decode through the
    chunk-walking parser, check amplitude stats against a pure-Python
    recomputation of the md5-derived samples."""
    import hashlib
    import struct

    media = mm.plant_wav_media(spark.range(15), "id", sample_rate=8000)
    rows = {r["media_id"]: r for r in mm.audio_stats(media).collect()}
    assert len(rows) == 15
    for mid in range(15):
        raw = (hashlib.md5(str(mid).encode()).digest() * 4)[:64]
        samples = [
            struct.unpack("<h", raw[2 * i : 2 * i + 2])[0] for i in range(32)
        ]
        r = rows[mid]
        assert (r["sample_rate"], r["n_samples"]) == (8000, 32)
        assert r["sum_amp"] == sum(samples)
        assert r["max_abs"] == max(abs(s) for s in samples)
        assert r["mean_amp"] == sum(samples) / 32


def test_resize_updates_meta_only_for_images(spark, media):
    out = mm.resize_images(media, 64, 64)
    rows = out.collect()
    assert rows and all(r["kind"] == "image" for r in rows)
    assert all(r["meta"]["width"] == 64 and r["meta"]["height"] == 64 for r in rows)


def test_sample_frames(spark, media):
    out = mm.sample_frames(media, every_n=25).collect()
    videos = [r for r in media.collect() if r["kind"] == "video"]
    # frames 0,25,50,75 per video
    assert len(out) == 4 * len(videos)


def test_media_dedup_pipeline_end_to_end(spark):
    """Multimodal → similarity composition (media dedup): extract_features
    embeddings feed SRP-LSH near-dup discovery and IVF top-k directly —
    the operators compose with only column-name arguments, no glue.
    Planted duplicate payloads (same LSFAKE1 bytes under new media_ids)
    are exactly the pairs discovered; distinct payloads stay apart
    (sha256-derived fake features: identical payload ⇒ identical vector,
    cosine 1.0; distinct payloads ⇒ cosine well below 0.99 at 64 dims)."""
    from lakeshack_spark.operators import similarity

    n, n_dup = 120, 20
    # media_id i >= 100 carries the SAME payload as media_id i-100
    media = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        mm.fake_media_col(F.col("id") % 100, "image").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    feats = mm.extract_features(media, feature_dim=64)
    pairs = similarity.srp_near_dup_pairs(
        feats,
        threshold=0.99,
        id_col="media_id",
        vec_col="feature",
        dim=64,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(i, i + 100) for i in range(n_dup)}
    assert got == want, got.symmetric_difference(want)
    assert all(r["cosine"] >= 0.999999 for r in pairs)

    # Same embeddings through the ANN path: media 0's nearest neighbor at
    # nprobe = n_centroids must be its planted duplicate at cosine 1.0.
    cents = similarity.sample_centroids(
        feats, 4, id_col="media_id", vec_col="feature"
    )
    top = similarity.ivf_topk(
        feats,
        feats.filter(F.col("media_id") == 0),
        cents,
        k=1,
        nprobe=4,
        id_col="media_id",
        vec_col="feature",
    ).collect()
    assert len(top) == 1
    assert top[0]["neighbor_id"] == 100
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-12)


def test_media_compression_tier_composition(spark):
    """Multimodal → compression composition: extracted media embeddings
    flow through JL projection and int8 quantization with only
    column-name arguments. Identical payloads keep identical projected
    coordinates and identical codes (both transforms are deterministic
    functions of the vector), so the compressed tiers preserve
    exact-duplicate structure end to end."""
    from lakeshack_spark.operators import similarity

    media = spark.range(40).select(
        F.col("id").alias("media_id"),
        F.lit("audio").alias("kind"),
        mm.fake_media_col(F.col("id") % 20, "audio").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    feats = mm.extract_features(media, feature_dim=16)
    proj = similarity.project_embeddings(
        feats, out_dim=4, vec_col="feature", dim=16
    )
    quant = similarity.quantize_embeddings(proj, vec_col="feature")
    rows = {r.media_id: r for r in quant.collect()}
    for i in range(20):
        a, b = rows[i], rows[i + 20]
        assert [a[f"proj_{j}"] for j in range(4)] == [
            b[f"proj_{j}"] for j in range(4)
        ]
        assert a.codes == b.codes and a.scale == b.scale
    # distinct payloads must not share full code vectors
    distinct_codes = {tuple(rows[i].codes) for i in range(20)}
    assert len(distinct_codes) > 1
