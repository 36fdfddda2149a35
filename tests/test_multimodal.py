"""Multimodal binary-column operators: schema/plumbing is real
(binary Arrow transfer, multi-batch mapInPandas, frame explode);
pixel decode is the deterministic fake-raw codec (no image libs in
the container — real formats must raise at the marked seam)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import multimodal as mm

N = 40


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(N).withColumnRenamed("id", "doc_id")
    return mm.synthesize_media(ids, width=16, height=12, channels=3).cache()


def test_media_schema_and_blob_shape(media):
    assert media.schema == mm.MEDIA_SCHEMA
    rows = media.orderBy("media_id").collect()
    assert len(rows) == N
    r = rows[5]
    assert r["kind"] == "image"
    assert r["meta"]["width"] == 16 and r["meta"]["channels"] == 3
    blob = bytes(r["content"])
    assert blob[:5] == mm.MAGIC
    assert len(blob) == 17 + 16 * 12 * 3


def test_features_deterministic_and_correct(spark, media):
    got = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert len(got) == N
    # independent ground truth: regenerate pixels with the same seed rule
    rng = np.random.default_rng(5 + 7_777_777)
    px = rng.integers(0, 256, 12 * 16 * 3, dtype=np.uint8)
    assert got[5]["px_mean"] == pytest.approx(float(px.mean()))
    assert got[5]["px_std"] == pytest.approx(float(px.std()))
    assert got[5]["px_min"] == int(px.min()) and got[5]["px_max"] == int(px.max())
    # determinism across jobs
    again = {r["media_id"]: r["px_mean"] for r in mm.image_features(media).collect()}
    assert all(again[k] == got[k]["px_mean"] for k in again)


def test_multiple_arrow_batches(spark):
    """Plumbing under small Arrow batches: same result, so the
    per-batch iteration really is batch-shape-independent."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        ids = spark.range(N).withColumnRenamed("id", "doc_id").coalesce(1)
        m = mm.synthesize_media(ids)
        assert mm.image_features(m).count() == N
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_resize(media):
    out = mm.resize_images(media, 8, 6)
    r = out.where(F.col("media_id") == 3).first()
    assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
    blob = bytes(r["content"])
    w, h, c = struct.unpack("<iii", blob[5:17])
    assert (w, h, c) == (8, 6, 3)
    assert len(blob) == 17 + 8 * 6 * 3
    # nearest-neighbor: corner pixel (0,0) survives any downscale
    orig = np.random.default_rng(3 + 7_777_777).integers(0, 256, 12 * 16 * 3, dtype=np.uint8)
    out_px = np.frombuffer(blob[17:], dtype=np.uint8).reshape(6, 8, 3)
    assert (out_px[0, 0] == orig.reshape(12, 16, 3)[0, 0]).all()


def test_frame_sampling(spark):
    ids = spark.range(4).withColumnRenamed("id", "doc_id")
    vids = mm.synthesize_media(ids, kind="video", width=8, height=8, channels=1, n_frames=10)
    frames = mm.sample_frames(vids, every_k=3)
    rows = frames.orderBy("media_id", "frame_idx").collect()
    assert len(rows) == 4 * 4  # frames 0,3,6,9
    assert [r["frame_idx"] for r in rows[:4]] == [0, 3, 6, 9]
    assert all(len(bytes(r["frame"])) == 8 * 8 for r in rows)
    # frame content round-trips: frame 3 of video 2 == slice of source blob
    blob = bytes(vids.where(F.col("media_id") == 2).first()["content"])
    w, h, c, nf = struct.unpack("<iiii", blob[5:21])
    fsz = w * h * c
    want = blob[21 + 3 * fsz : 21 + 4 * fsz]
    got = bytes(
        frames.where((F.col("media_id") == 2) & (F.col("frame_idx") == 3)).first()["frame"]
    )
    assert got == want


def test_unknown_codec_raises(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"PNG\x0d\x0a....."), None)], schema=mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="no codec|NotImplementedError"):
        mm.image_features(bad).collect()


def test_audio_frame_features_match_regenerated(spark):
    """Frame RMS/ZCR/peak for one clip must equal an independent
    numpy recomputation from the same seeded PCM."""
    import struct

    import numpy as np

    from netcdf_olap_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(7,)], "doc_id long")
    clips = mm.synthesize_audio(ids, n_samples=4096)
    got = (
        mm.audio_frame_features(clips, frame=1024, hop=512)
        .orderBy("frame_idx")
        .collect()
    )
    rng = np.random.default_rng(7 + 424_242)
    pcm = rng.integers(-(2**15), 2**15, 4096, dtype=np.int64).astype("<i2").astype(np.float64)
    starts = list(range(0, 4096 - 1024 + 1, 512))
    assert len(got) == len(starts)
    for r, s in zip(got, starts):
        w = pcm[s : s + 1024]
        signs = np.signbit(w)
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(w * w))), rel=1e-12)
        assert r.zcr == pytest.approx(float(np.mean(signs[1:] != signs[:-1])), rel=1e-12)
        assert r.peak == int(np.max(np.abs(w)))


def test_audio_codec_stub_raises(spark):
    from netcdf_olap_spark.operators import multimodal as mm

    bad = spark.createDataFrame(
        [(1, "audio", bytearray(b"RIFF....WAVE"), None)], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|no audio codec"):
        mm.audio_frame_features(bad).collect()


def test_ahash_dedup_finds_planted_groups(spark):
    """aHash + chunk-blocked Hamming join recovers exactly the planted
    duplicate groups: 4 members per seed group (seed_mod=50 over ids
    0..199), small perturbations keep Hamming low for group pairs and
    high across groups."""
    from netcdf_olap_spark.operators import multimodal as mm
    from netcdf_olap_spark.operators.dedup import hamming_blocked_pairs

    ids = spark.range(200).select(F.col("id").alias("doc_id"))
    media = mm.synthesize_media(ids, seed_mod=50, perturb_bytes=4)
    pairs = hamming_blocked_pairs(mm.ahash64(media), "media_id", "ahash", 7).collect()
    assert len(pairs) == 50 * 6  # C(4,2) pairs per group
    assert all(r["id1"] % 50 == r["id2"] % 50 for r in pairs)

    # exact copies (no perturbation) → Hamming 0 for every group pair
    media0 = mm.synthesize_media(ids, seed_mod=50, perturb_bytes=0)
    pairs0 = hamming_blocked_pairs(mm.ahash64(media0), "media_id", "ahash", 0).collect()
    assert len(pairs0) == 50 * 6
    assert all(r["hamming"] == 0 for r in pairs0)


def test_scene_cuts_recover_planted_boundaries(spark):
    """With scene_len=4 over 12 frames, cuts are exactly frames 4 and
    8 for every video; within-scene boundaries are identical frames
    (diff 0)."""
    from netcdf_olap_spark.operators import multimodal as mm

    ids = spark.range(20).select(F.col("id").alias("doc_id"))
    vids = mm.synthesize_media(
        ids, kind="video", width=8, height=8, channels=1, n_frames=12, scene_len=4
    )
    rows = mm.scene_cuts(vids, threshold=30.0).collect()
    assert len(rows) == 20 * 11
    for r in rows:
        if r["frame_idx"] in (4, 8):
            assert r["is_cut"] == "Y" and r["mean_abs_diff"] > 30.0
        else:
            assert r["is_cut"] == "N" and r["mean_abs_diff"] == 0.0


def test_audio_band_energies_invariants(spark):
    """Band fractions sum to 1 per clip; white-noise clips spread
    energy roughly evenly (no band above 3x uniform share)."""
    from netcdf_olap_spark.operators import multimodal as mm

    ids = spark.range(10).select(F.col("id").alias("doc_id"))
    clips = mm.synthesize_audio(ids)
    rows = mm.audio_band_energies(clips, n_bands=8).collect()
    assert len(rows) == 10 * 8
    by_clip: dict[int, list] = {}
    for r in rows:
        by_clip.setdefault(r["media_id"], []).append(r["energy_frac"])
    for fracs in by_clip.values():
        assert abs(sum(fracs) - 1.0) < 1e-9
        assert max(fracs) < 3.0 / 8
