"""Multimodal queries for the driver registry. Six of seven are
oracle-checked via PLANTED payloads whose downstream features are
pure id/shape arithmetic (duplicate groups mod 50, square-wave RMS,
band-centered tones, closed-form pixel patterns) — the blobs
themselves never need decoding on the oracle side, and the hash only
matches if the Spark-side decode/fan-out/feature plumbing is exact.
The one rows-only query (media_image_features) keeps the seeded-RNG
payload on purpose: pixel mean/std of RNG bytes isn't SQL, and the
RNG decode path deserves driver coverage; it's pinned against
independently regenerated pixels in tests/test_multimodal.py."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf_olap_spark.operators import multimodal as mm


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread_scan'd (r14 interleaved A/B): the media pipelines'
    # Arrow-batched synthesize/decode stages LOSE under the extra
    # exchange (media_audio_bands regressed pathologically — 32 tiny
    # Arrow batches per 5 k rows defeat the per-batch vectorization),
    # unlike the interpreted-HOF text/similarity winners (see
    # queries/text.py _docs).
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id")


def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one fake image per document, decode, extract pixel
    statistics — the full binary-column pipeline at sf scale.
    rows-only: pixel mean/std of seeded-RNG bytes has no SQL form;
    values are pinned against independently regenerated pixels in
    tests/test_multimodal.py."""
    media = mm.synthesize_media(_doc_ids(spark, sf_dir))
    return mm.image_features(media).orderBy("media_id")


def media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video path: synthesize, sample every 3rd frame, count + size
    per video (explode fan-out then re-aggregate).

    Oracle-checked: the sampled-frame count and byte totals are pure
    shape arithmetic (12 frames, every 3rd kept → 4; 8×8×1 bytes per
    frame → 256), so DuckDB can state the expected rollup without
    decoding a blob — a hash check that the explode fan-out neither
    drops nor duplicates frames."""
    # doc_id < 500, not limit(500): limit without order is
    # partition-order-dependent → nondeterministic media set
    vids = mm.synthesize_media(
        _doc_ids(spark, sf_dir).where(F.col("doc_id") < 500),
        kind="video",
        width=8,
        height=8,
        channels=1,
        n_frames=12,
    )
    frames = mm.sample_frames(vids, every_k=3)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_kept"),
            F.sum(F.length("frame")).alias("total_bytes"),
        )
        .orderBy("media_id")
    )


MEDIA_FRAME_STATS_SQL = """
SELECT doc_id AS media_id,
       CAST(4 AS BIGINT) AS n_frames_kept,
       CAST(256 AS BIGINT) AS total_bytes
FROM documents WHERE doc_id < 500
ORDER BY media_id
"""


def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio path: synthesize PCM clips, window into overlapping
    frames (1024/512), per-clip rollup of RMS/peak — the
    feature-extraction stage of an audio training pipeline. Blob →
    frame fan-out stays inside Arrow-batched mapInPandas; only small
    feature rows reach the shuffle.

    ORACLE-CHECKED (r6): the clips are planted square waves of
    amplitude Q = 4096 + (id mod 7)·3777, so every per-frame RMS is
    EXACTLY Q in float64 (perfect-square mean of integer sums < 2⁵³)
    and peak = Q — DuckDB states the whole rollup as id arithmetic
    without decoding a blob, and the hash only matches if the decode
    → frame → feature fan-out neither drops, duplicates, nor rounds
    anything. RNG white-noise feature invariants stay in
    tests/test_multimodal.py."""
    clips = mm.synthesize_audio(
        _doc_ids(spark, sf_dir).where(F.col("doc_id") < 500), wave="square"
    )
    frames = mm.audio_frame_features(clips, frame=1024, hop=512)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("peak").alias("max_peak"),
            F.sum(F.col("rms").cast("decimal(18,4)")).cast("double").alias("sum_rms"),
        )
        .orderBy("media_id")
    )


MEDIA_AUDIO_STATS_SQL = """
SELECT doc_id AS media_id,
       CAST(7 AS BIGINT) AS n_frames,
       CAST(4096 + (doc_id % 7) * 3777 AS INT) AS max_peak,
       CAST(7 * (4096 + (doc_id % 7) * 3777) AS DOUBLE) AS sum_rms
FROM documents WHERE doc_id < 500
ORDER BY media_id
"""


def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image pairs: aHash 64-bit signatures
    (Arrow-batched decode+hash) fed into the SAME chunk-blocked
    Hamming join as text SimHash — the multimodal column composed
    with the dedup machinery.

    ORACLE-CHECKED: the synthetic corpus plants duplicate groups
    (ids congruent mod 50 over doc_id < 200, perturb_bytes=4 keeps
    them NEAR-dups, not byte-copies), and the Hamming ≤ 7 pair set
    recovers those groups EXACTLY (precision AND recall 1.0, pinned
    in tests/test_multimodal.py) — so the expected pairs are pure id
    arithmetic DuckDB can state without decoding a single blob. The
    hamming distances themselves stay an engine-side detail; the
    dedup DECISION SET is the semantic output."""
    from netcdf_olap_spark.operators.dedup import hamming_blocked_pairs

    media = mm.synthesize_media(
        _doc_ids(spark, sf_dir).where(F.col("doc_id") < 200),
        seed_mod=50,
        perturb_bytes=4,
    )
    sigs = mm.ahash64(media)
    return (
        hamming_blocked_pairs(sigs, "media_id", "ahash", max_hamming=7)
        .select("id1", "id2")
        .orderBy("id1", "id2")
    )


MEDIA_PHASH_SQL = """
WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200)
SELECT a.id AS id1, b.id AS id2
FROM ids a JOIN ids b ON a.id % 50 = b.id % 50 AND a.id < b.id
ORDER BY id1, id2
"""


def media_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over synthetic videos with planted
    scene structure (scene_len=4 of 12 frames → cuts at frames 4 and
    8): per-boundary mean-abs-diff, thresholded.

    ORACLE-CHECKED (r6): the frames use the closed-form arithmetic
    pixel pattern ((id·31 + scene·101 + p·7) mod 256), so every
    boundary's mean |diff| — not just the cut flag — is exact integer
    arithmetic DuckDB restates pixel by pixel (within-scene 0,
    cross-scene a mix of 101s and 155-wraps, division by 64 pixels is
    a power of two → the double is exact). The RNG-video recovery
    property stays in tests/test_multimodal.py and in
    media_scene_cut_flags."""
    vids = mm.synthesize_media(
        _doc_ids(spark, sf_dir).where(F.col("doc_id") < 200),
        kind="video",
        width=8,
        height=8,
        channels=1,
        n_frames=12,
        scene_len=4,
        pixel_mode="arith",
    )
    return (
        mm.scene_cuts(vids, threshold=30.0)
        .orderBy("media_id", "frame_idx")
    )


MEDIA_SCENE_CUTS_SQL = """
WITH bounds AS (
  SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx
  FROM documents, unnest(generate_series(1, 11)) u(f)
  WHERE doc_id < 200
), diffs AS (
  SELECT b.media_id, b.frame_idx,
         CAST(SUM(ABS(
             ((b.media_id * 31 + (b.frame_idx // 4) * 101 + p * 7) % 256)
           - ((b.media_id * 31 + ((b.frame_idx - 1) // 4) * 101 + p * 7) % 256)
         )) AS DOUBLE) / 64 AS mean_abs_diff
  FROM bounds b, unnest(generate_series(0, 63)) t(p)
  GROUP BY b.media_id, b.frame_idx
)
SELECT media_id, frame_idx, mean_abs_diff,
       CASE WHEN mean_abs_diff > 30.0 THEN 'Y' ELSE 'N' END AS is_cut
FROM diffs
ORDER BY media_id, frame_idx
"""


def media_scene_cut_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision surface of scene-cut detection: (media_id,
    frame_idx, is_cut) with the RNG-dependent diff magnitude
    projected away. With scene_len=4 over 12 frames the planted cuts
    are exactly the boundaries at frame 4 and 8 (within-scene frames
    are byte-identical → diff 0; cross-scene frames are independent
    uniform pixels → diff ≈ 85 ≫ threshold 30, recovery pinned in
    tests/test_multimodal.py) — so the expected flags are pure frame
    arithmetic and DuckDB-checkable. media_scene_cuts keeps the full
    per-boundary diffs (rows-only)."""
    vids = mm.synthesize_media(
        _doc_ids(spark, sf_dir).where(F.col("doc_id") < 200),
        kind="video",
        width=8,
        height=8,
        channels=1,
        n_frames=12,
        scene_len=4,
    )
    return (
        mm.scene_cuts(vids, threshold=30.0)
        .select("media_id", "frame_idx", "is_cut")
        .orderBy("media_id", "frame_idx")
    )


MEDIA_SCENE_FLAGS_SQL = """
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       CASE WHEN i % 4 = 0 THEN 'Y' ELSE 'N' END AS is_cut
FROM documents, unnest(generate_series(1, 11)) u(i)
WHERE doc_id < 200
ORDER BY media_id, frame_idx
"""


def media_audio_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral band-energy features per synthetic PCM clip (8 bands,
    rfft power fractions).

    ORACLE-CHECKED (r6): the clips are int16-quantized full-scale
    cosines planted at the CENTER BIN of band (id mod 8), so the
    planted band holds all signal energy and quantization noise is
    ~98 dB down (measured worst-case band deviation 2e-10) — the
    fractions snap to exactly 1/0 under the decimal(18,6) quantize,
    and DuckDB states them as id arithmetic. The FFT itself is only
    checked for not leaking across band edges — white-noise flatness
    and unit-sum invariants stay in tests/test_multimodal.py."""
    clips = mm.synthesize_audio(
        _doc_ids(spark, sf_dir).where(F.col("doc_id") < 200), wave="tone"
    )
    return (
        mm.audio_band_energies(clips, n_bands=8)
        .select(
            "media_id",
            "band",
            "lo_hz",
            "hi_hz",
            F.col("energy_frac").cast("decimal(18,6)").cast("double").alias("energy_frac"),
        )
        .orderBy("media_id", "band")
    )


MEDIA_AUDIO_BANDS_SQL = """
SELECT doc_id AS media_id,
       CAST(b AS INT) AS band,
       8000.0 * b / 8 AS lo_hz,
       8000.0 * (b + 1) / 8 AS hi_hz,
       CASE WHEN b = doc_id % 8 THEN 1.0 ELSE 0.0 END AS energy_frac
FROM documents, unnest(generate_series(0, 7)) u(b)
WHERE doc_id < 200
ORDER BY media_id, band
"""


def media_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-duplicate grouping by spectral FINGERPRINT — the
    audio analog of media_phash_dedup: decode → band energies → md5 of
    the decimal-quantized 8-band vector (the chromaprint-style
    content key), then exact-dedup on the fingerprint with min-id
    survivorship.  Two clips with the same spectral shape collapse
    regardless of their blob bytes.

    ORACLE-CHECKED: the planted tone clips put all energy in band
    (id mod 8), so the fingerprint groups ARE the mod-8 congruence
    classes — group size, keeper id, and member count are pure id
    arithmetic DuckDB states without decoding a blob; the hash only
    matches if decode → FFT → quantize → fingerprint → group drops or
    merges nothing.

    100 TB shape: decode/FFT map-side in Arrow batches; ONE shuffle
    on the fingerprint (the exact-dedup shape)."""
    clips = mm.synthesize_audio(
        _doc_ids(spark, sf_dir).where(F.col("doc_id") < 200), wave="tone"
    )
    bands = mm.audio_band_energies(clips, n_bands=8).select(
        "media_id",
        "band",
        F.col("energy_frac").cast("decimal(18,6)").alias("ef"),
    )
    fp = (
        bands.groupBy("media_id")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("band", "ef"))),
                        lambda s: s["ef"].cast("string"),
                    ),
                )
            ).alias("fp")
        )
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.min("media_id").cast("long").alias("keeper_id"),
        )
        .orderBy("keeper_id")
    )


MEDIA_AUDIO_DEDUP_SQL = """
WITH fp AS (
  SELECT doc_id AS media_id,
         md5(concat_ws(',',
             CAST(CASE WHEN 0 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6)),
             CAST(CASE WHEN 1 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6)),
             CAST(CASE WHEN 2 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6)),
             CAST(CASE WHEN 3 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6)),
             CAST(CASE WHEN 4 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6)),
             CAST(CASE WHEN 5 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6)),
             CAST(CASE WHEN 6 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6)),
             CAST(CASE WHEN 7 = doc_id % 8 THEN 1.000000 ELSE 0.000000 END AS DECIMAL(18,6))
         )) AS fp
  FROM documents WHERE doc_id < 200)
SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_clips, CAST(MIN(media_id) AS BIGINT) AS keeper_id
FROM fp
GROUP BY fp
ORDER BY keeper_id
"""


QUERIES = {
    "media_audio_dedup": (media_audio_dedup, MEDIA_AUDIO_DEDUP_SQL),
    "media_image_features": (media_image_features, None),
    "media_frame_stats": (media_frame_stats, MEDIA_FRAME_STATS_SQL),
    "media_audio_stats": (media_audio_stats, MEDIA_AUDIO_STATS_SQL),
    "media_phash_dedup": (media_phash_dedup, MEDIA_PHASH_SQL),
    "media_scene_cuts": (media_scene_cuts, MEDIA_SCENE_CUTS_SQL),
    "media_scene_cut_flags": (media_scene_cut_flags, MEDIA_SCENE_FLAGS_SQL),
    "media_audio_bands": (media_audio_bands, MEDIA_AUDIO_BANDS_SQL),
}
