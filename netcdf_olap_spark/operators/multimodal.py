"""Multimodal (image/audio/video) columns over binary + typed metadata.

Data model: media rows are ``(media_id, kind, content: binary,
meta: struct)`` — the blob is OPAQUE to the relational layer (prune,
join, filter on metadata; never decode in SQL). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages, the multimodal analog of the PNG sink
(SURVEY.md §2.10; sinks/png.py).

Codec stubbing: this container has no image/audio libraries, so real
formats (PNG/JPEG/WAV/...) raise ``NotImplementedError`` at the
clearly-marked decode seam, and a deterministic fake raw codec
(``FAKE1`` header + seeded pixel bytes) exercises the REAL Spark-side
plumbing — schema, binary Arrow transfer, batch iteration, explode of
frames — end to end. Swapping in PIL/ffmpeg later touches only the
bytes→ndarray function inside each closure.

Scale notes (100 TB of blobs):

- blobs ride Arrow batches; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds per-batch memory (set it so batch_rows × blob_size fits the
  executor; tests drive multiple batches with a tiny cap).
- every stage is ``mapInPandas`` (no shuffle); only the small feature
  rows ever get shuffled/aggregated downstream.
- closures are self-contained (stdlib/numpy/pandas imports inside):
  nothing here is pickled by reference, so executors never need this
  package importable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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

MAGIC = b"FAKE1"  # deterministic fake raw format: magic, w, h, c, [nf], payload

META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("px_mean", DoubleType()),
        StructField("px_std", DoubleType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def synthesize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    kind: str = "image",
    width: int = 16,
    height: int = 12,
    channels: int = 3,
    n_frames: int = 8,
    seed_mod: int | None = None,
    perturb_bytes: int = 0,
    scene_len: int | None = None,
    pixel_mode: str = "rng",
) -> DataFrame:
    """Deterministic fake media table from any id column: blob bytes
    are a pure function of (media_id, shape), so every run and every
    engine agrees. Images: MAGIC + w,h,c + w*h*c pixel bytes; videos:
    MAGIC + w,h,c,nf + nf frames of w*h*c bytes.

    ``seed_mod``: pixel seed = media_id % seed_mod, so ids congruent
    mod seed_mod share content (duplicate groups for dedup tests);
    with ``perturb_bytes`` > 0, non-leader group members additionally
    flip that many id-derived pixels — NEAR-duplicates instead of
    exact copies.

    ``scene_len`` (video only): frame f's pixels are seeded by
    (media seed, f // scene_len) — every scene_len-th boundary is a
    hard scene cut, frames within a scene are identical. The planted
    structure scene-cut detection must recover.

    ``pixel_mode="arith"``: pixels are the CLOSED-FORM pattern
    ``(seed·31 + scene·101 + p·7) mod 256`` instead of RNG bytes —
    same decode/feature plumbing, but every downstream statistic
    (frame diffs, means) becomes pure integer arithmetic an SQL
    oracle can restate. The 101-per-scene step makes consecutive-
    scene mean |diff| ≥ 101 (wrap adds 155s), far above any sane cut
    threshold; within-scene diffs are exactly 0."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    k, w, h, c, nf = kind, width, height, channels, n_frames
    sm, pb, sl, pm = seed_mod, perturb_bytes, scene_len, pixel_mode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811 (self-contained closure)

        frames = nf if k == "video" else 1
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                seed = int(mid) % sm if sm else int(mid)
                if pm == "arith":
                    p = np.arange(h * w * c, dtype=np.int64)

                    def _frame(scene: int) -> np.ndarray:
                        return ((seed * 31 + scene * 101 + p * 7) % 256).astype(np.uint8)

                    if k == "video":
                        payload_a = np.concatenate(
                            [_frame(f // sl if sl else f) for f in range(frames)]
                        )
                    else:
                        payload_a = _frame(0)
                elif sl and k == "video":
                    parts = [
                        np.random.default_rng((seed + 7_777_777) * 1000 + f // sl)
                        .integers(0, 256, h * w * c, dtype=np.uint8)
                        for f in range(frames)
                    ]
                    payload_a = np.concatenate(parts)
                else:
                    rng = np.random.default_rng(seed + 7_777_777)
                    payload_a = rng.integers(0, 256, frames * h * w * c, dtype=np.uint8)
                if sm and pb and int(mid) >= sm:
                    # non-leader group members: flip a few pixels at
                    # id-derived positions → deterministic NEAR-dups
                    prng = np.random.default_rng(int(mid) + 13)
                    pos = prng.integers(0, payload_a.size, pb)
                    payload_a = payload_a.copy()
                    payload_a[pos] = 255 - payload_a[pos]
                payload = payload_a.tobytes()
                if k == "video":
                    head = b"FAKE1" + struct.pack("<iiii", w, h, c, frames)
                else:
                    head = b"FAKE1" + struct.pack("<iii", w, h, c)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": k,
                        "content": head + payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "channels": c,
                            "n_frames": frames,
                            "format": "fake-raw",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + per-image pixel statistics. The decode seam is the
    ``_decode`` function inside the closure — real formats raise
    NotImplementedError there until an image library exists in the
    runtime; everything around it is production plumbing."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811

        def _decode(blob: bytes) -> np.ndarray:
            if blob[:5] == b"FAKE1":
                w, h, c = struct.unpack("<iii", blob[5:17])
                return np.frombuffer(blob[17:], dtype=np.uint8).reshape(h, w, c)
            # CODEC STUB: PNG/JPEG decode needs PIL/cv2 (absent here)
            raise NotImplementedError(f"no codec for magic {blob[:5]!r}")

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                px = _decode(bytes(blob))
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(blob),
                        "px_mean": float(px.mean()),
                        "px_std": float(px.std()),
                        "px_min": int(px.min()),
                        "px_max": int(px.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(feats, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, blob → blob (same fake-raw format,
    updated meta). The index-grid subsample is exactly what a real
    resize kernel does before interpolation."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if blob[:5] != b"FAKE1":
                    raise NotImplementedError(f"no codec for magic {blob[:5]!r}")
                w, h, c = struct.unpack("<iii", blob[5:17])
                px = np.frombuffer(blob[17:], dtype=np.uint8).reshape(h, w, c)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out = px[yi][:, xi]
                head = b"FAKE1" + struct.pack("<iii", out_w, out_h, c)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": "image",
                        "content": head + out.tobytes(),
                        "meta": {
                            "width": out_w,
                            "height": out_h,
                            "channels": c,
                            "n_frames": 1,
                            "format": "fake-raw",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(rs, schema=MEDIA_SCHEMA)


AUDIO_MAGIC = b"FAKA1"  # fake raw PCM: magic, sample_rate, n_samples, int16 LE

AUDIO_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("peak", IntegerType()),
    ]
)


def synthesize_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 16000,
    n_samples: int = 4096,
    wave: str = "noise",
) -> DataFrame:
    """Deterministic fake PCM clips (int16 mono), one per id — the
    audio analog of synthesize_media: bytes are a pure function of
    (media_id, shape), so every run and engine agrees.

    ``wave`` plants CLOSED-FORM signals whose features an SQL oracle
    can restate exactly:

    - ``"noise"`` (default): seeded-RNG white samples — deterministic
      but not SQL-expressible (flatness invariants live in pytest).
    - ``"square"``: constant-magnitude square wave, amplitude
      Q = 4096 + (id mod 7)·3777. Every |sample| is Q, so per-frame
      RMS is sqrt of a perfect square = EXACTLY Q in float64 (all
      intermediate sums are integers < 2⁵³), and peak = Q.
    - ``"tone"``: int16-quantized full-scale cosine at FFT bin
      128 + 256·(id mod 8) — band-centered for an 8-band split of a
      4096-sample clip. Quantization noise is ~98 dB down, so band
      energy fractions are 1/0 to well past 6 decimals.
    """
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    sr, n, wv = sample_rate, n_samples, wave

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                if wv == "square":
                    q = 4096 + (int(mid) % 7) * 3777
                    half = np.full(32, q, dtype=np.int64)
                    period = np.concatenate([half, -half])
                    pcm = np.tile(period, -(-n // 64))[:n].astype("<i2")
                elif wv == "tone":
                    kbin = 128 + 256 * (int(mid) % 8)
                    t = np.arange(n, dtype=np.float64)
                    pcm = (
                        np.round(30000.0 * np.cos(2.0 * np.pi * kbin * t / n))
                        .astype(np.int64)
                        .astype("<i2")
                    )
                else:
                    rng = np.random.default_rng(int(mid) + 424_242)
                    pcm = rng.integers(-(2**15), 2**15, n, dtype=np.int64).astype("<i2")
                head = b"FAKA1" + struct.pack("<ii", sr, n)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": "audio",
                        "content": head + pcm.tobytes(),
                        "meta": {
                            "width": None,
                            "height": None,
                            "channels": 1,
                            "n_frames": n,
                            "format": "fake-pcm",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def audio_frame_features(media: DataFrame, frame: int = 1024, hop: int = 512) -> DataFrame:
    """Windowed audio features (RMS energy, zero-crossing rate, peak)
    per overlapping frame — the fan-out stage before any acoustic
    model. The decode seam raises NotImplementedError for real codecs
    (WAV/MP3 need audio libs absent here); the framing/feature
    plumbing around it is production-shaped: Arrow-batched
    mapInPandas, vectorized numpy per clip, small feature rows out."""
    fr, hp = frame, hop

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if blob[:5] != b"FAKA1":
                    # CODEC STUB: WAV/MP3 decode needs soundfile/ffmpeg
                    raise NotImplementedError(f"no audio codec for magic {blob[:5]!r}")
                _sr, n = struct.unpack("<ii", blob[5:13])
                pcm = np.frombuffer(blob[13 : 13 + 2 * n], dtype="<i2").astype(np.float64)
                for i, start in enumerate(range(0, n - fr + 1, hp)):
                    w = pcm[start : start + fr]
                    signs = np.signbit(w)
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "rms": float(np.sqrt(np.mean(w * w))),
                            "zcr": float(np.mean(signs[1:] != signs[:-1])),
                            "peak": int(np.max(np.abs(w))),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(feats, schema=AUDIO_FRAMES_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling: blob → one row per kept frame (every k-th)
    — the fan-out stage before per-frame featurization."""

    def sf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if blob[:5] != b"FAKE1":
                    raise NotImplementedError(f"no codec for magic {blob[:5]!r}")
                w, h, c, nf = struct.unpack("<iiii", blob[5:21])
                fsz = w * h * c
                for i in range(0, nf, every_k):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "frame": blob[21 + i * fsz : 21 + (i + 1) * fsz],
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(sf, schema=FRAMES_SCHEMA)


AHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("ahash", LongType())]
)


def ahash64(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) perceptual signature per image:
    grayscale → 8×8 nearest-sample downscale → bit b = pixel > mean.
    The canonical cheap perceptual hash; near-duplicate images differ
    in only a few bits, so the signature feeds the SAME 8-bit-chunk
    blocked Hamming join as text SimHash
    (``dedup.hamming_blocked_pairs``) — one multimodal column in, the
    whole dedup machinery reused. Arrow-batched mapInPandas; the
    decode seam matches image_features."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811

        def _decode(blob: bytes) -> np.ndarray:
            if blob[:5] == b"FAKE1":
                w, h, c = struct.unpack("<iii", blob[5:17])
                return np.frombuffer(blob[17:], dtype=np.uint8).reshape(h, w, c)
            # CODEC STUB: PNG/JPEG decode needs PIL/cv2 (absent here)
            raise NotImplementedError(f"no codec for magic {blob[:5]!r}")

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                px = _decode(bytes(blob)).mean(axis=2)  # grayscale
                h, w = px.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                small = px[np.ix_(ys, xs)]
                bits = (small > small.mean()).flatten()
                val = 0
                for i, b in enumerate(bits):
                    if b:
                        val |= 1 << i
                # wrap to signed 64-bit (LongType)
                if val >= 1 << 63:
                    val -= 1 << 64
                rows.append({"media_id": int(mid), "ahash": val})
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(hashes, schema=AHASH_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("mean_abs_diff", DoubleType()),
        StructField("is_cut", StringType()),
    ]
)


def scene_cuts(media: DataFrame, threshold: float = 30.0) -> DataFrame:
    """Video scene-cut detection: mean absolute pixel difference
    between consecutive frames, cut where the diff exceeds
    ``threshold`` (the classic shot-boundary heuristic). One
    Arrow-batched ``mapInPandas`` — a whole video's frames live in
    one blob row, so consecutive-frame state needs no shuffle and no
    window; output is one row per frame boundary. is_cut is 'Y'/'N'
    (string) to keep the schema trivially portable."""

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if blob[:5] != b"FAKE1":
                    raise NotImplementedError(f"no codec for magic {blob[:5]!r}")
                w, h, c, nf = struct.unpack("<iiii", blob[5:21])
                fsz = w * h * c
                px = np.frombuffer(blob[21 : 21 + nf * fsz], dtype=np.uint8).reshape(nf, fsz)
                diffs = np.abs(px[1:].astype(np.int16) - px[:-1].astype(np.int16)).mean(axis=1)
                for i, d in enumerate(diffs, start=1):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "mean_abs_diff": float(d),
                            "is_cut": "Y" if d > threshold else "N",
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(cuts, schema=SCENE_SCHEMA)


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("band", IntegerType()),
        StructField("lo_hz", DoubleType()),
        StructField("hi_hz", DoubleType()),
        StructField("energy_frac", DoubleType()),
    ]
)


def audio_band_energies(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """Per-clip spectral band energies: rfft power spectrum split into
    ``n_bands`` equal-width bands, each band's fraction of total
    energy — the feature row an audio-quality or silence/music
    classifier consumes. One Arrow-batched ``mapInPandas`` (numpy FFT
    is deterministic); output is n_bands small rows per clip, the
    blob never shuffles."""
    nb = n_bands

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd  # noqa: F811

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if blob[:5] != b"FAKA1":
                    raise NotImplementedError(f"no codec for magic {blob[:5]!r}")
                sr, n = struct.unpack("<ii", blob[5:13])
                pcm = np.frombuffer(blob[13 : 13 + 2 * n], dtype="<i2").astype(np.float64)
                power = np.abs(np.fft.rfft(pcm)) ** 2
                total = float(power.sum()) or 1.0
                nyq = sr / 2.0
                edges = np.linspace(0, len(power), nb + 1).astype(int)
                for b in range(nb):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "band": b,
                            "lo_hz": nyq * b / nb,
                            "hi_hz": nyq * (b + 1) / nb,
                            "energy_frac": float(power[edges[b] : edges[b + 1]].sum() / total),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(feats, schema=SPECTRAL_SCHEMA)
