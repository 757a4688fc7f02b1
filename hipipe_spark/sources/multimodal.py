"""Multimodal (image/audio/video) column plumbing.

Task-spec capability: treat media as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. Two decoders:

- ``decoder="stdlib"`` — REAL decode, zero extra deps: PNG via the
  pure-stdlib parser in :mod:`hipipe_spark.sources.media_codec` (zlib
  inflate + full None/Sub/Up/Average/Paeth filter reconstruction), WAV
  via the stdlib ``wave`` module, and video via APNG (the public
  Animated-PNG spec — acTL/fcTL/fdAT chunks) with every-k-th
  frame sampling. :func:`gen_real_media` synthesises deterministic REAL
  PNG/WAV/APNG bytes so decode outputs (width / height / channels /
  duration / frame count / mean) are value-checkable against an
  arithmetic oracle.
- ``decoder="fake"`` — deterministic fake decode (shape + checksum
  derived from the bytes), kept for the original plumbing tests;
  ``decoder="pil"``/"librosa" still raise ``NotImplementedError`` until
  those libs exist in the container.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "duration_ms int, mime string"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum long, "
    "thumb_w int, thumb_h int, n_frames int"
)


def gen_fake_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: content bytes derived from the id
    (sha256 stream), metadata hash-derived. Stand-in for an Iceberg table
    of binary blobs at scale."""
    def batches(it: Iterable[pd.DataFrame]):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                content = (h * (1 + int(i) % 7))[: 32 + (int(i) % 97)]
                kind = ["image", "audio", "video"][int(i) % 3]
                rows.append(
                    (int(i), kind, content, 64 + int(i) % 512, 64 + (int(i) * 3) % 512,
                     1000 + int(i) % 60000,
                     {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "width", "height",
                               "duration_ms", "mime"],
            )

    return spark.range(n).mapInPandas(batches, schema=MEDIA_SCHEMA)


DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes int, width int, height int, "
    "channels int, sample_rate int, duration_ms int, n_frames int, "
    "mean_val double, thumb_w int, thumb_h int"
)

AUDIO_RATE = 8000


def _img_dims(i: int) -> tuple[int, int, int]:
    return 8 + i % 13, 8 + (3 * i) % 11, 1 if i % 2 == 0 else 3


def _audio_n(i: int) -> int:
    return 200 + (i * 13) % 57


def _video_dims(i: int) -> tuple[int, int, int]:
    return 6 + i % 7, 6 + (2 * i) % 5, 2 + i % 4


def gen_real_media(spark: SparkSession, n: int = 128,
                   seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL decodable bytes, generated
    executor-side (no external data, per the task contract):

    - ``i % 3 == 0`` → PNG, ``w = 8 + i%13``, ``h = 8 + (3i)%11``,
      greyscale if ``i`` even else RGB, flat pixel ``j`` value
      ``(i*7 + 3j) % 256``, per-row filter type ``i % 5`` (so every PNG
      filter is exercised in the production path, not just tests);
    - ``i % 3 == 1`` → PCM-16 WAV at 8 kHz, ``200 + (13i)%57`` samples,
      sample ``t`` value ``(i*31 + 17t) % 2048 - 1024``;
    - ``i % 3 == 2`` → APNG video (the public Animated-PNG spec):
      ``w = 6 + i%7``, ``h = 6 + (2i)%5``, greyscale,
      ``2 + i%4`` full-size frames at 100 ms/frame, frame ``f`` pixel
      ``j`` value ``(i*7 + 11f + 3j) % 256``.

    Every parameter is pure arithmetic in ``i``, so a SQL oracle can
    recompute what a CORRECT decode must recover — the driver gate then
    value-checks the real PNG/WAV/APNG decoders end-to-end.
    """
    from hipipe_spark.sources.media_codec import (
        apng_encode, png_encode, wav_encode)

    def batches(it: Iterable[pd.DataFrame]):
        for pdf in it:
            rows = []
            for i in (int(v) for v in pdf["id"].to_numpy()):
                if i % 3 == 0:
                    w, h, ch = _img_dims(i)
                    px = bytes((i * 7 + 3 * j) % 256 for j in range(w * h * ch))
                    content = png_encode(w, h, px, ch, filter_type=i % 5)
                    rows.append((i, "image", content, w, h, None, "image/png"))
                elif i % 3 == 1:
                    ns = _audio_n(i)
                    samples = [(i * 31 + 17 * t) % 2048 - 1024
                               for t in range(ns)]
                    content = wav_encode(samples, rate=AUDIO_RATE)
                    rows.append((i, "audio", content, None, None,
                                 1000 * ns // AUDIO_RATE, "audio/wav"))
                else:
                    w, h, nf = _video_dims(i)
                    frames = [
                        bytes((i * 7 + 11 * f + 3 * j) % 256
                              for j in range(w * h))
                        for f in range(nf)]
                    content = apng_encode(w, h, frames, channels=1,
                                          delay_num=1, delay_den=10)
                    rows.append((i, "video", content, w, h, nf * 100,
                                 "image/apng"))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "width",
                               "height", "duration_ms", "mime"],
            )

    return spark.range(n).mapInPandas(batches, schema=MEDIA_SCHEMA)


def decode_features(df: DataFrame,
                    thumb: tuple[int, int] = (8, 8),
                    frame_step: int = 2) -> DataFrame:
    """REAL decode + feature extraction, Arrow-batched (stdlib codecs):

    - image/png → width, height, channels, mean pixel value (over all
      bands), nearest-neighbour thumbnail dims (aspect-preserving,
      ≤ ``thumb``, never upscaled);
    - audio/wav → sample_rate, duration_ms (floor), RMS amplitude as
      ``mean_val``;
    - video/apng → width, height, channels, frame count, duration from
      the per-frame delay, mean pixel over every ``frame_step``-th
      frame (the frame-sampling path), thumbnail dims from frame 0.

    Per-row Python inside an Arrow batch is the right tool here: codec
    state machines are genuinely imperative (the same boundary the
    task spec draws for media decode). Everything around it — schema,
    partitioning, column pruning — is ordinary Spark.
    """
    from hipipe_spark.sources.media_codec import (
        apng_decode, png_decode, png_thumbnail, wav_decode)

    tw, th = thumb

    def batches(it: Iterable[pd.DataFrame]):
        for pdf in it:
            rows = []
            for rec in pdf.itertuples(index=False):
                mid, kind, content = int(rec.media_id), rec.kind, bytes(rec.content)
                w = h = ch = rate = dur = nframes = tw_o = th_o = None
                mean = None
                if kind == "image":
                    w, h, ch, px = png_decode(content)
                    mean = sum(px) / len(px)
                    tw_o, th_o, _ = png_thumbnail(w, h, ch, px, tw, th)
                elif kind == "audio":
                    rate, ch, nf, samples = wav_decode(content)
                    dur = 1000 * nf // rate
                    mean = (sum(s * s for s in samples) / len(samples)) ** 0.5
                else:
                    w, h, ch, frames, delay_ms = apng_decode(content)
                    nframes = len(frames)
                    dur = int(nframes * delay_ms)
                    sampled = frames[::frame_step]
                    mean = (sum(sum(fr) for fr in sampled)
                            / (len(sampled) * w * h * ch))
                    tw_o, th_o, _ = png_thumbnail(w, h, ch, frames[0],
                                                  tw, th)
                rows.append((mid, kind, len(content), w, h, ch, rate, dur,
                             nframes, mean, tw_o, th_o))
            out = pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "width",
                               "height", "channels", "sample_rate",
                               "duration_ms", "n_frames", "mean_val",
                               "thumb_w", "thumb_h"])
            for c in ("n_bytes", "width", "height", "channels",
                      "sample_rate", "duration_ms", "n_frames",
                      "thumb_w", "thumb_h"):
                out[c] = out[c].astype("Int32")
            yield out

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, decoder: str = "fake",
                     thumb: tuple[int, int] = (32, 32),
                     frame_sample_ms: int = 5000) -> DataFrame:
    """Decode + feature-extract per media row, Arrow-batched.

    fake decoder: n_bytes, crc32 checksum, resize-target dims (clamped to
    source), frame count = duration/frame_sample_ms for videos. Real
    decoders (PIL/librosa/pyav) slot into the same batch signature.
    """
    if decoder == "stdlib":
        return decode_features(df)
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r} requires media libraries not present in "
            "this container; 'stdlib' does real PNG/WAV decode, 'fake' "
            "exercises the same plumbing with synthetic features"
        )
    tw, th = thumb

    def batches(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
                "checksum": pdf["content"].map(lambda b: zlib.crc32(b)).astype("int64"),
                "thumb_w": pdf["width"].clip(upper=tw).astype("int32"),
                "thumb_h": pdf["height"].clip(upper=th).astype("int32"),
                "n_frames": (
                    (pdf["duration_ms"] // frame_sample_ms)
                    .where(pdf["kind"] == "video", 0)
                    .astype("int32")
                ),
            })
            yield out

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)
