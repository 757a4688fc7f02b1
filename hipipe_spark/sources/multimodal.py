"""Multimodal (image/audio/video) column plumbing.

Task-spec capability: treat media as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode step itself is STUBBED
(no image/audio libs in this container): ``decoder="fake"`` produces a
deterministic fake decode (shape + checksum derived from the bytes) so
the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested; ``decoder="pil"``/"librosa" raise
``NotImplementedError`` until the libs are present.
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


def extract_features(df: DataFrame, decoder: str = "fake",
                     thumb: tuple[int, int] = (32, 32),
                     frame_sample_ms: int = 5000) -> DataFrame:
    """Decode + feature-extract per media row, Arrow-batched.

    fake decoder: n_bytes, crc32 checksum, resize-target dims (clamped to
    source), frame count = duration/frame_sample_ms for videos. Real
    decoders (PIL/librosa/pyav) slot into the same batch signature.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r} requires media libraries not present in "
            "this container; the 'fake' decoder exercises the same plumbing"
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
