"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side plumbing (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested; the actual
codec work is stubbed behind ``DECODERS`` because the sandbox image
ships no media libraries. Swapping in PIL/torchaudio/decord is a
one-function change per modality; nothing else moves.

Batch-shape notes for 100 TB media:
- binary cells stream through Arrow record batches; cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
  multi-MB blobs fits executor memory (set in session.py),
- ``mapInPandas`` (iterator form) processes one Arrow batch at a time,
  never materializing a partition,
- feature outputs are fixed-width arrays -> columnar, compact,
  shuffle-friendly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, blob binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, sha256 string, "
    f"features array<float>"
)


def _decode_image(blob: bytes, meta) -> list[float]:
    """Stub: real implementation would decode + resize + embed.
    Deterministic fake: normalized byte histogram over FEATURE_DIM
    buckets (keeps tests meaningful without a codec)."""
    if blob is None:
        raise NotImplementedError("image decode requires a codec library")
    hist = [0] * FEATURE_DIM
    for b in blob:
        hist[b % FEATURE_DIM] += 1
    total = max(sum(hist), 1)
    return [h / total for h in hist]


def _decode_audio(blob: bytes, meta) -> list[float]:
    if blob is None:
        raise NotImplementedError("audio decode requires a codec library")
    return _decode_image(blob, meta)  # same deterministic fake


def _sample_video_frames(blob: bytes, meta) -> list[float]:
    if blob is None:
        raise NotImplementedError("video decode requires a codec library")
    # frame-sampling stub: hash-stride over the byte stream
    stride = max(len(blob) // FEATURE_DIM, 1)
    return [blob[min(i * stride, len(blob) - 1)] / 255.0 for i in range(FEATURE_DIM)]


DECODERS = {
    "image": _decode_image,
    "audio": _decode_audio,
    "video": _sample_video_frames,
}


def extract_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item feature rows (FEATURES_SCHEMA).

    mapInPandas iterator: one Arrow batch in, one out; per-modality
    dispatch happens inside the batch (vectorized loop over numpy/bytes,
    no per-row Python UDF crossings).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for kind, blob, meta in zip(pdf["kind"], pdf["blob"], pdf["meta"]):
                decoder = DECODERS.get(kind)
                blob_b = bytes(blob) if blob is not None else b""
                shas.append(hashlib.sha256(blob_b).hexdigest())
                sizes.append(len(blob_b))
                feats.append(decoder(blob_b, meta) if decoder else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": shas,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary blobs from md5 streams)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(
            F.concat(*[
                F.md5(F.concat_ws(":", F.lit(seed), F.col("id"), F.lit(i)))
                for i in range(8)
            ])
        ).alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
        ).alias("meta"),
    )
    return df
