"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested; the codec step itself is stubbed because
the container ships no image/audio libraries — ``decode_image_batch``
raises ``NotImplementedError`` unless ``deterministic_fake=True``, which
substitutes a seeded, content-derived fake decode so the downstream
pipeline (feature extraction, resizing bookkeeping, frame sampling) can be
exercised end-to-end.

Schemas:
  media:    (media_id long, kind string, payload binary,
             meta struct<width:int, height:int, sample_rate:int,
                         duration_ms:int, codec:string>)
  features: (media_id long, kind string, feature array<float>)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)
FEATURE_SCHEMA = "media_id long, kind string, feature array<float>"


def synthesize_media(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id,
    metadata plausible per kind."""
    df = spark.range(0, n, 1, partitions or 8)
    i = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(i, F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("MEDIA:"), F.md5(F.concat(i.cast("string"), F.lit(seed)))),
        "UTF-8",
    )
    meta = F.struct(
        (F.pmod(i * 37, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(i * 53, F.lit(1080)) + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(i * 97, F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
        F.lit("synthetic").alias("codec"),
    )
    return df.select(
        i.alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def _fake_decode(payload: bytes, dim: int) -> "list[float]":
    """Deterministic stand-in for a real codec: derive a feature vector
    from the payload bytes."""
    import numpy as np

    h = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    rng = np.random.default_rng(int(h.sum()) % (2**32))
    return rng.standard_normal(dim).astype(np.float32).tolist()


def extract_features(
    media: DataFrame, dim: int = 16, deterministic_fake: bool = False
) -> DataFrame:
    """mapInPandas feature extraction; batch shape = one Arrow batch of
    (media_id, kind, payload) rows -> (media_id, kind, feature).  The real
    decode would live where ``_fake_decode`` is called."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not deterministic_fake:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "pass deterministic_fake=True to exercise the pipeline"
                )
            feats = [
                _fake_decode(p, dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling bookkeeping (pure SQL): one row per frame to
    sample, derived from duration metadata — the shuffle-light planning
    step that precedes the (stubbed) decode."""
    vids = media.filter(F.col("kind") == "video")
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / 1000.0 * fps).cast("int"), F.lit(1)
    )
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        (F.col("meta.duration_ms") / n_frames).alias("frame_interval_ms"),
    )
