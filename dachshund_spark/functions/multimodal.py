"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested.  Codec status by kind:

* **audio (uncompressed PCM WAV)** — REAL: ``synthesize_wav_media`` writes
  genuine RIFF/WAVE containers with the stdlib ``wave`` module and
  ``wav_feature_stats`` decodes them back task-side (no third-party libs).
* **image/video** — stubbed: the container ships no image/video codecs, so
  ``extract_features`` raises ``NotImplementedError`` unless
  ``deterministic_fake=True``, which substitutes a seeded, content-derived
  fake decode so the downstream pipeline (feature extraction, resizing
  bookkeeping, frame sampling) can be exercised end-to-end.

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


def synthesize_wav_media(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    sample_rate: int = 8000,
    n_samples: int = 1600,
    partitions: int = 8,
) -> DataFrame:
    """Deterministic REAL media payloads: uncompressed 16-bit PCM mono WAV
    files written with the stdlib ``wave`` module — one sine tone per row,
    frequency/amplitude derived from the id.  This is the non-fake codec
    path: the bytes are genuine RIFF/WAVE containers any audio tool can
    open.  Same (media, meta) schema as ``synthesize_media``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wavmod

        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            payloads, metas = [], []
            t = np.arange(n_samples, dtype=np.float64) / sample_rate
            for i in pdf["id"]:
                freq = 100.0 + (int(i) * 37 + seed) % 900  # 100..999 Hz
                amp = 0.25 + ((int(i) * 13 + seed) % 50) / 100.0  # 0.25..0.74
                x = (amp * np.sin(2 * np.pi * freq * t) * 32767.0).astype(
                    "<i2"
                )
                buf = io.BytesIO()
                w = wavmod.open(buf, "wb")
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(x.tobytes())
                w.close()
                payloads.append(buf.getvalue())
                metas.append(
                    {
                        "width": None,
                        "height": None,
                        "sample_rate": sample_rate,
                        "duration_ms": int(n_samples * 1000 / sample_rate),
                        "codec": "pcm_s16le",
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"],
                    "kind": "audio_wav",
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return (
        spark.range(0, n, 1, partitions)
        .select(F.col("id"))
        .mapInPandas(gen, MEDIA_SCHEMA)
    )


WAV_FEATURE_SCHEMA = (
    "media_id long, n_samples int, sample_rate int, rms double,"
    " peak double, zero_crossings int"
)


def wav_feature_stats(media: DataFrame) -> DataFrame:
    """REAL codec path (no fake, no stub): parse each payload as an
    uncompressed PCM WAV with the stdlib ``wave`` module inside an
    Arrow-batched ``mapInPandas`` and emit audio features — RMS level,
    peak amplitude, zero-crossing count.  Proves the multimodal plumbing
    end-to-end on genuine decoded bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wavmod

        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w = wavmod.open(io.BytesIO(bytes(payload)), "rb")
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise NotImplementedError(
                        "only 16-bit mono PCM WAV is supported"
                    )
                sr = w.getframerate()
                nf = w.getnframes()
                x = (
                    np.frombuffer(w.readframes(nf), dtype="<i2").astype(
                        np.float64
                    )
                    / 32768.0
                )
                w.close()
                rms = float(np.sqrt((x * x).mean())) if nf else 0.0
                peak = float(np.abs(x).max()) if nf else 0.0
                zc = int(((x[:-1] * x[1:]) < 0).sum()) if nf > 1 else 0
                recs.append((int(mid), nf, sr, rms, peak, zc))
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id",
                    "n_samples",
                    "sample_rate",
                    "rms",
                    "peak",
                    "zero_crossings",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        fn, WAV_FEATURE_SCHEMA
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
