"""Multimodal (binary-payload) columns for the training-data pipeline
tier: image/audio/video as opaque `binary` columns with typed
metadata, processed by Arrow-batched UDFs over `mapInPandas`.

The reference corpus is text-only; a 100 TB transcripts pipeline also
carries tool-emitted screenshots/audio. Design stance (per the build
brief): the Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — is REAL and tested; the actual media decode is stubbed
(no image/audio libs in this container) behind `decoder=` hooks:

- the default deterministic fake decoder derives pixel/sample features
  from the payload bytes (md5-seeded), so tests have stable goldens
  and the full distributed path (binary column → Arrow batch → numpy →
  feature struct) executes for real;
- `strict=True` raises NotImplementedError at the decode site instead,
  marking exactly what a deployment must supply (PIL/ffmpeg workers).

Scale notes:
- payloads stay OPAQUE to the JVM (binary column, never parsed by
  Catalyst); metadata columns (mime, width, height, n_bytes) are
  normal columns so pruning/filtering runs JVM-side BEFORE any decode;
- `decode_features` is mapInPandas: one Arrow batch of payloads in,
  one batch of fixed-width feature rows out — no per-row Python round
  trip, no payload ever on the driver;
- frame sampling / resize are batch-shape-preserving so the pipeline
  composes with repartition() sizing (big payloads → lower
  spark.sql.files.maxPartitionBytes / maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), True),       # owning turn
    T.StructField("mime", T.StringType(), False),      # image/png, audio/wav…
    T.StructField("width", T.IntegerType(), True),     # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_samples", T.IntegerType(), True),  # audio
    T.StructField("payload", T.BinaryType(), False),   # opaque bytes
])

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, "
    f"features array<float>, decode_ok boolean"
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes; metadata
    consistent with payload size). Stands in for the Iceberg media
    side-table keyed by (doc_id, media_id)."""
    rows = []
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    for i in range(n):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        mime = mimes[i % len(mimes)]
        payload = (h * (8 + i % 17))[: 64 + (i * 37) % 512]
        w = hh = ns = None
        if mime.startswith("image") or mime.startswith("video"):
            w, hh = 16 + i % 64, 16 + (i * 3) % 64
        else:
            ns = 1000 + i * 13
        rows.append((i, i % max(1, n // 2), mime, w, hh, ns, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in for the real decoder: FEATURE_DIM float32
    features derived from payload bytes (mean/std/quantiles of the byte
    histogram + md5-seeded projection). Pure function of (payload,
    mime) — byte-identical across runs and partitionings."""
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if b.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = np.frombuffer(hashlib.md5(payload + mime.encode()).digest(),
                           dtype=np.uint8).astype(np.float64)
    base = np.array([b.mean(), b.std(), b.min(), b.max(),
                     np.quantile(b, 0.25), np.quantile(b, 0.5),
                     np.quantile(b, 0.75), float(b.size % 251)])
    feats = np.concatenate([base, digest[:FEATURE_DIM - base.size] / 255.0])
    return (feats / (np.abs(feats).max() or 1.0)).astype(np.float32)


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """binary payload → fixed-width feature vector, Arrow-batched.

    strict=True marks the real-decoder integration point: raises
    NotImplementedError AT THE EXECUTOR (inside the batch loop), which
    is where PIL/torchaudio/ffmpeg plug in on a real deployment.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires image/audio libs; "
                    "supply a decoder or use the deterministic stub")
            feats = [_fake_decode(bytes(p), m).tolist()
                     for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "features": feats,
                "decode_ok": True,
            })

    return media.select("media_id", "mime", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """Video 'frame sampling' plumbing: one output row per sampled
    frame offset (JVM-side sequence over metadata — the payload is
    never touched until a downstream decode, so Catalyst prunes
    non-video rows before any byte moves)."""
    frames = F.sequence(
        F.lit(0),
        F.least(F.lit(max_frames - 1),
                (F.length("payload") / every_n_bytes).cast("int")))
    return (media.where(F.col("mime").startswith("video"))
            .select("media_id", "doc_id",
                    F.posexplode(frames).alias("frame_no", "_i"))
            .select("media_id", "doc_id", "frame_no",
                    (F.col("frame_no") * every_n_bytes).alias("byte_offset")))


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregate (no decode): per-mime payload size
    and dimension stats — the pruning-side profile a pipeline runs
    before deciding what to decode."""
    return (media.groupBy("mime")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum(F.length("payload")).cast("long").alias("total_bytes"),
                 F.round(F.avg(F.length("payload")), 4).alias("avg_bytes"),
                 F.max("width").alias("max_width"),
                 F.max("height").alias("max_height")))
