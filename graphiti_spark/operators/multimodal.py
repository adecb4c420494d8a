"""Multimodal column plumbing for training-data pipelines.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed via Arrow-batched ``mapInPandas`` — the schema,
partitioning, UDF signatures and batch shapes are real and tested; only the
codec step is stubbed (no image/audio libraries in this container) behind
``decode_image``/``decode_audio``:

  * with ``deterministic_fake=True`` (default) the "decode" derives
    byte-statistics features from the payload itself — stable, testable,
    and exercising the full distributed path;
  * with ``deterministic_fake=False`` it raises ``NotImplementedError``
    where a real ``PIL.Image.open`` / ``soundfile.read`` call would go.

At cluster scale the binary payloads dominate shuffle size, so every
transform here is a narrow map (no shuffle); downstream joins should carry
the extracted features, never the raw bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),      # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    T.StructField("payload", T.BinaryType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("sha256", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])

FEATURE_DIM = 32


def decode_image(payload: bytes, deterministic_fake: bool = True) -> np.ndarray:
    """STUB: real impl would be ``np.asarray(PIL.Image.open(BytesIO(b)))``.
    The fake derives a (H, W)-free byte histogram — deterministic."""
    if not deterministic_fake:
        raise NotImplementedError("image codecs not available in this env")
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return hist.astype(np.float32)


def decode_audio(payload: bytes, deterministic_fake: bool = True) -> np.ndarray:
    """STUB: real impl would be ``soundfile.read(BytesIO(b))`` + an FFT
    band summary. Fake: energy per byte-stride band."""
    if not deterministic_fake:
        raise NotImplementedError("audio codecs not available in this env")
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % FEATURE_DIM
    arr = np.pad(arr, (0, pad))
    return arr.reshape(FEATURE_DIM, -1).mean(axis=1)


def extract_features(media: DataFrame,
                     batch_hint: int = 256) -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURE_SCHEMA via Arrow-batched mapInPandas.

    Narrow map: no shuffle; feature vectors are L2-normalized so cosine
    joins downstream compose with the embedding operators."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                v = (decode_audio(b) if kind == "audio"
                     else decode_image(b))
                n = float(np.linalg.norm(v))
                feats.append((v / n if n else v).tolist())
                shas.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "sha256": shas, "n_bytes": pd.Series(sizes, dtype="int64"),
                "feature": feats,
            })
    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (real decoder would slice the container; the offsets, schema and
    explode shape are the production path)."""
    n_frames = (F.greatest(F.lit(1),
                           (F.coalesce(F.col("duration_ms"), F.lit(0))
                            / F.lit(every_ms)).cast("int")))
    return (media.where(F.col("kind") == "video")
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0), n_frames - 1)))
            .select("media_id",
                    "frame_idx",
                    (F.col("frame_idx") * every_ms).alias("offset_ms"),
                    "width", "height", "payload"))


def synthetic_media(spark, documents: DataFrame, kind_cycle=("image", "audio",
                                                             "video")):
    """Derive a deterministic media table from the documents table (no
    external data): payload = utf-8 bytes of the text; kind round-robins."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in kind_cycle]),
        (F.col("doc_id") % len(kind_cycle) + 1).cast("int"))
    return documents.select(
        F.concat(F.lit("m"), F.col("doc_id")).alias("media_id"),
        kind.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(48).cast("int").alias("height"),
        (F.length("text") * 10).cast("int").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("payload"))
