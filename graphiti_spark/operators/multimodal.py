"""Multimodal column plumbing for training-data pipelines.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed via Arrow-batched ``mapInPandas`` — the schema,
partitioning, UDF signatures and batch shapes are real and tested.

Two decode layers, honestly separated:

  * **Container metadata is REAL**: ``probe_media`` parses PNG / JPEG /
    GIF / BMP headers (magic + dimension fields) and WAV RIFF chunks
    (sample rate / duration) directly from the payload bytes — no codec
    library needed, same information ``identify``/``ffprobe`` reads.
    ``sniff_media`` runs it distributed as a narrow ``mapInPandas``.
  * **Pixel/sample decode is STUBBED** (no image/audio libraries in this
    container) behind ``decode_image``/``decode_audio``: with
    ``deterministic_fake=True`` (default) the "decode" derives
    byte-statistics features from the payload itself — stable, testable,
    and exercising the full distributed path; with ``False`` it raises
    ``NotImplementedError`` where ``PIL.Image.open`` / ``soundfile.read``
    would go.

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

PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("mime_detected", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), False),
])

# JPEG start-of-frame markers that carry dimensions (SOF0-15 minus
# DHT/JPG/DAC which share the 0xC0 nibble but aren't frames).
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def probe_media(b: bytes) -> tuple[str | None, int | None, int | None,
                                   int | None]:
    """REAL container-metadata parse from payload bytes — no codec libs:
    (mime, width, height, duration_ms), Nones where the field doesn't
    apply or the container is unrecognized.

      * PNG — IHDR is mandatorily the first chunk, so width/height are the
        two big-endian u32s at offsets 16/20.
      * GIF / BMP — little-endian dims in the fixed header (BMP height may
        be negative = top-down; absolute value is the pixel height).
      * JPEG — walk the marker stream to the first SOF frame header
        (height/width big-endian u16 at +5/+7 inside the segment).
      * WAV — RIFF/WAVE chunk walk: fmt's byte-rate + data's size give
        duration; chunks are padded to even offsets per the spec.
    """
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        return ("image/png", int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"), None)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return ("image/gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"), None)
    if len(b) >= 26 and b[:2] == b"BM":
        h = int.from_bytes(b[22:26], "little", signed=True)
        return ("image/bmp", int.from_bytes(b[18:22], "little"),
                abs(h), None)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(b) and b[i] == 0xFF:
            j = i + 1
            while j < len(b) and b[j] == 0xFF:      # spec-legal fill bytes
                j += 1
            if j >= len(b):
                break
            marker = b[j]
            # standalone markers (no length field): SOI, TEM, RST0-7
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i = j + 1
                continue
            if marker == 0xD9 or marker == 0xDA:    # EOI / SOS: dims are
                break                               # always before SOS
            if j + 3 > len(b):
                break
            seglen = int.from_bytes(b[j + 1:j + 3], "big")
            if seglen < 2:                          # corrupt length
                break
            if marker in _JPEG_SOF:
                if j + 8 <= len(b):
                    return ("image/jpeg",
                            int.from_bytes(b[j + 6:j + 8], "big"),
                            int.from_bytes(b[j + 4:j + 6], "big"), None)
                break
            i = j + 1 + seglen
        return ("image/jpeg", None, None, None)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        byte_rate, data_size, i = None, None, 12
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            clen = int.from_bytes(b[i + 4:i + 8], "little")
            # byte_rate lives at chunk offset 8; require the CHUNK to be
            # long enough (clen), not just the buffer — a truncated fmt
            # must not read the next chunk's bytes as a rate.
            if cid == b"fmt " and clen >= 12 and i + 20 <= len(b):
                byte_rate = int.from_bytes(b[i + 16:i + 20], "little")
            elif cid == b"data":
                data_size = clen
            i += 8 + clen + (clen & 1)             # chunks pad to even
        dur = (int(data_size * 1000 / byte_rate)
               if byte_rate and data_size is not None else None)
        return ("audio/wav", None, None, dur)
    return (None, None, None, None)


def sniff_media(media: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA → PROBE_SCHEMA: distributed header probe, narrow
    Arrow-batched map (no shuffle — the binary column never moves)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [probe_media(bytes(p) if p is not None else b"")
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "mime_detected": pd.Series(
                    [r[0] for r in rows], dtype="object"),
                "width": pd.Series([r[1] for r in rows], dtype="Int32"),
                "height": pd.Series([r[2] for r in rows], dtype="Int32"),
                "duration_ms": pd.Series(
                    [r[3] for r in rows], dtype="Int32"),
                "n_bytes": pd.Series(
                    [len(bytes(p)) if p is not None else 0
                     for p in pdf["payload"]], dtype="int64"),
            })
    return media.mapInPandas(run, PROBE_SCHEMA)


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


def synthetic_containers(documents: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table whose payloads are REAL container bytes, built
    entirely JVM-side (hex-string concat → unhex, CRC via Spark's own
    crc32) — no Python, no files:

      * even doc_id → structurally valid PNG (signature + IHDR with a
        real CRC + IEND; no IDAT, so parseable-not-renderable), width =
        16 + doc_id % 32, height = 9 + doc_id % 7 — per-row dims that a
        downstream probe must actually READ out of the bytes;
      * odd doc_id → fully valid 8 kHz 16-bit mono WAV of 4 000 zero
        samples (500 ms), constant bytes.

    Closes the loop for an oracle: DuckDB can't parse binaries, but it
    can state these dims closed-form from doc_id arithmetic, so
    `sniff_media(synthetic_containers(docs))` is SQL-checkable."""
    w = (F.lit(16) + F.col("doc_id") % 32).cast("int")
    h = (F.lit(9) + F.col("doc_id") % 7).cast("int")
    whex = F.lpad(F.hex(w), 8, "0")
    hhex = F.lpad(F.hex(h), 8, "0")
    # IHDR data: w, h, bit depth 8, color type 6 (RGBA), 3×0x00.
    ihdr_body = F.concat(F.lit("49484452"), whex, hhex, F.lit("0806000000"))
    ihdr_crc = F.lpad(F.hex(F.crc32(F.unhex(ihdr_body))), 8, "0")
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),      # signature
        F.lit("0000000D"), ihdr_body, ihdr_crc,
        F.lit("0000000049454E44AE426082"))  # IEND (fixed CRC)
    # RIFF/WAVE: fmt (PCM, mono, 8000 Hz, byte rate 16000, 16-bit) +
    # data of 8000 zero bytes -> 500 ms. Sizes little-endian.
    wav_hex = F.lit(
        "52494646" + "641F0000" + "57415645"
        + "666D7420" + "10000000" + "0100" + "0100"
        + "401F0000" + "803E0000" + "0200" + "1000"
        + "64617461" + "401F0000" + "00" * 8000)
    is_png = F.col("doc_id") % 2 == 0
    return documents.select(
        F.concat(F.lit("m"), F.col("doc_id")).alias("media_id"),
        F.when(is_png, F.lit("image")).otherwise(F.lit("audio"))
         .alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.unhex(F.when(is_png, png_hex).otherwise(wav_hex)).alias("payload"))


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
