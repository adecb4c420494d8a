"""Multimodal column plumbing for training-data pipelines.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed via Arrow-batched ``mapInPandas`` — the schema,
partitioning, UDF signatures and batch shapes are real and tested.

Two decode layers:

  * **Container metadata is REAL**: ``probe_media`` parses PNG / JPEG /
    GIF / BMP headers (magic + dimension fields) and WAV RIFF chunks
    (sample rate / duration) directly from the payload bytes — no codec
    library needed, same information ``identify``/``ffprobe`` reads.
    ``sniff_media`` runs it distributed as a narrow ``mapInPandas``.
  * **Pixel/sample decode is REAL for PNG and WAV-PCM16** — pure stdlib:
    ``decode_png`` inflates IDAT with ``zlib`` and inverts all five PNG
    scanline filters (None/Sub/Up/Average/Paeth, spec §9) for 8-bit
    gray / gray+alpha / RGB / RGBA; ``decode_wav`` parses RIFF chunks and
    reads PCM16 frames via numpy. ``decode_stats`` runs both distributed
    (narrow ``mapInPandas``) and emits integer-exact pixel/sample
    statistics, so a DuckDB oracle can state them closed-form. Formats
    needing entropy codecs absent from this container (JPEG, GIF-LZW,
    compressed audio) stay behind ``deterministic_fake=True`` in
    ``decode_image``/``decode_audio`` (byte-statistics fallback) or raise
    ``NotImplementedError`` with ``deterministic_fake=False``.

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


# ---------------------------------------------------------------------------
# REAL pixel/sample decode — pure stdlib (zlib) + numpy, no codec libraries.
# ---------------------------------------------------------------------------

#: PNG color type → samples per pixel (bit depth 8 only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_predict(a: int, b: int, c: int, ftype: int) -> int:
    """Spec §9 predictor for Sub(1)/Average(3)/Paeth(4), given left /
    above / upper-left reconstructed bytes. ONE copy shared by the
    decoder and its encoder twin, so the Average floor and the Paeth
    tie-break order cannot drift between them."""
    if ftype == 1:
        return a
    if ftype == 3:
        return (a + b) >> 1
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth).
    ``raw`` is the inflated IDAT stream: h rows of (1 filter byte +
    w*bpp sample bytes). Returns (h, w*bpp) uint8.

    Up (the only filter with no intra-row dependency) is fully
    vectorized; Sub/Average/Paeth need the previous RECONSTRUCTED byte so
    they walk the row — fine for this env's synthetic assets; a cluster
    deployment would swap in an installed codec at this exact seam."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG: inflated data shorter than h*(1+w*bpp)")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:                                   # None
            rec = line
        elif ftype == 2:                                 # Up
            rec = (line + prior) & 0xFF
        elif ftype in (1, 3, 4):                         # Sub/Average/Paeth
            rec = line.copy()
            for x in range(stride):
                pred = _png_predict(
                    rec[x - bpp] if x >= bpp else 0,     # left (recon)
                    prior[x],                            # above
                    prior[x - bpp] if x >= bpp else 0,   # upper-left
                    ftype)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out


def decode_png(b: bytes) -> np.ndarray:
    """REAL PNG decode, stdlib-only: chunk walk → IDAT concat →
    ``zlib.decompress`` → per-row unfilter. Supports bit depth 8, color
    types 0/2/4/6, no interlace (the overwhelmingly common web subset);
    palette/16-bit/Adam7 raise ``NotImplementedError``. Returns
    (h, w, channels) uint8."""
    import struct
    import zlib

    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", b[16:24])
    depth, ctype, _comp, _filt, interlace = struct.unpack(">BBBBB", b[24:29])
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color={ctype} interlace={interlace}"
            " outside the stdlib subset")
    ch = _PNG_CHANNELS[ctype]
    idat, i = [], 8
    while i + 8 <= len(b):
        (clen,), cid = struct.unpack(">I", b[i:i + 4]), b[i + 4:i + 8]
        if cid == b"IDAT":
            idat.append(b[i + 8:i + 8 + clen])
        elif cid == b"IEND":
            break
        i += 12 + clen                                  # len+type+data+crc
    if not idat:
        raise ValueError("PNG: no IDAT chunk")
    raw = zlib.decompress(b"".join(idat))
    return _png_unfilter(raw, h, w, ch).reshape(h, w, ch)


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder (the decoder's test twin and the synthetic-
    container generator): 8-bit gray/gray+alpha/RGB/RGBA, per-row filter
    types from ``filters`` (default all 0) applied FORWARD per spec §9 —
    so a decoder that mis-inverts any filter cannot round-trip."""
    import struct
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    lines = []
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = filters[y % len(filters)] if filters else 0
        rec = flat[y]
        if ftype == 0:
            enc = rec
        elif ftype == 2:
            enc = (rec - prior) & 0xFF
        else:
            enc = rec.copy()
            for x in range(stride - 1, -1, -1):
                pred = _png_predict(
                    rec[x - ch] if x >= ch else 0,
                    prior[x],
                    prior[x - ch] if x >= ch else 0,
                    ftype)
                enc[x] = (rec[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prior = rec

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV PCM16 decode: RIFF chunk walk → fmt (must be PCM,
    16-bit) → data chunk as little-endian int16 frames. Returns
    ((n_frames, n_channels) int16, sample_rate). Compressed/float WAV
    raises ``NotImplementedError``."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    fmt, data, i = None, None, 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        clen = int.from_bytes(b[i + 4:i + 8], "little")
        if cid == b"fmt " and clen >= 16 and i + 8 + 16 <= len(b):
            fmt = b[i + 8:i + 8 + 16]
        elif cid == b"data":
            data = b[i + 8:i + 8 + min(clen, len(b) - i - 8)]
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        raise NotImplementedError(
            f"WAV fmt={audio_fmt} bits={bits}: only PCM16 is stdlib-decodable")
    n = len(data) // (2 * n_ch)
    samples = np.frombuffer(data, dtype="<i2", count=n * n_ch)
    return samples.reshape(n, n_ch), rate


def decode_image(payload: bytes, deterministic_fake: bool = True) -> np.ndarray:
    """Pixel decode: REAL for PNG (``decode_png``). Other containers
    have no codec in this env: ``deterministic_fake=True`` returns the
    payload bytes as a 1-D uint8 'pixel' array (stable, exercises the
    full distributed path); ``False`` raises where ``PIL.Image.open``
    would go."""
    import zlib
    payload = payload or b"\x00"   # NULL column cell: keep the
    # deterministic byte-fallback contract instead of TypeError
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            return decode_png(bytes(payload))
        except (ValueError, NotImplementedError, zlib.error):
            if not deterministic_fake:
                raise
    if not deterministic_fake:
        raise NotImplementedError("non-PNG image codecs unavailable here")
    return np.frombuffer(payload or b"\x00", dtype=np.uint8)


def decode_audio(payload: bytes,
                 deterministic_fake: bool = True) -> np.ndarray:
    """Sample decode: REAL for WAV-PCM16 (``decode_wav``; returns the
    flattened int16 samples as float32). Other containers:
    ``deterministic_fake=True`` treats payload bytes as samples;
    ``False`` raises where ``soundfile.read`` would go."""
    payload = payload or b"\x00"   # NULL column cell: see decode_image
    if payload[:4] == b"RIFF":
        try:
            return decode_wav(bytes(payload))[0].ravel().astype(np.float32)
        except (ValueError, NotImplementedError):
            if not deterministic_fake:
                raise
    if not deterministic_fake:
        raise NotImplementedError("non-WAV audio codecs unavailable here")
    return np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)


def _image_feature(b: bytes) -> np.ndarray:
    """32-bin value histogram of the DECODED pixels (real for PNG; byte
    fallback otherwise — decode_image's contract)."""
    px = decode_image(b).ravel()
    hist, _ = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))
    return hist.astype(np.float32)


def _audio_feature(b: bytes) -> np.ndarray:
    """Per-band RMS energy over the DECODED samples (real int16 for
    WAV-PCM16; byte fallback otherwise)."""
    s = decode_audio(b).astype(np.float64)
    if not len(s):
        s = np.zeros(1)
    pad = (-len(s)) % FEATURE_DIM
    s = np.pad(s, (0, pad))
    return np.sqrt((s.reshape(FEATURE_DIM, -1) ** 2)
                   .mean(axis=1)).astype(np.float32)


def extract_features(media: DataFrame,
                     batch_hint: int = 256) -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURE_SCHEMA via Arrow-batched mapInPandas.

    Features come from the REAL decode where the container supports it
    (PNG pixel histogram, WAV-PCM16 band RMS) and from the deterministic
    byte fallback otherwise. Narrow map: no shuffle; vectors are
    L2-normalized so cosine joins downstream compose with the embedding
    operators."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                v = (_audio_feature(b) if kind == "audio"
                     else _image_feature(b))
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


DECODE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("px_sum", T.LongType(), True),
    T.StructField("px_min", T.IntegerType(), True),
    T.StructField("px_max", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("sample_sum", T.LongType(), True),
    T.StructField("sample_sumsq", T.LongType(), True),
    T.StructField("decoded", T.BooleanType(), False),
])


def decode_stats(media: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA → DECODE_SCHEMA: REAL pixel/sample decode, distributed
    as a narrow Arrow ``mapInPandas`` (binary column never shuffles).

    Emits INTEGER-exact statistics (sums, not means) so a SQL oracle can
    state the expected values closed-form with no float-hash hazard:
    images → (width, height, channels, px_sum, px_min, px_max); audio →
    (n_samples per channel, sample_rate, sample_sum, sample_sumsq).
    Rows whose container can't be pixel-decoded here (JPEG/GIF/BMP, PNG
    without IDAT, compressed audio) come back ``decoded=false`` with
    null stats — honest per-row success signaling, not a fake."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("width", "height", "channels", "px_sum",
                                   "px_min", "px_max", "n_samples",
                                   "sample_rate", "sample_sum",
                                   "sample_sumsq", "decoded")}
            import zlib
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                img = aud = None
                row = dict.fromkeys(out, None)
                try:
                    if b[:8] == b"\x89PNG\r\n\x1a\n":
                        img = decode_png(b)
                    elif b[:4] == b"RIFF":
                        aud = decode_wav(b)
                except (ValueError, NotImplementedError, zlib.error):
                    pass
                if img is not None:
                    h, w, c = img.shape
                    flat = img.astype(np.int64)
                    row.update(width=w, height=h, channels=c,
                               px_sum=int(flat.sum()),
                               px_min=int(img.min()) if img.size else None,
                               px_max=int(img.max()) if img.size else None,
                               decoded=True)
                elif aud is not None:
                    s, rate = aud
                    s64 = s.astype(np.int64)
                    row.update(n_samples=int(s.shape[0]), sample_rate=rate,
                               sample_sum=int(s64.sum()),
                               sample_sumsq=int((s64 * s64).sum()),
                               decoded=True)
                else:
                    row["decoded"] = False
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "channels": pd.Series(out["channels"], dtype="Int32"),
                "px_sum": pd.Series(out["px_sum"], dtype="Int64"),
                "px_min": pd.Series(out["px_min"], dtype="Int32"),
                "px_max": pd.Series(out["px_max"], dtype="Int32"),
                "n_samples": pd.Series(out["n_samples"], dtype="Int64"),
                "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                "sample_sum": pd.Series(out["sample_sum"], dtype="Int64"),
                "sample_sumsq": pd.Series(out["sample_sumsq"], dtype="Int64"),
                "decoded": pd.Series(out["decoded"], dtype="bool"),
            })
    return media.mapInPandas(run, DECODE_SCHEMA)


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


#: synthetic_containers_px audio parameters (shared with the oracle).
PX_WAV_N = 1600
PX_WAV_RATE = 8000


def px_image_value(doc_id: int, y: int) -> int:
    """Row-constant pixel value of the synthetic PNG — the closed form
    the DuckDB oracle states: ``(doc_id + 17*y) % 256``."""
    return (doc_id + 17 * y) % 256


def px_audio_sample(doc_id: int, i: int) -> int:
    """i-th int16 sample of the synthetic WAV:
    ``((37*doc_id + 11*i) % 4001) - 2000``."""
    return ((37 * doc_id + 11 * i) % 4001) - 2000


def synthetic_containers_px(documents: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table with REAL pixels/samples inside real containers
    (contrast :func:`synthetic_containers`, whose JVM-built PNGs carry no
    IDAT — enough for the header probe, not for decode):

      * even doc_id → 8-bit grayscale PNG, width ``16 + doc_id % 32``,
        height ``9 + doc_id % 7``, row y uniformly ``px_image_value``;
        the per-row FILTER TYPE cycles ``y % 5`` through all five spec
        filters, so decoding exercises every unfilter branch and any
        mis-inversion corrupts the closed-form pixel stats;
      * odd doc_id → 8 kHz PCM16 mono WAV of ``PX_WAV_N`` samples
        ``px_audio_sample`` (a mod-4001 ramp, zero-mean-ish, int-exact).

    Built in an Arrow ``mapInPandas`` (zlib lives in Python, not the
    JVM); generation is datagen, not the extraction hot path."""
    import struct
    import zlib as _zlib  # noqa: F401  (encode_png pulls it in)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ids.append(f"m{d}")
                if d % 2 == 0:
                    w, h = 16 + d % 32, 9 + d % 7
                    px = np.tile(
                        np.array([px_image_value(d, y) for y in range(h)],
                                 dtype=np.uint8)[:, None], (1, w))
                    kinds.append("image")
                    payloads.append(encode_png(px, filters=[0, 1, 2, 3, 4]))
                else:
                    s = np.array([px_audio_sample(d, i)
                                  for i in range(PX_WAV_N)], dtype="<i2")
                    data = s.tobytes()
                    fmt = struct.pack("<HHIIHH", 1, 1, PX_WAV_RATE,
                                      PX_WAV_RATE * 2, 2, 16)
                    riff = (b"WAVE"
                            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                            + b"data" + struct.pack("<I", len(data)) + data)
                    kinds.append("audio")
                    payloads.append(
                        b"RIFF" + struct.pack("<I", len(riff)) + riff)
            yield pd.DataFrame({
                "media_id": ids, "kind": kinds,
                "mime": pd.Series([None] * len(ids), dtype="object"),
                "width": pd.Series([None] * len(ids), dtype="Int32"),
                "height": pd.Series([None] * len(ids), dtype="Int32"),
                "duration_ms": pd.Series([None] * len(ids), dtype="Int32"),
                "payload": payloads,
            })
    return documents.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


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
