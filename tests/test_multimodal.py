"""Multimodal plumbing tests: schema, mapInPandas batch shape, determinism,
frame sampling, stub gating."""

import numpy as np
import pytest

from graphiti_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document text number {i} " * (i + 1)) for i in range(9)],
        ["doc_id", "text"])
    return M.synthetic_media(spark, docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == \
        [f.name for f in M.MEDIA_SCHEMA.fields]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_norm(media):
    feats = M.extract_features(media).collect()
    assert len(feats) == 9
    for r in feats:
        assert len(r["feature"]) == M.FEATURE_DIM
        assert abs(float(np.linalg.norm(r["feature"])) - 1.0) < 1e-5
        assert len(r["sha256"]) == 64
        assert r["n_bytes"] > 0


def test_extract_features_deterministic_across_partitioning(media):
    a = sorted((r["media_id"], r["sha256"], tuple(r["feature"]))
               for r in M.extract_features(media).collect())
    b = sorted((r["media_id"], r["sha256"], tuple(r["feature"]))
               for r in M.extract_features(media.repartition(7)).collect())
    assert a == b


def test_frame_sample_offsets(media):
    frames = M.frame_sample(media, every_ms=1000).collect()
    assert frames and all(r["offset_ms"] == r["frame_idx"] * 1000
                          for r in frames)
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))   # dense 0..n-1


def test_real_decoder_path_is_gated():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"xx", deterministic_fake=False)
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"xx", deterministic_fake=False)


# --- real container-header parsing (probe_media / sniff_media) ---------

def _png(w, h):
    """Fully valid PNG: signature + IHDR + 1-row IDAT + IEND, real CRCs."""
    import struct
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)   # 8-bit grayscale
    raw = b"".join(b"\x00" + b"\x7f" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _jpeg(w, h):
    """Valid JPEG prefix: SOI + APP0(JFIF) + SOF0 carrying the dims."""
    import struct
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0)


def _gif(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _bmp(w, h):
    import struct
    hdr = b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
    dib = struct.pack("<IiiHH", 40, w, -h, 1, 24) + b"\x00" * 24
    return hdr + dib


def _wav(sr=8000, n_samples=4000):
    """Valid 16-bit mono RIFF/WAVE; duration = n_samples / sr."""
    import struct
    data = b"\x00\x00" * n_samples
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_probe_media_real_headers():
    assert M.probe_media(_png(640, 480)) == ("image/png", 640, 480, None)
    assert M.probe_media(_jpeg(320, 240)) == ("image/jpeg", 320, 240, None)
    assert M.probe_media(_gif(12, 7)) == ("image/gif", 12, 7, None)
    assert M.probe_media(_bmp(33, 21)) == ("image/bmp", 33, 21, None)
    # 4000 samples at 8 kHz = 500 ms
    assert M.probe_media(_wav()) == ("audio/wav", None, None, 500)
    assert M.probe_media(b"not a container") == (None, None, None, None)
    assert M.probe_media(b"") == (None, None, None, None)
    # truncated PNG (magic only) must not crash or lie
    assert M.probe_media(b"\x89PNG\r\n\x1a\n") == (None, None, None, None)


def test_sniff_media_distributed(spark):
    rows = [("p1", "image", None, None, None, None, bytearray(_png(64, 48))),
            ("j1", "image", None, None, None, None, bytearray(_jpeg(8, 6))),
            ("w1", "audio", None, None, None, None, bytearray(_wav())),
            ("x1", "image", None, None, None, None, bytearray(b"junk")),
            ("n1", "image", None, None, None, None, None)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA).repartition(3)
    out = {r["media_id"]: r for r in M.sniff_media(media).collect()}
    assert (out["p1"]["mime_detected"], out["p1"]["width"],
            out["p1"]["height"]) == ("image/png", 64, 48)
    assert (out["j1"]["mime_detected"], out["j1"]["width"],
            out["j1"]["height"]) == ("image/jpeg", 8, 6)
    assert (out["w1"]["mime_detected"], out["w1"]["duration_ms"]) == \
        ("audio/wav", 500)
    assert out["x1"]["mime_detected"] is None
    assert out["n1"]["mime_detected"] is None and out["n1"]["n_bytes"] == 0


def test_synthetic_containers_are_real_files(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    rows = {r["media_id"]: bytes(r["payload"])
            for r in M.synthetic_containers(docs).collect()}
    # the JVM-built bytes must parse with the pure-Python probe
    assert M.probe_media(rows["m0"]) == ("image/png", 16, 9, None)
    assert M.probe_media(rows["m2"]) == ("image/png", 18, 11, None)
    assert M.probe_media(rows["m1"]) == ("audio/wav", None, None, 500)
    # and the PNG IHDR CRC must be the real CRC32 (zlib agrees with JVM)
    import struct
    import zlib
    png = rows["m4"]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    crc = struct.unpack(">I", png[29:33])[0]
    assert crc == zlib.crc32(png[12:29])


def test_probe_media_jpeg_fill_bytes_and_truncated_wav():
    """Review findings: (a) spec-legal 0xFF fill bytes between JPEG
    segments must not desync the marker walk; (b) a WAV whose fmt chunk
    is shorter than the byte-rate field must yield no duration, not one
    read from the next chunk's bytes."""
    import struct
    # JPEG with fill bytes before APP0 and before SOF0
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, 240, 320, 1) + b"\x01\x11\x00"
    jpg = (b"\xff\xd8" + b"\xff\xff\xff\xe0"
           + struct.pack(">H", len(app0) + 2) + app0
           + b"\xff\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0)
    assert M.probe_media(jpg) == ("image/jpeg", 320, 240, None)
    # truncated fmt chunk (clen=4) followed by a data chunk whose header
    # bytes must NOT be read as a byte rate
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert M.probe_media(wav) == ("audio/wav", None, None, None)
