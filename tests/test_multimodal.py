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


# --- REAL pixel/sample decode (decode_png / decode_wav / decode_stats) --


def test_decode_png_round_trip_all_filters_and_channels():
    rng = np.random.RandomState(7)
    for shape in [(9, 16), (5, 3, 2), (6, 4, 3), (7, 2, 4)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        b = M.encode_png(px, filters=[0, 1, 2, 3, 4])
        got = M.decode_png(b)
        want = px if px.ndim == 3 else px[:, :, None]
        assert np.array_equal(got, want), shape
        # header probe agrees with the decoded geometry
        mime, w, h, _ = M.probe_media(b)
        assert (mime, w, h) == ("image/png", shape[1], shape[0])


def test_decode_png_hand_built_vector():
    """Filter inversion against hand-computed bytes (not the encoder
    twin, so a symmetric encode/decode bug cannot hide): 2x2 grayscale
    [[1,2],[3,4]]; row0 Sub -> [1,1], row1 Up -> [2,2]."""
    import struct
    import zlib

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))
    raw = bytes([1, 1, 1]) + bytes([2, 2, 2])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    b = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
         + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert M.decode_png(b).reshape(2, 2).tolist() == [[1, 2], [3, 4]]


def test_decode_png_rejects_unsupported():
    import struct
    import zlib

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d)))
    with pytest.raises(ValueError):
        M.decode_png(b"nope")
    # 16-bit depth is outside the stdlib subset
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    b16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        M.decode_png(b16)
    # probe-only container (no IDAT) decodes to an honest error
    ihdr8 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    b_no_idat = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr8)
                 + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IDAT"):
        M.decode_png(b_no_idat)


def test_decode_wav_pcm16():
    got, rate = M.decode_wav(_wav())
    assert rate == 8000 and got.shape == (4000, 1) and not got.any()
    s = np.array([M.px_audio_sample(3, i) for i in range(M.PX_WAV_N)],
                 dtype="<i2")
    import struct
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    got, rate = M.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 44100 and np.array_equal(got.ravel(), s)
    # float WAV (fmt 3) is honestly not decodable here
    fmt3 = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body3 = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt3)) + fmt3
             + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        M.decode_wav(b"RIFF" + struct.pack("<I", len(body3)) + body3)


def test_decode_stats_matches_closed_form(spark):
    """The distributed decode of synthetic_containers_px must land on the
    closed-form pixel/sample statistics that DEFINED the content (the
    same formulas the DuckDB oracle states)."""
    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    out = {r["media_id"]: r
           for r in M.decode_stats(
               M.synthetic_containers_px(docs)).collect()}
    for d in range(0, 8, 2):
        w, h = 16 + d % 32, 9 + d % 7
        vals = [M.px_image_value(d, y) for y in range(h)]
        r = out[f"m{d}"]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        assert r["px_sum"] == w * sum(vals)
        assert r["px_min"] == min(vals) and r["px_max"] == max(vals)
        assert r["decoded"]
    for d in range(1, 8, 2):
        s = [M.px_audio_sample(d, i) for i in range(M.PX_WAV_N)]
        r = out[f"m{d}"]
        assert (r["n_samples"], r["sample_rate"]) == (M.PX_WAV_N,
                                                      M.PX_WAV_RATE)
        assert r["sample_sum"] == sum(s)
        assert r["sample_sumsq"] == sum(x * x for x in s)
        assert r["decoded"]


def test_decode_stats_flags_undecodable(spark):
    """Probe-only PNGs (no IDAT) and non-containers come back
    decoded=false with null stats — never a fake."""
    docs = spark.createDataFrame([(i,) for i in range(4)], ["doc_id"])
    probe_only = M.synthetic_containers(docs)   # JVM PNGs carry no IDAT
    out = {r["media_id"]: r for r in M.decode_stats(probe_only).collect()}
    for d in (0, 2):
        assert not out[f"m{d}"]["decoded"]
        assert out[f"m{d}"]["px_sum"] is None
    for d in (1, 3):                            # the WAVs are real PCM16
        assert out[f"m{d}"]["decoded"]
        assert out[f"m{d}"]["sample_sum"] == 0


def test_extract_features_uses_real_decode(spark):
    """For a constant-valued PNG the pixel histogram must be a one-hot
    on the pixel value's bin — it can only come from real decode (the
    byte-histogram fake sees zlib noise, not pixels)."""
    px = np.full((5, 8), 200, dtype=np.uint8)
    rows = [("c1", "image", None, None, None, None,
             bytearray(M.encode_png(px)))]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    feat = M.extract_features(media).collect()[0]["feature"]
    bin_idx = 200 * M.FEATURE_DIM // 256
    assert feat[bin_idx] == pytest.approx(1.0)
    assert sum(abs(v) for i, v in enumerate(feat) if i != bin_idx) == 0


def test_decode_null_payload_falls_back_deterministically():
    # a NULL/empty media cell must keep the deterministic byte-fallback
    # contract (not TypeError inside the executor batch)
    for payload in (None, b""):
        img = M.decode_image(payload)
        assert img.dtype == np.uint8 and img.shape == (1,)
        aud = M.decode_audio(payload)
        assert aud.dtype == np.float32 and aud.shape == (1,)
