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
