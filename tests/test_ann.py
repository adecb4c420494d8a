"""ANN tests: IVF recall vs brute force, sign-LSH bucket behavior,
determinism across partitionings."""

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators import ann


@pytest.fixture(scope="module")
def embeddings(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .cache())


@pytest.fixture(scope="module")
def queries(spark, embeddings):
    return (embeddings.where(F.col("vec_id") < 5)
            .select(F.col("vec_id").alias("query_id"), "embedding").cache())


def test_brute_force_topk_shape(embeddings, queries):
    out = ann.brute_force_knn(embeddings, queries, k=5).collect()
    assert len(out) == 25
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["score_q"]))
    for rows in by_q.values():
        rows.sort()
        scores = [s for _, s in rows]
        assert scores == sorted(scores, reverse=True)


def test_ivf_recall_vs_brute_force(embeddings, queries):
    cents, assign = ann.build_ivf(embeddings, n_cells=8)
    exact = ann.brute_force_knn(embeddings, queries, k=5).collect()
    approx = ann.ivf_knn(embeddings, queries, cents, assign,
                         k=5, nprobe=4).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(want & got) / len(want)
    assert recall >= 0.5, recall     # nprobe=4 of 8 cells ⇒ decent recall
    # probing ALL cells must reproduce brute force exactly
    full = ann.ivf_knn(embeddings, queries, cents, assign,
                       k=5, nprobe=8).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in full} == want


def test_ivf_assignment_complete(embeddings):
    cents, assign = ann.build_ivf(embeddings, n_cells=8)
    assert assign.count() == embeddings.count()
    assert assign.select("cell_id").distinct().count() <= 8
    assert assign.groupBy("vec_id").count().where("count > 1").count() == 0


def test_signlsh_deterministic_and_similar_collide(spark, embeddings):
    b1 = {r["vec_id"]: r["bucket"]
          for r in ann.signlsh_buckets(embeddings, 8).collect()}
    b2 = {r["vec_id"]: r["bucket"]
          for r in ann.signlsh_buckets(embeddings.repartition(7), 8).collect()}
    assert b1 == b2
    # identical vector → identical bucket
    dup = embeddings.limit(1).withColumn("vec_id", F.lit(99999))
    b3 = {r["vec_id"]: r["bucket"] for r in
          ann.signlsh_buckets(embeddings.limit(1).unionByName(dup), 8)
          .collect()}
    assert len(set(b3.values())) == 1


def test_near_dup_pairs_symmetric_bounded(embeddings):
    pairs = ann.near_dup_pairs_lsh(embeddings.limit(100), n_planes=4)
    rows = pairs.collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})


def test_quantize_int8_reconstruction(embeddings):
    """q in [-127,127]; reconstruction q*mx/127 within mx/254 per element;
    exact match vs a numpy reference."""
    import numpy as np
    rows = ann.quantize_int8(embeddings).collect()
    orig = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in embeddings.collect()}
    assert len(rows) == len(orig)
    for r in rows:
        x = orig[r.vec_id]
        q = np.asarray(r.q, dtype=np.int64)
        assert np.abs(q).max(initial=0) <= 127
        mx = np.abs(x).max(initial=0.0)
        assert r.mx == pytest.approx(mx, abs=0.0)
        if mx == 0:
            assert not q.any()
            continue
        expect = np.floor(x * 127.0 / mx + 0.5)  # HALF_UP for positives
        # HALF_UP rounds away from zero for negatives too
        neg = x * 127.0 / mx < 0
        expect[neg] = np.ceil(x[neg] * 127.0 / mx - 0.5)
        assert (q == expect.astype(np.int64)).all()
        recon = q * mx / 127.0
        assert np.abs(recon - x).max() <= mx / 254.0 * (1 + 1e-9)


def test_quantize_int8_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [0.5, -1.0, 0.25]), (3, [])],
        "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in ann.quantize_int8(df).collect()}
    assert got[1].mx == 0.0 and got[1].q == [0, 0, 0]
    assert got[2].mx == 1.0 and got[2].q == [64, -127, 32]
    assert got[3].mx == 0.0 and got[3].q == []
