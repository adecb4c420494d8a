"""Incremental LSH band index (streaming/lsh_index.py) vs batch rebuild.

Contract: after N micro-batches, the UNION of emitted candidate pairs
equals `minhash_candidate_pairs` over the union of the batches' docs
(under-cap corpora — see the module docstring for the cap-semantics
divergence, which the over-cap test pins down separately).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from graphiti_spark.operators.ann import minhash_candidate_pairs
from graphiti_spark.streaming.lsh_index import LshIndex

VOCAB = [f"w{i}" for i in range(50)]


def _docs(rng, ids):
    rows = []
    for i in ids:
        if i % 3 == 0 and i > 0:
            # near-dup of doc i-1: share most tokens
            base = rows[-1][1] if rows else rng.sample(VOCAB, 12)
            toks = sorted(set(base[:10] + rng.sample(VOCAB, 2)))
        else:
            toks = sorted(set(rng.sample(VOCAB, 12)))
        rows.append((i, toks))
    return rows


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, toks array<string>")


def test_incremental_equals_batch_rebuild(spark, tmp_path):
    rng = random.Random(7)
    batches = [_docs(rng, range(0, 20)), _docs(rng, range(20, 45)),
               _docs(rng, range(45, 60))]
    idx = LshIndex(str(tmp_path / "lsh"), max_bucket=100)
    got = set()
    for rows in batches:
        pairs = idx.update(_mk(spark, rows)).collect()
        got |= {(r["doc_a"], r["doc_b"]) for r in pairs}
    full = _mk(spark, [r for b in batches for r in b])
    want = {(r["doc_a"], r["doc_b"]) for r in
            minhash_candidate_pairs(full, max_bucket=100).collect()}
    assert got == want
    assert want  # the corpus actually produces near-dup candidates
    # the at-rest index equals the keys a fresh signature pass computes
    stored = spark.read.parquet(str(tmp_path / "lsh"))
    assert stored.count() == full.count() * 2  # bands=2 keys per doc
    assert stored.select("shard").distinct().count() >= 2  # really sharded


def test_capped_bucket_stops_emitting(spark, tmp_path):
    # every doc identical => ONE bucket per band; cap 4 with the
    # TOTAL-population rule (stored + batch): batch 1 (3 docs, total 3)
    # emits C(3,2); batch 2 (total 6 > 4) emits NOTHING — including the
    # in-batch self-join, which is the O(batch²) guard; batch 3 same.
    same = ["a", "b", "c", "d", "e"]
    idx = LshIndex(str(tmp_path / "lsh"), max_bucket=4)
    p1 = idx.update(_mk(spark, [(i, same) for i in (0, 1, 2)])).count()
    p2 = idx.update(_mk(spark, [(i, same) for i in (3, 4, 5)])).count()
    p3 = idx.update(_mk(spark, [(i, same) for i in (6, 7)])).count()
    assert p1 == 3          # C(3,2) within batch, total under cap
    assert p2 == 0          # total 6 > 4: bucket dark, no O(B^2) term
    assert p3 == 0


def test_replayed_batch_is_idempotent(spark, tmp_path):
    # at-least-once foreachBatch: re-running the SAME batch (keys
    # already stored) must append nothing and emit the same pairs
    rng = random.Random(5)
    rows = _docs(rng, range(0, 15))
    idx = LshIndex(str(tmp_path / "lsh"))
    first = {(r["doc_a"], r["doc_b"]) for r in
             idx.update(_mk(spark, rows)).collect()}
    n_rows = spark.read.parquet(str(tmp_path / "lsh")).count()
    replay = {(r["doc_a"], r["doc_b"]) for r in
              idx.update(_mk(spark, rows)).collect()}
    assert replay == first
    assert spark.read.parquet(str(tmp_path / "lsh")).count() == n_rows


def test_resumes_from_disk(spark, tmp_path):
    # a NEW LshIndex object over the same path sees prior batches:
    # restart-safety comes from the files, not driver state
    rng = random.Random(11)
    path = str(tmp_path / "lsh")
    LshIndex(path).update(_mk(spark, _docs(rng, range(0, 10))))
    dup_of_3 = [(100, [t for t in _docs(random.Random(11), range(0, 10))
                       [3][1]])]
    pairs = LshIndex(path).update(_mk(spark, dup_of_3)).collect()
    assert (3, 100) in {(r["doc_a"], r["doc_b"]) for r in pairs}


def test_run_near_dup_stream_matches_batch(spark, tmp_path):
    """End-to-end wiring: parquet drops → foreachBatch probe/append →
    pairs sink. The union of streamed pairs equals the batch operator
    over the whole corpus (under-cap), exactly as the direct-update
    test, but through a real StreamingQuery with availableNow."""
    from graphiti_spark.streaming.lsh_index import run_near_dup_stream

    rng = random.Random(13)
    rows = _docs(rng, range(0, 40))
    in_dir = tmp_path / "in"
    for i in range(4):                       # 4 drop files = 4 batches
        _mk(spark, rows[i * 10:(i + 1) * 10]) \
            .coalesce(1).write.mode("append") \
            .parquet(str(in_dir / f"drop{i}.parquet"))

    q = run_near_dup_stream(
        spark, str(in_dir / "*"), str(tmp_path / "idx"),
        str(tmp_path / "pairs"),
        schema="doc_id bigint, toks array<string>",
        tokenize=lambda df: df.select("doc_id", "toks"))
    q.awaitTermination(120)

    got = {(r["doc_a"], r["doc_b"]) for r in
           spark.read.parquet(str(tmp_path / "pairs")).collect()}
    want = {(r["doc_a"], r["doc_b"]) for r in
            minhash_candidate_pairs(_mk(spark, rows),
                                    max_bucket=100).collect()}
    assert got == want and want
