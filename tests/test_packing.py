"""pack_sequences (operators/packing.py) vs a pure-Python packer.

The operator's contract: within each shard, the exclusive prefix sum of
token counts in order_cols order gives each doc's start position; floor
divisions by the budget give the sequence span. A straddling doc is split;
a zero-token doc occupies exactly one sequence entry (its start's).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from graphiti_spark.operators.packing import pack_sequences


def _py_pack(rows, budget):
    """rows: list of (doc_id, shard, tokens) — reference coordinates."""
    out = {}
    by_shard = {}
    for doc_id, shard, tok in sorted(rows):
        by_shard.setdefault(shard, []).append((doc_id, tok))
    for shard, docs in by_shard.items():
        pos = 0
        for doc_id, tok in sorted(docs):
            first = pos // budget
            last = max(pos + tok - 1, pos) // budget
            out[doc_id] = (pos, first, last, last - first + 1, pos % budget)
            pos += tok
    return out


def _run(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, shard string, tokens long")
    got = pack_sequences(df, token_col="tokens", budget=budget,
                         order_cols=["doc_id"], shard_col="shard").collect()
    return {r.doc_id: (r.start_tok, r.first_seq, r.last_seq, r.n_seqs,
                       r.seq_offset) for r in got}


def test_matches_python_packer_random(spark):
    rng = random.Random(7)
    rows = [(i, f"s{rng.randrange(4)}", rng.randrange(0, 5000))
            for i in range(400)]
    assert _run(spark, rows, 2048) == _py_pack(rows, 2048)


def test_straddle_split_and_zero_token(spark):
    rows = [(1, "a", 100), (2, "a", 2000), (3, "a", 0), (4, "a", 5000)]
    got = _run(spark, rows, 1024)
    # doc 2 starts at 100, ends at 2099 -> seqs 0..2, split across 3
    assert got[2] == (100, 0, 2, 3, 100)
    # zero-token doc occupies one sequence at its start position
    assert got[3] == (2100, 2, 2, 1, 52)
    # doc 4 spans 2100..7099 -> seqs 2..6
    assert got[4] == (2100, 2, 6, 5, 52)


def test_shards_are_independent(spark):
    rows = [(1, "a", 10), (2, "b", 10), (3, "a", 10), (4, "b", 10)]
    got = _run(spark, rows, 16)
    assert got[1][0] == 0 and got[2][0] == 0
    assert got[3][0] == 10 and got[4][0] == 10


def test_coverage_is_contiguous(spark):
    """start_tok of each doc equals sum of earlier docs' tokens: no gaps,
    no overlaps, total packed length = shard token sum."""
    rng = random.Random(11)
    rows = [(i, "s", rng.randrange(1, 300)) for i in range(200)]
    got = _run(spark, rows, 256)
    pos = 0
    for doc_id, _, tok in sorted(rows):
        assert got[doc_id][0] == pos
        pos += tok


def test_single_shuffle_plan(spark):
    """The physical plan has exactly one exchange (the shard hash)."""
    df = spark.createDataFrame([(1, "a", 5)],
                               "doc_id long, shard string, tokens long")
    plan = (pack_sequences(df, token_col="tokens", budget=64,
                           order_cols=["doc_id"], shard_col="shard")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
