"""build_inverted_index (operators/search.py) vs a pure-Python index.

Contract: one row per (term, doc_id % n_buckets); bucket segments are
disjoint, internally ascending, and concatenate (in bucket order) to the
term's full sorted posting list; df_part/cf_part sum to the term's df/cf.
"""

from __future__ import annotations

import random
import re

from graphiti_spark.operators.keywords import DEFAULT_STOPWORDS
from graphiti_spark.operators.search import build_inverted_index

VOCAB = ["spark", "window", "agg", "join", "scan", "the", "to",
         "cat", "partition", "shuffle", "broadcast", "zz"]


def _py_index(docs, min_len=2, stop=DEFAULT_STOPWORDS):
    """docs: {doc_id: text} -> {term: (df, cf, sorted doc_ids)}."""
    tfs = {}
    for did, text in docs.items():
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower())
                if len(t) >= min_len and t not in stop]
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        tfs[did] = tf
    out = {}
    for did, tf in tfs.items():
        for t, c in tf.items():
            d, cf, ids = out.get(t, (0, 0, []))
            out[t] = (d + 1, cf + c, ids + [did])
    return {t: (d, cf, sorted(ids)) for t, (d, cf, ids) in out.items()}


def test_index_matches_python_reference(spark):
    rng = random.Random(3)
    docs = {i: " ".join(rng.choices(VOCAB, k=rng.randint(0, 30)))
            for i in range(80)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = build_inverted_index(df, n_buckets=4).collect()
    exp = _py_index(docs)
    got = {}
    for r in rows:
        ids = [int(x) for x in r.postings.split("|")] if r.postings else []
        assert ids == sorted(ids)                       # segment ascending
        assert all(i % 4 == r.bucket for i in ids)      # segment disjoint
        assert r.df_part == len(ids)
        d, cf, all_ids = got.get(r.term, (0, 0, {}))
        all_ids[r.bucket] = ids
        got[r.term] = (d + r.df_part, cf + r.cf_part, all_ids)
    assert set(got) == set(exp)
    for t, (d, cf, by_bucket) in got.items():
        merged = sorted(i for ids in by_bucket.values() for i in ids)
        assert (d, cf, merged) == exp[t], t


def test_index_head_term_spread(spark):
    # A term present in EVERY doc must spread across all buckets.
    df = spark.createDataFrame(
        [(i, "hot filler%d" % i) for i in range(40)],
        "doc_id long, text string")
    rows = [r for r in build_inverted_index(df, n_buckets=8).collect()
            if r.term == "hot"]
    assert len(rows) == 8
    assert sum(r.df_part for r in rows) == 40
    assert max(r.df_part for r in rows) == 5    # 40/8 exactly, zero skew


def test_string_ids_bucket_by_hash(spark):
    """code-review r5: pmod on a STRING id either throws (ANSI) or
    collapses every doc into a NULL bucket. String ids must hash-bucket;
    segments stay disjoint, internally sorted, and union to the full
    posting list."""
    rng = random.Random(9)
    docs = {f"uuid-{i:03d}": " ".join(rng.choices(VOCAB, k=20))
            for i in range(40)}
    df = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    got = build_inverted_index(df, id_col="doc_id", n_buckets=4).collect()
    want = _py_index(docs)
    seen = {}
    for r in got:
        assert r["bucket"] is not None and 0 <= r["bucket"] < 4
        ids = r["postings"].split("|")
        assert ids == sorted(ids)          # segment internally sorted
        d, cf, allids = seen.get(r["term"], (0, 0, []))
        seen[r["term"]] = (d + r["df_part"], cf + r["cf_part"],
                           allids + ids)
    assert {t: (d, cf, sorted(ids)) for t, (d, cf, ids) in seen.items()} \
        == want
