"""LSH-dedup scale probe: MinHash candidate generation at 10⁶ documents.

The driver testdata caps `documents` at 5 000 rows, so the dedup operators
never see scale there. This probe synthesizes a deterministic 1M-doc corpus
IN SPARK (no files, no Python UDFs — every token is md5-derived JVM-side),
plants near-duplicates, runs the exact production plan
(`operators/ann.minhash_candidate_pairs`, the same function behind the
oracle-checked `dedup_minhash` driver query) and reports throughput,
candidate volume, and recall of the planted pairs. Results →
BENCH_DOCS.json.

Corpus: doc i has 60 tokens; token j = 'w' || (md5(base:j) mod 50 000),
where base = i-1 when i % 20 == 19 (a planted near-dup of doc i-1, with
tokens j < 3 mutated → Jaccard ≈ 0.9) else i. Expected band-collision
probability for J≈0.9 with 2 bands of 4: 1-(1-0.9⁴)² ≈ 0.88.

Usage: python scripts/exp_docs.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators.ann import minhash_candidate_pairs   # noqa: E402
from graphiti_spark.session import get_spark, ship_package         # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_TOK, VOCAB, MUT = 60, 50_000, 3

spark = get_spark(app="exp_docs", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")


def corpus(n):
    """(doc_id, toks) — deterministic, generated distributed, all JVM."""
    base = F.when(F.col("id") % 20 == 19, F.col("id") - 1) \
            .otherwise(F.col("id"))
    tok = lambda b, j: F.concat(F.lit("w"), F.conv(
        F.substring(F.md5(F.concat_ws(":", b, j.cast("string"))), 1, 8),
        16, 10).cast("long") % VOCAB)
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(N_TOK - 1)),
        lambda j: F.when((F.col("id") % 20 == 19) & (j < MUT),
                         tok(F.concat_ws("#", F.lit("mut"),
                                         F.col("id").cast("string")), j))
                   .otherwise(tok(base.cast("string"), j)))
    return (spark.range(n)
            .repartition(max(CPUS, 8))
            .select(F.col("id").alias("doc_id"),
                    F.array_distinct(toks).alias("toks")))


docs = corpus(N_DOCS).persist()
n = docs.count()   # materialize generation outside the timed window

t0 = time.time()
pairs = minhash_candidate_pairs(docs).persist()
n_pairs = pairs.count()
wall = time.time() - t0

planted = (spark.range(N_DOCS).where(F.col("id") % 20 == 19)
           .select((F.col("id") - 1).alias("doc_a"),
                   F.col("id").alias("doc_b")))
n_planted = planted.count()
hit = pairs.join(planted, ["doc_a", "doc_b"], "left_semi").count()

# BM25 fulltext at the same corpus size: one full search (corpus-stats
# broadcast + token equi-join + df agg + topk) through the production
# plan behind the oracle-checked bm25_search query.
from graphiti_spark.operators.search import bm25_lite_search  # noqa: E402

texts = docs.select("doc_id",
                    F.array_join("toks", " ").alias("text")).persist()
texts.count()
q_toks = texts.where(F.col("doc_id") == 0).head()["text"].split()[:3]
t0 = time.time()
n_hits = bm25_lite_search(texts, "text", " ".join(q_toks),
                          id_col="doc_id", limit=20).count()
wall_bm25 = time.time() - t0

out = {
    "metric": "minhash_docs_per_sec",
    "value": round(n / wall, 1),
    "unit": "docs/sec",
    "n_docs": n,
    "wall_sec": round(wall, 2),
    "candidate_pairs": n_pairs,
    "planted_pairs": n_planted,
    "planted_found": hit,
    "recall_vs_expected_0.88": round(hit / max(n_planted, 1), 4),
    "bm25_search_sec": round(wall_bm25, 2),
    "bm25_top20_hits": n_hits,
    "cpus": CPUS,
    "max_bucket": 100,
}
print(json.dumps(out))
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DOCS.json"), "w") as f:
    json.dump(out, f, indent=1)
