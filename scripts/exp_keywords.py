"""Keyword/quality-score scale probe: extract_keywords and
unigram_cross_entropy at 10⁶ documents, two parallelism widths.

The driver testdata caps `documents` at 5 000 rows, so the zero-shuffle
map-side tf fold and the vocabulary-sized LM shuffle never see scale
there. This probe synthesizes a deterministic 1M-doc text corpus IN
SPARK (50 md5-mixed tokens per doc over a skewed ~50k-term vocabulary,
no files, no RNG state), runs the exact production operators behind the
oracle-checked `keyword_tfidf` / `quality_logprob` driver queries, and
checks closed-form invariants at full scale:

  * token conservation: sum of tf over all (doc, term) rows of the LM
    aggregation == 50 · n_docs exactly (generated tokens are 'w<id>',
    so no stopword or min_len drops);
  * total coverage: unigram_cross_entropy emits EXACTLY one row per
    document, and sum(n_toks) == 50 · n_docs;
  * entropy bounds: 0 < xent ≤ ln(total_tokens) for every doc
    (-ln(cnt/total) is bounded by cnt ≥ 1);
  * top-k bound: keyword_tfidf emits ≤ 5 rows per doc with rank a
    permutation prefix (checked via max(rank) == count per doc).

Runs at two fresh-JVM parallelism widths (8 and 32 cores) on the same
input and reports throughput at both plus scaling efficiency — the
operator-level version of the repo's N→4N scaling evidence.
Results → BENCH_DOCS.json key "keywords".

Usage: python scripts/exp_keywords.py [n_docs] [widths...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators.keywords import (extract_keywords,    # noqa: E402
                                               unigram_cross_entropy)
from graphiti_spark.session import get_spark, ship_package          # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
WIDTHS = [int(w) for w in sys.argv[2:]] or [8, 32]
TOKS_PER_DOC = 50
VOCAB = 50_000


def corpus(spark, n):
    """Deterministic skewed text: token ids h1 % (1 + h2 % VOCAB) make
    small ids harmonically more frequent (Zipf-ish head terms)."""
    h = ("CAST(conv(substring(md5(concat('k:', CAST(id AS STRING), ':', "
         "CAST(i AS STRING))), 1, 8), 16, 10) AS LONG)")
    h2 = ("CAST(conv(substring(md5(concat('v:', CAST(id AS STRING), ':', "
          "CAST(i AS STRING))), 1, 8), 16, 10) AS LONG)")
    text = (f"array_join(transform(sequence(1, {TOKS_PER_DOC}), "
            f"i -> concat('w', CAST({h} % (1 + {h2} % {VOCAB}) AS STRING))), "
            "' ')")
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 F.expr(text).alias("text"))


results = {"n_docs": N_DOCS, "toks_per_doc": TOKS_PER_DOC, "widths": []}
for cpus in WIDTHS:
    spark = get_spark(app=f"exp_keywords{cpus}", cores=cpus,
                      shuffle_partitions=max(8, min(cpus, 16)))
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    docs = corpus(spark, N_DOCS)

    t0 = time.time()
    x = unigram_cross_entropy(docs)
    total = F.lit(float(TOKS_PER_DOC * N_DOCS))
    inv = (x.agg(F.count(F.lit(1)).alias("rows"),
                 F.sum("n_toks").alias("tok_sum"),
                 F.min("xent").alias("min_x"),
                 F.max("xent").alias("max_x"),
                 F.sum(F.when((F.col("xent") <= 0)
                              | (F.col("xent") > F.log(total)), 1)
                       .otherwise(0)).alias("bound_violations"))
           .collect()[0])
    xent_wall = time.time() - t0

    t0 = time.time()
    kw = extract_keywords(docs, top_k=5)
    kinv = (kw.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("k"), F.max("rank").alias("mr"))
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum(F.when((F.col("k") > 5)
                              | (F.col("mr") != F.col("k")), 1)
                       .otherwise(0)).alias("rank_violations"))
            .collect()[0])
    kw_wall = time.time() - t0
    spark.stop()

    row = {"cpus": cpus,
           "xent_wall_s": round(xent_wall, 2),
           "xent_docs_per_sec": round(N_DOCS / xent_wall),
           "xent_rows": inv.rows,
           "token_conservation": bool(inv.tok_sum == TOKS_PER_DOC * N_DOCS
                                      and inv.rows == N_DOCS),
           "xent_bound_violations": inv.bound_violations,
           "xent_range": [float(inv.min_x), float(inv.max_x)],
           "kw_wall_s": round(kw_wall, 2),
           "kw_docs_per_sec": round(N_DOCS / kw_wall),
           "kw_docs_covered": kinv.docs,
           "kw_rank_violations": kinv.rank_violations}
    results["widths"].append(row)
    print(row, flush=True)

if len(results["widths"]) >= 2:
    lo, hi = results["widths"][0], results["widths"][-1]
    ratio = hi["cpus"] / lo["cpus"]
    results["scaling_efficiency"] = {
        "xent": round(hi["xent_docs_per_sec"]
                      / lo["xent_docs_per_sec"] / ratio, 3),
        "keywords": round(hi["kw_docs_per_sec"]
                          / lo["kw_docs_per_sec"] / ratio, 3)}
results["all_invariants_hold"] = all(
    r["token_conservation"] and r["xent_bound_violations"] == 0
    and r["kw_rank_violations"] == 0 and r["xent_rows"] == N_DOCS
    for r in results["widths"])
print(json.dumps(results))

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_DOCS.json")
try:
    with open(path) as f:
        doc = json.load(f)
except FileNotFoundError:
    doc = {}
doc["keywords"] = results
with open(path, "w") as f:
    json.dump(doc, f, indent=1)
