"""Composite 4-layer search() at 10⁶ docs (round-4 task 5).

The oracle-checked `composite_search` query runs at sf≤0.1 (≤5 000 docs);
this probe runs the SAME production operator
(operators/composite_search.search, COMBINED_HYBRID_SEARCH_RRF: bm25 +
cosine per layer, RRF fuse, broadcast hydration) over a synthetic corpus
two orders of magnitude larger, at TWO sizes, to verify the fan-out stays
scan-bound — wall should grow ~linearly with corpus size because every
layer is one corpus scan (bm25 stats + prefilter) plus one cosine scan,
and the persisted shared documents×embeddings join is built once.

Corpus: JVM-only generation (md5-derived tokens as in exp_docs.py; dim-16
embedding lanes likewise md5-derived — the plan cost scales with rows and
the operator is dim-agnostic, so small dims keep generation out of the
measured story). Results → BENCH_COMPOSITE.json.

Usage: python scripts/exp_composite.py [n_docs_hi] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators.composite_search import (             # noqa: E402
    COMBINED_HYBRID_SEARCH_RRF, search)
from graphiti_spark.session import get_spark, ship_package          # noqa: E402

N_HI = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_TOK, VOCAB, DIM = 30, 50_000, 16

spark = get_spark(app="exp_composite", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")


def corpus(n):
    """(uuid, text, embedding) — deterministic, all-JVM generation."""
    tok = lambda j: F.concat(F.lit("w"), F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("id").cast("string"),
                                      j.cast("string"))), 1, 8),
        16, 10).cast("long") % VOCAB)
    toks = F.transform(F.sequence(F.lit(0), F.lit(N_TOK - 1)), tok)
    lane = lambda j: (F.conv(
        F.substring(F.md5(F.concat_ws("e", F.col("id").cast("string"),
                                      j.cast("string"))), 1, 8),
        16, 10).cast("double") / 4294967295.0 - 0.5)
    emb = F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), lane)
    return (spark.range(n)
            .repartition(max(CPUS, 8))
            .select(F.col("id").alias("uuid"),
                    F.array_join(toks, " ").alias("text"),
                    emb.cast("array<float>").alias("embedding")))


def run_once(n_docs: int) -> dict:
    de = corpus(n_docs).persist()
    de.count()                      # generation outside the timed window
    q_text = de.where(F.col("uuid") == 0).head()["text"].split()[:3]
    qvec = [0.25 - 0.03 * j for j in range(DIM)]   # fixed non-corpus vector

    def slice_(k, text_alias, emb_alias=None):
        cols = [F.col("uuid"), F.col("text").alias(text_alias)]
        if emb_alias:
            cols.append(F.col("embedding").alias(emb_alias))
        return de.where(F.col("uuid") % 4 == k).select(*cols)

    t0 = time.time()
    res = search(" ".join(q_text), qvec, COMBINED_HYBRID_SEARCH_RRF,
                 edges=slice_(0, "fact", "fact_embedding"),
                 nodes=slice_(1, "name", "name_embedding"),
                 episodes=slice_(2, "content"),
                 communities=slice_(3, "summary", "name_embedding"))
    rows = {k: len(getattr(res, k).collect())
            for k in ("edges", "nodes", "episodes", "communities")}
    wall = time.time() - t0
    de.unpersist()
    return {"n_docs": n_docs, "wall_sec": round(wall, 2),
            "docs_per_sec": round(n_docs / wall, 1), "layer_rows": rows}


# Unmeasured warmup: first search pays Python-worker spawn + codegen JIT
# + datasource init (~14s on this box); without it the smallest point
# carries those one-time costs and the linearity fit is meaningless.
run_once(N_HI // 20)
points = [run_once(n) for n in (N_HI // 16, N_HI // 4, N_HI)]
# Least-squares fit wall = fixed + marginal*n over the 3 points: separates
# the per-search constant (Catalyst planning + stage scheduling of the
# ~7-plan fan-out) from the true per-doc scan cost. A superlinear term
# would show as the largest point sitting far above the fit.
ns = [p["n_docs"] for p in points]
ws = [p["wall_sec"] for p in points]
k = len(ns)
mean_n, mean_w = sum(ns) / k, sum(ws) / k
marg = (sum((n - mean_n) * (w - mean_w) for n, w in zip(ns, ws))
        / sum((n - mean_n) ** 2 for n in ns))
fixed = mean_w - marg * mean_n
hi = points[-1]
out = {
    "metric": "composite_search_docs_per_sec",
    "value": hi["docs_per_sec"],
    "unit": "docs/sec (one 4-layer hybrid search over the corpus)",
    "points": points,
    "fit_fixed_sec": round(fixed, 2),
    "fit_marginal_usec_per_doc": round(marg * 1e6, 3),
    "fit_residual_hi_sec": round(ws[-1] - (fixed + marg * ns[-1]), 2),
    "cpus": CPUS,
    "preset": "COMBINED_HYBRID_SEARCH_RRF (bm25+cosine x4 layers, rrf)",
}
print(json.dumps(out))
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_COMPOSITE.json"), "w") as f:
    json.dump(out, f, indent=1)
