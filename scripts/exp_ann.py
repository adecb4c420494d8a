"""ANN scale probe: IVF vs brute-force cosine top-k at 10⁶ vectors.

The driver testdata caps `embeddings` at 5 000 rows, so the ANN operators
never see scale there. This probe synthesizes a deterministic clustered
1M×64 corpus IN SPARK (cluster centers and per-vector noise both
md5-derived, zero Python UDFs), runs the exact production operators
(`operators/ann.brute_force_knn` / `build_ivf` / `ivf_knn` — the same
functions behind the oracle-checked `embedding_knn` / `embedding_knn_ivf`
driver queries) and reports walls, the scan-pruning speedup, and IVF
recall@k against the exact result. Results → BENCH_ANN.json.

Corpus: vector i belongs to cluster c = i mod N_CLUSTERS; dim j =
center(c, j) ± noise(i, j) with center ∈ [-1, 1] and noise ∈ [-0.1, 0.1].

Usage: python scripts/exp_ann.py [n_vecs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators.ann import (                          # noqa: E402
    brute_force_knn, build_ivf, ivf_index, ivf_knn)
from graphiti_spark.session import get_spark, ship_package          # noqa: E402

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM, N_CLUSTERS, N_CELLS, NPROBE, K, N_QUERIES = 64, 64, 32, 8, 5, 10

spark = get_spark(app="exp_ann", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")


def _u(key, lo, hi):
    """md5-derived uniform float in [lo, hi) — deterministic, JVM-side."""
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
            % 100_000) / 100_000 * (hi - lo) + lo


def corpus(n):
    c = (F.col("id") % N_CLUSTERS).cast("string")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (_u(F.concat_ws(":", F.lit("c"), c, j.cast("string")),
                      -1.0, 1.0)
                   + _u(F.concat_ws(":", F.lit("n"),
                                    F.col("id").cast("string"),
                                    j.cast("string")), -0.1, 0.1))
                  .cast("float"))
    return (spark.range(n).repartition(max(CPUS, 8))
            .select(F.col("id").alias("vec_id"), vec.alias("embedding")))


e = corpus(N_VECS).persist()
n = e.count()   # materialize generation outside the timed windows
queries = (e.where(F.col("vec_id") < N_QUERIES)
           .select(F.col("vec_id").alias("query_id"), "embedding")
           .persist())
queries.count()

t0 = time.time()
exact = brute_force_knn(e, queries, k=K).persist()
n_exact = exact.count()
wall_bf = time.time() - t0

t0 = time.time()
cents, assign = build_ivf(e, n_cells=N_CELLS)
cents = cents.persist()
cents.count()
idx = ivf_index(e, assign).persist()   # the stored cell-partitioned layout
idx.count()
wall_build = time.time() - t0

t0 = time.time()
approx = ivf_knn(e, queries, cents, None, k=K, nprobe=NPROBE,
                 indexed=idx).persist()
n_approx = approx.count()
wall_ivf = time.time() - t0

hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()

out = {
    "metric": "ann_ivf_recall_at_k",
    "value": round(hit / max(n_exact, 1), 4),
    "unit": f"recall@{K} vs brute force",
    "n_vecs": n, "dim": DIM, "n_queries": N_QUERIES,
    "n_cells": N_CELLS, "nprobe": NPROBE,
    "brute_force_sec": round(wall_bf, 2),
    "ivf_build_sec": round(wall_build, 2),
    "ivf_query_sec": round(wall_ivf, 2),
    "query_speedup_vs_brute": round(wall_bf / max(wall_ivf, 1e-9), 2),
    "scan_fraction": round(NPROBE / N_CELLS, 3),
    "cpus": CPUS,
}
print(json.dumps(out))
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_ANN.json"), "w") as f:
    json.dump(out, f, indent=1)
