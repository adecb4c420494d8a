"""Warm search latency over a served graph — the reference's headline
claim is "typically sub-second" hybrid search against an indexed Neo4j
graph (``/root/reference/README.md:97``). The Spark analog of "indexed
and served" is the pipeline's output tables persisted in memory; this
probe builds the KG once, persists the four layer tables, then times
repeated composite ``search()`` calls (all four layers collected per
call — the COMBINED_HYBRID_SEARCH_RRF preset, bm25 + cosine per layer,
RRF fuse) end to end. Results → BENCH_SEARCH.json.

Usage: python scripts/exp_search_latency.py [sf] [cpus] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphiti_spark.session import get_spark, ship_package          # noqa: E402
from graphiti_spark.datagen import ensure_corpus                    # noqa: E402

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_QUERIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

spark = get_spark(app="exp_search_latency", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators import composite_search as CS         # noqa: E402
from graphiti_spark.operators.communities import build_communities  # noqa: E402
from graphiti_spark.plans.pipeline import RUN_TS, build_graph       # noqa: E402

tr = spark.read.parquet(f"{ensure_corpus(SF)}/transcripts.parquet")
t0 = time.time()
g = build_graph(spark, tr, run_ts=RUN_TS, with_embeddings=True)
comms, members = build_communities(g.entities, g.edges, RUN_TS)
layers = {}
for name, df in [("edges", g.edges), ("nodes", g.entities),
                 ("episodes", g.episodes), ("communities", comms)]:
    layers[name] = df.persist()
    layers[name].count()
build_sec = time.time() - t0
n_edges = layers["edges"].count()

# Query terms drawn from real facts so bm25 has hits; a real entity
# embedding as the query vector so cosine has structure.
facts = [r["fact"] for r in
         layers["edges"].select("fact").limit(N_QUERIES * 3).collect()]
qvec = [float(x) for x in
        layers["nodes"].select("name_embedding").limit(1)
        .head()["name_embedding"]]

from concurrent.futures import ThreadPoolExecutor                   # noqa: E402


def run_query(i, concurrent):
    """One composite call; the 4 layer plans are independent, so the
    serving shape collects them as CONCURRENT Spark jobs (the DataFrame
    twin of the reference's semaphore_gather over 4 layer coroutines) —
    latency ≈ slowest layer, not the sum."""
    q = " ".join(facts[(3 * i) % len(facts)].split()[:4])
    t0 = time.time()
    res = CS.search(q, qvec, CS.COMBINED_HYBRID_SEARCH_RRF,
                    edges=layers["edges"], nodes=layers["nodes"],
                    episodes=layers["episodes"],
                    communities=layers["communities"])
    dfs = [df for df in [res.edges, res.nodes, res.episodes,
                         res.communities] if df is not None]
    if concurrent:
        with ThreadPoolExecutor(4) as ex:
            n = sum(len(r) for r in ex.map(lambda d: d.collect(), dfs))
    else:
        n = sum(len(df.collect()) for df in dfs)
    return time.time() - t0, n


seq = sorted(run_query(i, False)[0] for i in range(N_QUERIES))
conc = []
n = 0
for i in range(N_QUERIES):
    w, n = run_query(i, True)
    conc.append(w)
conc = sorted(conc)

# Batched counterpoint: M queries in ONE job through the multi-query
# brute-force KNN (broadcast query side, one corpus scan) — the
# Spark-native serving shape that amortizes per-job scheduling.
from graphiti_spark.operators.ann import brute_force_knn            # noqa: E402

M = 16
qdf = (layers["nodes"]
       .select(F.col("uuid").alias("query_id"),
               F.col("name_embedding").alias("embedding"))
       .limit(M).localCheckpoint(eager=True))
t0 = time.time()
n_knn = brute_force_knn(layers["nodes"].select(
    F.col("uuid").alias("vec_id"),
    F.col("name_embedding").alias("embedding")), qdf, k=10).count()
batch_sec = time.time() - t0

# The serving answer (graphiti_spark/serving.py): export the layer
# tables once (the Spark job), load the snapshot into a ServedGraph
# (inverted index + embedding matrix), and answer the SAME composite
# preset from memory — equivalence-tested per preset in
# tests/test_serving.py and oracle-checked by the served_search driver
# query. This is the reference's own architecture (build into an indexed
# store, serve point lookups) with Spark as the builder.
from graphiti_spark.serving import ServedGraph                      # noqa: E402

t0 = time.time()
sg = ServedGraph.from_spark(
    edges=layers["edges"], nodes=layers["nodes"],
    episodes=layers["episodes"], communities=layers["communities"])
sg.search("warm up the lazy indexes", qvec, CS.COMBINED_HYBRID_SEARCH_RRF)
served_load_sec = time.time() - t0
served = []
for i in range(max(N_QUERIES * 5, 50)):
    q = " ".join(facts[(3 * i) % len(facts)].split()[:4])
    t0 = time.time()
    res = sg.search(q, qvec, CS.COMBINED_HYBRID_SEARCH_RRF)
    served.append(time.time() - t0)
    n_served = sum(len(x) for x in (res.edges, res.nodes, res.episodes,
                                    res.communities) if x is not None)
served = sorted(served)

out = {
    "metric": "composite_search_latency_p50",
    "value": round(conc[len(conc) // 2], 3),
    "unit": "sec/query (4 layers, concurrent collects)",
    "sf": SF,
    "n_edges": n_edges,
    "n_queries": N_QUERIES,
    "build_and_persist_sec": round(build_sec, 2),
    "concurrent_layers_sec": {"min": round(conc[0], 3),
                              "p50": round(conc[len(conc) // 2], 3),
                              "max": round(conc[-1], 3)},
    "sequential_layers_sec": {"min": round(seq[0], 3),
                              "p50": round(seq[len(seq) // 2], 3),
                              "max": round(seq[-1], 3)},
    "last_result_rows": n,
    "batched_knn": {"n_queries": M, "total_sec": round(batch_sec, 3),
                    "per_query_sec": round(batch_sec / M, 3),
                    "rows": n_knn},
    "served": {
        "snapshot_load_sec": round(served_load_sec, 3),
        "n_queries": len(served),
        "sec_per_query": {"min": round(served[0], 6),
                          "p50": round(served[len(served) // 2], 6),
                          "max": round(served[-1], 6)},
        "last_result_rows": n_served,
        "note": "same COMBINED_HYBRID_SEARCH_RRF call answered by "
                "ServedGraph from the exported snapshot; equivalence "
                "per preset in tests/test_serving.py, oracle-checked "
                "by the served_search driver query",
    },
    "cpus": CPUS,
}
print(json.dumps(out))
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SEARCH.json"), "w") as f:
    json.dump(out, f, indent=1)
