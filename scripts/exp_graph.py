"""Graph-traversal scale probe: BFS + label propagation at 10⁶⁺ nodes.

The driver testdata builds graphs of ~10³ edges, so the traversal
operators (J9 BFS, A4 label propagation) never see scale there. This
probe synthesizes a deterministic graph IN SPARK (no files, no Python
UDFs): N nodes in disjoint clusters of 20, each cluster a ring + chord
(node i — i+1 and i — i+2 within its cluster, degree ≤ 4), and runs the
exact production operators (`operators/search.bfs_search`,
`operators/communities.label_propagation`).

Correctness at scale is closed-form on this topology:

  * BFS scale-invariance — the origin's cluster is identical whether the
    graph holds 1 cluster or 100 000, so `bfs_search(origin, depth=3)`
    must return the IDENTICAL (edge_uuid, hops) set at N=20 and at full
    N. Any frontier/seen-set leakage across the bigger graph would show.
  * LPA fixpoint — clusters are disconnected, so every node's final
    community must be exactly the max uuid of its own cluster
    (labels are zero-padded strings; monotone adoption converges to the
    cluster max). Checked for every node, not sampled.

Results → BENCH_GRAPH.json.

Usage: python scripts/exp_graph.py [n_nodes] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators.communities import label_propagation  # noqa: E402
from graphiti_spark.operators.search import bfs_search              # noqa: E402
from graphiti_spark.session import get_spark, ship_package          # noqa: E402

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
CSIZE = 20

spark = get_spark(app="exp_graph", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")

_uuid = lambda c: F.format_string("n%09d", c)
_grp = lambda c: F.format_string("g%08d", (c / CSIZE).cast("long"))


def graph(n):
    """nodes (uuid, group_id) + edges (uuid, group_id, source_node_uuid,
    target_node_uuid): ring + chord inside each 20-node cluster."""
    nodes = (spark.range(n).repartition(max(CPUS, 8))
             .select(_uuid(F.col("id")).alias("uuid"),
                     _grp(F.col("id")).alias("group_id")))
    parts = []
    for off in (1, 2):
        parts.append(
            spark.range(n).repartition(max(CPUS, 8))
            .where((F.col("id") % CSIZE) < CSIZE - off)
            .select(F.format_string(f"e%09d+{off}", F.col("id")).alias("uuid"),
                    _grp(F.col("id")).alias("group_id"),
                    _uuid(F.col("id")).alias("source_node_uuid"),
                    _uuid(F.col("id") + off).alias("target_node_uuid")))
    return nodes, parts[0].unionByName(parts[1])


# --- BFS: tiny reference answer (one cluster), then the full graph ----
_, edges_tiny = graph(CSIZE)
ref = sorted((r["uuid"], r["hops"])
             for r in bfs_search(edges_tiny, ["n000000000"]).collect())

nodes, edges = graph(N_NODES)
edges = edges.persist()
n_edges = edges.count()          # materialize outside the timed window

t0 = time.time()
big = sorted((r["uuid"], r["hops"])
             for r in bfs_search(edges, ["n000000000"]).collect())
wall_bfs = time.time() - t0
bfs_invariant = big == ref

# --- LPA: full closed-form community check, BOTH executors -------------
# "grouped" is what strategy="auto" resolves to here (every cluster is a
# 20-node group — the per-conversation shape): one cogrouped
# applyInPandas shuffle. "rounds" is the iterative-join fallback for a
# group too big for one task (forced here on the same input to keep the
# giant-single-group cost on record).
nodes = nodes.persist()
nodes.count()
expected = _uuid(
    (F.substring("uuid", 2, 9).cast("long") / CSIZE).cast("long") * CSIZE
    + (CSIZE - 1))
lpa = {}
for strat in ("grouped", "rounds"):
    t0 = time.time()
    labels = label_propagation(nodes, edges, strategy=strat).persist()
    labels.count()
    wall = time.time() - t0
    lpa[strat] = {
        "sec": round(wall, 2),
        "nodes_per_sec": round(N_NODES / wall, 1),
        "communities": labels.select("community").distinct().count(),
        "wrong_labels": labels.where(
            F.col("community") != expected).count(),
    }
    labels.unpersist()
wall_lpa = lpa["grouped"]["sec"]

# --- Triangles: closed-form count on the chord topology ----------------
# Each cluster is a 0..19 path with +1 and +2 chords (no wrap), so its
# triangles are exactly the (i, i+1, i+2) triples for i in 0..17:
# 18 per cluster, every cluster. Checked per GROUP, not just the total.
from graphiti_spark.operators.graph import triangle_count  # noqa: E402

t0 = time.time()
tri = triangle_count(edges).persist()
tri_groups = tri.count()
wall_tri = time.time() - t0
tri_wrong = tri.where(F.col("n_triangles") != 18).count()
tri.unpersist()

out = {
    "metric": "lpa_nodes_per_sec",
    "value": lpa["grouped"]["nodes_per_sec"],
    "unit": "nodes/sec",
    "n_nodes": N_NODES,
    "n_edges": n_edges,
    "bfs_sec": round(wall_bfs, 2),
    "bfs_edges_returned": len(big),
    "bfs_scale_invariant": bfs_invariant,
    "lpa_sec": wall_lpa,
    "lpa_by_strategy": lpa,
    "lpa_expected_communities": N_NODES // CSIZE,
    "triangles_sec": round(wall_tri, 2),
    "triangles_groups": tri_groups,
    "triangles_expected_groups": N_NODES // CSIZE,
    "triangles_wrong_groups": tri_wrong,
    "triangles_edges_per_sec": round(n_edges / wall_tri, 1),
    "cpus": CPUS,
}
print(json.dumps(out))
# merge-update: exp_lpa_skew.py records its result under other keys of
# the same file — a wholesale rewrite here would silently destroy them
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_GRAPH.json")
blob = {}
if os.path.exists(path):
    with open(path) as f:
        blob = json.load(f)
blob.update(out)
with open(path, "w") as f:
    json.dump(blob, f, indent=1)
