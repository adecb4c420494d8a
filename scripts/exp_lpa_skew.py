"""Skewed-group LPA probe: the auto size-gate hybrid at scale.

The grouped LPA executor (operators/communities._grouped_lpa) assumes a
group fits in one task's memory — the reference's own operating
assumption (community_operations.py:44-62). At 10^12-turn scale most
group_ids are conversation-sized, but nothing guarantees ALL are: one
tenant logging every conversation under a single group_id produces a
group with millions of nodes. ``strategy="auto"`` size-gates exactly
that shape: groups ≤ GROUPED_LPA_MAX_NODES take the one-shuffle grouped
path, oversized groups fall back to the iterative-join rounds, and the
two outputs union.

This probe builds that shape deterministically IN SPARK (no files):

  * N_SMALL nodes in 20-node ring+chord clusters, one group per cluster
    (the conversation-sized population → grouped path), PLUS
  * N_BIG nodes with the SAME internal 20-node cluster topology but all
    under ONE group_id 'gbig' (> the 200k gate → join-rounds path).

Because components are 20-node clusters in BOTH populations, the
closed-form fixpoint is identical everywhere: every node's community is
the max uuid of its own cluster. So one exhaustive check covers both
routes and the union seam. Results merge into BENCH_GRAPH.json under
"skew_hybrid".

Usage: python scripts/exp_lpa_skew.py [n_small] [n_big] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators.communities import (                  # noqa: E402
    GROUPED_LPA_MAX_NODES, label_propagation)
from graphiti_spark.session import get_spark, ship_package          # noqa: E402

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
N_BIG = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
CSIZE = 20
assert N_BIG > GROUPED_LPA_MAX_NODES, "big group must exceed the gate"
# the closed-form check (community = own cluster's max uuid) and the
# group layout both assume no 20-node cluster straddles the
# small/big-population boundary
assert N_SMALL % CSIZE == 0, "N_SMALL must be a multiple of CSIZE"
assert N_BIG % CSIZE == 0, "N_BIG must be a multiple of CSIZE"

spark = get_spark(app="exp_lpa_skew", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")

N = N_SMALL + N_BIG
_uuid = lambda c: F.format_string("n%09d", c)                       # noqa: E731
# first N_SMALL ids: one group per 20-cluster; the rest: ONE group
_grp = lambda c: F.when(c < N_SMALL,                                # noqa: E731
                        F.format_string("g%08d",
                                        (c / CSIZE).cast("long"))
                        ).otherwise(F.lit("gbig"))

nodes = (spark.range(N).repartition(max(CPUS, 8))
         .select(_uuid(F.col("id")).alias("uuid"),
                 _grp(F.col("id")).alias("group_id")))
parts = []
for off in (1, 2):
    parts.append(
        spark.range(N).repartition(max(CPUS, 8))
        .where((F.col("id") % CSIZE) < CSIZE - off)
        .select(F.format_string(f"e%09d+{off}", F.col("id")).alias("uuid"),
                _grp(F.col("id")).alias("group_id"),
                _uuid(F.col("id")).alias("source_node_uuid"),
                _uuid(F.col("id") + off).alias("target_node_uuid")))
edges = parts[0].unionByName(parts[1]).persist()
n_edges = edges.count()
nodes = nodes.persist()
nodes.count()

t0 = time.time()
labels = label_propagation(nodes, edges, strategy="auto").persist()
labels.count()
wall = time.time() - t0

expected = _uuid(
    (F.substring("uuid", 2, 9).cast("long") / CSIZE).cast("long") * CSIZE
    + (CSIZE - 1))
n_wrong = labels.where(F.col("community") != expected).count()
by_route = {
    "grouped": labels.where(F.col("group_id") != "gbig").count(),
    "rounds(gbig)": labels.where(F.col("group_id") == "gbig").count(),
}

out = {
    "n_small": N_SMALL, "n_big": N_BIG, "n_edges": n_edges,
    "gate_nodes": GROUPED_LPA_MAX_NODES,
    "sec": round(wall, 2),
    "nodes_per_sec": round(N / wall, 1),
    "labeled_by_route": by_route,
    "wrong_labels": n_wrong,
    "cpus": CPUS,
}
print(json.dumps(out))

path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_GRAPH.json")
blob = json.load(open(path)) if os.path.exists(path) else {}
blob["skew_hybrid"] = out
with open(path, "w") as f:
    json.dump(blob, f, indent=1)
