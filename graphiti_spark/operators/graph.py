"""Generic graph analytics over the KG edge tables — PageRank.

The reference ranks graph nodes only indirectly (community membership,
mention counts, node-distance reranking); a training-data / analytics user
of the same tables also wants a global importance score. PageRank is the
canonical one, and on Spark it is a pure DataFrame fixpoint: each
iteration is ONE partitioned join (edges ⋈ ranks on the source key) plus
ONE aggregation (contributions summed per destination) — the same
iterative-join shape as the connected-components canonicalizer
(operators/dedup.py:connected_components), with the same lineage hygiene
(eager localCheckpoint per round so the plan never grows with the
iteration count).

Scale shape (the part that matters at 100 TB):

* Edges are symmetrized/deduped ONCE, repartitioned by the join key, and
  persisted — every iteration shuffles only the (small) rank table, never
  the edge table.
* Per-``key`` graphs (e.g. ``group_id`` = one conversation) rank
  independently: N, degrees, and the teleport base are all per-key, so
  one run ranks millions of small graphs in the same jobs, no driver loop
  over graphs.
* Dangling nodes (out-degree 0 — possible in directed mode only) keep the
  teleport base and their mass is dropped rather than redistributed; the
  undirected default has no dangling nodes, so there the result is the
  exact textbook iteration. Documented, test-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             key: str | None = "group_id",
             src: str = "source_node_uuid", dst: str = "target_node_uuid",
             undirected: bool = True) -> DataFrame:
    """(key, node, rank) after ``iters`` synchronous PageRank rounds.

    ``rank_0 = 1/N``; ``rank_{t+1}(v) = (1-d)/N + d * Σ_{u→v}
    rank_t(u)/outdeg(u)`` with N and the sum scoped to ``key`` (pass
    ``key=None`` for one global graph). Determinism caveat: the per-
    destination contribution sum is floating-point, and double addition
    is commutative but NOT associative, so low-order bits can vary with
    partial-aggregation order on nodes with 3+ in-neighbors; consumers
    that hash values must quantize first (the driver query rounds to
    9 dp — comfortably above the ulp jitter, far below rank gaps).
    """
    kc = [key] if key else []
    if not key:
        edges = edges.withColumn("_k", F.lit(0))
        kc, key = ["_k"], "_k"
    e = edges.select(*kc, F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.union(e.select(key, F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    e = e.distinct()
    # One shuffle up front; every per-iteration join reuses this layout.
    e = e.repartition(key, "src").persist()

    nodes = (e.select(key, F.col("src").alias("node"))
             .union(e.select(key, F.col("dst").alias("node")))
             .distinct())
    n_per_key = nodes.groupBy(key).agg(F.count("*").alias("_n"))
    base = (nodes.join(n_per_key, key)
            .select(key, "node",
                    ((F.lit(1.0) - F.lit(damping)) / F.col("_n"))
                    .alias("_base"),
                    (F.lit(1.0) / F.col("_n")).alias("rank")))
    base = base.localCheckpoint(eager=True)

    deg = e.groupBy(key, "src").agg(F.count("*").alias("_deg"))
    # (key, src, deg) is edge-table-sized at worst; persist beside e.
    e_deg = e.join(deg, [key, "src"]).persist()

    ranks = base.select(key, "node", "rank")
    for _ in range(max(0, iters)):
        contribs = (e_deg.join(ranks.withColumnRenamed("node", "src"),
                               [key, "src"])
                    .groupBy(key, F.col("dst").alias("node"))
                    .agg(F.sum(F.col("rank") / F.col("_deg"))
                          .alias("_in")))
        ranks = (base.select(key, "node", "_base")
                 .join(contribs, [key, "node"], "left")
                 .select(key, "node",
                         (F.col("_base")
                          + F.lit(damping) * F.coalesce("_in", F.lit(0.0)))
                         .alias("rank")))
        # Cut lineage every round: the loop otherwise compounds a join+agg
        # per iteration into one unplannable DAG (same fix as CC).
        ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    e_deg.unpersist()
    if key == "_k":
        return ranks.select("node", "rank")
    return ranks
