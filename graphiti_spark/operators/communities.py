"""M7 — community detection + summarization (SURVEY.md §2.4 A4/A5).

Label propagation re-expressed as iterative DataFrame joins
(``/root/reference/graphiti_core/utils/maintenance/community_operations.py:
77-122``): each node adopts the plurality community among its neighbors
weighted by edge multiplicity, ties broken toward the larger label
(``:102-108``), iterated to fixpoint. The reference builds an in-memory
neighbor projection per group (``:44-62``); ours is a (src, dst,
edge_count) DataFrame aggregated once from the edges table.

Community summarization replaces the pairwise-LLM summarize-reduce
(``community_operations.py:125-190``) with a deterministic ordered
concat-truncate aggregation, and community names with the top-degree
member's name.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.operators.episodes import stable_id_cols

MAX_COMMUNITY_ROUNDS = 20
SUMMARY_MAX_WORDS = 250


def neighbor_projection(edges: DataFrame) -> DataFrame:
    """(group_id, src, dst, edge_count) undirected multiplicity projection
    (``community_operations.py:44-62``)."""
    sym = (edges.select("group_id",
                        F.col("source_node_uuid").alias("src"),
                        F.col("target_node_uuid").alias("dst"))
           .unionByName(edges.select(
               "group_id",
               F.col("target_node_uuid").alias("src"),
               F.col("source_node_uuid").alias("dst"))))
    return (sym.where(F.col("src") != F.col("dst"))
            .groupBy("group_id", "src", "dst")
            .agg(F.count("*").alias("edge_count")))


def label_propagation(entities: DataFrame, edges: DataFrame,
                      max_rounds: int = MAX_COMMUNITY_ROUNDS) -> DataFrame:
    """→ (uuid, group_id, community) with community = a stable label id.

    Initial label = own uuid; each round a node takes the neighbor label
    with max (Σ edge_count, label) — plurality with larger-label tie-break
    (``community_operations.py:102-108``); isolated nodes keep their own
    label. Driver loop with localCheckpoint per round (lineage cut)."""
    proj = neighbor_projection(edges).localCheckpoint(eager=True)
    labels = (entities.select("uuid", "group_id")
              .withColumn("community", F.col("uuid"))
              .localCheckpoint(eager=True))
    for _ in range(max_rounds):
        nbr_votes = (proj.join(
            labels.select(F.col("uuid").alias("dst"),
                          F.col("community").alias("nbr_label")), "dst")
            .select("group_id", "src", "nbr_label",
                    F.col("edge_count").alias("w")))
        # Self-vote (weight 1): stabilizes synchronous updates — without it
        # a symmetric pair oscillates a↔b forever (the reference updates
        # nodes sequentially in-memory, which converges implicitly).
        self_votes = labels.select(
            "group_id", F.col("uuid").alias("src"),
            F.col("community").alias("nbr_label"), F.lit(1).alias("w"))
        nbr = (nbr_votes.unionByName(self_votes)
               .groupBy("group_id", "src", "nbr_label")
               .agg(F.sum("w").alias("votes")))
        w = (Window.partitionBy("src")
             .orderBy(F.col("votes").desc(), F.col("nbr_label").desc()))
        best = (nbr.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(F.col("src").alias("uuid"),
                        F.col("nbr_label").alias("new_label")))
        # Monotone adoption: take the plurality label only when it is
        # LARGER than the current one (extending the reference's
        # tie-toward-larger rule, community_operations.py:102-108, into the
        # update itself). Labels are then non-decreasing per node, so the
        # synchronous parallel update cannot oscillate the way naive
        # Jacobi-style LPA does on symmetric pulls, and a fixpoint is
        # guaranteed; the reference avoids this only by updating nodes
        # sequentially in-memory.
        new_labels = (labels.join(best, "uuid", "left")
                      .select("uuid", "group_id",
                              F.when(F.col("new_label") > F.col("community"),
                                     F.col("new_label"))
                               .otherwise(F.col("community"))
                               .alias("community"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "uuid")
                   .where(F.col("n.community") != F.col("o.community"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def build_communities(entities: DataFrame, edges: DataFrame,
                      run_ts: datetime) -> tuple[DataFrame, DataFrame]:
    """→ (communities, community_edges) — CommunityNode rows (uuid, name,
    group_id, summary, created_at) + HAS_MEMBER thin edges
    (``edges.py:344``). Summary = member summaries joined chronologically,
    truncated to 250 words (``community_operations.py:125-190`` semantics,
    deterministic)."""
    labels = label_propagation(entities, edges)
    members = (entities.join(labels.select("uuid", "community"), "uuid"))

    degree = (neighbor_projection(edges)
              .groupBy("src").agg(F.sum("edge_count").alias("degree"))
              .withColumnRenamed("src", "uuid"))
    members = members.join(degree, "uuid", "left").na.fill({"degree": 0})

    comm_uuid = stable_id_cols(F.lit("community"), F.col("group_id"),
                               F.col("community"))
    members = members.withColumn("community_uuid", comm_uuid)

    # name = top-degree member's name, degree ties broken by min uuid;
    # summary = ordered concat of member summaries. min(struct(-degree,
    # uuid, ...)) = max degree then lexicographic-min uuid.
    pick = F.min(F.struct((-F.col("degree")).alias("_nd"),
                          F.col("uuid").alias("_u"),
                          F.col("name"))).alias("top")
    agg = (members.groupBy("group_id", "community_uuid")
           .agg(pick,
                F.count("*").alias("n_members"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("uuid").alias("u"),
                                     F.coalesce("summary", F.lit(""))
                                      .alias("s")))),
                        lambda s: s["s"]), " ").alias("_summary")))
    words = F.split(F.col("_summary"), " ")
    summary = F.when(F.size(words) > SUMMARY_MAX_WORDS,
                     F.array_join(F.slice(words, 1, SUMMARY_MAX_WORDS), " ")
                     ).otherwise(F.col("_summary"))
    communities = agg.select(
        F.col("community_uuid").alias("uuid"),
        F.col("top.name").alias("name"),
        "group_id",
        summary.alias("summary"),
        F.col("n_members"),
        F.lit(run_ts).cast("timestamp").alias("created_at"))

    community_edges = members.select(
        stable_id_cols(F.lit("member"), F.col("group_id"),
                       F.col("community_uuid"), F.col("uuid")).alias("uuid"),
        "group_id",
        F.col("community_uuid").alias("source_node_uuid"),
        F.col("uuid").alias("target_node_uuid"),
        F.lit(run_ts).cast("timestamp").alias("created_at"))
    return communities, community_edges
