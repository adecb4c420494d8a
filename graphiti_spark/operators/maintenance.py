"""Graph-maintenance API surface (SURVEY.md §2.1 S6-S9, §2.3 J7, §2.9 Q11,
§2.10 incremental semantics).

Point lookups, pagination, orphan GC, and the incremental micro-batch path
that recovers the reference's ``add_episode`` semantics (each batch joins
against the already-materialized graph before union-merge —
``graphiti.py:352-551`` re-expressed over tables, SURVEY §2.10).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# -- S7: point lookups + cursor pagination ----------------------------------

def get_by_uuids(df: DataFrame, uuids: list[str]) -> DataFrame:
    """``get_by_uuid(s)`` (nodes.py:177-262): partition-prunable IN filter."""
    return df.where(F.col("uuid").isin(uuids))


def get_by_group_ids(df: DataFrame, group_ids: list[str],
                     limit: int | None = None,
                     uuid_cursor: str | None = None) -> DataFrame:
    """``get_by_group_ids`` with uuid-cursor pagination
    (nodes.py:221-237): uuid < cursor, ORDER BY uuid DESC LIMIT n."""
    out = df.where(F.col("group_id").isin(group_ids))
    if uuid_cursor is not None:
        out = out.where(F.col("uuid") < uuid_cursor)
    out = out.orderBy(F.col("uuid").desc())
    return out.limit(limit) if limit else out


def get_edges_by_node(edges: DataFrame, node_uuid: str) -> DataFrame:
    """S8 ``get_by_node_uuid`` (edges.py:327-341): undirected endpoint
    match."""
    return edges.where((F.col("source_node_uuid") == node_uuid)
                       | (F.col("target_node_uuid") == node_uuid))


# -- J7: traversal semi-joins -----------------------------------------------

def get_mentioned_nodes(episodic_edges: DataFrame, entities: DataFrame,
                        episode_uuids: list[str]) -> DataFrame:
    """Entities mentioned by the given episodes
    (``search_utils.py:85-103``)."""
    mentions = (episodic_edges
                .where(F.col("source_node_uuid").isin(episode_uuids))
                .select(F.col("target_node_uuid").alias("uuid")))
    return entities.join(mentions, "uuid", "left_semi")


def get_episodes_by_mentions(episodic_edges: DataFrame, episodes: DataFrame,
                             entity_uuids: list[str]) -> DataFrame:
    """Episodes mentioning the given entities (``search_utils.py:106-121``)."""
    eps = (episodic_edges
           .where(F.col("target_node_uuid").isin(entity_uuids))
           .select(F.col("source_node_uuid").alias("uuid")))
    return episodes.join(eps, "uuid", "left_semi")


def get_nodes_and_edges_by_episode(episodic_edges: DataFrame,
                                   entities: DataFrame, edges: DataFrame,
                                   episode_uuids: list[str]
                                   ) -> tuple[DataFrame, DataFrame]:
    """``graphiti.py:965-977``: the (nodes, edges) bundle for a list of
    episodes — entities mentioned by them plus the entity edges whose
    provenance (``episodes`` array) references any of them. The uuid list
    is a literal (API argument), so both filters are scan predicates —
    one flat arrays_overlap against an array literal for the provenance
    (not an O(n)-deep OR chain: wide boolean trees cost Catalyst analysis
    time per action), no explode/shuffle."""
    nodes = get_mentioned_nodes(episodic_edges, entities, episode_uuids)
    if episode_uuids:
        prov = F.arrays_overlap(F.col("episodes"),
                                F.lit([str(u) for u in episode_uuids]))
    else:
        prov = F.lit(False)
    return nodes, edges.where(prov)


# -- S6 / S9: deletion + orphan GC ------------------------------------------

def clear_groups(df: DataFrame, group_ids: list[str]) -> DataFrame:
    """S6 ``clear_data`` by group (graph_data_operations.py:66-81) — at the
    table layer this is a partition drop; at the DataFrame layer an
    anti-filter."""
    return df.where(~F.col("group_id").isin(group_ids))


def remove_episodes(episodes: DataFrame, episodic_edges: DataFrame,
                    entities: DataFrame, edges: DataFrame,
                    episode_uuids: list[str]) -> dict[str, DataFrame]:
    """S9 episode removal + orphan GC (graphiti.py:1019-1052):
    drop the episodes, edges created by them (edge.episodes ⊆ removed),
    and entities mentioned ONLY by them (mention-count anti-join)."""
    removed = F.array(*[F.lit(u) for u in episode_uuids])

    episodes_out = episodes.where(~F.col("uuid").isin(episode_uuids))

    # Drop only edges whose episode provenance is entirely within the
    # removed set. Null/empty provenance (manually inserted or externally
    # loaded edges) means "not created by any episode" → always keep.
    prov = F.coalesce("episodes", F.array().cast("array<string>"))
    edges_out = edges.where(
        (F.size(prov) == 0) | (F.size(F.array_except(prov, removed)) > 0))

    kept_mentions = episodic_edges.where(
        ~F.col("source_node_uuid").isin(episode_uuids))
    # entities still mentioned by a surviving episode stay (graphiti.py:
    # 1036-1042 counts mentions and deletes when == 1, i.e. only-removed)
    entities_out = entities.join(
        kept_mentions.select(F.col("target_node_uuid").alias("uuid"))
                     .distinct(),
        "uuid", "left_semi")
    return {"episodes": episodes_out, "episodic_edges": kept_mentions,
            "entities": entities_out, "edges": edges_out}


# -- Q11: add_triplet --------------------------------------------------------

def add_triplet(spark, group_id: str, subj: str, pred: str, obj: str,
                fact: str, run_ts: datetime, valid_at=None) -> DataFrame:
    """Manual triple insert (graphiti.py:979-1017): the edge row is built
    DIRECTLY from (subj, pred, obj, fact) — the reference's add_triplet
    accepts arbitrary triples, so this must not depend on the extraction
    templates matching the fact text — then merged through the same
    dedupe + temporal-versioning stages as extracted edges."""
    from graphiti_spark import rules
    from graphiti_spark.operators import versioning

    subj_c, obj_c = rules.clean_text(subj), rules.clean_text(obj)
    if not subj_c or not obj_c or \
            rules.normalize_name(subj_c) == rules.normalize_name(obj_c):
        raise ValueError("add_triplet needs two distinct non-empty entities")
    src = rules.entity_uuid(group_id, subj_c)
    dst = rules.entity_uuid(group_id, obj_c)
    va = valid_at or run_ts
    raw = spark.createDataFrame(
        [(group_id, rules.episode_uuid(group_id, 0), 0,
          subj_c, pred, obj_c, rules.clean_text(fact) or fact,
          va.replace(tzinfo=None), None, src, dst,
          rules.edge_uuid(group_id, src, pred, dst, fact, 0),
          run_ts.replace(tzinfo=None))],
        "group_id string, episode_uuid string, turn_idx int, subj string,"
        " pred string, obj string, fact string, valid_at timestamp,"
        " invalid_at timestamp, source_node_uuid string,"
        " target_node_uuid string, uuid string, created_at timestamp")
    return versioning.apply_versioning(versioning.dedupe_edges(raw), run_ts)


# -- §2.10: incremental micro-batch merge -----------------------------------

def incremental_update(spark, new_transcripts: DataFrame,
                       existing_transcripts: DataFrame | None,
                       existing_entities: DataFrame | None,
                       existing_edges: DataFrame | None,
                       run_ts: datetime) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The add_episode semantics over tables via **touched-group
    recomputation**: every dedup/versioning rule is scoped by ``group_id``
    (the reference scopes all reads by group, ``nodes.py:84``), so a
    micro-batch only needs to rebuild the conversations it touches —
    old+new turns of those groups re-run the batch stages, and all other
    groups' rows are carried over untouched. This is exact (provably equal
    to a full batch rebuild) and incremental-cost ∝ touched-conversation
    size, not graph size — the Spark-native form of the reference's
    per-episode candidate-join-vs-graph pattern (J3-J5).

    Returns (merged_transcripts, merged_entities, merged_edges); under
    Iceberg the merge is ``overwritePartitions`` on the touched group_ids.
    """
    from graphiti_spark.plans.pipeline import build_graph

    if existing_transcripts is not None:
        all_tr = existing_transcripts.unionByName(new_transcripts) \
            .dropDuplicates(["conv_id", "turn_idx"])
    else:
        all_tr = new_transcripts
    affected = new_transcripts.select("conv_id").distinct()
    touched = all_tr.join(F.broadcast(affected), "conv_id", "left_semi")

    g = build_graph(spark, touched, run_ts=run_ts)
    new_entities, new_edges = g.entities, g.edges

    def merge(existing, new):
        if existing is None:
            return new
        kept = existing.join(
            F.broadcast(affected.select(F.col("conv_id").alias("group_id"))),
            "group_id", "left_anti")
        return kept.unionByName(new.select(existing.columns))

    return (all_tr, merge(existing_entities, new_entities),
            merge(existing_edges, new_edges))
