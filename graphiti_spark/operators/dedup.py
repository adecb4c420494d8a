"""M3 — entity canonicalization: blocking join + connected components.

Replaces the reference's O(n²) Python candidate loops + LLM dedup + in-memory
union-find (``/root/reference/graphiti_core/utils/bulk_utils.py:201-285,
377-414``) with:

  1. **Blocking** (candidate generation, J1): a token equi-join — the
     reference's word-overlap branch (``bulk_utils.py:227-234``) IS an
     equi-join on a shared token — unioned with a SimHash-band LSH join
     standing in for the cosine≥0.8 branch (``bulk_utils.py:236-241``).
     Self-joins are per ``group_id`` (the reference scopes all dedup reads
     by group, ``nodes.py:84``), so blocks never cross conversations and the
     join co-partitions on (group_id, key).
  2. **Verify**: exact pair check with the shared deterministic rule
     (:func:`graphiti_spark.rules.node_is_duplicate`) in one Arrow-batched
     pandas UDF (cheap checks + cosine in numpy).
  3. **Connected components**: iterative hash-min label propagation over
     DataFrame joins (GraphFrames-style), canonical = lexicographic-min uuid
     in the component — exactly the reference's ``compress_uuid_map``
     tie-break (``bulk_utils.py:399-414``), which keeps outputs identical
     across partitionings and cluster sizes.

Skew note: token blocks are capped (``MAX_BLOCK``) — a stop-token shared by
millions of names would otherwise create a quadratic block; the reference
never reaches that scale. Hot canonical keys in later groupBys are handled
by two-phase salted aggregation (:mod:`graphiti_spark.operators.skew`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphiti_spark import rules
from graphiti_spark.functions import text as tx

MAX_BLOCK = 64          # max members of one blocking bucket considered
SIMHASH_BANDS = 8       # 8 bands × 8 bits over the 64-bit name simhash


@F.pandas_udf(T.ArrayType(T.StringType()))
def _band_keys_udf(name_norm: pd.Series) -> pd.Series:
    """SimHash LSH band keys of the (tokenized) name — names whose
    embeddings are cosine-close share a band with high probability."""
    def keys(s: str) -> list[str]:
        sh = tx.simhash64(tx.tokenize(s or ""))
        return [f"b{b}:{(sh >> (8 * b)) & 0xFF:02x}" for b in range(SIMHASH_BANDS)]
    return name_norm.map(keys)


@F.pandas_udf(T.BooleanType())
def _node_dup_udf(name_a: pd.Series, name_b: pd.Series,
                  emb_a: pd.Series, emb_b: pd.Series) -> pd.Series:
    ea = np.array([np.asarray(v, dtype=np.float32) for v in emb_a])
    eb = np.array([np.asarray(v, dtype=np.float32) for v in emb_b])
    cos = tx.cosine_batch(ea, eb) if len(ea) else np.zeros(0)
    return pd.Series([rules.node_is_duplicate(a, b, c)
                      for a, b, c in zip(name_a, name_b, cos)])


def candidate_pairs(entities: DataFrame) -> DataFrame:
    """J1 blocking: (group_id, uuid_a, uuid_b) candidate duplicate pairs,
    uuid_a < uuid_b, from token-block ∪ simhash-band self-joins."""
    token_keys = F.array_distinct(F.split(F.col("name_norm"), " "))
    keyed = (
        entities
        .select("group_id", "uuid", "name_norm", "name_embedding",
                F.explode(F.concat(token_keys,
                                   _band_keys_udf(F.col("name_norm"))))
                 .alias("block_key"))
    )
    # Cap pathological blocks (stop-token buckets) deterministically.
    from pyspark.sql import Window
    w = Window.partitionBy("group_id", "block_key").orderBy("uuid")
    keyed = (keyed.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") <= MAX_BLOCK).drop("_rn"))

    a = keyed.select("group_id", "block_key",
                     F.col("uuid").alias("uuid_a"),
                     F.col("name_norm").alias("name_a"),
                     F.col("name_embedding").alias("emb_a"))
    b = keyed.select("group_id", "block_key",
                     F.col("uuid").alias("uuid_b"),
                     F.col("name_norm").alias("name_b"),
                     F.col("name_embedding").alias("emb_b"))
    return (
        a.join(b, ["group_id", "block_key"])
         .where(F.col("uuid_a") < F.col("uuid_b"))
         .drop("block_key")
         .dropDuplicates(["group_id", "uuid_a", "uuid_b"])
    )


def duplicate_pairs(entities: DataFrame) -> DataFrame:
    """Blocking + exact verify → confirmed duplicate pairs."""
    cand = candidate_pairs(entities)
    return (cand.where(_node_dup_udf(F.col("name_a"), F.col("name_b"),
                                     F.col("emb_a"), F.col("emb_b")))
                .select("group_id", "uuid_a", "uuid_b"))


def connected_components(vertices: DataFrame, pairs: DataFrame,
                         max_iter: int = 20) -> DataFrame:
    """Hash-min label propagation: (uuid → component) with component =
    lexicographic-min uuid reachable. Returns (uuid, component).

    Driver-side loop of DataFrame joins with localCheckpoint per round to
    cut lineage (SURVEY.md §7 risk 2); rounds are O(diameter), and alias
    components have diameter ≤ 2-3. Deterministic: min() is order-free.
    """
    sym = (pairs.select(F.col("uuid_a").alias("src"), F.col("uuid_b").alias("dst"))
           .union(pairs.select(F.col("uuid_b").alias("src"),
                               F.col("uuid_a").alias("dst"))))
    sym = sym.localCheckpoint(eager=True)
    labels = vertices.select(F.col("uuid"), F.col("uuid").alias("component"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = (sym.join(labels, sym.dst == labels.uuid)
                   .select(F.col("src").alias("uuid"), "component"))
        new_labels = (labels.union(msgs)
                      .groupBy("uuid")
                      .agg(F.min("component").alias("component")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "uuid")
                   .where(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonicalize_entities(entities: DataFrame, run_ts) -> tuple[DataFrame, DataFrame]:
    """→ (canonical_entities, uuid_map).

    uuid_map: (uuid, canonical_uuid) for every raw entity. Canonical row
    keeps the canonical member's surface form; labels = distinct union
    (reference keeps resolved node's fields, ``node_operations.py:258-284``).
    """
    pairs = duplicate_pairs(entities)
    cc = connected_components(entities.select("uuid"), pairs)
    uuid_map = cc.select("uuid", F.col("component").alias("canonical_uuid"))

    merged = (
        entities.join(uuid_map, "uuid")
        .groupBy("group_id", "canonical_uuid")
        .agg(
            F.min(F.struct("uuid", "name", "name_norm")).alias("canon"),
            F.array_distinct(F.flatten(F.collect_list("labels"))).alias("labels"),
            F.min("created_at").alias("created_at"),
            F.min("first_turn").alias("first_turn"),
        )
        .select(
            F.col("canonical_uuid").alias("uuid"),
            F.col("canon.name").alias("name"),
            "group_id", "labels", "created_at",
            F.col("canon.name_norm").alias("name_norm"),
            "first_turn",
        )
    )
    from graphiti_spark.operators.extract import embed_udf
    merged = merged.withColumn("name_embedding", embed_udf(F.col("name_norm")))
    return merged, uuid_map


def resolve_edge_pointers(edges: DataFrame, uuid_map: DataFrame) -> DataFrame:
    """J8 — remap edge endpoints through the canonical map
    (``bulk_utils.py:420-427``): two joins + coalesce."""
    src_map = uuid_map.select(F.col("uuid").alias("source_node_uuid"),
                              F.col("canonical_uuid").alias("_src_c"))
    dst_map = uuid_map.select(F.col("uuid").alias("target_node_uuid"),
                              F.col("canonical_uuid").alias("_dst_c"))
    return (
        edges
        .join(src_map, "source_node_uuid", "left")
        .join(dst_map, "target_node_uuid", "left")
        .withColumn("source_node_uuid",
                    F.coalesce(F.col("_src_c"), F.col("source_node_uuid")))
        .withColumn("target_node_uuid",
                    F.coalesce(F.col("_dst_c"), F.col("target_node_uuid")))
        .drop("_src_c", "_dst_c")
        .where(F.col("source_node_uuid") != F.col("target_node_uuid"))
    )
