"""M3 — entity canonicalization: blocking join + connected components.

Replaces the reference's O(n²) Python candidate loops + LLM dedup + in-memory
union-find (``/root/reference/graphiti_core/utils/bulk_utils.py:201-285,
377-414``) with:

  1. **Blocking** (candidate generation, J1): a token equi-join — the
     reference's word-overlap branch (``bulk_utils.py:227-234``) IS an
     equi-join on a shared token. Self-joins are per ``group_id`` (the
     reference scopes all dedup reads by group, ``nodes.py:84``), so blocks
     never cross conversations and the join co-partitions on
     (group_id, token).
  2. **Verify**: the duplicate decision entirely in whole-stage codegen.
     The cosine≥0.8 branch (``bulk_utils.py:236-241``) is computed as
     token-set cosine |A∩B| / √(|A|·|B|) — for our signed-feature-hash
     embeddings (functions/text.py) this equals the embedding cosine up to
     hash collisions (each shared distinct token contributes exactly 1 to
     the dot product), so no Python/pandas pass and no 1024-float shuffle
     is needed in the hot path. Blocking by shared token has full recall
     for every branch: equal, subset, and token-cosine > 0 all require a
     shared token.
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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark import rules

MAX_BLOCK = 64          # max members of one blocking bucket considered


def _tok(col) -> F.Column:
    """Distinct alnum-run tokens of a normalized name — the JVM twin of
    :func:`graphiti_spark.rules.name_tokens` (punctuated aliases like
    'coca-cola' / 'coca cola' tokenize identically)."""
    return F.array_distinct(F.array_remove(F.split(col, "[^a-z0-9]+"), ""))


def candidate_pairs(entities: DataFrame) -> DataFrame:
    """J1 blocking: (group_id, uuid_a, uuid_b, name_a, name_b) candidate
    duplicate pairs, uuid_a < uuid_b, from a per-group token self-join."""
    keyed = (entities
             .select("group_id", "uuid", "name_norm",
                     F.explode(_tok(F.col("name_norm"))).alias("block_key")))
    # Cap pathological blocks (stop-token buckets) deterministically.
    w = Window.partitionBy("group_id", "block_key").orderBy("uuid")
    keyed = (keyed.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") <= MAX_BLOCK).drop("_rn"))

    a = keyed.select("group_id", "block_key",
                     F.col("uuid").alias("uuid_a"),
                     F.col("name_norm").alias("name_a"))
    b = keyed.select("group_id", "block_key",
                     F.col("uuid").alias("uuid_b"),
                     F.col("name_norm").alias("name_b"))
    return (
        a.join(b, ["group_id", "block_key"])
         .where(F.col("uuid_a") < F.col("uuid_b"))
         .drop("block_key")
         .dropDuplicates(["group_id", "uuid_a", "uuid_b"])
    )


def duplicate_decision(name_a, name_b) -> F.Column:
    """The deterministic duplicate rule as a boolean Column — the JVM twin
    of :func:`graphiti_spark.rules.node_is_duplicate`: normalized-equal,
    token-subset (alias 'bob' ⊂ 'bob smith'), or token-cosine ≥ 0.8."""
    ta, tb = _tok(name_a), _tok(name_b)
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    cos = inter / F.sqrt(F.size(ta).cast("double") * F.size(tb).cast("double"))
    subset = (F.size(F.array_except(ta, tb)) == 0) | \
             (F.size(F.array_except(tb, ta)) == 0)
    return ((name_a == name_b) | subset
            | (cos >= F.lit(rules.NODE_COSINE_THRESHOLD)))


def cosine_cols(a, b) -> F.Column:
    """Pairwise cosine of two array<float> columns, entirely JVM-side
    (zip_with dot product + aggregate norms — F4, no Python)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def duplicate_pairs(entities: DataFrame,
                    emb_col: str | None = None) -> DataFrame:
    """Blocking + verify → confirmed duplicate pairs.

    Default (``emb_col=None``): token blocking + token-cosine verify,
    whole-stage codegen, no Python in the path. For our hash embeddings
    token-cosine equals embedding-cosine by construction, but an EXTERNAL
    embedding model breaks that identity (``bulk_utils.py:236-241``
    verifies with real embedding cosine) — so when an embedding column is
    supplied the verify branch uses pairwise JVM ``cosine_cols`` at the
    reference's 0.8 node threshold (``bulk_utils.py:208``), and the
    candidate set is widened with sign-LSH buckets over the embeddings
    (``operators/ann.py``): a real-embedding duplicate may share NO name
    token ('IBM' vs 'International Business Machines'), which the token
    block alone would miss. Both blocks stay group-scoped equi-joins —
    the 100 TB-safe shape."""
    cand = candidate_pairs(entities)
    if emb_col is None:
        return (cand.where(duplicate_decision(F.col("name_a"),
                                              F.col("name_b")))
                    .select("group_id", "uuid_a", "uuid_b"))

    from graphiti_spark.operators import ann
    buckets = (ann.signlsh_buckets(entities, n_planes=12, id_col="uuid",
                                   emb_col=emb_col)
               .join(entities.select("uuid", "group_id"), "uuid"))
    ba = buckets.select("group_id", "bucket", F.col("uuid").alias("uuid_a"))
    bb = buckets.select("group_id", "bucket", F.col("uuid").alias("uuid_b"))
    lsh_cand = (ba.join(bb, ["group_id", "bucket"])
                .where(F.col("uuid_a") < F.col("uuid_b"))
                .drop("bucket"))
    names = entities.select("uuid", "name_norm")
    lsh_cand = (lsh_cand
                .join(names.select(F.col("uuid").alias("uuid_a"),
                                   F.col("name_norm").alias("name_a")),
                      "uuid_a")
                .join(names.select(F.col("uuid").alias("uuid_b"),
                                   F.col("name_norm").alias("name_b")),
                      "uuid_b"))
    all_cand = (cand.select("group_id", "uuid_a", "uuid_b",
                            "name_a", "name_b")
                .unionByName(lsh_cand.select("group_id", "uuid_a", "uuid_b",
                                             "name_a", "name_b"))
                .dropDuplicates(["group_id", "uuid_a", "uuid_b"]))
    embs = entities.select("uuid", emb_col)
    all_cand = (all_cand
                .join(embs.select(F.col("uuid").alias("uuid_a"),
                                  F.col(emb_col).alias("_ea")), "uuid_a")
                .join(embs.select(F.col("uuid").alias("uuid_b"),
                                  F.col(emb_col).alias("_eb")), "uuid_b"))
    ta, tb = _tok(F.col("name_a")), _tok(F.col("name_b"))
    subset = (F.size(F.array_except(ta, tb)) == 0) | \
             (F.size(F.array_except(tb, ta)) == 0)
    is_dup = ((F.col("name_a") == F.col("name_b")) | subset
              | (cosine_cols(F.col("_ea"), F.col("_eb"))
                 >= F.lit(rules.NODE_COSINE_THRESHOLD)))
    return all_cand.where(is_dup).select("group_id", "uuid_a", "uuid_b")


def edge_duplicate_pairs(edges: DataFrame,
                         emb_col: str = "fact_embedding") -> DataFrame:
    """J2 with real embeddings: duplicate-edge candidates ONLY between
    edges with identical (source, target) endpoints (the pair guard,
    ``bulk_utils.py:318-321``) verified by fact-embedding cosine ≥ 0.6
    (``bulk_utils.py:297``) or fact word overlap. A pure equi-join on
    (group_id, src, dst) + JVM cosine predicate — no O(n²), no Python."""
    keyed = edges.select("group_id", "source_node_uuid", "target_node_uuid",
                         "uuid", "fact", F.col(emb_col))
    a = keyed.select("group_id", "source_node_uuid", "target_node_uuid",
                     F.col("uuid").alias("uuid_a"),
                     F.col("fact").alias("fact_a"),
                     F.col(emb_col).alias("_ea"))
    b = keyed.select("group_id", "source_node_uuid", "target_node_uuid",
                     F.col("uuid").alias("uuid_b"),
                     F.col("fact").alias("fact_b"),
                     F.col(emb_col).alias("_eb"))
    ta, tb = _tok(F.lower(F.col("fact_a"))), _tok(F.lower(F.col("fact_b")))
    overlap = F.size(F.array_intersect(ta, tb)) > 0
    return (a.join(b, ["group_id", "source_node_uuid", "target_node_uuid"])
            .where(F.col("uuid_a") < F.col("uuid_b"))
            .where(overlap
                   | (cosine_cols(F.col("_ea"), F.col("_eb"))
                      >= F.lit(rules.EDGE_COSINE_THRESHOLD)))
            .select("group_id", "source_node_uuid", "target_node_uuid",
                    "uuid_a", "uuid_b"))


def connected_components(vertices: DataFrame, pairs: DataFrame,
                         max_iter: int = 20) -> DataFrame:
    """Hash-min label propagation: (uuid → component) with component =
    lexicographic-min uuid reachable. Returns (uuid, component).

    Driver-side loop of DataFrame joins with localCheckpoint per round to
    cut lineage (SURVEY.md §7 risk 2); rounds are O(diameter), and alias
    components have diameter ≤ 2-3. Deterministic: min() is order-free.
    """
    # Materialize pairs once — the symmetric union consumes it twice, and
    # recomputing the blocking join per branch doubles the heaviest stage.
    pairs = pairs.localCheckpoint(eager=True)
    sym = (pairs.select(F.col("uuid_a").alias("src"), F.col("uuid_b").alias("dst"))
           .union(pairs.select(F.col("uuid_b").alias("src"),
                               F.col("uuid_a").alias("dst"))))
    sym = sym.localCheckpoint(eager=True)
    labels = vertices.select(F.col("uuid"), F.col("uuid").alias("component"))
    labels = labels.localCheckpoint(eager=True)
    for it in range(max_iter):
        msgs = (sym.join(labels, sym.dst == labels.uuid)
                .select(F.col("src").alias("uuid"), "component",
                        F.lit(False).alias("own")))
        # Old label rides along (own=True) so the convergence check is a
        # cheap scan of the checkpointed result — no extra join job.
        new_labels = (labels.withColumn("own", F.lit(True)).union(msgs)
                      .groupBy("uuid")
                      .agg(F.min("component").alias("component"),
                           F.min(F.when(F.col("own"), F.col("component")))
                            .alias("_old")))
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels.select("uuid", "component")
        if it == 0:
            # Alias components have diameter ≥ 1; the first round always
            # changes something — skip its convergence check.
            continue
        changed = (new_labels
                   .where(F.col("component") != F.col("_old"))
                   .limit(1).count())
        if changed == 0:
            break
    return labels


def grouped_uuid_map(entities: DataFrame, max_full_pairwise: int = 200
                     ) -> DataFrame:
    """(uuid → canonical_uuid) via ONE ``applyInPandas`` over ``group_id``.

    Duplicate components can never span groups — every entity uuid is a
    hash of (group_id, name) and all candidate joins are group-scoped — so
    connected components reduce to an in-group union-find: one shuffle,
    no driver-side iteration, no convergence barriers. This is the
    scale-out shape: groups are conversation-sized (tens of entities), and
    a group with more than ``max_full_pairwise`` members falls back to
    token-blocked candidate generation (capped per token like MAX_BLOCK)
    inside the same UDF. The global iterative-join CC
    (:func:`connected_components`) remains for graphs whose components may
    span the partition key."""
    import math
    import re
    from collections.abc import Iterator

    import pandas as pd

    alnum = re.compile(r"[a-z0-9]+")

    def solve_group(uuids: list, names: list) -> list:
        # same alnum-run tokenization as rules.name_tokens / _tok
        toks = [set(alnum.findall(n)) for n in names]
        k = len(uuids)

        parent = list(range(k))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        def dup(i, j):
            if names[i] == names[j]:
                return True
            ti, tj = toks[i], toks[j]
            if not ti or not tj:
                return False
            if ti <= tj or tj <= ti:
                return True
            cos = len(ti & tj) / math.sqrt(len(ti) * len(tj))
            return cos >= rules.NODE_COSINE_THRESHOLD

        if k <= max_full_pairwise:
            for i in range(k):
                for j in range(i + 1, k):
                    if dup(i, j):
                        union(i, j)
        else:
            blocks: dict[str, list[int]] = {}
            for i, ts in enumerate(toks):
                for t in ts:
                    b = blocks.setdefault(t, [])
                    if len(b) < MAX_BLOCK:
                        b.append(i)
            seen = set()
            for members in blocks.values():
                for ai in range(len(members)):
                    for bi in range(ai + 1, len(members)):
                        i, j = members[ai], members[bi]
                        key = (i, j)
                        if key in seen:
                            continue
                        seen.add(key)
                        if dup(i, j):
                            union(i, j)

        # canonical = lexicographic-min uuid in the component
        canon_by_root: dict[int, str] = {}
        for i in range(k):
            r = find(i)
            c = canon_by_root.get(r)
            if c is None or uuids[i] < c:
                canon_by_root[r] = uuids[i]
        return [canon_by_root[find(i)] for i in range(k)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Manual group splitting over group-sorted partitions: millions of
        # conversation-sized groups make per-group pandas dispatch
        # (applyInPandas) the bottleneck; here each Arrow batch handles
        # thousands of groups with plain-list slicing. A group straddling
        # two batches is carried over (state persists across yields
        # within one partition).
        carry_g, carry_u, carry_n = None, [], []
        for pdf in batches:
            gs = pdf["group_id"].tolist()
            us = pdf["uuid"].tolist()
            ns = pdf["name_norm"].tolist()
            out_u, out_c = [], []
            i, n = 0, len(gs)
            while i < n:
                j = i
                g = gs[i]
                while j < n and gs[j] == g:
                    j += 1
                uu, nn = us[i:j], ns[i:j]
                if carry_g == g:
                    uu, nn = carry_u + uu, carry_n + nn
                    carry_u, carry_n, carry_g = [], [], None
                elif carry_g is not None:
                    cc = solve_group(carry_u, carry_n)
                    out_u += carry_u
                    out_c += cc
                    carry_u, carry_n, carry_g = [], [], None
                if j == n:
                    carry_g, carry_u, carry_n = g, uu, nn   # maybe continues
                else:
                    out_u += uu
                    out_c += solve_group(uu, nn)
                i = j
            if out_u:
                yield pd.DataFrame({"uuid": out_u, "canonical_uuid": out_c})
        if carry_u:
            yield pd.DataFrame({"uuid": carry_u,
                                "canonical_uuid": solve_group(carry_u,
                                                              carry_n)})

    n_part = max(2 * entities.sparkSession.sparkContext.defaultParallelism, 8)
    return (entities.select("group_id", "uuid", "name_norm")
            .repartition(n_part, "group_id")
            .sortWithinPartitions("group_id", "uuid")
            .mapInPandas(run, "uuid string, canonical_uuid string"))


def canonicalize_entities(entities: DataFrame, run_ts,
                          grouped: bool = True,
                          emb_col: str | None = None
                          ) -> tuple[DataFrame, DataFrame]:
    """→ (canonical_entities, uuid_map).

    uuid_map: (uuid, canonical_uuid) for every raw entity. Canonical row
    keeps the canonical member's surface form; labels = distinct union
    (reference keeps resolved node's fields, ``node_operations.py:258-284``).
    Embeddings are NOT computed here — the pipeline embeds canonical names
    once, downstream, so the CC/merge shuffles stay narrow.

    ``grouped=True`` (default) uses the single-shuffle per-group
    union-find (:func:`grouped_uuid_map`); ``grouped=False`` runs the
    blocking join + global iterative CC — same semantics, kept for graphs
    whose duplicate relation is not partition-scoped.

    ``emb_col`` (opt-in) switches the duplicate verify to REAL embedding
    cosine at the 0.8 threshold (``bulk_utils.py:208,236-241``) with
    sign-LSH blocking — use when ``entities`` carries an external model's
    embeddings, whose cosine is NOT the token cosine. Implies the
    blocking-join + iterative-CC path (duplicates found through a shared
    LSH bucket are still group-scoped, but the in-UDF union-find only
    knows token rules)."""
    if emb_col is not None:
        pairs = duplicate_pairs(entities, emb_col=emb_col)
        cc = connected_components(entities.select("uuid"), pairs)
        uuid_map = cc.select("uuid", F.col("component").alias("canonical_uuid"))
    elif grouped:
        uuid_map = grouped_uuid_map(entities)
    else:
        pairs = duplicate_pairs(entities)
        cc = connected_components(entities.select("uuid"), pairs)
        uuid_map = cc.select("uuid", F.col("component").alias("canonical_uuid"))

    merged = (
        entities.join(uuid_map, "uuid")
        .groupBy("group_id", "canonical_uuid")
        .agg(
            # min by uuid (unique) — trailing fields ride along.
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
    return merged, uuid_map


def resolve_edge_pointers(edges: DataFrame, uuid_map: DataFrame) -> DataFrame:
    """J8 — remap edge endpoints through the canonical map
    (``bulk_utils.py:420-427``): two joins + coalesce.

    Only genuine renames join: the left-join + coalesce already treats an
    absent key as identity, and most entities are singletons
    (canonical_uuid == uuid), so filtering the map to changed rows shrinks
    the join side from |entities| to |duplicates| — small enough for AQE
    to broadcast, which removes both edge-table shuffles. At 100 TB the
    rename set is the only part of the entity table an edge remap ever
    needs to move."""
    renames = uuid_map.where(F.col("canonical_uuid") != F.col("uuid"))
    src_map = renames.select(F.col("uuid").alias("source_node_uuid"),
                             F.col("canonical_uuid").alias("_src_c"))
    dst_map = renames.select(F.col("uuid").alias("target_node_uuid"),
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
