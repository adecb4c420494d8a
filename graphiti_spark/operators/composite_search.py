"""Composite 4-layer search — the reference's top-level ``search()``
fan-out (``graphiti_core/search/search.py:66-162``) with nested per-layer
sub-configs (``search/search_config.py:80-118``).

One :func:`search` call runs the edge, node, episode and community layers
— each with its OWN methods + reranker from the preset — and returns one
:class:`SearchResults` bundle, instead of the caller orchestrating four
:func:`~graphiti_spark.operators.search.hybrid_search` calls by hand.

Execution shape: each layer is an independent lazy DataFrame plan (method
fan-out → fuse → rerank → limit, all JVM-side); no action runs here, so a
caller that collects all four layers gets four parallel Spark jobs — the
DataFrame twin of the reference's ``semaphore_gather`` over the four
layer coroutines. Hydration joins broadcast the ≤limit-row reranked side
into the layer table, so no full-table shuffle is added at any scale.

The 16 reference preset names (``search/search_config_recipes.py:34-223``)
are re-exported here at full nesting fidelity: the COMBINED_* presets
carry all four sub-configs (episode layer bm25-only, MMR presets with the
reference's ``mmr_lambda=1``, CROSS_ENCODER presets adding bfs to the
edge/node method lists), EDGE_*/NODE_*/COMMUNITY_* presets carry exactly
one.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.operators.search import (
    DEFAULT_MIN_SCORE,
    DEFAULT_SEARCH_LIMIT,
    MAX_SEARCH_DEPTH,
    MMR_LAMBDA,
    SearchConfig,
    SearchFilters,
    hybrid_search,
)


@dataclass
class LayerConfig:
    """Per-layer sub-config — Edge/Node/Episode/CommunitySearchConfig
    (``search_config.py:80-109``)."""

    methods: list[str] = field(default_factory=lambda: ["bm25", "cosine"])
    reranker: str = "rrf"
    sim_min_score: float = DEFAULT_MIN_SCORE
    mmr_lambda: float = MMR_LAMBDA
    bfs_max_depth: int = MAX_SEARCH_DEPTH


@dataclass
class CompositeSearchConfig:
    """``SearchConfig`` (``search_config.py:111-118``): four optional
    nested layer configs + shared limit / reranker floor."""

    edge_config: LayerConfig | None = None
    node_config: LayerConfig | None = None
    episode_config: LayerConfig | None = None
    community_config: LayerConfig | None = None
    limit: int = DEFAULT_SEARCH_LIMIT
    reranker_min_score: float = 0.0


@dataclass
class SearchResults:
    """``SearchResults`` (``search/search.py:146-155``): hydrated rows per
    layer with a ``score`` column (the reranker score), descending."""

    edges: DataFrame | None = None
    nodes: DataFrame | None = None
    episodes: DataFrame | None = None
    communities: DataFrame | None = None


#: layer → (text column, embedding column) of the corresponding table.
_LAYER_COLS = {
    "edge": ("fact", "fact_embedding"),
    "node": ("name", "name_embedding"),
    "episode": ("content", None),
    "community": ("summary", "name_embedding"),
}


def _one_layer(kind: str, df: DataFrame | None, layer: LayerConfig | None,
               query: str, query_vec, limit: int, reranker_min_score: float,
               filters, edges, episodic_edges, origin_uuids, center_uuid
               ) -> DataFrame | None:
    if df is None or layer is None:
        return None
    text_col, emb_col = _LAYER_COLS[kind]
    methods = list(layer.methods)
    # A layer whose table doesn't carry the embedding column (e.g. a
    # pipeline built with with_embeddings=False) degrades to its lexical
    # methods instead of failing the whole composite call.
    reranker = layer.reranker
    if emb_col not in (df.columns if emb_col else []):
        methods = [m for m in methods if m != "cosine"]
        emb_col = text_col  # unused placeholder; mmr would need embeddings
        if reranker == "mmr":
            # MMR needs real embeddings; joining the text column as the
            # embedding would crash np.asarray deep inside the reranker.
            # Degrade the same way the cosine method does: fall back to
            # score-order fusion (rrf), keeping the composite call alive.
            reranker = "rrf"
    if not methods:
        return None
    cfg = SearchConfig(methods=methods, reranker=reranker,
                       limit=limit, min_score=layer.sim_min_score,
                       bfs_depth=layer.bfs_max_depth,
                       mmr_lambda=layer.mmr_lambda,
                       reranker_min_score=reranker_min_score)
    fused = hybrid_search(df, text_col, emb_col, query, query_vec,
                          config=cfg, filters=filters, kind=kind,
                          edges=edges, episodic_edges=episodic_edges,
                          origin_uuids=origin_uuids,
                          center_uuid=center_uuid)
    # Hydrate: the reranked side is ≤ limit rows — broadcast it into the
    # layer table (no shuffle of the big side at any scale).
    return (df.join(F.broadcast(fused), "uuid")
            .orderBy(F.col("score").desc(), "uuid"))


def search(query: str, query_vec: list[float] | None,
           config: CompositeSearchConfig,
           edges: DataFrame | None = None,
           nodes: DataFrame | None = None,
           episodes: DataFrame | None = None,
           communities: DataFrame | None = None,
           episodic_edges: DataFrame | None = None,
           filters: SearchFilters | None = None,
           group_ids: list[str] | None = None,
           center_node_uuid: str | None = None,
           bfs_origin_node_uuids: list[str] | None = None) -> SearchResults:
    """The reference's ``search()``: fan out to the four layers, each with
    its preset's own methods/reranker, under one shared limit.

    Blank queries return an empty bundle (``search.py:83-84``); empty
    ``group_ids`` means no group filter (``search.py:91``).
    """
    if not (query or "").strip():
        return SearchResults()
    group_ids = [g for g in (group_ids or []) if g] or None

    def scope(df):
        if df is None or group_ids is None:
            return df
        return df.where(F.col("group_id").isin(group_ids))

    common = dict(query=query, query_vec=query_vec, limit=config.limit,
                  reranker_min_score=config.reranker_min_score,
                  filters=filters, edges=scope(edges),
                  episodic_edges=episodic_edges,
                  origin_uuids=bfs_origin_node_uuids,
                  center_uuid=center_node_uuid)
    return SearchResults(
        edges=_one_layer("edge", scope(edges), config.edge_config, **common),
        nodes=_one_layer("node", scope(nodes), config.node_config, **common),
        episodes=_one_layer("episode", scope(episodes),
                            config.episode_config, **common),
        communities=_one_layer("community", scope(communities),
                               config.community_config, **common),
    )


# ---------------------------------------------------------------------------
# Preset family (search_config_recipes.py:34-223) at full nesting fidelity
# ---------------------------------------------------------------------------

def _combined(edge_r, node_r, episode_r, community_r, *, bfs=False,
              lam=MMR_LAMBDA):
    hybrid = ["bm25", "cosine"] + (["bfs"] if bfs else [])
    return CompositeSearchConfig(
        edge_config=LayerConfig(list(hybrid), edge_r, mmr_lambda=lam),
        node_config=LayerConfig(list(hybrid), node_r, mmr_lambda=lam),
        episode_config=LayerConfig(["bm25"], episode_r),
        community_config=LayerConfig(["bm25", "cosine"], community_r,
                                     mmr_lambda=lam))


COMBINED_HYBRID_SEARCH_RRF = _combined("rrf", "rrf", "rrf", "rrf")
COMBINED_HYBRID_SEARCH_MMR = _combined("mmr", "mmr", "rrf", "mmr", lam=1.0)
COMBINED_HYBRID_SEARCH_CROSS_ENCODER = _combined(
    "cross_encoder", "cross_encoder", "cross_encoder", "cross_encoder",
    bfs=True)

def _edge(reranker, *, bfs=False):
    return CompositeSearchConfig(edge_config=LayerConfig(
        ["bm25", "cosine"] + (["bfs"] if bfs else []), reranker))

def _node(reranker, *, bfs=False):
    return CompositeSearchConfig(node_config=LayerConfig(
        ["bm25", "cosine"] + (["bfs"] if bfs else []), reranker))

EDGE_HYBRID_SEARCH_RRF = _edge("rrf")
EDGE_HYBRID_SEARCH_MMR = _edge("mmr")
EDGE_HYBRID_SEARCH_NODE_DISTANCE = _edge("node_distance")
EDGE_HYBRID_SEARCH_EPISODE_MENTIONS = _edge("episode_mentions")
EDGE_HYBRID_SEARCH_CROSS_ENCODER = _edge("cross_encoder", bfs=True)
NODE_HYBRID_SEARCH_RRF = _node("rrf")
NODE_HYBRID_SEARCH_MMR = _node("mmr")
NODE_HYBRID_SEARCH_NODE_DISTANCE = _node("node_distance")
NODE_HYBRID_SEARCH_EPISODE_MENTIONS = _node("episode_mentions")
NODE_HYBRID_SEARCH_CROSS_ENCODER = _node("cross_encoder", bfs=True)
COMMUNITY_HYBRID_SEARCH_RRF = CompositeSearchConfig(
    community_config=LayerConfig(["bm25", "cosine"], "rrf"))
COMMUNITY_HYBRID_SEARCH_MMR = CompositeSearchConfig(
    community_config=LayerConfig(["bm25", "cosine"], "mmr"))
COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER = CompositeSearchConfig(
    community_config=LayerConfig(["bm25", "cosine"], "cross_encoder"))

COMPOSITE_RECIPES = {
    name: obj for name, obj in list(globals().items())
    if isinstance(obj, CompositeSearchConfig)
}
