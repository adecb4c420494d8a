"""Point-lookup serving layer — interactive-latency twin of the
composite ``search()`` (SURVEY.md §2.9 Q9; reference ``README.md:97``).

The reference answers hybrid search "typically sub-second" because
``add_episode`` materializes the graph into an INDEXED point-lookup
store (Neo4j + Lucene) and ``search()`` probes those indexes. The Spark
engine here is the *builder*: at 100 TB the pipeline distills the corpus
into layer tables (edges/nodes/episodes/communities) that are tiny
relative to the input — a 10¹²-turn corpus yields a graph measured in
GBs per group, not TBs. Interactive serving should never pay Spark's
per-query scheduling floor (measured: p50 13.6 s/query on a served
sf0.1 graph, BENCH_SEARCH.json — structural, not a plan problem).

This module is the missing half of that story, in-repo and tested:

* :func:`export_search_artifacts` — the Spark-side export job: snapshot
  the layer tables as parquet (the point-lookup store's load format).
* :class:`ServedGraph` — loads one graph's artifacts into memory
  (inverted token index, L2 row norms + float64 embedding matrix,
  symmetric adjacency) and answers the SAME composite ``search()`` —
  same methods, rerankers, presets, filters, tie-breaks — in
  milliseconds.

Equivalence is the contract, not an aspiration: ``tests/test_serving.py``
replays every composite preset through both engines and asserts
identical uuid orderings with score agreement to float tolerance, and
the ``served_search`` driver query answers the SAME DuckDB oracle as
``composite_search``.

Scale story: serving memory is O(graph), not O(corpus); shard by
``group_id`` (each ServedGraph holds one shard — the export is
partitioned by group) and route queries to shards. The Spark engine
remains the only writer; serving snapshots are immutable exports, so
there is no dual-write consistency problem.

Reference parity map: search/search.py:66-162 (fan-out),
search/search_utils.py:188-296 (methods), :875-1006 (rerankers),
search/search_filters.py:40-184 (filter compiler).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from graphiti_spark.functions.text import tokenize
from graphiti_spark.operators.composite_search import (
    _LAYER_COLS,
    CompositeSearchConfig,
)
from graphiti_spark.operators.search import (
    DEFAULT_SEARCH_LIMIT,
    MAX_SEARCH_DEPTH,
    SearchFilters,
    _mmr_greedy,
)

_ARTIFACTS = ("edges", "nodes", "episodes", "communities",
              "episodic_edges")


def _query_tokens(query: str) -> list[str]:
    """Query-side tokenizer — MUST match ``bm25_lite_search`` /
    ``cross_encoder_rank`` in operators/search.py (per-char isalnum →
    lower → split), which is deliberately looser than the corpus-side
    ``tokenize`` on non-ASCII alnum."""
    return [t for t in
            "".join(c.lower() if c.isalnum() else " " for c in query)
            .split() if t]


def _sorted_scores(uuids, scores) -> pd.DataFrame:
    """(score DESC, uuid ASC) — the ordering every Spark search plan
    emits (hash-stable tie-break)."""
    df = pd.DataFrame({"uuid": uuids, "score": scores})
    return df.sort_values(["score", "uuid"], ascending=[False, True],
                          ignore_index=True)


class _Layer:
    """One layer table prepared for point lookups: positional rows, an
    inverted token index (token → (row idx array, tf array)), doc
    lengths, and the float64 embedding matrix + norms."""

    def __init__(self, pdf: pd.DataFrame, text_col: str,
                 emb_col: str | None):
        self.rows = pdf.reset_index(drop=True)
        self.uuid = self.rows["uuid"].to_numpy()
        self.text_col = text_col
        texts = self.rows[text_col] if text_col in self.rows else \
            pd.Series([""] * len(self.rows))
        self.toks = [tokenize(t if isinstance(t, str) else "")
                     for t in texts]
        self.tok_sets = [set(t) for t in self.toks]
        self.dl = np.array([len(t) for t in self.toks], dtype=np.float64)
        index: dict[str, list[tuple[int, int]]] = {}
        for i, ts in enumerate(self.toks):
            tf: dict[str, int] = {}
            for t in ts:
                tf[t] = tf.get(t, 0) + 1
            for t, n in tf.items():
                index.setdefault(t, []).append((i, n))
        self.index = {
            t: (np.array([i for i, _ in post], dtype=np.int64),
                np.array([n for _, n in post], dtype=np.float64))
            for t, post in index.items()}
        self.has_emb = emb_col is not None and emb_col in self.rows
        if self.has_emb:
            vecs = [np.asarray(v, dtype=np.float64)
                    for v in self.rows[emb_col]]
            # a 0-row layer (no communities yet, empty group shard) must
            # still build a 2-D matrix — np.array([]) is 1-D and breaks
            # the einsum and the matmul in cosine()
            self.emb = (np.vstack(vecs) if vecs
                        else np.zeros((0, 0), dtype=np.float64))
            # same formula as cosine_col: norm from the element squares,
            # rows with zero norm score 0
            self.norm = np.sqrt(np.einsum("ij,ij->i", self.emb, self.emb))
        self._uuid_to_idx = {u: i for i, u in enumerate(self.uuid)}

    # -- methods ----------------------------------------------------------

    def bm25(self, mask: np.ndarray | None, query: str, limit: int,
             k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
        """Twin of ``bm25_lite_search``: full BM25, idf from the scoped
        corpus itself, (score DESC, uuid) top-``limit``."""
        uniq = list(dict.fromkeys(_query_tokens(query)))
        if not uniq:
            return pd.DataFrame({"uuid": [], "score": []})
        if mask is None:
            n_docs = float(len(self.rows))
            avgdl = float(self.dl.mean()) if len(self.dl) else 1.0
        else:
            n_docs = float(mask.sum())
            avgdl = float(self.dl[mask].mean()) if mask.any() else 1.0
        scores: dict[int, float] = {}
        for t in uniq:
            post = self.index.get(t)
            if post is None:
                continue
            idx, tf = post
            if mask is not None:
                keep = mask[idx]
                idx, tf = idx[keep], tf[keep]
            if len(idx) == 0:
                continue
            df_t = float(len(idx))
            idf = np.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
            norm = (1.0 - b) + b * self.dl[idx] / max(avgdl, 1e-9)
            w = idf * (tf * (k1 + 1.0)) / (tf + k1 * norm)
            for i, wi in zip(idx, w):
                scores[int(i)] = scores.get(int(i), 0.0) + float(wi)
        hits = [(self.uuid[i], s) for i, s in scores.items() if s > 0]
        out = _sorted_scores([u for u, _ in hits], [s for _, s in hits])
        return out.head(limit).reset_index(drop=True)

    def cosine(self, mask: np.ndarray | None, query_vec, min_score: float,
               limit: int) -> pd.DataFrame:
        """Twin of ``similarity_search``: cosine > min_score (strict),
        (score DESC, uuid) top-``limit``; zero-norm rows score 0."""
        q = np.asarray(query_vec, dtype=np.float64)
        qn = float(np.sqrt((q * q).sum())) or 1.0
        if self.emb.shape[0] == 0:
            # empty layer: the (0, 0) placeholder matrix cannot matmul a
            # dim-d query, and there is nothing to score anyway
            return pd.DataFrame({"uuid": [], "score": []})
        if mask is None:
            # unscoped hot path: matmul against the stored matrix
            # directly — fancy-indexing with arange would COPY the whole
            # (n × dim) matrix per query (measured: ~0.3 s/query at 27k
            # docs × dim 1024, the entire served latency budget)
            dots, norms, uuids = self.emb @ q, self.norm, self.uuid
        else:
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                return pd.DataFrame({"uuid": [], "score": []})
            dots = self.emb[idx] @ q
            norms, uuids = self.norm[idx], self.uuid[idx]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(norms > 0, dots / (norms * qn), 0.0)
        keep = cos > min_score
        out = _sorted_scores(uuids[keep], cos[keep])
        return out.head(limit).reset_index(drop=True)


@dataclass
class ServedResults:
    """Hydrated rows per layer (pandas), score DESC — the serving twin of
    :class:`~graphiti_spark.operators.composite_search.SearchResults`."""

    edges: pd.DataFrame | None = None
    nodes: pd.DataFrame | None = None
    episodes: pd.DataFrame | None = None
    communities: pd.DataFrame | None = None


class ServedGraph:
    """One graph snapshot loaded for interactive search.

    Construction: :meth:`from_spark` (collect the pipeline's layer
    DataFrames), :meth:`load` (read a directory written by
    :func:`export_search_artifacts`), or pass pandas frames directly.
    """

    def __init__(self, edges: pd.DataFrame | None = None,
                 nodes: pd.DataFrame | None = None,
                 episodes: pd.DataFrame | None = None,
                 communities: pd.DataFrame | None = None,
                 episodic_edges: pd.DataFrame | None = None):
        self._tables = {"edge": edges, "node": nodes,
                        "episode": episodes, "community": communities}
        self.episodic_edges = episodic_edges
        self._layers: dict[str, _Layer | None] = {}
        self._adj: dict | None = None
        self._mention_counts: dict | None = None

    # -- construction ------------------------------------------------------

    @classmethod
    def from_spark(cls, edges=None, nodes=None, episodes=None,
                   communities=None, episodic_edges=None) -> "ServedGraph":
        def pdf(df):
            return None if df is None else df.toPandas()
        return cls(pdf(edges), pdf(nodes), pdf(episodes), pdf(communities),
                   pdf(episodic_edges))

    @classmethod
    def load(cls, artifacts_dir: str) -> "ServedGraph":
        frames = {}
        for name in _ARTIFACTS:
            path = os.path.join(artifacts_dir, name)
            frames[name] = pd.read_parquet(path) if os.path.isdir(path) \
                else None
        return cls(frames["edges"], frames["nodes"], frames["episodes"],
                   frames["communities"], frames["episodic_edges"])

    def _layer(self, kind: str) -> _Layer | None:
        if kind not in self._layers:
            pdf = self._tables[kind]
            text_col, emb_col = _LAYER_COLS[kind]
            self._layers[kind] = None if pdf is None else \
                _Layer(pdf, text_col, emb_col)
        return self._layers[kind]

    # -- graph-method state (built lazily, cached for the unscoped case) ---

    def _adjacency(self, group_ids: list[str] | None):
        edges = self._tables["edge"]
        if edges is None:
            return {}
        if group_ids is None and self._adj is not None:
            return self._adj
        pdf = edges if group_ids is None else \
            edges[edges["group_id"].isin(group_ids)]
        adj: dict = {}
        for s, t, u in zip(pdf["source_node_uuid"],
                           pdf["target_node_uuid"], pdf["uuid"]):
            adj.setdefault(s, []).append((t, u))
            adj.setdefault(t, []).append((s, u))
        if group_ids is None:
            self._adj = adj
        return adj

    def _bfs(self, origin_uuids, depth: int,
             group_ids) -> pd.DataFrame:
        """Twin of ``bfs_search``: edge uuids within ``depth`` hops of the
        origins (symmetric), min hop per edge."""
        adj = self._adjacency(group_ids)
        hops: dict = {}
        frontier = set(origin_uuids)
        seen = set(origin_uuids)
        for hop in range(1, depth + 1):
            nxt: set = set()
            for n in frontier:
                for dst, eu in adj.get(n, ()):
                    if eu not in hops:
                        hops[eu] = hop
                    nxt.add(dst)
            frontier = nxt - seen
            seen |= frontier
            if not frontier:
                break
        return pd.DataFrame({"uuid": list(hops.keys()),
                             "score": [1.0 / h for h in hops.values()]})

    def _mentions(self) -> dict:
        """Twin of ``episode_mentions_reranker``'s count: episodic-edge
        rows per target entity (``salted_count`` is a plain row count —
        edge uuid is the table's PK, so rows == mentions), UNSCOPED —
        matching the composite fan-out, which passes episodic_edges
        through un-sliced."""
        if self._mention_counts is None:
            ee = self.episodic_edges
            self._mention_counts = {} if ee is None else (
                ee.groupby("target_node_uuid").size()
                .astype(float).to_dict())
        return self._mention_counts

    # -- filter compiler (twin of compile_filters) --------------------------

    def _mask(self, kind: str, group_ids, filters: SearchFilters | None
              ) -> np.ndarray | None:
        layer = self._layer(kind)
        rows = layer.rows
        mask = None
        if group_ids is not None:
            mask = rows["group_id"].isin(group_ids).to_numpy()
        if filters is None:
            return mask
        cond = np.ones(len(rows), dtype=bool)
        if kind == "node" and filters.node_labels:
            for lab in filters.node_labels:
                cond &= np.array(
                    [isinstance(ls, (list, np.ndarray)) and lab in list(ls)
                     for ls in rows.get("labels", [None] * len(rows))])
        if kind == "edge" and filters.edge_types:
            cond &= rows["name"].isin(filters.edge_types).to_numpy() \
                if "name" in rows else np.zeros(len(rows), dtype=bool)
        if filters.date_groups:
            outer = np.zeros(len(rows), dtype=bool)
            for group in filters.date_groups:
                inner = np.ones(len(rows), dtype=bool)
                for f in group:
                    col = pd.to_datetime(rows[f.field]) \
                        if f.field in rows else \
                        pd.Series([pd.NaT] * len(rows))
                    if f.op == "is_null":
                        c = col.isna().to_numpy()
                    elif f.op == "is_not_null":
                        c = col.notna().to_numpy()
                    elif f.value is None:
                        # Spark: comparison with NULL literal → null → false
                        c = np.zeros(len(rows), dtype=bool)
                    else:
                        val = pd.Timestamp(f.value)
                        if col.dt.tz is None and val.tz is not None:
                            col = col.dt.tz_localize("UTC")
                        ops = {"=": col == val, "<>": col != val,
                               ">": col > val, "<": col < val,
                               ">=": col >= val, "<=": col <= val}
                        c = ops[f.op].fillna(False).to_numpy()
                    inner &= c
                outer |= inner
            cond &= outer
        return cond if mask is None else (mask & cond)

    # -- the composite search (twin of composite_search.search) -------------

    def search(self, query: str, query_vec,
               config: CompositeSearchConfig,
               group_ids: list[str] | None = None,
               filters: SearchFilters | None = None,
               center_node_uuid: str | None = None,
               bfs_origin_node_uuids: list[str] | None = None
               ) -> ServedResults:
        if not (query or "").strip():
            return ServedResults()
        group_ids = [g for g in (group_ids or []) if g] or None
        out = {}
        for kind, attr, layer_cfg in [
                ("edge", "edges", config.edge_config),
                ("node", "nodes", config.node_config),
                ("episode", "episodes", config.episode_config),
                ("community", "communities", config.community_config)]:
            out[attr] = self._one_layer(
                kind, layer_cfg, query, query_vec, config.limit,
                config.reranker_min_score, group_ids, filters,
                center_node_uuid, bfs_origin_node_uuids)
        return ServedResults(**out)

    def _one_layer(self, kind, layer_cfg, query, query_vec, limit,
                   reranker_min_score, group_ids, filters, center_uuid,
                   origin_uuids) -> pd.DataFrame | None:
        layer = self._layer(kind)
        if layer is None or layer_cfg is None:
            return None
        methods = list(layer_cfg.methods)
        reranker = layer_cfg.reranker
        if not layer.has_emb:
            methods = [m for m in methods if m != "cosine"]
            if reranker == "mmr":
                reranker = "rrf"   # same degradation as _one_layer
        if not methods:
            return None
        mask = self._mask(kind, group_ids, filters)
        results: list[pd.DataFrame] = []
        if "bm25" in methods:
            results.append(layer.bm25(mask, query, 2 * limit))
        if "cosine" in methods:
            results.append(layer.cosine(mask, query_vec,
                                        layer_cfg.sim_min_score, 2 * limit))
        if "bfs" in methods and self._tables["edge"] is not None \
                and origin_uuids:
            results.append(self._bfs(origin_uuids,
                                     layer_cfg.bfs_max_depth, group_ids))
        fused = self._rerank(layer, reranker, results, query, query_vec,
                             layer_cfg.mmr_lambda, limit, center_uuid,
                             group_ids)
        if reranker_min_score:
            fused = fused[fused["score"] >= reranker_min_score]
        fused = fused.head(limit)
        # hydrate: positional take of the ≤limit fused rows (uuids not in
        # the layer table — e.g. bfs edge uuids fused into a node layer —
        # drop, exactly like the Spark broadcast-join hydration; a full
        # merge would hash the whole layer table per query)
        present = fused["uuid"].map(layer._uuid_to_idx).notna()
        fused = fused[present]
        pos = [layer._uuid_to_idx[u] for u in fused["uuid"]]
        hyd = layer.rows.iloc[pos].reset_index(drop=True)
        hyd["score"] = fused["score"].to_numpy()
        return hyd.sort_values(["score", "uuid"],
                               ascending=[False, True],
                               ignore_index=True)

    def _rerank(self, layer, reranker, results, query, query_vec,
                mmr_lambda, limit, center_uuid, group_ids) -> pd.DataFrame:
        if reranker == "rrf":
            parts: dict = {}
            for res in results:
                ranked = res.sort_values(["score", "uuid"],
                                         ascending=[False, True],
                                         ignore_index=True)
                for rank, u in enumerate(ranked["uuid"]):
                    parts[u] = parts.get(u, 0.0) + 1.0 / (rank + 1)
            return _sorted_scores(list(parts.keys()), list(parts.values()))
        cand = list(dict.fromkeys(
            u for res in results for u in res["uuid"]))
        if reranker == "mmr":
            # inner join with the layer table, sorted by uuid — the same
            # deterministic tie-break order as mmr_rerank
            present = sorted(u for u in cand if u in layer._uuid_to_idx)
            if not present:
                return pd.DataFrame({"uuid": [], "score": []})
            idx = [layer._uuid_to_idx[u] for u in present]
            sel, scores = _mmr_greedy(layer.emb[idx], query_vec,
                                      mmr_lambda, limit)
            return pd.DataFrame({"uuid": [present[i] for i in sel],
                                 "score": scores})
        if reranker == "episode_mentions":
            counts = self._mentions()
            return _sorted_scores(cand,
                                  [counts.get(u, 0.0) for u in cand])
        if reranker == "node_distance":
            adj = self._adjacency(group_ids)
            neigh = {dst for dst, _eu in adj.get(center_uuid, ())}
            return _sorted_scores(
                cand, [10.0 if u == center_uuid
                       else (1.0 if u in neigh else 0.0) for u in cand])
        if reranker == "cross_encoder":
            q_set = set(_query_tokens(query))
            if not q_set:
                return pd.DataFrame({"uuid": [], "score": []})
            present = [u for u in cand if u in layer._uuid_to_idx]
            scores = [len(layer.tok_sets[layer._uuid_to_idx[u]] & q_set)
                      / float(len(q_set)) for u in present]
            return _sorted_scores(present, scores)
        raise ValueError(f"unknown reranker {reranker}")


def export_search_artifacts(out_dir: str, edges=None, nodes=None,
                            episodes=None, communities=None,
                            episodic_edges=None) -> str:
    """Spark-side export job: snapshot the layer tables as parquet under
    ``out_dir`` (one subdirectory per table — the point-lookup store's
    load format; at scale, partition the writes by ``group_id`` and load
    one shard per ServedGraph)."""
    for name, df in zip(_ARTIFACTS,
                        (edges, nodes, episodes, communities,
                         episodic_edges)):
        if df is not None:
            df.write.mode("overwrite").parquet(
                os.path.join(out_dir, name))
    return out_dir
