"""M6 search-layer tests (SURVEY.md §2.9): BM25-lite ranking, cosine
search, BFS, rerankers, filter compiler, hybrid fan-out."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions import text as tx
from graphiti_spark.operators import search as S


@pytest.fixture(scope="module")
def edges_df(spark):
    rows = [
        # uuid, src, dst, name, fact
        ("e1", "alice", "acme", "WORKS_AT", "Alice Smith works at Acme Corp"),
        ("e2", "bob", "globex", "WORKS_AT", "Bob Jones works at Globex"),
        ("e3", "alice", "paris", "LIVES_IN", "Alice Smith lives in Paris"),
        ("e4", "carol", "acme", "CEO_OF", "Carol Chen is the CEO of Acme Corp"),
    ]
    df = spark.createDataFrame(
        rows, ["uuid", "source_node_uuid", "target_node_uuid", "name", "fact"])
    emb = F.udf(lambda s: tx.embed_text(s).tolist(), "array<float>")
    return df.withColumn("fact_embedding", emb(F.lower("fact"))).cache()


def test_bm25_ranks_matching_fact_first(spark, edges_df):
    out = S.bm25_lite_search(edges_df, "fact", "alice acme").collect()
    assert out[0]["uuid"] == "e1"            # matches both query tokens
    uuids = [r["uuid"] for r in out]
    assert "e2" not in uuids                 # shares no query token
    assert all(out[i]["score"] >= out[i + 1]["score"]
               for i in range(len(out) - 1))


def test_bm25_empty_query(spark, edges_df):
    assert S.bm25_lite_search(edges_df, "fact", "???").count() == 0


def test_similarity_search_threshold_and_order(spark, edges_df):
    qv = tx.embed_text("alice smith works at acme corp").tolist()
    out = S.similarity_search(edges_df, "fact_embedding", qv,
                              min_score=0.3).collect()
    assert out and out[0]["uuid"] == "e1"
    assert all(r["score"] > 0.3 for r in out)
    # a high threshold filters everything except the near-exact match
    strict = S.similarity_search(edges_df, "fact_embedding", qv,
                                 min_score=0.95).collect()
    assert [r["uuid"] for r in strict] == ["e1"]


def test_bfs_search_depth_and_hops(spark, edges_df):
    out = {r["uuid"]: r["hops"]
           for r in S.bfs_search(edges_df, ["alice"], depth=2).collect()}
    assert out["e1"] == 1 and out["e3"] == 1     # alice's own edges
    assert out["e4"] == 2                         # via acme
    assert "e2" not in out                        # disconnected component
    d1 = {r["uuid"] for r in S.bfs_search(edges_df, ["alice"], 1).collect()}
    assert d1 == {"e1", "e3"}


def test_bfs_dense_frontier(spark):
    """Hub-and-spoke graph: the hop-1 frontier is 500 nodes wide — deeper
    hops must run the unhinted equi-join path (no forced broadcast, the
    driver-OOM shape at scale) and still return exact hop counts."""
    n = 500
    rows = [(f"e{i}", "hub", f"leaf{i}") for i in range(n)] + \
           [(f"x{i}", f"leaf{i}", f"deep{i}") for i in range(n)]
    edges = spark.createDataFrame(
        rows, ["uuid", "source_node_uuid", "target_node_uuid"])
    out = {r["uuid"]: r["hops"]
           for r in S.bfs_search(edges, ["hub"], depth=2).collect()}
    assert sum(1 for h in out.values() if h == 1) == n
    assert sum(1 for h in out.values() if h == 2) == n


def test_rrf_exact_scores(spark):
    a = spark.createDataFrame([("x", 3.0), ("y", 2.0)], ["uuid", "score"])
    b = spark.createDataFrame([("y", 9.0), ("z", 1.0)], ["uuid", "score"])
    got = {r["uuid"]: r["score"] for r in S.rrf([a, b]).collect()}
    # ranks are 0-based with rank_const=1: x:1/1, y:1/2+1/1, z:1/2
    assert got == {"x": 1.0, "y": 1.5, "z": 0.5}


def test_episode_mentions_reranker(spark):
    epi = spark.createDataFrame(
        [("m1", "ep1", "alice"), ("m2", "ep2", "alice"), ("m3", "ep1", "bob")],
        ["uuid", "source_node_uuid", "target_node_uuid"])
    cands = spark.createDataFrame([("alice",), ("bob",), ("carol",)], ["uuid"])
    out = [(r["uuid"], r["score"])
           for r in S.episode_mentions_reranker(epi, cands).collect()]
    assert out == [("alice", 2.0), ("bob", 1.0), ("carol", 0.0)]


def test_node_distance_reranker(spark, edges_df):
    cands = spark.createDataFrame(
        [("alice",), ("acme",), ("globex",)], ["uuid"])
    out = {r["uuid"]: r["score"]
           for r in S.node_distance_reranker(edges_df, cands, "alice").collect()}
    assert out["alice"] == 10.0      # center: dist 0.1 → score 10
    assert out["acme"] == 1.0        # 1-hop
    assert out["globex"] == 0.0      # unreachable in 1 hop


def test_mmr_prefers_relevant_then_diverse(spark, edges_df):
    qv = tx.embed_text("alice smith works at acme corp").tolist()
    out = S.mmr_rerank(edges_df.select("uuid", "fact_embedding"),
                       "fact_embedding", qv, limit=3).collect()
    assert out[0]["uuid"] == "e1"    # most relevant first
    assert len(out) == 3


def test_filter_compiler(spark):
    t1 = datetime(2024, 1, 1)
    rows = [("a", "WORKS_AT", datetime(2023, 6, 1), None),
            ("b", "WORKS_AT", datetime(2024, 6, 1), None),
            ("c", "LIVES_IN", datetime(2023, 6, 1), datetime(2024, 2, 1))]
    df = spark.createDataFrame(
        rows, "uuid string, name string, valid_at timestamp,"
              " invalid_at timestamp")
    f = S.SearchFilters(
        edge_types=["WORKS_AT"],
        date_groups=[[S.DateFilter("valid_at", "<", t1)],
                     [S.DateFilter("invalid_at", "is_not_null")]])
    got = {r["uuid"] for r in df.where(S.compile_filters(f, "edge")).collect()}
    assert got == {"a"}   # b fails both date groups; c fails edge_types


def test_hybrid_search_rrf_end_to_end(spark, edges_df):
    qv = tx.embed_text("alice smith works at acme corp").tolist()
    out = S.hybrid_search(edges_df, "fact", "fact_embedding",
                          "Alice Acme", qv,
                          config=S.SearchConfig(["bm25", "cosine"], "rrf",
                                                limit=3, min_score=0.2))
    rows = out.collect()
    assert rows[0]["uuid"] == "e1"   # top in both methods → top fused
    assert len(rows) <= 3


def test_cross_encoder_rank_lexical_overlap(spark, edges_df):
    out = S.cross_encoder_rank(edges_df, "fact",
                               "Alice Smith Acme").collect()
    # e1 shares all 3 query tokens → score 1.0; e2 shares none → 0.0
    scores = {r["uuid"]: r["score"] for r in out}
    assert scores["e1"] == 1.0
    assert scores["e2"] == 0.0
    assert out[0]["uuid"] == "e1"
    assert S.cross_encoder_rank(edges_df, "fact", "???").count() == 0


def test_hybrid_search_cross_encoder(spark, edges_df):
    qv = tx.embed_text("alice smith works at acme corp").tolist()
    out = S.hybrid_search(
        edges_df, "fact", "fact_embedding", "Alice Acme", qv,
        config=S.COMBINED_HYBRID_SEARCH_CROSS_ENCODER).collect()
    assert out and out[0]["uuid"] == "e1"


def test_search_recipes_cover_reference_presets():
    """Q9 — every reference preset name (search_config_recipes.py:34-223)
    resolves to a SearchConfig with a dispatchable reranker."""
    names = {
        "COMBINED_HYBRID_SEARCH_RRF", "COMBINED_HYBRID_SEARCH_MMR",
        "COMBINED_HYBRID_SEARCH_CROSS_ENCODER",
        "EDGE_HYBRID_SEARCH_RRF", "EDGE_HYBRID_SEARCH_MMR",
        "EDGE_HYBRID_SEARCH_NODE_DISTANCE",
        "EDGE_HYBRID_SEARCH_EPISODE_MENTIONS",
        "EDGE_HYBRID_SEARCH_CROSS_ENCODER",
        "NODE_HYBRID_SEARCH_RRF", "NODE_HYBRID_SEARCH_MMR",
        "NODE_HYBRID_SEARCH_NODE_DISTANCE",
        "NODE_HYBRID_SEARCH_EPISODE_MENTIONS",
        "NODE_HYBRID_SEARCH_CROSS_ENCODER",
        "COMMUNITY_HYBRID_SEARCH_RRF", "COMMUNITY_HYBRID_SEARCH_MMR",
        "COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER",
    }
    assert names <= set(S.SEARCH_RECIPES)
    rerankers = {"rrf", "mmr", "cross_encoder", "node_distance",
                 "episode_mentions"}
    assert all(S.SEARCH_RECIPES[n].reranker in rerankers for n in names)


def test_search_results_to_context_string():
    s = S.search_results_to_context_string(
        edges=[{"fact": "Alice works at Acme", "valid_at": "2024-01-01",
                "invalid_at": None}],
        nodes=[{"name": "Alice", "summary": "Works at Acme."}],
        episodes=[{"source_description": "", "content": "user: hi"}],
        communities=[{"name": "Acme", "summary": "The Acme cluster."}])
    assert "<FACTS>" in s and "</COMMUNITIES>" in s
    assert "Present" in s            # open fact renders invalid_at=Present
    assert "Alice works at Acme" in s and "The Acme cluster." in s


def test_hybrid_search_with_bfs_method(spark, edges_df):
    qv = tx.embed_text("carol ceo acme").tolist()
    out = S.hybrid_search(
        edges_df, "fact", "fact_embedding", "Carol CEO", qv,
        config=S.SearchConfig(["bm25", "cosine", "bfs"], "rrf", limit=4,
                              min_score=0.2),
        edges=edges_df, origin_uuids=["carol"])
    assert {r["uuid"] for r in out.collect()} >= {"e4"}


def test_bm25_length_normalization(spark):
    """b=0.75 (Lucene default) penalizes long docs; b=0 recovers the
    un-normalized scorer. Checked against the closed-form BM25 weight."""
    import math
    docs = [("short", "alice"),
            ("long", "alice " + " ".join(f"filler{i}" for i in range(20)))]
    df = spark.createDataFrame(docs, ["uuid", "text"])
    out = {r["uuid"]: r["score"]
           for r in S.bm25_lite_search(df, "text", "alice").collect()}
    assert out["short"] > out["long"]
    # closed form: idf = ln((N - df + .5)/(df + .5) + 1); N=2, df=2
    k1, b = 1.2, 0.75
    idf = math.log((2 - 2 + 0.5) / (2 + 0.5) + 1.0)
    avgdl = (1 + 21) / 2
    for uuid, dl in (("short", 1.0), ("long", 21.0)):
        w = idf * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * dl / avgdl))
        assert abs(out[uuid] - w) < 1e-9
    # b=0: both docs have tf=1 → identical scores
    flat = {r["uuid"]: r["score"]
            for r in S.bm25_lite_search(df, "text", "alice", b=0.0).collect()}
    assert abs(flat["short"] - flat["long"]) < 1e-12


def test_mmr_grouped_matches_driver_path(spark):
    """F5 as a grouped pandas UDF: a 100-query batch runs distributed
    (FlatMapGroupsInPandas in the plan, no driver collect) and each
    query's selection equals the single-query driver-path MMR."""
    import random
    rng = random.Random(7)
    cand_rows, query_rows = [], []
    for q in range(100):
        qv = [rng.uniform(-1, 1) for _ in range(8)]
        query_rows.append((q, qv))
        for c in range(12):
            emb = [rng.uniform(-1, 1) for _ in range(8)]
            cand_rows.append((q, f"q{q}c{c}", emb))
    cands = spark.createDataFrame(
        cand_rows, "query_id int, uuid string, embedding array<double>")
    queries = spark.createDataFrame(
        query_rows, "query_id int, query_vec array<double>")
    grouped = S.mmr_rerank_grouped(cands, queries, limit=5)
    assert "FlatMapGroupsInPandas" in grouped._jdf.queryExecution() \
        .executedPlan().toString()
    rows = grouped.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(100))
    for q, rs in by_q.items():
        assert [r["rn"] for r in sorted(rs, key=lambda r: r["rn"])] == \
            list(range(1, 6))
    # spot-check equivalence with the driver-side single-query path
    for q in (0, 37, 99):
        single = S.mmr_rerank(
            cands.where(F.col("query_id") == q).select("uuid", "embedding"),
            "embedding", query_rows[q][1], limit=5).collect()
        batch = sorted(by_q[q], key=lambda r: r["rn"])
        assert [r["uuid"] for r in single] == [r["uuid"] for r in batch]
        for a, c in zip(single, batch):
            assert abs(a["score"] - c["score"]) < 1e-9


# ---------------------------------------------------------------------------
# Composite 4-layer search (search/search.py:66-162 fidelity)
# ---------------------------------------------------------------------------

from graphiti_spark.operators import composite_search as CS


@pytest.fixture(scope="module")
def graph_layers(spark):
    """Tiny 4-table graph: edges + nodes + episodes + communities, all
    mentioning 'alice'/'acme' so every layer has hits."""
    emb = F.udf(lambda s: tx.embed_text(s).tolist(), "array<float>")
    edges = spark.createDataFrame(
        [("e1", "g1", "alice", "acme", "WORKS_AT",
          "Alice Smith works at Acme Corp"),
         ("e2", "g1", "bob", "globex", "WORKS_AT",
          "Bob Jones works at Globex"),
         ("e3", "g2", "alice", "paris", "LIVES_IN",
          "Alice Smith lives in Paris")],
        ["uuid", "group_id", "source_node_uuid", "target_node_uuid",
         "name", "fact"]).withColumn(
        "fact_embedding", emb(F.lower("fact")))
    nodes = spark.createDataFrame(
        [("alice", "g1", "Alice Smith", ["Person"]),
         ("acme", "g1", "Acme Corp", ["Organization"]),
         ("bob", "g1", "Bob Jones", ["Person"])],
        "uuid string, group_id string, name string, labels array<string>"
    ).withColumn("name_embedding", emb(F.lower("name")))
    episodes = spark.createDataFrame(
        [("ep1", "g1", "user: Alice Smith works at Acme Corp."),
         ("ep2", "g1", "user: Bob Jones works at Globex.")],
        ["uuid", "group_id", "content"])
    communities = spark.createDataFrame(
        [("c1", "g1", "Alice Smith",
          "Alice Smith works at Acme Corp. Alice Smith lives in Paris")],
        ["uuid", "group_id", "name", "summary"]).withColumn(
        "name_embedding", emb(F.lower("summary")))
    return {"edges": edges.cache(), "nodes": nodes.cache(),
            "episodes": episodes.cache(), "communities": communities.cache()}


def test_composite_search_all_four_layers(spark, graph_layers):
    """COMBINED_HYBRID_SEARCH_RRF fans out to all four layers in one call,
    each reranked independently, per-layer limit honored."""
    qv = tx.embed_text("alice smith works at acme corp").tolist()
    cfg = CS.COMBINED_HYBRID_SEARCH_RRF
    res = CS.search("alice acme", qv, cfg, **graph_layers)
    assert res.edges is not None and res.nodes is not None
    assert res.episodes is not None and res.communities is not None
    e = res.edges.collect()
    assert e[0]["uuid"] == "e1" and "fact" in res.edges.columns
    assert [r["uuid"] for r in res.episodes.collect()] == ["ep1"]
    assert [r["uuid"] for r in res.communities.collect()] == ["c1"]
    n = res.nodes.collect()
    assert {r["uuid"] for r in n} >= {"alice", "acme"}
    for layer in (res.edges, res.nodes, res.episodes, res.communities):
        assert layer.count() <= cfg.limit
        scores = [r["score"] for r in layer.collect()]
        assert scores == sorted(scores, reverse=True)


def test_composite_search_limit_and_group_scope(spark, graph_layers):
    qv = tx.embed_text("alice").tolist()
    cfg = CS.CompositeSearchConfig(
        edge_config=CS.LayerConfig(["bm25", "cosine"], "rrf"), limit=1)
    res = CS.search("alice", qv, cfg, **graph_layers)
    assert res.edges.count() == 1
    assert res.nodes is None           # no node_config in the preset
    # group scoping (search.py:91): only g2 edges considered
    res2 = CS.search("alice", qv, cfg, group_ids=["g2"], **graph_layers)
    assert [r["uuid"] for r in res2.edges.collect()] == ["e3"]
    # blank query -> empty bundle (search.py:83-84)
    empty = CS.search("  ", qv, cfg, **graph_layers)
    assert empty.edges is None


def test_composite_search_single_layer_presets(spark, graph_layers):
    qv = tx.embed_text("alice").tolist()
    res = CS.search("alice", qv, CS.COMMUNITY_HYBRID_SEARCH_RRF,
                    **graph_layers)
    assert res.edges is None and res.nodes is None and res.episodes is None
    assert [r["uuid"] for r in res.communities.collect()] == ["c1"]
    # all 16 reference preset names exist at full nesting fidelity
    assert len(CS.COMPOSITE_RECIPES) == 16
    combined = CS.COMPOSITE_RECIPES["COMBINED_HYBRID_SEARCH_CROSS_ENCODER"]
    assert "bfs" in combined.edge_config.methods
    assert combined.episode_config.methods == ["bm25"]
    assert CS.COMPOSITE_RECIPES["COMBINED_HYBRID_SEARCH_MMR"] \
        .node_config.mmr_lambda == 1.0


def test_composite_search_degrades_without_embeddings(spark, graph_layers):
    """A layer table without its embedding column (with_embeddings=False
    pipeline) falls back to lexical methods instead of failing."""
    qv = tx.embed_text("alice").tolist()
    cfg = CS.CompositeSearchConfig(
        edge_config=CS.LayerConfig(["bm25", "cosine"], "rrf"))
    bare = graph_layers["edges"].drop("fact_embedding")
    res = CS.search("alice", qv, cfg, edges=bare)
    # bm25-only now: e3's shorter fact outranks e1 on the tf tie (b=0.75
    # length norm); both alice edges hit, bob's does not
    assert {r["uuid"] for r in res.edges.collect()} == {"e1", "e3"}


def test_bm25_arrays_and_explode_paths_agree(spark):
    """bm25_lite_search routes short queries through the array-expression
    plan and long ones through the explode plan — both must produce
    identical (uuid, score) sets (same tf/df/N/avgdl arithmetic)."""
    docs = spark.createDataFrame(
        [(f"d{i}",
          " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 9)))
         for i in range(60)], ["uuid", "text"])
    base = docs.select(F.col("uuid").alias("_id"),
                       S.tokens_col(F.col("text")).alias("_toks"))
    q = ["w1", "w3", "w5", "w12"]
    a = {(r["uuid"], round(r["score"], 9))
         for r in S._bm25_arrays(base, q, 1.2, 0.75, 100).collect()}
    b = {(r["uuid"], round(r["score"], 9))
         for r in S._bm25_explode(base, q, 1.2, 0.75, 100).collect()}
    assert a == b and len(a) > 10
