"""PageRank operator (operators/graph.py) vs a pure-Python reference loop."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.graph import pagerank


def ref_pagerank(edges, iters, damping=0.85, undirected=True):
    """Textbook synchronous PageRank on a python edge list [(src, dst)]."""
    es = set(edges)
    if undirected:
        es |= {(d, s) for s, d in es}
    nodes = sorted({n for e in es for n in e})
    n = len(nodes)
    deg = {v: 0 for v in nodes}
    for s, _ in es:
        deg[s] += 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inc = {v: 0.0 for v in nodes}
        for s, d in es:
            inc[d] += rank[s] / deg[s]
        rank = {v: (1.0 - damping) / n + damping * inc[v] for v in nodes}
    return rank


def _run(spark, edges, key_rows, **kw):
    df = spark.createDataFrame(key_rows, "group_id string, src string, dst string")
    out = pagerank(df, src="src", dst="dst", **kw)
    return {(r["group_id"], r["node"]): r["rank"] for r in out.collect()}


def test_matches_reference_random_graph(spark):
    rng = random.Random(7)
    edges = sorted({(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
                    for _ in range(30)})
    edges = [(s, d) for s, d in edges if s != d]
    got = _run(spark, edges, [("g", s, d) for s, d in edges], iters=6)
    want = ref_pagerank(edges, iters=6)
    assert set(got) == {("g", v) for v in want}
    for (g, v), r in got.items():
        assert r == pytest.approx(want[v], abs=1e-12)


def test_per_key_graphs_are_independent(spark):
    rows = [("a", "x", "y"), ("a", "x", "z"),   # star in group a
            ("b", "x", "y")]                     # pair in group b, same names
    got = _run(spark, None, rows, iters=3)
    want_a = ref_pagerank([("x", "y"), ("x", "z")], iters=3)
    want_b = ref_pagerank([("x", "y")], iters=3)
    for v, r in want_a.items():
        assert got[("a", v)] == pytest.approx(r, abs=1e-12)
    for v, r in want_b.items():
        assert got[("b", v)] == pytest.approx(r, abs=1e-12)


def test_rank_mass_conserved_undirected(spark):
    rows = [("g", "a", "b"), ("g", "b", "c"), ("g", "c", "a"), ("g", "c", "d")]
    got = _run(spark, None, rows, iters=8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_directed_dangling_node_keeps_base(spark):
    # d has no out-edges in directed mode: its mass drops, others' ranks
    # still match the same simplification in the reference loop.
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    got = _run(spark, None, [("g", s, d) for s, d in edges],
               iters=5, undirected=False)
    want = ref_pagerank(edges, iters=5, undirected=False)
    for v, r in want.items():
        assert got[("g", v)] == pytest.approx(r, abs=1e-12)


def test_global_mode_without_key(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = pagerank(df, iters=4, key=None, src="src", dst="dst")
    assert set(out.columns) == {"node", "rank"}
    got = {r["node"]: r["rank"] for r in out.collect()}
    want = ref_pagerank([("a", "b"), ("b", "c")], iters=4)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-12)


# ---------------------------------------------------------------- triangles

from graphiti_spark.operators.graph import triangle_count  # noqa: E402


def ref_triangles(edges):
    """Brute-force: count id-ordered closed triples a<b<c."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in es for n in e})
    cnt = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes[nodes.index(b) + 1:]:
                if (a, c) in es and (b, c) in es:
                    cnt += 1
    return cnt


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_triangle_count_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    groups = {}
    rows = []
    for g in ("g0", "g1"):
        n = rng.randint(8, 14)
        es = {(f"{g}n{rng.randrange(n)}", f"{g}n{rng.randrange(n)}")
              for _ in range(40)}
        # add reversed + exact duplicates: the operator must dedup both
        rows += [(g, s, d) for s, d in es] + \
                [(g, d, s) for s, d in list(es)[:10]]
        groups[g] = ref_triangles(es)
    df = spark.createDataFrame(
        rows, "group_id string, source_node_uuid string, "
              "target_node_uuid string")
    got = {r["group_id"]: r["n_triangles"]
           for r in triangle_count(df).collect()}
    want = {g: c for g, c in groups.items() if c > 0}
    assert got == want


def test_triangle_count_global_and_empty(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "source_node_uuid string, target_node_uuid string")
    assert triangle_count(df, key=None).collect()[0]["n_triangles"] == 1
    tri_free = spark.createDataFrame(
        [("x", "y"), ("y", "z")],
        "source_node_uuid string, target_node_uuid string")
    assert triangle_count(tri_free, key=None).count() == 0
