"""Canonicalization tests: blocking recall, CC determinism vs a pure-Python
union-find oracle (``bulk_utils.py:377-414`` semantics), uuid-map transitive
compression (3→2, 2→1 ⇒ 3→1)."""

import random

from pyspark.sql import functions as F

from graphiti_spark import rules
from graphiti_spark.operators import dedup
from graphiti_spark.operators.extract import norm_name_col
from graphiti_spark.plans.pipeline import RUN_TS


def _entities_df(spark, names, group="g"):
    rows = [(rules.entity_uuid(group, n), n, group, ["Entity"],
             RUN_TS.replace(tzinfo=None), i) for i, n in enumerate(names)]
    df = spark.createDataFrame(
        rows, ["uuid", "name", "group_id", "labels", "created_at", "first_turn"])
    return df.withColumn("name_norm", norm_name_col(F.col("name")))


def test_alias_pairs_found_and_distinct_people_kept(spark):
    ents = _entities_df(spark, ["Bob Smith", "Bob", "Alice Smith", "Paris"])
    pairs = {(r["uuid_a"], r["uuid_b"])
             for r in dedup.duplicate_pairs(ents).collect()}
    bob, bobs = rules.entity_uuid("g", "Bob"), rules.entity_uuid("g", "Bob Smith")
    alice = rules.entity_uuid("g", "Alice Smith")
    assert (min(bob, bobs), max(bob, bobs)) in pairs
    # 'Alice Smith' shares the token 'smith' with 'Bob Smith' (a blocking
    # candidate) but must NOT be confirmed a duplicate.
    assert not any(alice in p for p in pairs)


def test_punctuated_alias_merges(spark):
    """Names with internal punctuation ('Coca-Cola' vs 'Coca Cola') must
    share a block and pass the duplicate rule — alnum-run tokenization on
    every path (rules.name_tokens, JVM _tok, grouped union-find)."""
    ents = _entities_df(spark, ["Coca-Cola", "Coca Cola", "Pepsi"])
    cc1 = rules.entity_uuid("g", "Coca-Cola")
    cc2 = rules.entity_uuid("g", "Coca Cola")
    pairs = {(r["uuid_a"], r["uuid_b"])
             for r in dedup.duplicate_pairs(ents).collect()}
    assert (min(cc1, cc2), max(cc1, cc2)) in pairs
    # pure-python rule agrees (single source of truth)
    assert rules.node_is_duplicate("Coca-Cola", "Coca Cola", 0.0)
    # grouped union-find (the pipeline path) merges them too
    umap = {r["uuid"]: r["canonical_uuid"]
            for r in dedup.grouped_uuid_map(ents).collect()}
    assert umap[cc1] == umap[cc2] == min(cc1, cc2)
    assert umap[rules.entity_uuid("g", "Pepsi")] == \
        rules.entity_uuid("g", "Pepsi")


def test_no_cross_group_merge(spark):
    a = _entities_df(spark, ["Bob Smith", "Bob"], group="g1")
    b = _entities_df(spark, ["Bob Smith", "Bob"], group="g2")
    pairs = dedup.duplicate_pairs(a.unionByName(b)).collect()
    assert all(r["group_id"] in ("g1", "g2") for r in pairs)
    assert len(pairs) == 2  # one within each group, none across


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)  # lexicographic-min canonical


def test_cc_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [(a, b) for a, b in
             ((rng.choice(nodes), rng.choice(nodes)) for _ in range(45))
             if a != b]
    uf = _UF()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    want = {n: uf.find(n) for n in nodes}

    v = spark.createDataFrame([(n,) for n in nodes], ["uuid"])
    p = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["uuid_a", "uuid_b"])
    got = {r["uuid"]: r["component"]
           for r in dedup.connected_components(v, p).collect()}
    assert got == want


def test_uuid_map_transitive_compression(spark):
    """bulk_utils.py:270,359 — chains compress to the root canonical."""
    v = spark.createDataFrame([("a",), ("b",), ("c",)], ["uuid"])
    p = spark.createDataFrame([("b", "c"), ("a", "b")], ["uuid_a", "uuid_b"])
    got = {r["uuid"]: r["component"]
           for r in dedup.connected_components(v, p).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_resolve_edge_pointers_drops_self_loops(spark):
    edges = spark.createDataFrame(
        [("e1", "x", "y"), ("e2", "x", "z")],
        ["uuid", "source_node_uuid", "target_node_uuid"])
    umap = spark.createDataFrame(
        [("x", "x"), ("y", "x"), ("z", "z")], ["uuid", "canonical_uuid"])
    out = dedup.resolve_edge_pointers(edges, umap).collect()
    # e1 becomes x→x (self) and is dropped; e2 stays x→z
    assert [(r["uuid"], r["source_node_uuid"], r["target_node_uuid"])
            for r in out] == [("e2", "x", "z")]
