"""M7 community-detection tests: label propagation fixpoint + plurality
semantics (community_operations.py:77-122), summarize-reduce determinism."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators import communities as C

RUN_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _graph(spark, edge_rows, nodes):
    edges = spark.createDataFrame(
        [(f"e{i}", "g", s, d) for i, (s, d) in enumerate(edge_rows)],
        ["uuid", "group_id", "source_node_uuid", "target_node_uuid"])
    ents = spark.createDataFrame(
        [(n, n.upper(), "g", f"summary of {n}") for n in nodes],
        ["uuid", "name", "group_id", "summary"])
    return ents, edges


def test_two_cliques_two_communities(spark):
    # triangle a-b-c + triangle x-y-z, joined by nothing
    ents, edges = _graph(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z")],
        ["a", "b", "c", "x", "y", "z"])
    labels = C.label_propagation(ents, edges).collect()
    by = {r["uuid"]: r["community"] for r in labels}
    assert by["a"] == by["b"] == by["c"]
    assert by["x"] == by["y"] == by["z"]
    assert by["a"] != by["x"]


def test_isolated_node_keeps_own_label(spark):
    ents, edges = _graph(spark, [("a", "b")], ["a", "b", "lonely"])
    by = {r["uuid"]: r["community"]
          for r in C.label_propagation(ents, edges).collect()}
    assert by["lonely"] == "lonely"
    assert by["a"] == by["b"]


def test_edge_multiplicity_weights_votes(spark):
    # b is pulled both ways; a-b has multiplicity 3, b-c multiplicity 1,
    # so b must land in a's community.
    ents, edges = _graph(
        spark,
        [("a", "b"), ("a", "b"), ("a", "b"), ("b", "c"),
         ("c", "d"), ("c", "d"), ("d", "c")],
        ["a", "b", "c", "d"])
    by = {r["uuid"]: r["community"]
          for r in C.label_propagation(ents, edges).collect()}
    assert by["a"] == by["b"]
    assert by["c"] == by["d"]


def test_build_communities_rollup(spark):
    ents, edges = _graph(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")],
        ["a", "b", "c", "x", "y"])
    comms, comm_edges = C.build_communities(ents, edges, RUN_TS)
    rows = comms.collect()
    assert {r["n_members"] for r in rows} == {3, 2}
    # summaries are ordered member concat
    big = next(r for r in rows if r["n_members"] == 3)
    assert big["summary"] == "summary of a summary of b summary of c"
    # HAS_MEMBER edges: one per member, pointing community → entity
    assert comm_edges.count() == 5
    orphan = (comm_edges.join(
        comms.select(F.col("uuid").alias("source_node_uuid")),
        "source_node_uuid", "left_anti").count())
    assert orphan == 0


def test_label_propagation_deterministic(spark):
    ents, edges = _graph(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        ["a", "b", "c", "d"])
    l1 = sorted(map(tuple, C.label_propagation(ents, edges).collect()))
    l2 = sorted(map(tuple, C.label_propagation(
        ents.repartition(7), edges.repartition(5)).collect()))
    assert l1 == l2
