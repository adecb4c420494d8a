"""MERGE-shaped writer (sources/merge.py): upsert/insert/delete-slice
semantics, MERGE plan row sets, snapshot-commit crash safety, and the
integration that motivates it — landing incremental_update_entity's
``delta_only`` output as a row-level merge that equals the full rebuild."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.incremental import incremental_update_entity
from graphiti_spark.plans.pipeline import build_graph
from graphiti_spark.sources import merge as MG
from graphiti_spark.sources.merge import MergeWriter, merge_plan

RUN_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
          " tool string, ts timestamp")


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", t, None, datetime(2024, 1, 1, h)) for c, i, t, h
         in rows], SCHEMA)


BASE = [
    ("c1", 0, "Alice works at Acme Corp.", 0),
    ("c1", 1, "Alice lives in Paris.", 1),
    ("c2", 0, "Bob Jones works at Globex.", 0),
    ("c3", 0, "Carol works at Initech.", 0),
]

NEW = [
    ("c1", 2, "Alice works at Acme Corp.", 2),
    ("c1", 3, "Alice works at Hooli.", 3),
    ("c2", 1, "Bob Jones no longer works at Globex.", 1),
    ("c2", 2, "Dave works at Globex.", 2),
]


def _rows(df, cols=("k", "v")):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_merge_upsert_insert_delete(spark, tmp_path):
    w = MergeWriter(spark, str(tmp_path), "t", key_cols=("k",))
    assert w.read() is None
    w.full(spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"))
    # upsert b, insert d; delete-scope covers c (not re-asserted -> gone)
    # and b (re-asserted -> survives with the new value)
    upd = spark.createDataFrame([("b", 20), ("d", 4)], "k string, v int")
    scope = spark.createDataFrame([("b",), ("c",)], "k string")
    w.merge(upd, delete_keys=scope)
    assert _rows(w.read()) == {("a", 1), ("b", 20), ("d", 4)}


def test_merge_plan_row_sets(spark, tmp_path):
    w = MergeWriter(spark, str(tmp_path), "t", key_cols=("k",))
    upd = spark.createDataFrame([("b", 20), ("d", 4)], "k string, v int")
    # empty target: everything is an insert
    p0 = merge_plan(None, upd, ["k"])
    assert p0["matched"].count() == 0 and p0["not_matched"].count() == 2
    w.full(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"))
    p = w.plan(upd)
    assert _rows(p["matched"]) == {("b", 20)}
    assert _rows(p["not_matched"]) == {("d", 4)}


def test_snapshot_gc_keeps_rollback_margin(spark, tmp_path):
    import os
    w = MergeWriter(spark, str(tmp_path), "t", key_cols=("k",))
    for i in range(4):
        w.merge(spark.createDataFrame([("a", i)], "k string, v int"))
    vs = sorted(d for d in os.listdir(w.dir) if d.startswith("v"))
    assert vs == ["v3", "v4"] and w.current_version() == 4
    assert _rows(w.read()) == {("a", 3)}


def test_kill_mid_commit_preserves_snapshot_and_resumes(
        spark, tmp_path, monkeypatch):
    """Kill the process between the version-dir write and the pointer
    swap: readers still see the previous snapshot; re-running the same
    merge (the resume contract — deterministic from inputs) converges to
    the uninterrupted result."""
    w = MergeWriter(spark, str(tmp_path), "t", key_cols=("k",))
    w.full(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"))
    upd = spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int")

    real_replace = MG.os.replace
    def boom(src, dst):
        raise OSError("killed mid-commit")
    monkeypatch.setattr(MG.os, "replace", boom)
    with pytest.raises(OSError, match="killed"):
        w.merge(upd)
    monkeypatch.setattr(MG.os, "replace", real_replace)

    # the half-committed version is invisible: still snapshot v1
    assert w.current_version() == 1
    assert _rows(w.read()) == {("a", 1), ("b", 2)}
    # resume = re-run the merge; orphaned v2 dir is reclaimed
    w.merge(upd)
    assert w.current_version() == 2
    assert _rows(w.read()) == {("a", 1), ("b", 20), ("c", 3)}


def test_incremental_delta_lands_via_merge_equals_rebuild(spark, tmp_path):
    """The delta_only output of the entity-granular micro-batch, applied
    through MergeWriter (entities: upsert-on-uuid; edges: replace the
    affected (group_id, source_node_uuid) slice), reproduces the fully
    merged tables — i.e. an Iceberg MERGE driven by the delta is exact."""
    base = _turns(spark, BASE)
    new = _turns(spark, NEW)
    g0 = build_graph(spark, base, run_ts=RUN_TS)

    ents_w = MergeWriter(spark, str(tmp_path), "entities",
                         key_cols=("uuid",))
    edges_w = MergeWriter(spark, str(tmp_path), "edges", key_cols=("uuid",))
    ents_w.full(g0.entities)
    edges_w.full(g0.edges)

    keys, d_ents, d_edges = incremental_update_entity(
        spark, new, base, g0.entities, g0.edges, RUN_TS, delta_only=True)
    ents_w.merge(d_ents.select(g0.entities.columns))
    edges_w.merge(d_edges.select(g0.edges.columns), delete_keys=keys)

    _, m_ents, m_edges = incremental_update_entity(
        spark, new, base, g0.entities, g0.edges, RUN_TS)
    want_e = {(r["uuid"], r["summary"], tuple(r["member_uuids"] or []))
              for r in m_ents.collect()}
    got_e = {(r["uuid"], r["summary"], tuple(r["member_uuids"] or []))
             for r in ents_w.read().collect()}
    assert got_e == want_e
    cols = ["uuid", "source_node_uuid", "name", "target_node_uuid"]
    assert _rows(edges_w.read(), cols) == _rows(m_edges, cols)
    assert edges_w.read().count() == m_edges.count()


def test_corrupt_pointer_raises_instead_of_empty(spark, tmp_path):
    # a readable-but-corrupt pointer must raise: mapping it to None
    # would make the next merge treat the table as empty, commit a
    # v1 containing only the micro-batch, and GC the live snapshot —
    # silent truncation. Only a genuinely-missing pointer means "new".
    w = MergeWriter(spark, str(tmp_path), "t", key_cols=("k",))
    assert w.current_version() is None
    w.full(spark.createDataFrame([("a", 1)], "k string, v int"))
    assert w.current_version() == 1
    with open(w._pointer_path(), "w") as f:
        f.write("{ not json")
    with pytest.raises(ValueError):
        w.current_version()
