"""Temporal-semantics contract tests (SURVEY.md §2.7 T1/T2).

Ports the reference's six behavioral cases
(``tests/utils/maintenance/test_temporal_operations_int.py:96-264``) onto the
deterministic window-based versioning: contradictions must invalidate the
right edge and nothing else.
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.versioning import apply_versioning, dedupe_edges
from graphiti_spark.plans.pipeline import RUN_TS


def _ts(day: int, hour: int = 0):
    return datetime(2024, 1, day, hour, tzinfo=timezone.utc)


def _edges_df(spark, rows):
    """rows: (src, pred, dst, valid_at|None, invalid_at|None, turn_idx)"""
    data = [
        ("e%02d" % i, "g", s, d, p, f"{s} {p} {d}", s, d, "ep%02d" % i,
         ti, RUN_TS.replace(tzinfo=None),
         v.replace(tzinfo=None) if v else None,
         iv.replace(tzinfo=None) if iv else None)
        for i, (s, p, d, v, iv, ti) in enumerate(rows)
    ]
    schema = ("uuid string, group_id string, source_node_uuid string, "
              "target_node_uuid string, pred string, fact string, "
              "subj string, obj string, episode_uuid string, turn_idx int, "
              "created_at timestamp, valid_at timestamp, invalid_at timestamp")
    return spark.createDataFrame(data, schema)


def _run(spark, rows):
    out = apply_versioning(dedupe_edges(_edges_df(spark, rows)), RUN_TS)
    return {
        (r["source_node_uuid"], r["name"], r["target_node_uuid"]):
            (r["valid_at"], r["invalid_at"], r["expired_at"])
        for r in out.where(F.col("valid_at").isNotNull()).collect()
    }


def test_sentiment_flip_invalidates_earlier(spark):
    """'Alice likes Bob' then 'Alice dislikes Bob' → first edge invalidated
    at the second's valid_at, expired_at stamped; second stays open."""
    got = _run(spark, [
        ("alice", "LIKES", "bob", _ts(1), None, 0),
        ("alice", "DISLIKES", "bob", _ts(2), None, 1),
    ])
    v, iv, ex = got[("alice", "LIKES", "bob")]
    assert iv == _ts(2).replace(tzinfo=None)
    assert ex == RUN_TS.replace(tzinfo=None)
    assert got[("alice", "DISLIKES", "bob")][1] is None


def test_sentiment_unrelated_target_not_invalidated(spark):
    got = _run(spark, [
        ("alice", "LIKES", "bob", _ts(1), None, 0),
        ("alice", "DISLIKES", "carol", _ts(2), None, 1),
    ])
    assert got[("alice", "LIKES", "bob")][1] is None
    assert got[("alice", "DISLIKES", "carol")][1] is None


def test_functional_pred_supersedes(spark):
    """Job change: later WORKS_AT with a different org closes the earlier."""
    got = _run(spark, [
        ("alice", "WORKS_AT", "acme", _ts(1), None, 0),
        ("alice", "WORKS_AT", "globex", _ts(5), None, 1),
    ])
    assert got[("alice", "WORKS_AT", "acme")][1] == _ts(5).replace(tzinfo=None)
    assert got[("alice", "WORKS_AT", "globex")][1] is None


def test_non_functional_pred_accumulates(spark):
    """FRIENDS_WITH is not functional — two edges coexist."""
    got = _run(spark, [
        ("alice", "FRIENDS_WITH", "bob", _ts(1), None, 0),
        ("alice", "FRIENDS_WITH", "carol", _ts(2), None, 1),
    ])
    assert got[("alice", "FRIENDS_WITH", "bob")][1] is None
    assert got[("alice", "FRIENDS_WITH", "carol")][1] is None


def test_explicit_negation_closes_edge(spark):
    """'no longer works at' row (invalid_at=ts, valid_at null) closes the
    matching open edge at the earliest negation after its valid_at."""
    got = _run(spark, [
        ("alice", "WORKS_AT", "acme", _ts(1), None, 0),
        ("alice", "WORKS_AT", "acme", None, _ts(3), 1),   # negation row
    ])
    assert got[("alice", "WORKS_AT", "acme")][1] == _ts(3).replace(tzinfo=None)


def test_negation_before_fact_ignored(spark):
    """A negation that precedes the fact's valid_at must not close it
    (candidates require candidate.ts > edge.valid_at — the reference skips
    non-overlapping intervals, edge_operations.py:351-361)."""
    got = _run(spark, [
        ("alice", "WORKS_AT", "acme", _ts(5), None, 1),
        ("alice", "WORKS_AT", "acme", None, _ts(2), 0),
    ])
    assert got[("alice", "WORKS_AT", "acme")][1] is None


def test_earliest_candidate_wins(spark):
    """Multiple later contradictions → invalid_at = earliest one
    (sorted-by-valid_at-asc order, edge_operations.py:476)."""
    got = _run(spark, [
        ("alice", "WORKS_AT", "acme", _ts(1), None, 0),
        ("alice", "WORKS_AT", "globex", _ts(4), None, 1),
        ("alice", "WORKS_AT", "initech", _ts(8), None, 2),
    ])
    assert got[("alice", "WORKS_AT", "acme")][1] == _ts(4).replace(tzinfo=None)
    assert got[("alice", "WORKS_AT", "globex")][1] == _ts(8).replace(tzinfo=None)


def test_duplicate_facts_merge_episodes(spark):
    """Same (src,pred,dst) twice → one edge, earliest valid_at, episode
    union (edge_operations.py:428-436)."""
    df = _edges_df(spark, [
        ("alice", "LIKES", "bob", _ts(2), None, 2),
        ("alice", "LIKES", "bob", _ts(1), None, 1),
    ])
    out = dedupe_edges(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["valid_at"] == _ts(1).replace(tzinfo=None)
    assert sorted(r["episodes"]) == ["ep00", "ep01"]


@pytest.mark.parametrize("n_dupes", [1, 3])
def test_exact_negation_dedup(spark, n_dupes):
    rows = [("alice", "WORKS_AT", "acme", _ts(1), None, 0)]
    rows += [("alice", "WORKS_AT", "acme", None, _ts(3), 1 + i)
             for i in range(n_dupes)]
    df = _edges_df(spark, rows)
    out = apply_versioning(dedupe_edges(df), RUN_TS)
    assert out.where(F.col("valid_at").isNull()).count() == 1


def test_custom_functional_pred_via_ontology(spark):
    """E6 → T1a: an ontology-declared functional predicate gets the same
    supersede-on-next-fact semantics as the builtins; without the
    declaration both facts stay open."""
    from graphiti_spark.ontology import Ontology
    rows = [
        ("acme", "SUPPLIES", "widgetco", _ts(1), None, 0),
        ("acme", "SUPPLIES", "gadgetco", _ts(2), None, 1),
    ]
    base = _run(spark, rows)       # SUPPLIES not functional by default
    assert base[("acme", "SUPPLIES", "widgetco")][1] is None
    onto = Ontology(functional_preds=["SUPPLIES"])
    out = apply_versioning(dedupe_edges(_edges_df(spark, rows)), RUN_TS,
                           ontology=onto)
    got = {(r["source_node_uuid"], r["name"], r["target_node_uuid"]):
           (r["valid_at"], r["invalid_at"], r["expired_at"])
           for r in out.where(F.col("valid_at").isNotNull()).collect()}
    assert got[("acme", "SUPPLIES", "widgetco")][1] == \
        _ts(2).replace(tzinfo=None)
    assert got[("acme", "SUPPLIES", "gadgetco")][1] is None
    # builtin functional semantics are preserved under a custom ontology
    assert rules_builtin_still_functional(spark, onto)


def rules_builtin_still_functional(spark, onto):
    rows = [
        ("alice", "WORKS_AT", "acme", _ts(1), None, 0),
        ("alice", "WORKS_AT", "globex", _ts(2), None, 1),
    ]
    out = apply_versioning(dedupe_edges(_edges_df(spark, rows)), RUN_TS,
                           ontology=onto)
    got = {r["target_node_uuid"]: r["invalid_at"]
           for r in out.where(F.col("valid_at").isNotNull()).collect()}
    return got["acme"] == _ts(2).replace(tzinfo=None) \
        and got["globex"] is None


def test_same_endpoints_noncontradicting_pred_not_invalidated(spark):
    """Reference test_invalidate_edges_partial_update /
    test_get_edge_contradictions_no_effect
    (test_temporal_operations_int.py:227-264): a new edge between the SAME
    endpoints whose predicate neither negates, flips sentiment, nor
    re-binds a functional predicate must leave the existing edge open —
    'Alice is friends with Bob' does not close 'Alice likes Bob'."""
    got = _run(spark, [
        ("alice", "LIKES", "bob", _ts(1), None, 0),
        ("alice", "FRIENDS_WITH", "bob", _ts(2), None, 1),
    ])
    assert got[("alice", "LIKES", "bob")][1] is None
    assert got[("alice", "FRIENDS_WITH", "bob")][1] is None
