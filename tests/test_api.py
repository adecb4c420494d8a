"""GraphitiSpark facade (graphiti_spark/api.py): the reference's verbs
drive the tested operators end-to-end through one handle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphiti_spark.api import GraphitiSpark

TS = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", t, None, TS.replace(tzinfo=None) +
          dt.timedelta(minutes=i)) for c, i, t in rows],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")


ROWS = [
    ("conv1", 0, "Alice Smith works at Acme Corp."),
    ("conv1", 1, "Alice Smith lives in Paris."),
    ("conv2", 0, "Bob Jones works at Hooli Inc."),
]


def test_facade_end_to_end(spark):
    g = GraphitiSpark(spark, run_ts=TS).add_episode_bulk(_tr(spark, ROWS))
    assert g.edges.count() >= 3
    base_conv2 = sorted(r["uuid"] for r in
                        g.edges.where("group_id = 'conv2'").collect())

    # single-episode write: touched-group incremental, conv2 untouched
    g.add_episode("conv1", "Alice Smith moved to Berlin.")
    assert g.transcripts.where("conv_id = 'conv1'").count() == 3
    assert sorted(r["uuid"] for r in
                  g.edges.where("group_id = 'conv2'").collect()) \
        == base_conv2
    facts = [r["fact"] for r in
             g.edges.where("group_id = 'conv1'").collect()]
    assert any("Berlin" in f for f in facts)

    # incremental ≡ one-shot bulk over the same turns
    full = GraphitiSpark(spark, run_ts=TS).add_episode_bulk(
        g.transcripts)
    assert sorted(map(tuple, g.edges.select(
        "uuid", "group_id", "fact", "valid_at", "invalid_at")
        .collect())) == \
        sorted(map(tuple, full.edges.select(
            "uuid", "group_id", "fact", "valid_at", "invalid_at")
            .collect()))

    # edge-RRF search shortcut finds the Hooli fact
    hits = g.search("works Hooli", num_results=5).collect()
    assert any("Hooli" in r["fact"] for r in hits)

    # composite search by preset name returns a bundle
    res = g.search_("Alice Paris", "COMBINED_HYBRID_SEARCH_RRF")
    assert res.edges is not None and res.edges.count() >= 1

    # communities: every conversation's star collapses to one community
    comms = g.build_communities()
    assert comms.where("group_id = 'conv2'").count() == 1

    # add_triplet resolves against existing edges: an exact repeat of a
    # stored fact merges instead of duplicating
    n_before = g.edges.where("group_id = 'conv2'").count()
    g.add_triplet("conv2", "Bob Jones", "WORKS_AT", "Hooli Inc",
                  "Bob Jones works at Hooli Inc.")
    assert g.edges.where("group_id = 'conv2'").count() == n_before
    # ... and a genuinely new triplet lands, with its entities upserted
    g.add_triplet("conv2", "Bob Jones", "FOUNDED", "Initech",
                  "Bob Jones founded Initech.")
    assert g.edges.where(
        "group_id = 'conv2' AND name = 'FOUNDED'").count() == 1
    assert g.entities.where(
        "group_id = 'conv2' AND name = 'Initech'").count() == 1

    # retrieve_episodes: last-n read path
    eps = g.retrieve_episodes(TS + dt.timedelta(days=1), last_n=2,
                              group_ids=["conv1"]).collect()
    assert 1 <= len(eps) <= 2

    # get_nodes_and_edges_by_episode round-trip on a real episode uuid
    ep_uuid = g.episodes.where("group_id = 'conv1'") \
        .select("uuid").head()[0]
    nodes, edges = g.get_nodes_and_edges_by_episode([ep_uuid])
    assert nodes.count() >= 1

    # remove_episode: conv2's only extraction episode goes away; the
    # manually-added FOUNDED edge (no episode provenance) survives
    ep2 = [r["uuid"] for r in
           g.episodes.where("group_id = 'conv2'").collect()]
    g.remove_episode(ep2)
    assert g.episodes.where("group_id = 'conv2'").count() == 0
    assert g.edges.where(
        "group_id = 'conv2' AND name = 'FOUNDED'").count() == 1
    assert g.edges.where(
        "group_id = 'conv2' AND name = 'WORKS_AT'").count() == 0


def test_facade_save_load_roundtrip(spark, tmp_path):
    """save() then load() resumes the SAME graph: tables equal, and an
    incremental add_episode on the re-opened handle matches one applied
    to the original (restart-safety lives in the files)."""
    g = GraphitiSpark(spark, run_ts=TS).add_episode_bulk(_tr(spark, ROWS))
    g.save(str(tmp_path / "graph"))
    h = GraphitiSpark.load(spark, str(tmp_path / "graph"), run_ts=TS)

    def edge_set(x):
        return sorted(map(tuple, x.edges.select(
            "uuid", "group_id", "fact", "valid_at", "invalid_at")
            .collect()))

    assert edge_set(g) == edge_set(h)
    g.add_episode("conv2", "Bob Jones lives in Oslo.")
    h.add_episode("conv2", "Bob Jones lives in Oslo.")
    assert edge_set(g) == edge_set(h)
    assert any("Oslo" in f for (_, _, f, _, _) in edge_set(h))


def test_add_triplet_hardening(spark):
    """code-review r5 continuation: two manual triplets in one group must
    both survive (explode_outer in the raw re-slice), the touched
    group's fact_embedding must be re-derived, the upserted entities
    carry name_embedding, and validation applies on a populated graph."""
    import pytest as _pytest

    g = GraphitiSpark(spark, run_ts=TS).add_episode_bulk(_tr(spark, ROWS))
    assert "fact_embedding" in g.edges.columns
    g.add_triplet("conv2", "Bob Jones", "FOUNDED", "Initech",
                  "Bob Jones founded Initech.")
    g.add_triplet("conv2", "Carol Moss", "OWNS", "Globex",
                  "Carol Moss owns Globex.")
    names = {r["name"] for r in
             g.edges.where("group_id = 'conv2'").collect()}
    assert {"FOUNDED", "OWNS"} <= names          # first manual edge kept
    assert g.edges.where(
        "group_id = 'conv2' AND fact_embedding IS NULL").count() == 0
    assert g.entities.where(
        "name = 'Globex' AND name_embedding IS NULL").count() == 0
    with _pytest.raises(ValueError):
        g.add_triplet("conv2", "Bob Jones", "LIKES", "bob jones", "x")


def test_resupplied_turn_takes_new_text(spark):
    g = GraphitiSpark(spark, run_ts=TS).add_episode_bulk(_tr(spark, ROWS))
    g.add_episode_bulk(_tr(spark, [
        ("conv1", 1, "Alice Smith lives in Madrid.")]))
    texts = [r["text"] for r in g.transcripts
             .where("conv_id = 'conv1' AND turn_idx = 1").collect()]
    assert texts == ["Alice Smith lives in Madrid."]
    facts = [r["fact"] for r in
             g.edges.where("group_id = 'conv1'").collect()]
    assert any("Madrid" in f for f in facts)
    assert not any("Paris" in f for f in facts)


def test_save_in_place_after_load(spark, tmp_path):
    import pytest as _pytest

    root = str(tmp_path / "graph")
    GraphitiSpark(spark, run_ts=TS).add_episode_bulk(
        _tr(spark, ROWS)).save(root)
    h = GraphitiSpark.load(spark, root, run_ts=TS)
    h.add_episode("conv1", "Alice Smith moved to Berlin.")
    h.save(root)                      # overwrite the dirs we read from
    again = GraphitiSpark.load(spark, root, run_ts=TS)
    assert any("Berlin" in r["fact"] for r in again.edges.collect())
    with _pytest.raises(FileNotFoundError):
        GraphitiSpark.load(spark, str(tmp_path / "nope"), run_ts=TS)
