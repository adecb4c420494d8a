"""Streaming ingest test: two parquet drops through foreachBatch must
converge to the same graph as one batch rebuild (§2.10 equivalence)."""

import os
from datetime import datetime, timezone

from graphiti_spark.plans.pipeline import build_graph
from graphiti_spark.streaming.ingest import run_stream

RUN_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
          " tool string, ts timestamp")


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", t, None, datetime(2024, 1, 1, h)) for c, i, t, h
         in rows], SCHEMA)


def test_stream_matches_batch_rebuild(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    batch1 = _turns(spark, [
        ("c1", 0, "Alice works at Acme Corp.", 0),
        ("c1", 1, "Alice lives in Paris.", 1)])
    batch2 = _turns(spark, [
        ("c2", 0, "Bob Jones works at Globex.", 0),
        ("c1", 2, "Alice works at Acme Corp.", 2)])   # duplicate fact
    batch1.coalesce(1).write.mode("append").parquet(in_dir)

    q = run_stream(spark, in_dir, out_dir, RUN_TS)
    q.awaitTermination(120)

    batch2.coalesce(1).write.mode("append").parquet(in_dir)
    q2 = run_stream(spark, in_dir, out_dir, RUN_TS)
    q2.awaitTermination(120)

    got_edges = spark.read.parquet(os.path.join(out_dir, "edges"))
    got_entities = spark.read.parquet(os.path.join(out_dir, "entities"))

    full = build_graph(spark, batch1.unionByName(batch2), run_ts=RUN_TS)
    want_edges = {tuple(r) for r in full.edges
                  .select("uuid", "source_node_uuid", "name",
                          "target_node_uuid").collect()}
    have_edges = {tuple(r) for r in got_edges
                  .select("uuid", "source_node_uuid", "name",
                          "target_node_uuid").collect()}
    assert have_edges == want_edges
    assert (got_entities.select("uuid").distinct().count()
            == got_entities.count())
    assert (got_entities.count()
            == full.entities.count())
