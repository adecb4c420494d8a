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


def test_stream_dedup_matches_batch(spark, tmp_path):
    """Watermarked streaming dedup: duplicates across micro-batches inside
    the watermark are dropped; the surviving hash set equals the batch
    distinct; first arrival wins."""
    from pyspark.sql import functions as F

    from graphiti_spark.streaming.ingest import stream_dedup

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    schema = "doc_id long, text string, ts timestamp"

    def drop(rows, name):
        (spark.createDataFrame(
            [(i, t, datetime(2024, 1, 1, 0, m)) for i, t, m in rows],
            schema).coalesce(1).write.mode("append").parquet(in_dir))

    # batch 1: two unique + an in-batch duplicate of "aa"
    drop([(1, "aa", 0), (2, "bb", 1), (3, "aa", 2)], "b1")
    # batch 2 (arrives later, within the 10-min watermark of batch 1):
    # cross-batch duplicate of "bb" + one new doc
    drop([(4, "bb", 3), (5, "cc", 4)], "b2")

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = (stream_dedup(src, watermark="10 minutes")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).collect()
    by_text = {}
    for r in got:
        by_text.setdefault(r.text, []).append(r.doc_id)
    # one survivor per distinct text — the batch-distinct hash set
    assert {t: len(ids) for t, ids in by_text.items()} == \
        {"aa": 1, "bb": 1, "cc": 1}
    assert by_text["aa"] == [1]            # first arrival won
    assert by_text["bb"] == [2]
    assert by_text["cc"] == [5]
