"""Micro-batch latency evidence for the incremental path (§2.10 / J3-J5).

Claim under test (``operators/maintenance.py`` incremental_update,
``streaming/ingest.py`` StreamingGraphWriter): micro-batch cost is
∝ touched-conversation size, not graph size, because every dedup/
versioning rule is group-scoped.

Two phases, one JSON line each to stdout (results summarized in
BASELINE.md; the combined line lands in BENCH_INCREMENTAL.json):

* ``compute`` (default sf5, 250k conversations): wall time of the
  ENTITY-granular micro-batch (``incremental_update_entity`` with
  ``delta_only`` — extraction over new turns only, J3 resolution against
  the materialized entities table, dedupe+versioning over the affected
  (group, src) slice, outputs = the rows an Iceberg MERGE would write)
  for k ∈ {1, 10, 100} touched conversations, against the full-corpus
  rebuild time. If the claim holds, k=100 stays orders of magnitude under
  the full rebuild and grows mildly from k=1 (fixed driver/JVM overhead
  dominates small k).

* ``io`` (sf0.01, 500 conversations): seed a group_id-partitioned store
  via StreamingGraphWriter, then apply micro-batches touching
  k ∈ {1, 10, 100} conversations and count partition directories whose
  files were rewritten — the parquet stand-in for Iceberg
  ``overwritePartitions`` IO. If the claim holds, rewritten partitions
  == touched groups (+0 untouched).

Usage::

    python scripts/exp_incremental.py [--sf 5] [--io-sf 0.01] [--skip-io]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

RUN_TS = datetime(2025, 6, 1, tzinfo=timezone.utc)


def _spark(cores: int = 8):
    from graphiti_spark.session import get_spark, ship_package
    s = get_spark(app="exp_incremental", cores=cores,
                  shuffle_partitions=max(8, min(cores, 16)))
    ship_package(s)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _new_turns(spark, base, k: int):
    """One appended turn for each of k deterministic conversations."""
    convs = [r["conv_id"] for r in
             base.select("conv_id").distinct().orderBy("conv_id")
                 .limit(k).collect()]
    nxt = (base.where(F.col("conv_id").isin(convs))
           .groupBy("conv_id").agg(F.max("turn_idx").alias("mx"),
                                   F.max("ts").alias("mts")))
    return (nxt.select(
        "conv_id", (F.col("mx") + 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("Zed Carter works at Initech "),
                 F.upper(F.col("conv_id")),
                 F.lit(".")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("mts") + F.expr("INTERVAL 1 MINUTE")).alias("ts")))


def phase_compute(spark, sf: float, ks, tmp_root: str):
    """Entity-granular micro-batch latency vs touched size.

    Seeds the graph once (materialized to parquet — the incremental path
    reads the MATERIALIZED graph like add_episode reads the DB, not a
    lineage chain), then times ``incremental_update_entity(delta_only)``
    — the rows an Iceberg MERGE would write — for k touched
    conversations, against the full-rebuild wall time."""
    from graphiti_spark.datagen import ensure_corpus
    from graphiti_spark.plans.pipeline import build_graph
    from graphiti_spark.operators.incremental import incremental_update_entity

    corpus = ensure_corpus(sf)
    tr = spark.read.parquet(f"{corpus}/transcripts.parquet")
    t0 = time.time()
    g = build_graph(spark, tr)
    g.entities.write.mode("overwrite").parquet(f"{tmp_root}/entities")
    g.edges.write.mode("overwrite").parquet(f"{tmp_root}/edges")
    full_sec = time.time() - t0
    entities = spark.read.parquet(f"{tmp_root}/entities")
    edges = spark.read.parquet(f"{tmp_root}/edges")
    out = {"full_rebuild_sec": round(full_sec, 2),
           "n_convs": tr.select("conv_id").distinct().count(),
           "n_edges": edges.count(),
           "touched": {}}
    for k in ks:
        batch = _new_turns(spark, tr, k).localCheckpoint(eager=True)
        spark.catalog.clearCache()
        t0 = time.time()
        keys, d_ents, d_edges = incremental_update_entity(
            spark, batch, None, entities, edges, RUN_TS, delta_only=True)
        _noop(d_ents)
        _noop(d_edges)
        sec = time.time() - t0
        out["touched"][str(k)] = {
            "sec": round(sec, 2),
            "delta_edges": d_edges.count(),
            "delta_entities": d_ents.count()}
    return out


def _part_files(root: str, name: str) -> dict[str, float]:
    """{partition dir: max mtime of its files}."""
    out = {}
    base = os.path.join(root, name)
    for d in os.listdir(base):
        p = os.path.join(base, d)
        if not os.path.isdir(p):
            continue
        mt = max((os.path.getmtime(os.path.join(p, f))
                  for f in os.listdir(p)), default=0)
        out[d] = mt
    return out


def phase_io(spark, sf: float, ks, tmp_root: str):
    from graphiti_spark.datagen import ensure_corpus
    from graphiti_spark.streaming.ingest import StreamingGraphWriter

    corpus = ensure_corpus(sf)
    tr = spark.read.parquet(f"{corpus}/transcripts.parquet")
    writer = StreamingGraphWriter(tmp_root, RUN_TS)
    writer(tr, batch_id=0)          # seed: full corpus as batch 0
    out = {"n_convs": tr.select("conv_id").distinct().count(),
           "touched": {}}
    for i, k in enumerate(ks):
        batch = _new_turns(spark, tr, k).localCheckpoint(eager=True)
        before = _part_files(tmp_root, "edges")
        t0 = time.time()
        writer(batch, batch_id=i + 1)
        sec = time.time() - t0
        after = _part_files(tmp_root, "edges")
        rewritten = [d for d, mt in after.items()
                     if mt > before.get(d, 0)]
        out["touched"][str(k)] = {
            "sec": round(sec, 2),
            "edge_partitions_rewritten": len(rewritten),
            "edge_partitions_total": len(after)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=5.0)
    ap.add_argument("--io-sf", type=float, default=0.01)
    ap.add_argument("--ks", default="1,10,100")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--skip-io", action="store_true")
    ap.add_argument("--skip-compute", action="store_true")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    spark = _spark(args.cores)
    result = {"metric": "incremental_update_latency", "cores": args.cores}
    if not args.skip_compute:
        import tempfile
        with tempfile.TemporaryDirectory(prefix="inc_seed_") as tmp:
            result["compute_sf"] = args.sf
            result["compute"] = phase_compute(spark, args.sf, ks, tmp)
    if not args.skip_io:
        import tempfile
        with tempfile.TemporaryDirectory(prefix="inc_io_") as tmp:
            result["io_sf"] = args.io_sf
            result["io"] = phase_io(spark, args.io_sf, ks, tmp)
    spark.stop()
    line = json.dumps(result)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_INCREMENTAL.json"),
            "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
