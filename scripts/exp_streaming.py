"""Structured Streaming end-to-end latency probe (§2.10).

Splits the seeded corpus into K parquet drop files, streams them through
the production wiring (`streaming/ingest.run_stream`: file source →
watermark → foreachBatch(StreamingGraphWriter) → dynamic partition
overwrite of group-partitioned tables) with ``maxFilesPerTrigger=1`` so
each drop is its own micro-batch, and reports per-batch latency from the
StreamingQuery's own progress events plus a final equality check: the
streamed `edges` table must hold exactly as many rows as a one-shot
batch `build_graph` over the same corpus. Results → BENCH_STREAMING.json.

Usage: python scripts/exp_streaming.py [sf] [cpus] [n_drops]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphiti_spark.session import get_spark, ship_package          # noqa: E402
from graphiti_spark.datagen import ensure_corpus                    # noqa: E402

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_DROPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

spark = get_spark(app="exp_streaming", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.plans.pipeline import RUN_TS, build_graph       # noqa: E402
from graphiti_spark.streaming.ingest import run_stream              # noqa: E402

work = tempfile.mkdtemp(prefix="exp_streaming_")
src_dir = os.path.join(work, "drops")
out_root = os.path.join(work, "out")

tr = spark.read.parquet(f"{ensure_corpus(SF)}/transcripts.parquet")
# Deterministic drop assignment by conversation: hash-split into N files
# so each micro-batch touches a disjoint conversation set.
(tr.withColumn("_d", F.pmod(F.xxhash64("conv_id"), F.lit(N_DROPS)))
   .repartition("_d").write.partitionBy("_d").parquet(src_dir))
# flatten the partition dirs into N single drop files
drop_files = []
for d in sorted(os.listdir(src_dir)):
    if not d.startswith("_d="):
        continue
    part = [f for f in os.listdir(os.path.join(src_dir, d))
            if f.endswith(".parquet")]
    for i, f in enumerate(part):
        drop_files.append((os.path.join(src_dir, d, f),
                           f"{d.replace('_d=', 'drop')}_{i}.parquet"))
stream_in = os.path.join(work, "in")
os.makedirs(stream_in)
for src, name in drop_files:
    shutil.copy(src, os.path.join(stream_in, name))

t0 = time.time()
q = run_stream(spark, stream_in, out_root, RUN_TS)
q.awaitTermination()
wall = time.time() - t0

def _as_dict(p):
    if isinstance(p, dict):
        return p
    return json.loads(p.json if hasattr(p, "json") else str(p))


progress = [_as_dict(p) for p in q.recentProgress]
batches = [{"rows": p["numInputRows"],
            "batch_ms": p["durationMs"].get("triggerExecution")}
           for p in progress if p["numInputRows"]]

streamed_edges = spark.read.parquet(os.path.join(out_root, "edges"))
n_streamed = streamed_edges.count()
n_batch = build_graph(spark, tr, run_ts=RUN_TS).edges.count()

lat = sorted(b["batch_ms"] for b in batches)
out = {
    "metric": "streaming_batch_p50_ms",
    "value": lat[len(lat) // 2] if lat else None,
    "unit": "ms per micro-batch (foreachBatch incremental rebuild + "
            "dynamic partition overwrite)",
    "sf": SF,
    "n_drops": len(drop_files),
    "n_batches": len(batches),
    "total_wall_sec": round(wall, 2),
    "batch_ms": {"min": lat[0] if lat else None,
                 "p50": lat[len(lat) // 2] if lat else None,
                 "max": lat[-1] if lat else None},
    "rows_per_batch": sorted(b["rows"] for b in batches),
    "streamed_edges": n_streamed,
    "batch_rebuild_edges": n_batch,
    "edges_match": n_streamed == n_batch,
    "cpus": CPUS,
}
print(json.dumps(out))
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_STREAMING.json"), "w") as f:
    json.dump(out, f, indent=1)
shutil.rmtree(work, ignore_errors=True)
