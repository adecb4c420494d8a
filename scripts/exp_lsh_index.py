"""Incremental LSH index scale probe: per-batch cost vs index size.

The claim under test: `streaming/lsh_index.LshIndex.update` stays
~flat per batch as the at-rest index grows, because the probe prunes
the store scan to the batch's shards and the appended index rows are
tiny (doc_id + band key). A naive design (re-scan or rebuild the whole
signature table per batch) would grow linearly with batches ingested —
unusable on a feed.

Protocol: synthesize batches of B docs in Spark (deterministic token
sets from the doc id, ~12 tokens over a 5k vocabulary, every 7th doc a
near-dup of its predecessor), feed N batches through the production
operator, record each batch's wall. Report first-half vs second-half
mean wall (the growth signal), total pairs, and the final index size.
Correctness ride-along: every (i, i+1) planted near-dup pair whose
members share a band must be found; we count planted-pair recall by
re-probing 200 planted duplicates against the final index.

Results → BENCH_STREAMING.json (merge-update, keys lsh_*).

Usage: python scripts/exp_lsh_index.py [n_batches] [batch_docs] [cpus]
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

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32

spark = get_spark(app="exp_lsh_index", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.streaming.lsh_index import LshIndex             # noqa: E402


def batch_docs(lo: int, hi: int):
    """(doc_id, toks) rows built IN SPARK: 12 md5-derived tokens from a
    5k vocabulary; doc_id % 7 == 1 copies its predecessor's tokens with
    one swapped (a planted near-dup)."""
    base = (spark.range(lo, hi).repartition(max(8, CPUS))
            .withColumn("seed",
                        F.when(F.col("id") % 7 == 1, F.col("id") - 1)
                         .otherwise(F.col("id"))))
    toks = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda i: F.concat(F.lit("t"), (F.conv(F.substring(
            F.md5(F.concat_ws(":", F.col("seed"), i)), 1, 6), 16, 10)
            .cast("bigint") % 5000).cast("string"))))
    swapped = F.when(
        F.col("id") % 7 == 1,
        F.array_distinct(F.concat(
            F.slice(toks, 1, 10),
            F.array(F.concat(F.lit("x"), F.col("id").cast("string"))))),
        ).otherwise(toks)
    return base.select(F.col("id").alias("doc_id"),
                       swapped.alias("toks"))


root = tempfile.mkdtemp(prefix="lsh_probe_")
idx = LshIndex(os.path.join(root, "index"), n_shards=32)

walls, pairs_total = [], 0
for b in range(N_BATCHES):
    docs = batch_docs(b * BATCH, (b + 1) * BATCH).localCheckpoint(
        eager=True)
    t0 = time.time()
    pairs_total += idx.update(docs).count()
    walls.append(round(time.time() - t0, 2))
    print(f"batch {b}: {walls[-1]}s (index ~{(b + 1) * BATCH * 2} rows)",
          file=sys.stderr)

# planted-pair recall: re-probe 200 fresh duplicates of early docs
# (ids far outside the ingested range so they are new) — each copies
# doc 7k+0's tokens exactly, so every band collides; all must pair.
probe = (batch_docs(0, 200 * 7)
         .where(F.col("doc_id") % 7 == 0).limit(200)
         .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "toks"))
found = (idx.update(probe)
         .where(F.col("doc_b") >= 10_000_000).select("doc_b")
         .distinct().count())

half = len(walls) // 2
out = {
    "lsh_n_batches": N_BATCHES,
    "lsh_batch_docs": BATCH,
    "lsh_docs_total": N_BATCHES * BATCH,
    "lsh_batch_walls_sec": walls,
    "lsh_first_half_mean_sec": round(sum(walls[:half]) / half, 2),
    "lsh_second_half_mean_sec": round(sum(walls[half:])
                                      / (len(walls) - half), 2),
    "lsh_pairs_total": pairs_total,
    "lsh_exact_dup_probe_recall": found / 200,
    "lsh_cpus": CPUS,
}
print(json.dumps(out))
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_STREAMING.json")
blob = {}
if os.path.exists(path):
    with open(path) as f:
        blob = json.load(f)
blob.update(out)
with open(path, "w") as f:
    json.dump(blob, f, indent=1)
shutil.rmtree(root, ignore_errors=True)
