"""Sequence-packing scale probe: pack_sequences at 10⁶ documents.

The driver testdata caps `documents` at 5 000 rows, so the packing
operator never sees scale there. This probe synthesizes a deterministic
1M-doc (doc_id, shard, tokens) table IN SPARK (all JVM expressions, no
files), runs the exact production operator
(`operators/packing.pack_sequences`, the same function behind the
oracle-checked `sequence_pack` driver query) across a shard-count sweep,
and checks the closed-form invariants at full scale:

  * per-shard coverage: max(start_tok + tokens) == sum(tokens) — the
    packed stream has no gaps or overlaps;
  * global sequence count: sum over shards of ceil(shard_tokens/budget)
    == count(distinct (shard, seq)) implied by last_seq of the final doc;
  * the physical plan holds ONE Exchange regardless of scale.

Shard-count sweep shows the wall is flat once shards ≥ cores (the window
cumsum is embarrassingly parallel across shards), and degrades gracefully
at shards=1 (single-reducer total order — the documented anti-pattern the
shard column exists to avoid). Results → BENCH_DOCS.json key "packing".

Usage: python scripts/exp_packing.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F                              # noqa: E402

from graphiti_spark.operators.packing import pack_sequences        # noqa: E402
from graphiti_spark.session import get_spark, ship_package         # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
BUDGET = 2048

spark = get_spark(app="exp_packing", cores=CPUS,
                  shuffle_partitions=max(8, min(CPUS, 16)))
ship_package(spark)
spark.sparkContext.setLogLevel("ERROR")


def table(n, n_shards):
    """Deterministic (doc_id, shard, tokens): tokens = 1..4096 md5-mixed."""
    tok = (F.conv(F.substring(F.md5(F.concat(F.lit("t:"),
           F.col("id").cast("string"))), 1, 8), 16, 10)
           .cast("long") % 4096 + 1)
    shard = F.concat(F.lit("s"), (F.col("id") % n_shards).cast("string"))
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 shard.alias("shard"),
                                 tok.alias("tokens"))


results = {"n_docs": N_DOCS, "cpus": CPUS, "budget": BUDGET, "sweep": []}
for n_shards in (1, 32, 1024):
    df = table(N_DOCS, n_shards)
    packed = pack_sequences(df, token_col="tokens", budget=BUDGET,
                            order_cols=["doc_id"], shard_col="shard")
    t0 = time.time()
    inv = (packed.groupBy("shard")
           .agg(F.max(F.col("start_tok") + F.col("tokens")).alias("covered"),
                F.sum("tokens").alias("total"),
                F.max("last_seq").alias("max_seq"))
           .select(F.sum(F.when(F.col("covered") == F.col("total"), 0)
                         .otherwise(1)).alias("coverage_violations"),
                   F.sum("total").alias("total_tokens"),
                   F.sum(F.col("max_seq") + 1).alias("n_seqs"),
                   F.sum(F.expr(f"(total + {BUDGET} - 1) DIV {BUDGET}"))
                    .alias("expected_seqs"))
           .collect()[0])
    wall = time.time() - t0
    plan = packed._jdf.queryExecution().executedPlan().toString()
    row = {"n_shards": n_shards, "wall_s": round(wall, 2),
           "docs_per_sec": round(N_DOCS / wall),
           "coverage_violations": inv.coverage_violations,
           "seqs_match": bool(inv.n_seqs == inv.expected_seqs),
           "total_tokens": inv.total_tokens,
           "exchanges_in_plan": plan.count("Exchange")}
    results["sweep"].append(row)
    print(row, flush=True)

ok = all(r["coverage_violations"] == 0 and r["seqs_match"]
         and r["exchanges_in_plan"] == 1 for r in results["sweep"])
results["all_invariants_hold"] = ok
print(json.dumps(results))

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_DOCS.json")
try:
    with open(path) as f:
        doc = json.load(f)
except FileNotFoundError:
    doc = {}
doc["packing"] = results
with open(path, "w") as f:
    json.dump(doc, f, indent=1)
