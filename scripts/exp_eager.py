"""A/B: build_graph eager vs lazy at a given sf, fresh JVM per invocation.

Usage: python scripts/exp_eager.py {eager|lazy} [sf]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphiti_spark.session import get_spark, ship_package          # noqa: E402
from graphiti_spark.datagen import ensure_corpus                    # noqa: E402
from graphiti_spark.plans.pipeline import build_graph               # noqa: E402

mode = sys.argv[1]
sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
s = get_spark(app=f"exp_{mode}", cores=cpus,
              shuffle_partitions=max(8, min(cpus, 16)))
ship_package(s)
s.sparkContext.setLogLevel("ERROR")
tr = s.read.parquet(f"{ensure_corpus(sf)}/transcripts.parquet")
t0 = time.time()
g = build_graph(s, tr, eager=(mode == "eager"))
n = g.edges.count()
print(f"RESULT {mode} sf={sf} cpus={cpus} wall={round(time.time()-t0, 2)} triples={n}")
s.stop()
