"""Per-stage wall-clock breakdown of the KG pipeline at a given sf."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphiti_spark.session import get_spark, ship_package          # noqa: E402
from graphiti_spark.datagen import ensure_corpus                    # noqa: E402

sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
s = get_spark(app="exp_stages", cores=cpus,
              shuffle_partitions=max(8, min(cpus, 16)))
ship_package(s)
s.sparkContext.setLogLevel("ERROR")

from pyspark.storagelevel import StorageLevel                       # noqa: E402
from graphiti_spark.operators import dedup, episodes as ep, extract, versioning  # noqa: E402
from graphiti_spark.plans.pipeline import RUN_TS                    # noqa: E402

tr = s.read.parquet(f"{ensure_corpus(sf)}/transcripts.parquet")

if os.environ.get("EXP_WARM"):
    # Warm the JVM + Python workers the way bench.py's query phase does
    # before the pipeline is timed.
    warm = ep.assemble_episodes(tr.limit(2000), RUN_TS)
    extract.extract_mentions(warm).count()
    extract.extract_edges(warm, RUN_TS).count()

t_all = time.time()
marks = []


def mark(name, t0):
    marks.append((name, round(time.time() - t0, 2)))


t0 = time.time()
n_part = max(2 * s.sparkContext.defaultParallelism, 8)
tr = tr.repartition(n_part, "conv_id")
episodes = ep.assemble_episodes(tr, RUN_TS).persist(StorageLevel.MEMORY_AND_DISK)
episodes.count()
mark("episodes", t0)

# Mirror the pipeline's combined path: ONE UDF pass, both tables
# flattened from it (plans/pipeline.py extract_combined stage).
t0 = time.time()
combined = extract.extract_combined(episodes).persist(StorageLevel.MEMORY_AND_DISK)
combined.count()
mark("extract_combined", t0)

t0 = time.time()
mentions = extract.mentions_from_combined(combined).persist(StorageLevel.MEMORY_AND_DISK)
mentions.count()
mark("mentions", t0)

t0 = time.time()
edges_raw = extract.edges_from_combined(combined, RUN_TS).persist(StorageLevel.MEMORY_AND_DISK)
edges_raw.count()
mark("edges_raw", t0)

t0 = time.time()
raw = extract.raw_entities(mentions, RUN_TS).persist(StorageLevel.MEMORY_AND_DISK)
raw.count()
mark("raw_entities", t0)

t0 = time.time()
canonical, uuid_map = dedup.canonicalize_entities(raw, RUN_TS)
uuid_map = uuid_map.persist(StorageLevel.MEMORY_AND_DISK)
uuid_map.count()
mark("canonicalize(CC)", t0)

t0 = time.time()
remapped = dedup.resolve_edge_pointers(edges_raw, uuid_map)
deduped = versioning.dedupe_edges(remapped).persist(StorageLevel.MEMORY_AND_DISK)
deduped.count()
mark("remap+dedupe", t0)

t0 = time.time()
out = versioning.apply_versioning(deduped, RUN_TS, eager=False)
n = out.count()
mark("versioning", t0)

print(f"STAGES sf={sf} cpus={cpus} total={round(time.time()-t_all,2)} "
      f"triples={n} " + " ".join(f"{k}={v}" for k, v in marks))
s.stop()
