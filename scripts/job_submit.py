"""Cluster-shaped KG-build entry point for ``spark-submit --py-files``.

The north rule asks for the pipeline to run "via spark-submit --py-files
on a multi-executor cluster". This script is that artifact: it carries NO
repo-path imports — ``graphiti_spark`` must arrive through the
``--py-files graphiti_spark.zip`` archive exactly as it would on a real
cluster edge node, and the master (e.g. ``local-cluster[2,4,4096]`` for
two real executor JVMs over loopback, or ``yarn``/``k8s`` in production)
comes from the ``spark-submit --master`` flag. All engine configs ride
``--conf`` so the submit command is the single source of tuning, the way
a production job template would be.

Usage (see scripts/exp_submit.py for the packaged launcher):

    $SPARK_HOME/bin/spark-submit \
        --master local-cluster[2,4,4096] \
        --py-files build/graphiti_spark.zip \
        scripts/job_submit.py \
        --transcripts data/transcripts_sf0.001/transcripts.parquet

Prints ONE JSON line with row counts and wall time on success; the
launcher compares the counts against an in-process build of the same
input (they must be identical — the pipeline is deterministic across
masters and parallelism by design, SURVEY.md §7 risk 1).
"""

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True,
                    help="parquet path of (conv_id, turn_idx, role, text, "
                         "tool, ts) transcripts")
    ap.add_argument("--store", default="",
                    help="optional TableStore root: materialize + "
                         "checkpoint every stage (resumable)")
    a = ap.parse_args()

    # No .master() here: spark-submit owns it. getOrCreate() attaches to
    # the submit-provided context.
    spark = SparkSession.builder.appName("graphiti_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Imported AFTER the session exists, from the --py-files archive.
    from graphiti_spark.plans.pipeline import build_graph
    from graphiti_spark.sources.tables import TableStore

    t0 = time.time()
    transcripts = spark.read.parquet(a.transcripts)
    store = TableStore(spark, a.store) if a.store else None
    g = build_graph(spark, transcripts, store=store)
    counts = {
        "episodes": g.episodes.count(),
        "entities": g.entities.count(),
        "edges": g.edges.count(),
        "episodic_edges": g.episodic_edges.count(),
    }
    wall = round(time.time() - t0, 2)
    print(json.dumps({
        "metric": "submit_pipeline", "unit": "sec", "value": wall,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        **counts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
