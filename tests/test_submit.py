"""North-rule artifact: the pipeline runs through the REAL
``spark-submit --py-files`` binary (separate driver JVM, two executor
JVMs via local-cluster, package shipped as a zip archive) and produces
row counts identical to the in-process build of the same input —
determinism across masters and parallelism (SURVEY.md §7 risk 1).
"""

import os
import sys

from graphiti_spark.plans.pipeline import build_graph

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from exp_submit import build_zip, run_submit  # noqa: E402


def test_spark_submit_matches_inprocess(spark, corpus_dir):
    transcripts = os.path.join(corpus_dir, "transcripts.parquet")
    sub = run_submit(build_zip(), transcripts,
                     master="local-cluster[2,4,4096]")
    g = build_graph(spark, spark.read.parquet(transcripts))
    assert sub["episodes"] == g.episodes.count()
    assert sub["entities"] == g.entities.count()
    assert sub["edges"] == g.edges.count()
    assert sub["episodic_edges"] == g.episodic_edges.count()
    # the submit job really ran on executor JVMs, not threads
    assert sub["master"].startswith("local-cluster")
