"""Structured Streaming ingest wrapper (SURVEY.md §2.10).

The reference is incremental, not streaming: ``add_episode`` is awaited
sequentially per group with the graph DB as the only state
(``graphiti.py:412-415``). Our batch pipeline recovers those semantics via
the candidate-join-vs-existing-tables pattern, so the streaming wrapper is
thin: ``foreachBatch`` re-uses the *identical* stage functions per
micro-batch and merges into the materialized tables.

The previous-episode context (S3) is a bounded ``rowsBetween(-3,-1)``
window, so no unbounded state is needed; late turns are handled with a
watermark on ``ts`` — turns later than the watermark re-enter as a new
micro-batch and the uuid-keyed merge keeps the result identical to a batch
rebuild (ids are pure functions of content, rules.py).
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from graphiti_spark.operators.maintenance import incremental_update
from graphiti_spark.schema import TRANSCRIPTS


def stream_transcripts(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of transcript parquet drops (the Iceberg
    streaming-read equivalent in this sandbox)."""
    return (spark.readStream.schema(TRANSCRIPTS)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


class StreamingGraphWriter:
    """foreachBatch sink: per micro-batch, run the batch stages and merge
    into the entity/edge tables under `out_root` (uuid-keyed, existing rows
    preferred — matching resolve-to-existing, node_operations.py:258-284)."""

    def __init__(self, out_root: str, run_ts: datetime):
        self.out_root = out_root
        self.run_ts = run_ts

    def _read_or_none(self, spark: SparkSession, name: str):
        p = os.path.join(self.out_root, name)
        try:
            return spark.read.parquet(p)
        except Exception:
            return None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        transcripts, entities, edges = incremental_update(
            spark, batch_df,
            self._read_or_none(spark, "transcripts"),
            self._read_or_none(spark, "entities"),
            self._read_or_none(spark, "edges"),
            self.run_ts)
        # rewrite-merge (MERGE INTO / overwritePartitions under Iceberg;
        # staging-dir swap here)
        for name, df in (("transcripts", transcripts),
                         ("entities", entities), ("edges", edges)):
            tmp = os.path.join(self.out_root, f"_{name}_b{batch_id}")
            df.write.mode("overwrite").parquet(tmp)
            final = os.path.join(self.out_root, name)
            spark.read.parquet(tmp).write.mode("overwrite").parquet(final)


def run_stream(spark: SparkSession, in_path: str, out_root: str,
               run_ts: datetime, checkpoint: str | None = None,
               watermark: str = "1 hour"):
    """Wire source → watermark → foreachBatch(stage functions) → tables.
    Returns the StreamingQuery (caller awaits/stops)."""
    src = stream_transcripts(spark, in_path).withWatermark("ts", watermark)
    writer = StreamingGraphWriter(out_root, run_ts)
    return (src.writeStream
            .foreachBatch(writer)
            .option("checkpointLocation",
                    checkpoint or os.path.join(out_root, "_checkpoints"))
            .trigger(availableNow=True)
            .start())
