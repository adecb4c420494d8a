"""Incremental MinHash-LSH index maintenance — near-dup detection for a
feed, not a corpus.

``stream_dedup`` (streaming/ingest.py) handles EXACT duplicates on an
unbounded feed with watermark-bounded state; this module is its near-dup
complement: an at-rest band index (one parquet row per (doc, band key),
hash-sharded) that each micro-batch PROBES for collisions against
everything ingested so far and then APPENDS its own keys to. The
reference's incremental shape is dedup_nodes against the existing graph
per episode (graphiti_core/utils/maintenance/node_operations.py
dedupe_extracted_nodes — new extraction vs stored graph, not vs the
batch); this is the same new-vs-store probe applied to the LSH dedup
family.

Scale shape, sized for a 100 TB/day feed:

* The index holds (shard, bk, doc_id) only — a few tens of bytes per
  (doc, band), orders of magnitude smaller than the corpus; growth is
  linear in docs ingested, never rewritten (append-only).
* Per batch: the batch's band keys are computed narrow (the shared
  :func:`~graphiti_spark.operators.ann.minhash_band_keys` step), the
  store scan is PRUNED to the shards those keys hash into (shard is the
  partition column, filtered with a literal isin — the
  streaming/ingest.py trick), and the probe is a bucket equi-join whose
  batch side is micro-batch-sized (broadcastable). No state lives in
  the streaming engine, so a crashed job resumes by re-reading the
  index — the append is the checkpoint.
* Engine-portable md5 band keys make the maintenance ORDER-FREE: the
  index after N batches equals a batch rebuild over the union of their
  docs (test-gated), because a doc's keys depend on its tokens alone.

Cap semantics (mega-bucket skew control) differ from the batch operator
by construction, and honestly so: batch ``minhash_candidate_pairs``
drops a bucket > ``max_bucket`` RETROACTIVELY (it sees the final
count); the incremental probe emits NO pairs through a bucket whose
TOTAL population (stored + this batch) exceeds the cap at that batch —
the same decision a batch rebuild over the corpus-so-far would make —
but pairs emitted while the bucket was small stand (a stream cannot
retract history — the same reasoning as ``stream_dedup``'s watermark
re-emission). The total-population rule also bounds the in-batch
self-join: one degenerate micro-batch cannot emit O(batch²) pairs
through a mega-bucket. Equality with the batch operator holds exactly
on buckets that never exceed the cap, which is every non-degenerate
bucket by design. Replay-safe: a re-run batch (at-least-once
foreachBatch) finds its keys already stored, appends nothing, and
emits the same pairs the first attempt would have.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.operators.ann import minhash_band_keys

__all__ = ["LshIndex"]

_SCHEMA = "doc_id bigint, bk string, shard int"


class LshIndex:
    """Append-only LSH band index at ``path``, hash-sharded on the band
    key into ``n_shards`` partition dirs."""

    def __init__(self, path: str, n_hashes: int = 8, bands: int = 2,
                 n_shards: int = 16, max_bucket: int = 100):
        self.path = path
        self.n_hashes = n_hashes
        self.bands = bands
        self.n_shards = n_shards
        self.max_bucket = max_bucket

    # -- helpers -----------------------------------------------------------

    def _keys(self, docs: DataFrame, id_col: str, toks_col: str
              ) -> DataFrame:
        keys = minhash_band_keys(docs, id_col, toks_col,
                                 self.n_hashes, self.bands)
        return keys.select(
            F.col(id_col).alias("doc_id"), "bk",
            F.pmod(F.hash("bk"), F.lit(self.n_shards)).cast("int")
             .alias("shard"))

    def _stored(self, spark: SparkSession) -> DataFrame:
        # the dir may exist but hold no parquet yet (e.g. a foreign
        # _checkpoints subdir landed first) — treat that as empty too
        from pyspark.errors import AnalysisException
        try:
            df = spark.read.schema(_SCHEMA).parquet(self.path)
        except AnalysisException:
            # missing path = empty index; any OTHER failure (corrupt
            # footer, IO fault) must propagate — an empty-index fallback
            # there would silently skip the probe while still appending
            return spark.createDataFrame([], _SCHEMA)
        # partition-column inference pins shard back to int
        return df.select("doc_id", "bk", F.col("shard").cast("int")
                         .alias("shard"))

    # -- the per-micro-batch step ------------------------------------------

    def update(self, docs: DataFrame, id_col: str = "doc_id",
               toks_col: str = "toks") -> DataFrame:
        """Probe + append one batch. ``docs`` carries (id_col, toks_col:
        array<string> of DISTINCT tokens). Returns the batch's candidate
        pairs as (doc_a, doc_b), doc_a < doc_b, deduped — new-vs-stored
        collisions plus new-vs-new collisions within the batch.

        The batch side is collected ONCE to (a) drive literal-isin shard
        pruning on the store scan and (b) broadcast the probe join —
        both require batch keys to be micro-batch-sized, which
        maxFilesPerTrigger-style batch bounding guarantees upstream.
        """
        spark = docs.sparkSession
        keys = self._keys(docs, id_col, toks_col).localCheckpoint(
            eager=True)

        shards = [r["shard"] for r in
                  keys.select("shard").distinct().collect()]
        stored = self._stored(spark)
        if shards:
            stored = stored.where(F.col("shard").isin(shards))
        # at-least-once replay safety: a retried batch (pairs write
        # failed after the index append landed) finds its own keys
        # already stored — drop them from BOTH the append and the
        # stored probe side, so counts never double and the re-run
        # emits the same pairs as the first attempt would have
        stored = stored.localCheckpoint(eager=True)
        replayed = stored.join(F.broadcast(keys), ["doc_id", "bk"],
                               "left_semi")
        stored = stored.join(F.broadcast(keys), ["doc_id", "bk"],
                             "left_anti")
        keys_new = keys  # every key is appended unless already stored
        if replayed.limit(1).count():
            keys_new = keys.join(replayed, ["doc_id", "bk"], "left_anti")

        # TOTAL-population cap per bucket (stored + this batch): a
        # bucket over the cap is degenerate — emit NO pairs through it,
        # matching what a batch rebuild over the corpus-so-far would
        # drop; earlier batches' pairs stand (a stream cannot retract
        # history — see module docstring)
        batch_bn = keys.groupBy("bk").agg(F.count("*").alias("_bbn"))
        bn = (stored.groupBy("bk").agg(F.count("*").alias("_sbn"))
              .join(batch_bn, "bk", "full")
              .select("bk", (F.coalesce("_sbn", F.lit(0))
                             + F.coalesce("_bbn", F.lit(0))).alias("_bn")))
        live_bk = bn.where(F.col("_bn") <= self.max_bucket).select("bk") \
            .localCheckpoint(eager=True)

        new_old = (stored.join(F.broadcast(live_bk), "bk")
                   .join(F.broadcast(keys.select(
                       F.col("doc_id").alias("doc_new"), "bk")), "bk")
                   .select(F.least("doc_id", "doc_new").alias("doc_a"),
                           F.greatest("doc_id", "doc_new").alias("doc_b"))
                   .where(F.col("doc_a") != F.col("doc_b")))
        capped = keys.join(F.broadcast(live_bk), "bk")
        a = capped.select(F.col("doc_id").alias("doc_a"), "bk")
        b = capped.select(F.col("doc_id").alias("doc_b"), "bk")
        new_new = (a.join(b, "bk")
                   .where(F.col("doc_a") < F.col("doc_b"))
                   .select("doc_a", "doc_b"))
        pairs = new_old.unionByName(new_new).distinct() \
            .localCheckpoint(eager=True)

        # append AFTER the probe is materialized: the probe scan reads
        # the very dirs the append grows; pairs is checkpointed first so
        # a mid-append crash re-runs the batch cleanly, and the replay
        # anti-join above makes the re-run's append a no-op
        (keys_new.repartition("shard")
             .write.partitionBy("shard").mode("append")
             .parquet(self.path))
        return pairs


def run_near_dup_stream(spark: SparkSession, in_path: str, index_path: str,
                        pairs_path: str, schema: str,
                        tokenize, id_col: str = "doc_id",
                        checkpoint: str | None = None,
                        max_files_per_trigger: int = 1,
                        **index_kw):
    """Production wiring: file-source doc stream → per-micro-batch
    :meth:`LshIndex.update` probe-then-append → candidate pairs appended
    to ``pairs_path`` (the same foreachBatch shape as
    :func:`~graphiti_spark.streaming.ingest.run_stream`). ``tokenize``
    maps the raw batch DataFrame to (id_col, toks: array<string> of
    DISTINCT tokens) — pass the corpus's shingling. Returns the
    StreamingQuery (caller awaits/stops); restart-safe because the
    index IS the state (no engine-held dedup state to lose)."""
    idx = LshIndex(index_path, **index_kw)

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (idx.update(tokenize(batch_df), id_col=id_col)
            .write.mode("append").parquet(pairs_path))

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(in_path))
    return (src.writeStream
            .foreachBatch(_batch)
            # checkpoint OUTSIDE the index dir: a subdir inside it would
            # make the first probe read a parquet-less directory
            .option("checkpointLocation",
                    checkpoint or index_path.rstrip("/") + "_checkpoints")
            .trigger(availableNow=True)
            .start())
