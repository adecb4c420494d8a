"""Sequence packing — concat-and-chunk packing coordinates for LLM training.

Every pre-training pipeline ends with this step: documents are concatenated
in a deterministic order and chunked into fixed token-budget training
sequences (GPT-style "pack and chunk"; a document that straddles a chunk
boundary is split across sequences). This module computes the packing
COORDINATES per document — where each doc's tokens land in the packed
stream — which is all a writer needs to emit the packed shards, and is
exactly reproducible from the row alone.

Scale shape: ONE hash shuffle on the shard column (the window cumsum);
everything downstream is narrow integer arithmetic riding that exchange.
Shards bound the window state — at 100 TB you shard by a hash bucket (as
the driver query does), so no single reducer sees more than one shard and
packing is embarrassingly parallel across shards. Sequences never cross
shard boundaries, which is the standard practice (it keeps shards
independently writable and resumable).

Reference analogue: the reference materializes episodic text for downstream
LLM consumption (graphiti_core/graphiti.py add_episode bulk paths); packing
is the training-data-pipeline generalization the brief asks for beyond the
reference's own surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   order_cols: list[str], shard_col: str | None = None,
                   ) -> DataFrame:
    """Assign concat-and-chunk packing coordinates to each document.

    Within each shard (``shard_col``; one global shard when ``None``),
    documents are ordered by ``order_cols``, concatenated, and chunked into
    sequences of exactly ``budget`` tokens. Adds integer columns:

    * ``start_tok`` — exclusive prefix sum of ``token_col`` (the doc's
      first token's position in the shard's packed stream);
    * ``first_seq`` / ``last_seq`` — the sequence indexes the doc's first
      and last token land in (a doc spanning a boundary is split);
    * ``n_seqs`` — how many sequences the doc touches;
    * ``seq_offset`` — position of the doc's first token inside
      ``first_seq``.

    All arithmetic is integer (BIGINT), so results are hash-exact across
    engines and runs. ``order_cols`` must be a total order within each
    shard for determinism.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = F.col(shard_col) if shard_col else F.lit(0)
    w = (Window.partitionBy(shard).orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, -1))
    b = F.lit(budget).cast("bigint")
    start = F.coalesce(F.sum(token_col).over(w).cast("bigint"),
                       F.lit(0).cast("bigint"))
    # A zero-token doc occupies no sequence span; greatest(...) pins its
    # last token to start_tok so n_seqs stays 1 and downstream writers
    # treat it as an empty marker.
    return (df.withColumn("start_tok", start)
            .withColumn("first_seq",
                        F.expr(f"start_tok DIV {budget}").cast("bigint"))
            .withColumn("last_seq",
                        F.expr(f"greatest(start_tok + {token_col} - 1, "
                               f"start_tok) DIV {budget}").cast("bigint"))
            .withColumn("n_seqs",
                        (F.col("last_seq") - F.col("first_seq") + 1)
                        .cast("bigint"))
            .withColumn("seq_offset",
                        (F.col("start_tok") % b).cast("bigint")))
