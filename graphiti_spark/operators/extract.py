"""M2 — extraction operators (SURVEY.md §2.2 E1/E3/E5/E7).

Vectorized pandas/Arrow UDFs wrapping the deterministic rule module
(:mod:`graphiti_spark.rules`) — the Spark-side stand-ins for the reference's
LLM prompt programs:

  * :func:`extract_mentions_udf` ≙ ``extract_nodes``
    (``utils/maintenance/node_operations.py:69-175``)
  * :func:`extract_triples_udf` ≙ ``extract_edges`` + edge-date resolution
    (``utils/maintenance/edge_operations.py:110-244`` +
    ``temporal_operations.py:33-69``)
  * :func:`embed_udf` ≙ the embedder client (``embedder/client.py:29-37``)

Each UDF is Scalar-pandas (one Arrow batch per call); results are arrays of
structs that the caller ``explode``s — i.e. UDTF semantics without leaving
the DataFrame API. Entity/edge uuids are pure functions of content (sha1),
computed JVM-side, so downstream joins need no driver-side uuid_map dict —
the reference's ``uuid_map`` (``bulk_utils.py:420-427``) becomes a column
expression + one canonicalization join.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphiti_spark import rules
from graphiti_spark.functions import text as tx
from graphiti_spark.operators.episodes import stable_id_cols
from graphiti_spark.schema import MENTION, TRIPLE

EMBED_DIM = tx.EMBED_DIM


def _pc(pc):
    """Arrow array cell → prev_context argument (None for empty)."""
    return None if pc is None or len(pc) == 0 else list(pc)


@F.pandas_udf(T.ArrayType(MENTION))
def extract_mentions_udf(content: pd.Series, source: pd.Series,
                         prev_context: pd.Series) -> pd.Series:
    return pd.Series(
        [rules.extract_mentions(c or "", s or rules.SOURCE_MESSAGE,
                                prev_context=_pc(pc))
         for c, s, pc in zip(content, source, prev_context)], dtype=object)


def extract_mentions_udf_for(ontology):
    """E6: the mention UDF bound to a custom
    :class:`~graphiti_spark.ontology.Ontology` (caller templates +
    excluded types). The ontology object (compiled regexes included)
    pickles into the UDF closure and ships to executors once per stage."""
    @F.pandas_udf(T.ArrayType(MENTION))
    def _udf(content: pd.Series, source: pd.Series,
             prev_context: pd.Series) -> pd.Series:
        return pd.Series(
            [rules.extract_mentions(c or "", s or rules.SOURCE_MESSAGE,
                                    ontology, prev_context=_pc(pc))
             for c, s, pc in zip(content, source, prev_context)],
            dtype=object)
    return _udf


# Combined single-pass extraction: mentions + triples from one scan of the
# content (one Python stage instead of two full Arrow round-trips).
COMBINED = T.StructType([
    T.StructField("mentions", T.ArrayType(MENTION), False),
    T.StructField("triples", T.ArrayType(TRIPLE), False),
])


@F.pandas_udf(COMBINED)
def extract_all_udf(content: pd.Series, ts: pd.Series, source: pd.Series,
                    prev_context: pd.Series) -> pd.DataFrame:
    """``prev_context``: array<string> of previous-episode contents
    (the reference's ``previous_episodes`` window) — empty/null for the
    pronoun-free hot path; rules.extract_all consumes it lazily, only
    when a coref pronoun actually needs a cross-episode antecedent."""
    mentions, triples = [], []
    for c, t, s, pc in zip(content, ts, source, prev_context):
        c = c or ""
        s = s or rules.SOURCE_MESSAGE
        t_aware = None if pd.isna(t) else pd.Timestamp(t).tz_localize("UTC")
        ms, rows = rules.extract_all(
            c, t_aware, s,
            prev_context=None if pc is None or len(pc) == 0 else list(pc))
        mentions.append(ms)
        triples.append([
            {**r, "valid_at": _naive_utc(r["valid_at"]),
             "invalid_at": _naive_utc(r["invalid_at"])}
            for r in rows])
    return pd.DataFrame({"mentions": mentions, "triples": triples})


def _naive_utc(dt) -> datetime | None:
    if dt is None or (isinstance(dt, float) and pd.isna(dt)):
        return None
    t = pd.Timestamp(dt)
    if t.tzinfo is not None:
        t = t.tz_convert("UTC").tz_localize(None)
    return t.to_pydatetime()


@F.pandas_udf(T.ArrayType(TRIPLE))
def extract_triples_udf(content: pd.Series, ts: pd.Series,
                        source: pd.Series,
                        prev_context: pd.Series) -> pd.Series:
    out = []
    for c, t, s, pc in zip(content, ts, source, prev_context):
        t_aware = None if pd.isna(t) else pd.Timestamp(t).tz_localize("UTC")
        rows = rules.extract_triples(c or "", t_aware,
                                     s or rules.SOURCE_MESSAGE,
                                     prev_context=_pc(pc))
        out.append([
            {**r, "valid_at": _naive_utc(r["valid_at"]),
             "invalid_at": _naive_utc(r["invalid_at"])}
            for r in rows
        ])
    return pd.Series(out, dtype=object)


def extract_triples_udf_for(ontology):
    """E6: the triple UDF bound to a custom ontology (see
    :func:`extract_mentions_udf_for`)."""
    @F.pandas_udf(T.ArrayType(TRIPLE))
    def _udf(content: pd.Series, ts: pd.Series,
             source: pd.Series, prev_context: pd.Series) -> pd.Series:
        out = []
        for c, t, s, pc in zip(content, ts, source, prev_context):
            t_aware = (None if pd.isna(t)
                       else pd.Timestamp(t).tz_localize("UTC"))
            rows = rules.extract_triples(c or "", t_aware,
                                         s or rules.SOURCE_MESSAGE,
                                         ontology, prev_context=_pc(pc))
            out.append([
                {**r, "valid_at": _naive_utc(r["valid_at"]),
                 "invalid_at": _naive_utc(r["invalid_at"])}
                for r in rows
            ])
        return pd.Series(out, dtype=object)
    return _udf


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda s: tx.embed_text(s or "").tolist())


def norm_name_col(col):
    """JVM-side rules.normalize_name: lower, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def _prev_ctx_col(episodes: DataFrame):
    """prev_context column if the episodes carry one (assemble_episodes
    include_context / hydrate_context), else an empty-array literal so
    the UDF signature stays uniform (null → no cross-episode seeding)."""
    if "prev_context" in episodes.columns:
        return F.col("prev_context")
    # non-foldable empty array (see assemble_episodes: the F.array()
    # literal as a UDF arg under Generate trips a Catalyst pruning bug)
    return F.slice(F.array(F.col("content")), 1, 0)


def extract_combined(episodes: DataFrame) -> DataFrame:
    """One UDF pass per episode → (episode meta, mentions[], triples[]).
    The pipeline persists THIS and derives both the mentions and raw-edge
    tables from it, so content is scanned by Python exactly once."""
    return (episodes
            .select("group_id", F.col("uuid").alias("episode_uuid"),
                    "turn_idx", "valid_at",
                    extract_all_udf(F.col("content"), F.col("valid_at"),
                                    F.col("source"),
                                    _prev_ctx_col(episodes)).alias("x")))


def mentions_from_combined(combined: DataFrame) -> DataFrame:
    return (combined
            .select("group_id", "episode_uuid", "turn_idx",
                    F.explode("x.mentions").alias("m"))
            .select("group_id", "episode_uuid", "turn_idx",
                    F.col("m.name").alias("name"),
                    norm_name_col(F.col("m.name")).alias("name_norm"),
                    F.col("m.entity_type_id").alias("entity_type_id"))
            .withColumn("entity_uuid",
                        stable_id_cols(F.lit("entity"), F.col("group_id"),
                                       F.col("name_norm"))))


def edges_from_combined(combined: DataFrame, run_ts) -> DataFrame:
    t = (combined
         .select("group_id", "episode_uuid", "turn_idx",
                 F.explode("x.triples").alias("t"))
         .select("group_id", "episode_uuid", "turn_idx",
                 "t.subj", "t.pred", "t.obj", "t.fact",
                 F.col("t.valid_at").alias("valid_at"),
                 F.col("t.invalid_at").alias("invalid_at"),
                 F.col("t.attributes").alias("attributes")))
    return _finish_raw_edges(t, run_ts)


def extract_mentions(episodes: DataFrame, ontology=None) -> DataFrame:
    """episodes → exploded mentions (group_id, episode_uuid, turn_idx,
    name, name_norm, entity_type_id, entity_uuid). One row per distinct
    mention per episode. ``ontology`` (E6) swaps in a custom rule set."""
    udf = (extract_mentions_udf if ontology is None
           else extract_mentions_udf_for(ontology))
    return (
        episodes
        .withColumn("m", F.explode(udf(F.col("content"), F.col("source"),
                                       _prev_ctx_col(episodes))))
        .select(
            "group_id",
            F.col("uuid").alias("episode_uuid"),
            "turn_idx",
            F.col("m.name").alias("name"),
            norm_name_col(F.col("m.name")).alias("name_norm"),
            F.col("m.entity_type_id").alias("entity_type_id"),
        )
        .withColumn("entity_uuid",
                    stable_id_cols(F.lit("entity"), F.col("group_id"),
                                   F.col("name_norm")))
    )


def raw_entities(mentions: DataFrame, run_ts: datetime) -> DataFrame:
    """Distinct pre-dedup entities per group, with deterministic tie-breaks:
    surface form / type = those of the first mention (min turn_idx)."""
    first = F.min(F.struct("turn_idx", "name", "entity_type_id")).alias("f")
    return (
        mentions
        .groupBy("group_id", "entity_uuid", "name_norm")
        .agg(first,
             F.min("turn_idx").alias("first_turn"))
        .select(
            F.col("entity_uuid").alias("uuid"),
            F.col("f.name").alias("name"),
            "group_id",
            F.array(F.col("f.entity_type_id")).alias("labels"),
            F.lit(run_ts).cast("timestamp").alias("created_at"),
            "name_norm",
            "first_turn",
        )
        # No embedding here: dedup verifies JVM-side (token cosine), so the
        # pipeline embeds only canonical entities, once, at the final stage.
    )


def extract_edges(episodes: DataFrame, run_ts: datetime,
                  ontology=None) -> DataFrame:
    """episodes → raw (pre-canonicalization) entity edges.

    Endpoint uuids are computed directly (sha1 of normalized surface form),
    matching the mention-side ids — the reference's resolve-by-index join
    (``edge_operations.py:182-209``) collapses into column expressions.
    Negation rows ("no longer ...") carry invalid_at and a null valid_at.
    ``ontology`` (E6) swaps in a custom rule set.
    """
    udf = (extract_triples_udf if ontology is None
           else extract_triples_udf_for(ontology))
    t = (
        episodes
        .withColumn("t", F.explode(udf(F.col("content"),
                                       F.col("valid_at"),
                                       F.col("source"),
                                       _prev_ctx_col(episodes))))
        .select("group_id", F.col("uuid").alias("episode_uuid"), "turn_idx",
                "t.subj", "t.pred", "t.obj", "t.fact",
                F.col("t.valid_at").alias("valid_at"),
                F.col("t.invalid_at").alias("invalid_at"),
                F.col("t.attributes").alias("attributes"))
    )
    return _finish_raw_edges(t, run_ts)


def _finish_raw_edges(t: DataFrame, run_ts) -> DataFrame:
    subj_norm = norm_name_col(F.col("subj"))
    obj_norm = norm_name_col(F.col("obj"))
    return (
        t
        .withColumn("source_node_uuid",
                    stable_id_cols(F.lit("entity"), F.col("group_id"), subj_norm))
        .withColumn("target_node_uuid",
                    stable_id_cols(F.lit("entity"), F.col("group_id"), obj_norm))
        .where(F.col("source_node_uuid") != F.col("target_node_uuid"))
        .withColumn("uuid",
                    stable_id_cols(F.lit("edge"), F.col("group_id"),
                                   F.col("source_node_uuid"), F.col("pred"),
                                   F.col("target_node_uuid"),
                                   norm_name_col(F.col("fact")),
                                   F.col("turn_idx").cast("string")))
        .withColumn("created_at", F.lit(run_ts).cast("timestamp"))
    )
