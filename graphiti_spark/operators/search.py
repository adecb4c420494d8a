"""M6 — query-side search layer (SURVEY.md §2.9 Q1-Q9).

The reference fans a query out to 2-3 retrieval methods per layer
(fulltext BM25 ⫽ embedding cosine ⫽ graph BFS, ``search/search.py:66-162``)
and fuses with a reranker. Spark-first re-expression:

  * fulltext → **BM25-lite**: tokenize once into an array column, explode,
    equi-join query tokens, tf×idf aggregation (Q1/Q4/Q5; the reference's
    Lucene index probes become joins — SURVEY §4 "index selection").
  * similarity → JVM-side cosine with ``zip_with``/``aggregate`` column
    expressions (no Python in the hot path; Q2).
  * bfs → iterative frontier self-join, depth ≤ 3 (`MAX_SEARCH_DEPTH`,
    ``search_utils.py:61``; Q3).
  * rerankers → rrf (``search_utils.py:875-890``), mmr
    (``search_utils.py:968-1006``), node_distance (``:893-936``),
    episode_mentions (``:939-965``) as window/groupBy pipelines (Q7).
  * SearchFilters → AND-of-OR Column predicate compiler
    (``search/search_filters.py:40-184``; Q8).

Every search returns (uuid, score) plus payload columns; limits follow the
reference's 2×limit-per-method-then-fuse shape (``search.py:183-204``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_SEARCH_DEPTH = 3          # search_utils.py:61
DEFAULT_SEARCH_LIMIT = 10     # search_config.py:29
DEFAULT_MIN_SCORE = 0.6       # search_utils.py:59
MMR_LAMBDA = 0.5              # search_config.py defaults
MAX_MMR_CANDIDATES = 4096     # driver-side greedy MMR collect guard


def tokens_col(col) -> F.Column:
    """Fulltext tokenization as a column expression (lucene_sanitize +
    analyzer stand-in, ``helpers.py:67-101``): lowercase alnum runs.

    Single regex pass: split directly on the non-alnum delimiter class
    (after lower(), A-Z is gone) instead of regexp_replace-then-split —
    the replace+split form was 26× the per-doc cost and tokenization
    dominates fulltext search (62s of a 118s BM25 at 10⁶ docs). Token
    streams agree on ASCII; they differ only on characters whose
    LOWERCASE form introduces ASCII alnum (e.g. 'İ' → 'i̇', Kelvin 'K' →
    'k'), where lower-then-split keeps the letter the old
    delete-then-lower form dropped — the new behavior matches the
    Python ``functions.text.tokenize`` twin and the DuckDB oracle
    (both lower first), so the three tokenizers now agree."""
    return F.array_remove(F.split(F.lower(col), "[^a-z0-9]+"), "")


def bm25_lite_search(df: DataFrame, text_col: str, query: str,
                     id_col: str = "uuid", k1: float = 1.2, b: float = 0.75,
                     limit: int = 2 * DEFAULT_SEARCH_LIMIT) -> DataFrame:
    """Q1/Q4/Q5 fulltext search: full BM25 over a token equi-join.

    idf computed from the corpus itself (doc-frequency aggregation);
    ``b`` is Lucene's length-normalization knob (the reference's fulltext
    indexes rely on Lucene defaults, where b=0.75 — ``graph_queries.py``
    index DDL); b=0 recovers the un-normalized round-2 scorer. Short
    queries (≤32 unique terms — the common case) score via pure array
    column expressions with df folded into the 1-row corpus-stats
    broadcast: two scans, zero wide shuffles. Longer queries fall back to
    the explode + broadcast-equi-join plan. Both produce identical
    tf/df/N/avgdl, hence identical scores."""
    q_tokens = [t for t in
                "".join(c.lower() if c.isalnum() else " " for c in query)
                .split() if t]
    if not q_tokens:
        return df.select(F.col(id_col).alias("uuid")).limit(0) \
                 .withColumn("score", F.lit(0.0))
    uniq = list(dict.fromkeys(q_tokens))
    # Tokenize ONCE per scan: materializing the token array in a prior
    # projection keeps the regex split from running 2-3× per row.
    base = df.select(F.col(id_col).alias("_id"),
                     tokens_col(F.col(text_col)).alias("_toks"))
    if len(uniq) <= 32:
        return _bm25_arrays(base, uniq, k1, b, limit)
    return _bm25_explode(base, uniq, k1, b, limit)


def _bm25_arrays(base: DataFrame, uniq: list[str], k1: float, b: float,
                 limit: int) -> DataFrame:
    """BM25 scored entirely with array column expressions — the scale path
    for short queries. Per-token tf is ``size(_toks) -
    size(array_remove(_toks, t))`` (one narrow pass over each doc's token
    array per query token, all inside whole-stage codegen); doc
    frequencies fold into the SAME 1-row corpus-stats aggregate as N and
    avgdl. Two corpus scans total, ZERO wide shuffles — no 10⁸-row explode
    or tf groupBy at 10⁶ docs (the explode plan took 188s there; this one
    is scan-bound). Every number (tf, df, N, avgdl) is identical to the
    explode plan, so scores and the SQL oracle replay are unchanged."""
    tf_cols = [(F.size("_toks") - F.size(F.array_remove("_toks", t)))
               .cast("double").alias(f"_tf_{i}")
               for i, t in enumerate(uniq)]
    pre = base.select("_id", F.size("_toks").cast("double").alias("_dl"),
                      *tf_cols)
    stats_df = pre.agg(
        F.count("*").cast("double").alias("_n_docs"),
        F.coalesce(F.avg("_dl"), F.lit(1.0)).alias("_avgdl"),
        *[F.sum((F.col(f"_tf_{i}") > 0).cast("double")).alias(f"_df_{i}")
          for i in range(len(uniq))])
    norm = F.lit(1.0 - b) + F.lit(b) * F.col("_dl") \
        / F.greatest(F.col("_avgdl"), F.lit(1e-9))
    score = None
    for i in range(len(uniq)):
        idf = F.log((F.col("_n_docs") - F.col(f"_df_{i}") + 0.5)
                    / (F.col(f"_df_{i}") + 0.5) + 1.0)
        w = idf * (F.col(f"_tf_{i}") * (k1 + 1)) \
            / (F.col(f"_tf_{i}") + k1 * norm)
        score = w if score is None else score + w
    return (pre.crossJoin(F.broadcast(stats_df))
            .select(F.col("_id").alias("uuid"), score.alias("score"))
            .where(F.col("score") > 0)
            .orderBy(F.col("score").desc(), "uuid").limit(limit))


def _bm25_explode(base: DataFrame, uniq: list[str], k1: float, b: float,
                  limit: int) -> DataFrame:
    """BM25 via token explode + broadcast equi-join — the long-query path
    (arrays path cost is O(|query| × doclen) per doc, so past ~32 unique
    terms the single explode + tf groupBy wins). Corpus size + average doc
    length fold into a 1-row broadcast aggregate — no separate count()
    action or scan per search."""
    stats_df = base.select(
        F.count("*").cast("double").alias("_n_docs"),
        F.coalesce(F.avg(F.size("_toks")), F.lit(1.0)).alias("_avgdl"))
    toks = (base.select(F.col("_id").alias("uuid"),
                        F.size("_toks").cast("double").alias("_dl"),
                        F.explode("_toks").alias("tok")))
    qdf = toks.sparkSession.createDataFrame(
        [(t,) for t in uniq], ["tok"])
    tf = (toks.join(F.broadcast(qdf), "tok")
          .groupBy("uuid", "tok").agg(F.count("*").alias("tf"),
                                      F.max("_dl").alias("_dl")))
    df_freq = tf.groupBy("tok").agg(F.countDistinct("uuid").alias("df"))
    norm = F.lit(1.0 - b) + F.lit(b) * F.col("_dl") \
        / F.greatest(F.col("_avgdl"), F.lit(1e-9))
    scored = (tf.join(F.broadcast(df_freq), "tok")
              .crossJoin(F.broadcast(stats_df))
              .withColumn("idf", F.log(
                  (F.col("_n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0))
              .withColumn("w", F.col("idf") * (F.col("tf") * (k1 + 1))
                          / (F.col("tf") + k1 * norm))
              .groupBy("uuid").agg(F.sum("w").alias("score")))
    return (scored.select("uuid", "score")
            .orderBy(F.col("score").desc(), "uuid").limit(limit))


def build_inverted_index(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", min_len: int = 2,
                         stopwords: tuple[str, ...] | None = None,
                         n_buckets: int = 8) -> DataFrame:
    """Materialized inverted index (posting lists) — the batch
    index-build behind fulltext search at rest, where bm25_lite_search
    computes tf/df on the fly per query.

    Returns one row per ``(term, bucket)``: ``df_part`` (docs), ``cf_part``
    (corpus frequency), and ``postings`` — the '|'-joined ascending doc
    ids of the bucket segment. For a NUMERIC ``id_col`` the bucket is
    ``doc_id % n_buckets``, so segments are disjoint and internally
    sorted and a reader reconstructs a term's full (sorted) posting list
    by a k-way merge of its buckets. For a STRING id (the pipeline's
    uuids) the bucket is ``pmod(hash(id), n_buckets)`` — a plain modulus
    would cast the string and either throw under ANSI mode or collapse
    every doc into a NULL bucket; segments stay disjoint and internally
    sorted, reconstruction is the same merge.

    Scale shape, sized for a 100 TB corpus: per-doc (term, tf) pairs
    come from the zero-shuffle sorted-run-length fold
    (keywords._tf_pairs_sql), so the ONLY shuffle is the ``groupBy
    (term, bucket)`` — map-side combined over distinct (doc, term) rows.
    The bucket in the key is the skew control: a head term (stopword-ish,
    present in nearly every doc) would otherwise send its entire posting
    list to ONE reducer; bucketing bounds each reducer's state to
    ~corpus/n_buckets regardless of term skew, at the price of
    n_buckets rows per term. Set n_buckets ~ O(corpus_docs /
    target_segment_size); 1 re-creates the classic single-list layout.
    """
    from graphiti_spark.operators.keywords import (DEFAULT_STOPWORDS,
                                                   _tf_pairs_sql)
    if stopwords is None:
        stopwords = DEFAULT_STOPWORDS
    pairs = (df.select(id_col,
                       F.expr(_tf_pairs_sql(text_col, min_len, stopwords))
                       .alias("pairs"))
             .select(id_col, F.explode("pairs").alias("p"))
             .select(id_col, F.col("p.term").alias("term"),
                     F.col("p.tf").alias("tf")))
    from pyspark.sql.types import NumericType
    if isinstance(df.schema[id_col].dataType, NumericType):
        bucket = F.pmod(F.col(id_col), F.lit(n_buckets))
    else:
        bucket = F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets))
    return (pairs
            .withColumn("bucket", bucket.cast("int"))
            .groupBy("term", "bucket")
            .agg(F.count(F.lit(1)).alias("df_part"),
                 F.sum("tf").alias("cf_part"),
                 F.array_join(
                     F.expr(f"transform(array_sort(collect_list({id_col})), "
                            "x -> CAST(x AS STRING))"), "|")
                 .alias("postings")))


def cosine_col(emb_col, query_vec: list[float]) -> F.Column:
    """JVM-side cosine similarity of an array<float> column vs a literal
    query vector — whole-stage-codegen'd, no Python (F4).

    The query vector is ONE array Literal (``F.lit(list)``), not an
    ``array()`` of 1024 literal nodes — the wide expression tree cost
    ~0.5 s of Catalyst analysis per action at dim 1024 (measured: warm
    top-k 1.2 s → 0.72 s on a cached 27k-row table)."""
    q = F.lit([float(x) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    dot = F.aggregate(
        F.zip_with(emb_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(
        emb_col, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return F.when(norm > 0, dot / (norm * F.lit(qn))).otherwise(F.lit(0.0))


def similarity_search(df: DataFrame, emb_col: str, query_vec: list[float],
                      id_col: str = "uuid",
                      min_score: float = DEFAULT_MIN_SCORE,
                      limit: int = 2 * DEFAULT_SEARCH_LIMIT) -> DataFrame:
    """Q2 cosine search with min_score filter + top-k
    (``search_utils.py:188-249``)."""
    return (df.withColumn("score", cosine_col(F.col(emb_col), query_vec))
            .where(F.col("score") > min_score)
            .select(F.col(id_col).alias("uuid"), "score")
            .orderBy(F.col("score").desc(), "uuid").limit(limit))


def bfs_search(edges: DataFrame, origin_uuids: list[str],
               depth: int = MAX_SEARCH_DEPTH) -> DataFrame:
    """Q3/J9: nodes (and the edges traversed) within `depth` hops of the
    origins; iterative frontier join, per-level dedup (GraphFrames-style).
    Returns (uuid, hops) over edge uuids — matching edge_bfs_search which
    returns the edges on paths (``search_utils.py:252-296``)."""
    spark = edges.sparkSession
    sym = (edges.select(F.col("source_node_uuid").alias("src"),
                        F.col("target_node_uuid").alias("dst"),
                        F.col("uuid").alias("edge_uuid"))
           .unionByName(edges.select(
               F.col("target_node_uuid").alias("src"),
               F.col("source_node_uuid").alias("dst"),
               F.col("uuid").alias("edge_uuid"))))
    frontier = spark.createDataFrame([(u,) for u in origin_uuids], ["node"])
    seen_nodes = frontier
    out = None
    for hop in range(1, depth + 1):
        # Broadcast only the first frontier (the literal origin list, known
        # small). Deeper frontiers on a dense graph can reach millions of
        # nodes — a forced broadcast there is a driver OOM at scale, so the
        # later hops use an unhinted equi-join and let AQE pick the
        # strategy (it still broadcasts when the frontier is actually
        # small at runtime).
        fr = F.broadcast(frontier) if hop == 1 else frontier
        step = (sym.join(fr, sym.src == frontier.node)
                .select("dst", "edge_uuid")
                .withColumn("hops", F.lit(hop)))
        hop_edges = step.select(F.col("edge_uuid").alias("uuid"), "hops")
        out = hop_edges if out is None else out.unionByName(hop_edges)
        frontier = (step.select(F.col("dst").alias("node")).distinct()
                    .join(seen_nodes, "node", "left_anti")
                    .localCheckpoint(eager=True))
        seen_nodes = seen_nodes.unionByName(frontier).localCheckpoint(True)
        if frontier.limit(1).count() == 0:
            break
    return (out.groupBy("uuid").agg(F.min("hops").alias("hops"))
            if out is not None else
            spark.createDataFrame([], "uuid string, hops int"))


# ---------------------------------------------------------------------------
# Rerankers (Q7)
# ---------------------------------------------------------------------------

def rrf(result_lists: list[DataFrame], rank_const: int = 1,
        min_score: float = 0.0) -> DataFrame:
    """A2 reciprocal rank fusion (``search_utils.py:875-890``): each input
    is a scored (uuid, score) DF; rank within each list (0-based), fuse
    score(uuid) = Σ 1/(rank + rank_const)."""
    fused = None
    for i, df in enumerate(result_lists):
        w = Window.orderBy(F.col("score").desc(), "uuid")
        ranked = df.select(
            "uuid", (F.row_number().over(w) - 1).alias("rank"))
        part = ranked.select(
            "uuid", (F.lit(1.0) / (F.col("rank") + F.lit(rank_const)))
            .alias("part"))
        fused = part if fused is None else fused.unionByName(part)
    return (fused.groupBy("uuid").agg(F.sum("part").alias("score"))
            .where(F.col("score") >= min_score)
            .orderBy(F.col("score").desc(), "uuid"))


def episode_mentions_reranker(episodic_edges: DataFrame,
                              candidates: DataFrame) -> DataFrame:
    """A3: relevance = MENTIONS count per entity
    (``search_utils.py:939-965``). Counting per canonical entity is the
    canonical hot-key aggregation at 10^12-turn scale (a famous entity is
    mentioned everywhere), so it goes through the two-phase salted
    aggregation."""
    from graphiti_spark.operators.skew import salted_count
    counts = (salted_count(
        episodic_edges.select(F.col("target_node_uuid").alias("entity"),
                              F.col("uuid").alias("_edge_uuid")),
        ["entity"], unique_col="_edge_uuid", out="score")
        .select(F.col("entity").alias("uuid"),
                F.col("score").cast("double").alias("score")))
    return (candidates.select("uuid").join(counts, "uuid", "left")
            .na.fill({"score": 0.0})
            .orderBy(F.col("score").desc(), "uuid"))


def node_distance_reranker(edges: DataFrame, candidates: DataFrame,
                           center_uuid: str) -> DataFrame:
    """J10: score = 1/dist with dist=1 for 1-hop neighbors of the center,
    ∞ (score 0) otherwise; the center itself gets dist 0.1 → score 10
    (``search_utils.py:893-936``)."""
    neigh = (edges.where((F.col("source_node_uuid") == center_uuid)
                         | (F.col("target_node_uuid") == center_uuid))
             .select(F.when(F.col("source_node_uuid") == center_uuid,
                            F.col("target_node_uuid"))
                     .otherwise(F.col("source_node_uuid")).alias("uuid"))
             .distinct()
             .withColumn("score", F.lit(1.0)))
    return (candidates.select("uuid")
            .join(neigh, "uuid", "left")
            .withColumn("score",
                        F.when(F.col("uuid") == center_uuid, F.lit(10.0))
                        .otherwise(F.coalesce("score", F.lit(0.0))))
            .orderBy(F.col("score").desc(), "uuid"))


def cross_encoder_rank(df: DataFrame, text_col: str, query: str,
                       id_col: str = "uuid") -> DataFrame:
    """Q7 ``cross_encoder`` reranker stand-in.

    The reference ranks passages against the query with an external
    cross-encoder model (``cross_encoder/client.py:30-44``, dispatched at
    ``search/search.py:254-260``). The deterministic offline replacement is
    a lexical-overlap scorer: score = |query_toks ∩ passage_toks| /
    |query_toks| — monotone in shared-vocabulary coverage, computed
    entirely JVM-side (whole-stage codegen, no Python)."""
    q_tokens = sorted({t for t in
                       "".join(c.lower() if c.isalnum() else " "
                               for c in query).split() if t})
    spark = df.sparkSession
    if not q_tokens:
        return spark.createDataFrame([], "uuid string, score double")
    q_arr = F.array(*[F.lit(t) for t in q_tokens])
    score = (F.size(F.array_intersect(tokens_col(F.col(text_col)), q_arr))
             .cast("double") / F.lit(float(len(q_tokens))))
    return (df.select(F.col(id_col).alias("uuid"), score.alias("score"))
            .orderBy(F.col("score").desc(), "uuid"))


def _mmr_greedy(embs, query_vec, mmr_lambda: float, limit: int):
    """Numpy core of F5 greedy MMR (``search_utils.py:968-1006``):
    mmr = λ·sim(q, c) + (λ-1)·max_sim(c, selected). Returns (selected
    indices, their scores) in selection order."""
    import numpy as np

    norms = np.linalg.norm(embs, axis=1)
    norms[norms == 0] = 1.0
    embs = embs / norms[:, None]
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    rel = embs @ q
    selected: list[int] = []
    scores: list[float] = []
    remaining = list(range(len(embs)))
    while remaining and len(selected) < limit:
        if selected:
            max_sim = np.max(embs[remaining] @ embs[selected].T, axis=1)
        else:
            max_sim = np.zeros(len(remaining))
        mmr = mmr_lambda * rel[remaining] + (mmr_lambda - 1) * max_sim
        best = int(np.argmax(mmr))
        idx = remaining.pop(best)
        scores.append(float(mmr[best]))
        selected.append(idx)
    return selected, scores


def mmr_rerank(candidates: DataFrame, emb_col: str, query_vec: list[float],
               mmr_lambda: float = MMR_LAMBDA,
               limit: int = DEFAULT_SEARCH_LIMIT) -> DataFrame:
    """F5 maximal-marginal-relevance for ONE query: driver-side greedy
    selection (``search_utils.py:968-1006``). Candidate sets are small
    (≤2×limit per method). For batches of many queries use
    :func:`mmr_rerank_grouped`, which keeps the loop on the executors."""
    import numpy as np
    import pandas as pd

    # Driver-side greedy selection is only valid on bounded candidate sets
    # (the reference reranks ≤ 2×limit rows). Guard the collect so a caller
    # passing an unbounded DataFrame fails loudly instead of OOMing.
    rows = (candidates.select("uuid", emb_col)
            .limit(MAX_MMR_CANDIDATES + 1).toPandas())
    if len(rows) > MAX_MMR_CANDIDATES:
        raise ValueError(
            f"mmr_rerank got > {MAX_MMR_CANDIDATES} candidates; "
            "pre-truncate with a cheap scorer before MMR")
    if rows.empty:
        return candidates.sparkSession.createDataFrame(
            [], "uuid string, score double")
    # np.argmax tie-breaks on row order; sort by uuid so MMR-score ties
    # select the same candidate regardless of partitioning / scan order
    # (hash-stable results, like every other operator here).
    rows = rows.sort_values("uuid", ignore_index=True)
    embs = np.array([np.asarray(v, dtype=np.float64) for v in rows[emb_col]])
    selected, scores = _mmr_greedy(embs, query_vec, mmr_lambda, limit)
    out = pd.DataFrame({
        "uuid": [rows.uuid[i] for i in selected],
        "score": scores})
    return candidates.sparkSession.createDataFrame(out)


def mmr_rerank_grouped(candidates: DataFrame, queries: DataFrame,
                       emb_col: str = "embedding",
                       mmr_lambda: float = MMR_LAMBDA,
                       limit: int = DEFAULT_SEARCH_LIMIT) -> DataFrame:
    """F5 MMR for a BATCH of queries as one distributed job (SURVEY §2.8:
    per-query grouped execution). ``candidates``: (query_id, uuid,
    emb_col); ``queries``: (query_id, query_vec: array<float/double>).

    The greedy loop runs inside ``applyInPandas`` keyed by query_id — each
    query's ≤2×limit candidate set is one Arrow batch on an executor, so a
    thousand-query batch fans out across the cluster with no driver
    collect (the round-2 version serialized every query through the
    driver). The query vector is broadcast-joined onto its candidate rows
    (one small-side hash join, no shuffle of the query table)."""
    import pandas as pd

    joined = candidates.join(
        F.broadcast(queries.select("query_id",
                                   F.col("query_vec").alias("_qv"))),
        "query_id")
    q_type = dict(joined.dtypes)["query_id"]
    schema = f"query_id {q_type}, uuid string, score double, rn int"

    def one_query(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        if pdf.empty:
            return pd.DataFrame(
                {"query_id": [], "uuid": [], "score": [], "rn": []})
        # Arrow batch row order is partitioning-dependent; sort by uuid so
        # np.argmax tie-breaks deterministically across runs.
        pdf = pdf.sort_values("uuid", ignore_index=True)
        embs = np.array([np.asarray(v, dtype=np.float64)
                         for v in pdf[emb_col]])
        qv = np.asarray(pdf["_qv"].iloc[0], dtype=np.float64)
        sel, scores = _mmr_greedy(embs, qv, mmr_lambda, limit)
        return pd.DataFrame({
            "query_id": [pdf["query_id"].iloc[0]] * len(sel),
            "uuid": [pdf["uuid"].iloc[sel_i] for sel_i in sel],
            "score": scores,
            "rn": list(range(1, len(sel) + 1))})

    return joined.groupBy("query_id").applyInPandas(one_query, schema)


# ---------------------------------------------------------------------------
# SearchFilters predicate compiler (Q8)
# ---------------------------------------------------------------------------

OPS = {
    "=": lambda c, v: c == v, "<>": lambda c, v: c != v,
    ">": lambda c, v: c > v, "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v, "<=": lambda c, v: c <= v,
    "is_null": lambda c, v: c.isNull(),
    "is_not_null": lambda c, v: c.isNotNull(),
}


@dataclass
class DateFilter:
    """One comparison (``search_filters.py:34-38``)."""
    field: str           # valid_at / invalid_at / created_at / expired_at
    op: str              # key into OPS
    value: datetime | None = None


@dataclass
class SearchFilters:
    """AND-of-OR filter groups + label/type filters
    (``search/search_filters.py:40-64``): outer list = OR, inner = AND."""
    node_labels: list[str] = field(default_factory=list)
    edge_types: list[str] = field(default_factory=list)
    date_groups: list[list[DateFilter]] = field(default_factory=list)


def compile_filters(f: SearchFilters, kind: str = "edge") -> F.Column:
    """→ a single boolean Column (``search_filters.py:87-184``)."""
    cond = F.lit(True)
    if kind == "node" and f.node_labels:
        lab = None
        for l in f.node_labels:
            c = F.array_contains(F.col("labels"), l)
            lab = c if lab is None else (lab & c)
        cond = cond & lab
    if kind == "edge" and f.edge_types:
        cond = cond & F.col("name").isin(f.edge_types)
    if f.date_groups:
        outer = None
        for group in f.date_groups:
            inner = None
            for df_ in group:
                c = OPS[df_.op](F.col(df_.field),
                                F.lit(df_.value) if df_.value else None)
                inner = c if inner is None else (inner & c)
            outer = inner if outer is None else (outer | inner)
        cond = cond & outer
    return cond


# ---------------------------------------------------------------------------
# Hybrid search (the read-path fan-out, search.py:66-162) + recipes (Q9)
# ---------------------------------------------------------------------------

@dataclass
class SearchConfig:
    methods: list[str] = field(default_factory=lambda: ["bm25", "cosine"])
    reranker: str = "rrf"
    limit: int = DEFAULT_SEARCH_LIMIT
    min_score: float = DEFAULT_MIN_SCORE
    bfs_depth: int = MAX_SEARCH_DEPTH
    mmr_lambda: float = MMR_LAMBDA       # search_config.py:84 per-layer knob
    reranker_min_score: float = 0.0      # search_config.py:118


# Search recipes (Q9) — the full preset family of
# ``search/search_config_recipes.py:34-223``, one per reference name.
# COMBINED_* applies the reranker across every layer; EDGE_/NODE_ include
# the bfs method like the reference's edge/node configs; COMMUNITY_ has no
# graph methods (communities aren't vertices of the RELATES_TO graph).
COMBINED_HYBRID_SEARCH_RRF = SearchConfig(["bm25", "cosine"], "rrf")
COMBINED_HYBRID_SEARCH_MMR = SearchConfig(["bm25", "cosine"], "mmr")
COMBINED_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    ["bm25", "cosine"], "cross_encoder")
EDGE_HYBRID_SEARCH_RRF = SearchConfig(["bm25", "cosine", "bfs"], "rrf")
EDGE_HYBRID_SEARCH_MMR = SearchConfig(["bm25", "cosine", "bfs"], "mmr")
EDGE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    ["bm25", "cosine", "bfs"], "node_distance")
EDGE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    ["bm25", "cosine", "bfs"], "episode_mentions")
EDGE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    ["bm25", "cosine", "bfs"], "cross_encoder")
NODE_HYBRID_SEARCH_RRF = SearchConfig(["bm25", "cosine", "bfs"], "rrf")
NODE_HYBRID_SEARCH_MMR = SearchConfig(["bm25", "cosine", "bfs"], "mmr")
NODE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    ["bm25", "cosine", "bfs"], "node_distance")
NODE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    ["bm25", "cosine", "bfs"], "episode_mentions")
NODE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    ["bm25", "cosine", "bfs"], "cross_encoder")
COMMUNITY_HYBRID_SEARCH_RRF = SearchConfig(["bm25", "cosine"], "rrf")
COMMUNITY_HYBRID_SEARCH_MMR = SearchConfig(["bm25", "cosine"], "mmr")
COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    ["bm25", "cosine"], "cross_encoder")

SEARCH_RECIPES = {
    name: obj for name, obj in list(globals().items())
    if isinstance(obj, SearchConfig)
}

# back-compat aliases (round-1 names)
EDGE_HYBRID_RRF = EDGE_HYBRID_SEARCH_RRF
EDGE_HYBRID_MMR = EDGE_HYBRID_SEARCH_MMR
EDGE_HYBRID_BFS_RRF = EDGE_HYBRID_SEARCH_RRF
NODE_HYBRID_RRF = NODE_HYBRID_SEARCH_RRF
NODE_HYBRID_MENTIONS = NODE_HYBRID_SEARCH_EPISODE_MENTIONS
NODE_HYBRID_DISTANCE = NODE_HYBRID_SEARCH_NODE_DISTANCE
COMBINED_HYBRID_RRF = COMBINED_HYBRID_SEARCH_RRF


def hybrid_search(df: DataFrame, text_col: str, emb_col: str, query: str,
                  query_vec: list[float],
                  config: SearchConfig = EDGE_HYBRID_RRF,
                  filters: SearchFilters | None = None,
                  kind: str = "edge",
                  edges: DataFrame | None = None,
                  episodic_edges: DataFrame | None = None,
                  origin_uuids: list[str] | None = None,
                  center_uuid: str | None = None) -> DataFrame:
    """The per-layer search: method fan-out → fuse → rerank → limit
    (``search/search.py:180-274`` re-expressed as DataFrame union)."""
    if filters is not None:
        df = df.where(compile_filters(filters, kind))
    results = []
    if "bm25" in config.methods:
        results.append(bm25_lite_search(df, text_col, query,
                                        limit=2 * config.limit))
    if "cosine" in config.methods:
        results.append(similarity_search(df, emb_col, query_vec,
                                         min_score=config.min_score,
                                         limit=2 * config.limit))
    if "bfs" in config.methods and edges is not None and origin_uuids:
        bfs = bfs_search(edges, origin_uuids, config.bfs_depth)
        results.append(bfs.select(
            "uuid", (F.lit(1.0) / F.col("hops")).alias("score")))
    if config.reranker == "rrf":
        fused = rrf(results)
    elif config.reranker == "mmr":
        union = results[0]
        for r in results[1:]:
            union = union.unionByName(r)
        cands = (union.dropDuplicates(["uuid"]).select("uuid")
                 .join(df.select("uuid", emb_col), "uuid"))
        fused = mmr_rerank(cands, emb_col, query_vec,
                           mmr_lambda=config.mmr_lambda, limit=config.limit)
    elif config.reranker == "episode_mentions":
        union = results[0]
        for r in results[1:]:
            union = union.unionByName(r)
        fused = episode_mentions_reranker(
            episodic_edges, union.dropDuplicates(["uuid"]))
    elif config.reranker == "node_distance":
        union = results[0]
        for r in results[1:]:
            union = union.unionByName(r)
        fused = node_distance_reranker(
            edges, union.dropDuplicates(["uuid"]), center_uuid)
    elif config.reranker == "cross_encoder":
        union = results[0]
        for r in results[1:]:
            union = union.unionByName(r)
        cands = (union.dropDuplicates(["uuid"]).select("uuid")
                 .join(df.select("uuid", text_col), "uuid"))
        fused = cross_encoder_rank(cands, text_col, query)
    else:
        raise ValueError(f"unknown reranker {config.reranker}")
    if config.reranker_min_score:
        fused = fused.where(F.col("score") >= config.reranker_min_score)
    return fused.limit(config.limit)


def search_results_to_context_string(edges=None, nodes=None, episodes=None,
                                     communities=None) -> str:
    """Q10 — format a search result set into one LLM-context block
    (``search/search_helpers.py:28-73`` contract: FACTS with their
    valid/invalid dates — 'Present' when open — then ENTITIES, EPISODES,
    COMMUNITIES as JSON lists inside tagged sections). Driver-side over
    collected rows: result sets are bounded by the search limit."""
    import json as _json

    def _d(r):
        return r.asDict() if hasattr(r, "asDict") else dict(r)

    facts = [{"fact": e.get("fact"),
              "valid_at": str(e.get("valid_at")),
              "invalid_at": str(e.get("invalid_at") or "Present")}
             for e in map(_d, edges or [])]
    entities = [{"entity_name": n.get("name"), "summary": n.get("summary")}
                for n in map(_d, nodes or [])]
    eps = [{"source_description": e.get("source_description"),
            "content": e.get("content")}
           for e in map(_d, episodes or [])]
    comms = [{"community_name": c.get("name"), "summary": c.get("summary")}
             for c in map(_d, communities or [])]
    return (
        "FACTS and ENTITIES are the most relevant context for the current"
        " conversation; COMMUNITIES are clusters of closely related"
        " entities.\n"
        "A fact is valid between its valid_at and invalid_at dates;"
        " invalid_at \"Present\" means it still holds.\n"
        f"<FACTS>\n{_json.dumps(facts, indent=12)}\n</FACTS>\n"
        f"<ENTITIES>\n{_json.dumps(entities, indent=12)}\n</ENTITIES>\n"
        f"<EPISODES>\n{_json.dumps(eps, indent=12)}\n</EPISODES>\n"
        f"<COMMUNITIES>\n{_json.dumps(comms, indent=12)}\n</COMMUNITIES>\n")
