"""Top-level facade — the reference's ``Graphiti`` class surface over the
Spark-native engine.

The reference's primary UX is one object with add/search/maintain methods
(``graphiti_core/graphiti.py``: add_episode, add_episode_bulk, search,
search_, retrieve_episodes, build_communities, add_triplet,
remove_episode, get_nodes_and_edges_by_episode, ...). The engine's
operators are all built and tested individually; this module is the thin
composition layer so a reference user can hold ONE handle and call the
same verbs. Every method delegates to the tested operator — no logic of
its own beyond table bookkeeping — and each docstring cites the
reference method it mirrors.

State model (the Spark-native translation of "a graph database"):
the graph IS four DataFrames (episodes, entities, edges, episodic_edges)
plus optional communities, all keyed by ``group_id``. Updates are
touched-group incremental (old+new turns of touched conversations
re-run the batch stages; untouched groups carry over — provably equal
to a full rebuild, tests/test_incremental.py), so an ``add_episode``
costs O(that conversation), not O(graph), exactly the reference's
per-episode incremental shape.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.plans.pipeline import RUN_TS, build_graph

__all__ = ["GraphitiSpark"]

_TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                      "text string, tool string, ts timestamp")


class GraphitiSpark:
    """One handle over the KG tables with the reference's verbs.

    ``with_embeddings=True`` (default) materializes name/fact embedding
    columns during builds so ``search``'s cosine layers work out of the
    box; pass False for extract-only pipelines to keep the embedding
    Arrow traffic out of the build (the core triples never depend on
    it).
    """

    def __init__(self, spark: SparkSession, run_ts: datetime = RUN_TS,
                 ontology=None, with_embeddings: bool = True):
        self.spark = spark
        self.run_ts = run_ts
        self.ontology = ontology
        self.with_embeddings = with_embeddings
        self.transcripts: DataFrame | None = None
        self.episodes: DataFrame | None = None
        self.entities: DataFrame | None = None
        self.edges: DataFrame | None = None
        self.episodic_edges: DataFrame | None = None
        self.communities: DataFrame | None = None
        self.community_edges: DataFrame | None = None

    # -- write path --------------------------------------------------------

    def add_episode_bulk(self, transcripts: DataFrame) -> "GraphitiSpark":
        """``Graphiti.add_episode_bulk`` (graphiti.py, bulk path): ingest
        turn rows ``(conv_id, turn_idx, role, text, tool, ts)``. First
        call builds the graph; later calls rebuild ONLY the touched
        conversations and carry every other group over unchanged
        (≡ full rebuild, the operators/maintenance.incremental_update
        contract)."""
        if self.transcripts is None:
            self.transcripts = transcripts.localCheckpoint(eager=True)
            g = self._build(self.transcripts)
            self.episodes, self.entities = g.episodes, g.entities
            self.edges, self.episodic_edges = g.edges, g.episodic_edges
            return self
        # a re-supplied (conv_id, turn_idx) must deterministically take
        # the NEW text — dropDuplicates keeps an arbitrary shuffle winner
        kept = self.transcripts.join(
            transcripts.select("conv_id", "turn_idx").distinct(),
            ["conv_id", "turn_idx"], "left_anti")
        all_tr = (kept.unionByName(
                      transcripts.dropDuplicates(["conv_id", "turn_idx"]))
                  .localCheckpoint(eager=True))
        touched = transcripts.select("conv_id").distinct() \
            .localCheckpoint(eager=True)
        g = self._build(all_tr.join(F.broadcast(touched), "conv_id",
                                    "left_semi"))
        self.transcripts = all_tr

        def merge(existing, new):
            keep = existing.join(
                F.broadcast(touched.select(F.col("conv_id")
                                           .alias("group_id"))),
                "group_id", "left_anti")
            return keep.unionByName(new, allowMissingColumns=True)

        self.episodes = merge(self.episodes, g.episodes)
        self.entities = merge(self.entities, g.entities)
        self.edges = merge(self.edges, g.edges)
        self.episodic_edges = merge(self.episodic_edges, g.episodic_edges)
        return self

    def add_episode(self, group_id: str, body: str, role: str = "user",
                    reference_time: datetime | None = None,
                    tool: str | None = None) -> "GraphitiSpark":
        """``Graphiti.add_episode`` (single-episode write path): one turn
        appended to ``group_id``'s conversation at the next turn index,
        then the touched-group incremental update."""
        nxt = 0
        if self.transcripts is not None:
            row = (self.transcripts.where(F.col("conv_id") == group_id)
                   .agg(F.max("turn_idx")).head()[0])
            nxt = 0 if row is None else row + 1
        ts = reference_time or self.run_ts
        one = self.spark.createDataFrame(
            [(group_id, nxt, role, body, tool, ts.replace(tzinfo=None))],
            _TRANSCRIPT_SCHEMA)
        return self.add_episode_bulk(one)

    def add_triplet(self, group_id: str, subj: str, pred: str, obj: str,
                    fact: str, valid_at: datetime | None = None
                    ) -> "GraphitiSpark":
        """``Graphiti.add_triplet`` (graphiti.py:979-1017): insert an
        arbitrary (subj, pred, obj) edge and resolve it against the
        group's EXISTING edges through the same dedupe + temporal
        versioning as extracted ones — the group's stored rows are
        re-sliced to raw (incremental.stored_edges_to_raw), unioned with
        the new raw row, and re-merged; missing entity rows are
        upserted."""
        from graphiti_spark import rules
        from graphiti_spark.operators import versioning
        from graphiti_spark.operators.incremental import stored_edges_to_raw
        from graphiti_spark.operators.maintenance import add_triplet

        # same validation on BOTH branches (maintenance.add_triplet only
        # guards the fresh-graph path): no empty names, no self-loops
        subj_c, obj_c = rules.clean_text(subj), rules.clean_text(obj)
        if not subj_c or not obj_c or \
                rules.normalize_name(subj_c) == rules.normalize_name(obj_c):
            raise ValueError(
                "add_triplet needs two distinct non-empty entities")
        if self.edges is None:
            self.edges = add_triplet(self.spark, group_id, subj, pred,
                                     obj, fact, self.run_ts, valid_at)
            self._upsert_entities(group_id, [subj_c, obj_c])
            return self
        grp = self.edges.where(F.col("group_id") == group_id)
        rest = self.edges.where(
            F.coalesce(F.col("group_id") != group_id, F.lit(True)))
        va = valid_at or self.run_ts
        # NULL episode provenance: a manual triplet is created by no
        # episode, so collect_list skips it and the merged edge carries
        # an empty episodes array — remove_episode's orphan GC must
        # never collect it (graphiti.py keeps non-episodic edges)
        new_raw = self.spark.createDataFrame(
            [(group_id, None, 0,
              subj_c, pred, obj_c, rules.clean_text(fact) or fact,
              va.replace(tzinfo=None), None,
              rules.entity_uuid(group_id, subj_c),
              rules.entity_uuid(group_id, obj_c),
              rules.edge_uuid(group_id,
                              rules.entity_uuid(group_id, subj_c), pred,
                              rules.entity_uuid(group_id, obj_c), fact, 0),
              self.run_ts.replace(tzinfo=None))],
            "group_id string, episode_uuid string, turn_idx int,"
            " subj string, pred string, obj string, fact string,"
            " valid_at timestamp, invalid_at timestamp,"
            " source_node_uuid string, target_node_uuid string,"
            " uuid string, created_at timestamp")
        raw = stored_edges_to_raw(grp).unionByName(
            new_raw, allowMissingColumns=True)
        merged = versioning.apply_versioning(
            versioning.dedupe_edges(raw), self.run_ts,
            ontology=self.ontology)
        # the versioning re-merge emits embedding-less rows; re-derive
        # fact_embedding for the touched group or its cosine search
        # layer would silently go dark after any manual insert
        if self.edges is not None and "fact_embedding" in self.edges.columns:
            from graphiti_spark.operators.extract import embed_udf
            merged = merged.withColumn("fact_embedding",
                                       embed_udf(F.col("fact")))
        self.edges = rest.unionByName(merged, allowMissingColumns=True)
        self._upsert_entities(group_id, [subj_c, obj_c])
        return self

    def _upsert_entities(self, group_id: str, names: list[str]) -> None:
        from graphiti_spark import rules
        rows = [(rules.entity_uuid(group_id, n), n, group_id,
                 self.run_ts.replace(tzinfo=None))
                for n in names]
        new = self.spark.createDataFrame(
            rows, "uuid string, name string, group_id string,"
                  " created_at timestamp")
        if (self.with_embeddings or
                (self.entities is not None
                 and "name_embedding" in self.entities.columns)):
            # the reference embeds names on insert — without this the
            # node cosine layer never scores a manually-added entity
            from graphiti_spark.operators.extract import embed_udf
            new = new.withColumn("name_embedding",
                                 embed_udf(F.col("name")))
        if self.entities is None:
            self.entities = new
            return
        fresh = new.join(self.entities.select("uuid"), "uuid",
                         "left_anti")
        self.entities = self.entities.unionByName(
            fresh, allowMissingColumns=True)

    def remove_episode(self, episode_uuids: list[str]) -> "GraphitiSpark":
        """``Graphiti.remove_episode`` (graphiti.py:1019-1052): drop the
        episodes, the edges they alone created, and entities mentioned
        only by them (orphan GC)."""
        from graphiti_spark.operators.maintenance import remove_episodes
        out = remove_episodes(self.episodes, self.episodic_edges,
                              self.entities, self.edges, episode_uuids)
        self.episodes = out["episodes"]
        self.episodic_edges = out["episodic_edges"]
        self.entities = out["entities"]
        self.edges = out["edges"]
        return self

    # -- read path ---------------------------------------------------------

    def retrieve_episodes(self, reference_time: datetime,
                          last_n: int = 10,
                          group_ids: list[str] | None = None) -> DataFrame:
        """``Graphiti.retrieve_episodes`` (S3): last-n episodes at or
        before ``reference_time`` per group, chronological."""
        from graphiti_spark.operators.episodes import retrieve_episodes
        return retrieve_episodes(self.episodes, reference_time,
                                 last_n=last_n, group_ids=group_ids)

    def get_nodes_and_edges_by_episode(self, episode_uuids: list[str]):
        """``Graphiti.get_nodes_and_edges_by_episode``
        (graphiti.py:965-977)."""
        from graphiti_spark.operators.maintenance import (
            get_nodes_and_edges_by_episode)
        return get_nodes_and_edges_by_episode(
            self.episodic_edges, self.entities, self.edges, episode_uuids)

    def get_entity_edge(self, uuid: str) -> DataFrame:
        """``Graphiti.get_entity_edge`` point lookup (S7)."""
        from graphiti_spark.operators.maintenance import get_by_uuids
        return get_by_uuids(self.edges, [uuid])

    def search(self, query: str, num_results: int = 10,
               group_ids: list[str] | None = None,
               center_node_uuid: str | None = None) -> DataFrame:
        """``Graphiti.search`` — the edge-RRF shortcut (graphiti.py:
        hybrid bm25+cosine over facts, RRF fused; node-distance rerank
        when ``center_node_uuid`` is given). Returns edge rows."""
        from graphiti_spark.operators.composite_search import (
            EDGE_HYBRID_SEARCH_NODE_DISTANCE, EDGE_HYBRID_SEARCH_RRF)
        cfg = (EDGE_HYBRID_SEARCH_NODE_DISTANCE if center_node_uuid
               else EDGE_HYBRID_SEARCH_RRF)
        res = self.search_(query, cfg, group_ids=group_ids,
                           center_node_uuid=center_node_uuid)
        return res.edges.limit(num_results)

    def search_(self, query: str, config, filters=None,
                group_ids: list[str] | None = None,
                center_node_uuid: str | None = None,
                bfs_origin_node_uuids: list[str] | None = None):
        """``Graphiti.search_`` — the full composite fan-out
        (search/search.py): ``config`` is a CompositeSearchConfig or a
        preset name from COMPOSITE_RECIPES. Returns SearchResults."""
        from graphiti_spark.functions.text import embed_text
        from graphiti_spark.operators import composite_search as CS
        if isinstance(config, str):
            config = CS.COMPOSITE_RECIPES[config]
        qvec = [float(x) for x in embed_text(query)]
        return CS.search(
            query, qvec, config,
            edges=self.edges, nodes=self.entities,
            episodes=self.episodes, communities=self.communities,
            episodic_edges=self.episodic_edges, filters=filters,
            group_ids=group_ids, center_node_uuid=center_node_uuid,
            bfs_origin_node_uuids=bfs_origin_node_uuids)

    # -- maintenance -------------------------------------------------------

    def build_communities(self, mode: str = "monotone") -> DataFrame:
        """``Graphiti.build_communities`` (A4/A5): label propagation +
        summarization over the current graph; result cached on the
        handle so the community search layer is live."""
        from graphiti_spark.operators.communities import build_communities
        comms, ce = build_communities(self.entities, self.edges,
                                      self.run_ts, mode=mode)
        self.communities = comms.localCheckpoint(eager=True)
        self.community_edges = ce
        return self.communities

    def _build(self, transcripts: DataFrame):
        return build_graph(self.spark, transcripts, run_ts=self.run_ts,
                           with_embeddings=self.with_embeddings,
                           ontology=self.ontology)

    # -- persistence -------------------------------------------------------

    _TABLES = ("transcripts", "episodes", "entities", "edges",
               "episodic_edges", "communities", "community_edges")

    def save(self, root: str) -> "GraphitiSpark":
        """Persist every populated table under ``root``, partitioned by
        the incremental unit (``conv_id``/``group_id``) so a later
        micro-batch update rewrites only touched partition dirs — the
        same layout the streaming writer uses (S4; the parquet stand-in
        for the Iceberg tables of the brief)."""
        for name in self._TABLES:
            df = getattr(self, name)
            if df is None:
                continue
            # cut lineage BEFORE overwrite: a load()ed table's plan still
            # reads the very directory this write replaces — Spark
            # rejects overwrite-while-reading, and a partial failure
            # would leave the on-disk graph half-replaced
            df = df.localCheckpoint(eager=True)
            setattr(self, name, df)
            part = ("conv_id" if "conv_id" in df.columns else
                    "group_id" if "group_id" in df.columns else None)
            w = df.write.mode("overwrite")
            if part:
                w = w.partitionBy(part)
            w.parquet(f"{root.rstrip('/')}/{name}")
        return self

    @classmethod
    def load(cls, spark: SparkSession, root: str,
             run_ts: datetime = RUN_TS, ontology=None,
             with_embeddings: bool = True) -> "GraphitiSpark":
        """Re-open a saved graph: the handle resumes incremental updates
        and searches from the on-disk tables (restart-safety lives in
        the files, not driver state — the LshIndex/TableStore rule)."""
        import os

        if "://" in root:
            raise NotImplementedError(
                "load() probes the local filesystem; for a remote or "
                "cataloged store use sources.tables.TableStore")
        g = cls(spark, run_ts=run_ts, ontology=ontology,
                with_embeddings=with_embeddings)
        found = False
        for name in cls._TABLES:
            p = f"{root.rstrip('/')}/{name}"
            if os.path.isdir(p):
                found = True
                df = spark.read.parquet(p)
                # partition-column inference may narrow string keys
                for c in ("conv_id", "group_id"):
                    if c in df.columns:
                        df = df.withColumn(c, F.col(c).cast("string"))
                setattr(g, name, df)
        if not found:
            # a typo'd root must not silently hand back an empty graph
            # that a later save() would happily write somewhere new
            raise FileNotFoundError(f"no saved graph tables under {root}")
        return g
