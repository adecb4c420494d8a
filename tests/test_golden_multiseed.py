"""Property-style golden gate: the pipeline must match the independent
pure-Python T1/T2 model (datagen._expected_versioning) on corpora drawn
from SEVERAL seeds, not just the shipped one — each seed plants a fresh
random mix of contradictions, sentiment flips, aliases, FOUNDED years and
distractors (datagen._gen_range), so this sweeps fact combinations the
single-seed golden gate never saw."""

import pandas as pd
import pytest

from graphiti_spark.datagen import ensure_corpus
from graphiti_spark.plans.pipeline import build_graph

SEEDS = [7, 1234, 987654]


def _edge_sets(spark, corpus_dir):
    tr = spark.read.parquet(f"{corpus_dir}/transcripts.parquet")
    g = build_graph(spark, tr)
    ent = g.entities.toPandas().set_index("uuid")["name_norm"].to_dict()
    edges = g.edges.toPandas()
    pos = edges[edges.valid_at.notna()]
    got = {(r.group_id, ent[r.source_node_uuid], r.name,
            ent[r.target_node_uuid], r.valid_at,
            None if pd.isna(r.invalid_at) else r.invalid_at)
           for r in pos.itertuples()}
    ge = pd.read_parquet(f"{corpus_dir}/golden_edges.parquet")
    want = {(r.conv_id, r.subj, r.pred, r.obj, r.valid_at,
             None if pd.isna(r.invalid_at) else r.invalid_at)
            for r in ge.itertuples()}
    return got, want


@pytest.mark.parametrize("seed", SEEDS)
def test_versioned_edges_match_golden_across_seeds(spark, tmp_path_factory,
                                                   seed):
    root = str(tmp_path_factory.mktemp(f"corpus_seed{seed}"))
    corpus_dir = ensure_corpus(0.001, root=root, seed=seed)
    got, want = _edge_sets(spark, corpus_dir)
    tp = len(got & want)
    p, r = tp / max(len(got), 1), tp / max(len(want), 1)
    assert p >= 0.95 and r >= 0.95, (
        seed, p, r, list(want - got)[:3], list(got - want)[:3])
