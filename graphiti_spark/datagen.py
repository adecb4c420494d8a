"""Deterministic synthetic transcript corpus + golden ground truth (M0).

Generates the BASELINE.json ``input_hint`` table
``(conv_id, turn_idx, role, text, tool, ts)`` with planted facts drawn from
the template contract in FIXTURES.md §4, plus golden tables:

  * ``golden_triples``   — expected raw extraction per turn (P/R gate);
  * ``golden_components``— expected entity alias groups per conversation
                           (canonicalization gate);
  * ``golden_edges``     — expected final *versioned* edges with
                           ``invalid_at``/``expired_at`` semantics applied
                           (temporal gate; an independent pure-Python
                           implementation of the T1/T2 rules, so the Spark
                           window logic is checked against a second
                           implementation, not against itself).

Everything is a pure function of (sf, seed). No external data. The generator
intentionally does NOT import the Spark pipeline; it imports only the shared
extraction-rule vocabulary (predicates, uuid functions) from
:mod:`graphiti_spark.rules`.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from graphiti_spark import rules

SEED = 42
BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

FIRST = ["Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Henry",
         "Ivy", "Jack", "Karen", "Liam", "Mona", "Nate", "Olga", "Paul",
         "Quinn", "Rosa", "Sam", "Tina"]
LAST = ["Smith", "Jones", "Miller", "Garcia", "Chen", "Patel", "Kim",
        "Nakamura", "Okafor", "Novak"]
ORGS = ["Acme Corp", "Globex", "Initech", "Umbrella Labs", "Stark Industries",
        "Wayne Enterprises", "Hooli", "Vandelay Industries", "Wonka Factory",
        "Cyberdyne Systems"]
CITIES = ["Paris", "Berlin", "Tokyo", "Austin", "Lisbon", "Oslo", "Nairobi",
          "Seoul", "Toronto", "Zurich"]
HOT_ORG = "Acme Corp"   # appears in a large fraction of convs → hot entity

DISTRACTORS = [
    "the weather has been quite nice lately.",
    "please take a look at the logs when you can.",
    "that sounds like a reasonable plan to me.",
    "let me check on that and get back to you.",
    "thanks, that was exactly what i needed.",
    "hmm, i am not sure about the details there.",
]
TOOL_OUTPUTS = [
    "status: ok, 200 records processed.",
    "lookup complete, 3 results returned.",
    "no matching entries found in the index.",
]


def n_convs_for_sf(sf: float) -> int:
    return max(20, int(round(5000 * sf * 10)))


def _mk_persons(rng: np.random.Generator, n: int) -> list[dict]:
    """Persons with distinct first names within a conversation, so the
    alias rule ('Bob' ⊂ 'Bob Smith') can never merge two different people."""
    firsts = rng.choice(len(FIRST), size=n, replace=False)
    lasts = rng.integers(0, len(LAST), size=n)
    return [{"full": f"{FIRST[f]} {LAST[l]}", "alias": FIRST[f]}
            for f, l in zip(firsts, lasts)]


def _expected_versioning(pos: list[dict], neg: list[dict]) -> list[dict]:
    """Independent pure-Python implementation of the T1/T2 temporal rules
    (``edge_operations.py:345-375,471-488`` re-expressed per SURVEY §2.5 W6).

    pos/neg: dicts with subj, pred, obj (canonical-normalized), valid_at /
    neg ts. Returns pos rows with invalid_at filled (or None).
    """
    out = []
    for e in pos:
        candidates = []
        if e["pred"] in rules.FUNCTIONAL_PREDS:
            later = [p["valid_at"] for p in pos
                     if p["subj"] == e["subj"] and p["pred"] == e["pred"]
                     and p["obj"] != e["obj"] and p["valid_at"] > e["valid_at"]]
            candidates += later
        if e["pred"] in rules.SENTIMENT_PREDS:
            later = [p["valid_at"] for p in pos
                     if p["subj"] == e["subj"] and p["obj"] == e["obj"]
                     and p["pred"] in rules.SENTIMENT_PREDS
                     and p["pred"] != e["pred"] and p["valid_at"] > e["valid_at"]]
            candidates += later
        negs = [n["ts"] for n in neg
                if n["subj"] == e["subj"] and n["pred"] == e["pred"]
                and n["obj"] == e["obj"] and n["ts"] > e["valid_at"]]
        candidates += negs
        out.append({**e, "invalid_at": min(candidates) if candidates else None})
    return out


def _gen_range(args):
    """Generate conversations [lo, hi) — each conv is seeded independently
    by (seed, ci), so chunked generation is bit-identical to serial."""
    seed, lo, hi = args
    t_rows, g_triples, g_comp, g_edges = [], [], [], []

    for ci in range(lo, hi):
        conv_id = f"conv{ci:06d}"
        conv_rng = np.random.default_rng(seed * 1_000_003 + ci)
        # Conversation base times advance 1h per conv. Unwrapped, conv
        # index ~2.09M (between sf40 and sf100) crosses pandas' year-2262
        # nanosecond-timestamp bound, so indices past 2M wrap back to
        # BASE_TS with a minute offset for near-uniqueness — bit-identical
        # to the old layout for every ci < 2_000_000 (all corpora ≤ sf40),
        # and timestamps only ever matter WITHIN a conversation (windows
        # and retrieval partition by conv/group), so cross-conv collisions
        # are harmless.
        base = BASE_TS + timedelta(hours=ci % 2_000_000,
                                   minutes=ci // 2_000_000)

        # cast: 2-3 persons (alias-prone), 1-2 orgs, 1-2 cities
        persons = _mk_persons(conv_rng, int(conv_rng.integers(2, 4)))
        orgs = list(conv_rng.choice(ORGS, size=2, replace=False))
        if conv_rng.random() < 0.6 and HOT_ORG not in orgs:
            orgs[0] = HOT_ORG   # hot-entity rate
        cities = list(conv_rng.choice(CITIES, size=2, replace=False))

        # zipf-ish turn counts: mostly 6-14, a heavy tail for skew
        n_turns = int(conv_rng.integers(6, 15))
        if conv_rng.random() < 0.02:
            n_turns = int(conv_rng.integers(40, 80))

        # Plan facts: each is (turn_slot, sentence, expected-triple-or-None)
        plans = []   # (sentence, subj, pred, obj, mode, year)
        p0 = persons[0]
        p1 = persons[1 % len(persons)]
        plans.append((f"{p0['full']} works at {orgs[0]}.",
                      p0["full"], "WORKS_AT", orgs[0], "pos", None))
        plans.append((f"{p0['alias']} lives in {cities[0]}.",
                      p0["alias"], "LIVES_IN", cities[0], "pos", None))
        if conv_rng.random() < 0.5:   # contradiction: job change
            plans.append((f"{p0['alias']} no longer works at {orgs[0]}.",
                          p0["alias"], "WORKS_AT", orgs[0], "neg", None))
            plans.append((f"{p0['alias']} works at {orgs[1]}.",
                          p0["alias"], "WORKS_AT", orgs[1], "pos", None))
        if conv_rng.random() < 0.5:   # move
            plans.append((f"{p0['full']} moved to {cities[1]}.",
                          p0["full"], "LIVES_IN", cities[1], "pos", None))
        if conv_rng.random() < 0.6:   # sentiment flip pair
            plans.append((f"{p1['full']} likes {orgs[0]}.",
                          p1["full"], "LIKES", orgs[0], "pos", None))
            if conv_rng.random() < 0.7:
                plans.append((f"{p1['alias']} dislikes {orgs[0]}.",
                              p1["alias"], "DISLIKES", orgs[0], "pos", None))
        if len(persons) > 2 and conv_rng.random() < 0.5:
            p2 = persons[2]
            plans.append((f"{p0['alias']} is friends with {p2['full']}.",
                          p0["alias"], "FRIENDS_WITH", p2["full"], "pos", None))
        if conv_rng.random() < 0.4:
            yr = int(conv_rng.integers(1990, 2023))
            plans.append((f"{p1['alias']} founded {orgs[1]} in {yr}.",
                          p1["alias"], "FOUNDED", orgs[1], "year", yr))
        if conv_rng.random() < 0.3:
            plans.append((f"{p1['full']} is the CEO of {orgs[0]}.",
                          p1["full"], "CEO_OF", orgs[0], "pos", None))

        # spread fact sentences over turns in order; pad with distractors
        fact_turns = sorted(conv_rng.choice(
            np.arange(n_turns), size=min(len(plans), n_turns), replace=False))
        turn_fact = {int(t): plans[i] for i, t in enumerate(fact_turns)}

        conv_pos, conv_neg = [], []
        mentioned_names: set[str] = set()

        for ti in range(n_turns):
            ts = base + timedelta(seconds=int(ti) * 60)
            is_tool = conv_rng.random() < 0.08 and ti not in turn_fact
            if is_tool:
                role, tool = "tool", "search"
                text = TOOL_OUTPUTS[int(conv_rng.integers(len(TOOL_OUTPUTS)))]
            else:
                tool = None
                role = "user" if ti % 2 == 0 else "assistant"
                if conv_rng.random() < 0.1:
                    role = persons[0]["alias"]   # named speaker turn
                if ti in turn_fact:
                    sent, subj, pred, obj, mode, yr = turn_fact[ti]
                    lead = DISTRACTORS[int(conv_rng.integers(len(DISTRACTORS)))]
                    text = f"{lead} {sent}" if conv_rng.random() < 0.5 else sent
                    valid_at = invalid_at = None
                    if mode == "pos":
                        valid_at = ts
                    elif mode == "neg":
                        invalid_at = ts
                    else:
                        valid_at = datetime(yr, 1, 1, tzinfo=timezone.utc)
                    g_triples.append({
                        "conv_id": conv_id, "episode_idx": ti,
                        "subj": subj, "pred": pred, "obj": obj,
                        "fact": sent.rstrip("."),
                        "valid_at": valid_at, "invalid_at": invalid_at,
                    })
                    mentioned_names.update([subj, obj])
                    rec = {"subj": rules.normalize_name(subj), "pred": pred,
                           "obj": rules.normalize_name(obj)}
                    if mode == "neg":
                        conv_neg.append({**rec, "ts": ts})
                    else:
                        conv_pos.append({**rec, "valid_at": valid_at,
                                         "fact": sent.rstrip(".")})
                else:
                    text = DISTRACTORS[int(conv_rng.integers(len(DISTRACTORS)))]
            t_rows.append({"conv_id": conv_id, "turn_idx": ti, "role": role,
                           "text": text, "tool": tool, "ts": ts})
            if role not in ("user", "assistant", "tool"):
                mentioned_names.add(role)

        # golden components: group names by alias rule (full ↔ first name).
        comp_of: dict[str, int] = {}
        comp_id = 0
        for p in persons:
            members = [n for n in (p["full"], p["alias"]) if n in mentioned_names]
            if members:
                for n in members:
                    comp_of.setdefault(rules.normalize_name(n), comp_id)
                comp_id += 1
        for n in sorted(mentioned_names):
            key = rules.normalize_name(n)
            if key not in comp_of:
                comp_of[key] = comp_id
                comp_id += 1
        for key, cid in comp_of.items():
            g_comp.append({"conv_id": conv_id, "name_norm": key, "comp": cid})

        # canonical name per component = name of min entity_uuid member
        # (matches the CC canonical rule, bulk_utils.py:399-414 semantics).
        members_by_comp: dict[int, list[str]] = {}
        for key, cid in comp_of.items():
            members_by_comp.setdefault(cid, []).append(key)
        canon_name = {}
        for cid, names in members_by_comp.items():
            canon = min(names, key=lambda n: rules.entity_uuid(conv_id, n))
            for n in names:
                canon_name[n] = canon

        pos_c = [{**p, "subj": canon_name[p["subj"]], "obj": canon_name[p["obj"]]}
                 for p in conv_pos]
        neg_c = [{**n, "subj": canon_name[n["subj"]], "obj": canon_name[n["obj"]]}
                 for n in conv_neg]
        # dedup identical (s,p,o): keep min valid_at (edge-dedup semantics)
        best: dict[tuple, dict] = {}
        for p in sorted(pos_c, key=lambda r: r["valid_at"]):
            best.setdefault((p["subj"], p["pred"], p["obj"]), p)
        for e in _expected_versioning(list(best.values()), neg_c):
            g_edges.append({"conv_id": conv_id, "subj": e["subj"],
                            "pred": e["pred"], "obj": e["obj"],
                            "valid_at": e["valid_at"],
                            "invalid_at": e["invalid_at"]})

    return t_rows, g_triples, g_comp, g_edges


def generate(sf: float, seed: int = SEED):
    """Returns (transcripts, golden_triples, golden_components, golden_edges)
    as pandas DataFrames. Deterministic in (sf, seed); large scale factors
    generate chunk-parallel (per-conv seeding makes order/content identical
    to a serial run)."""
    n_convs = n_convs_for_sf(sf)
    if n_convs >= 20_000:
        import multiprocessing as mp
        n_chunks = 64
        bounds = [(seed, i * n_convs // n_chunks,
                   (i + 1) * n_convs // n_chunks) for i in range(n_chunks)]
        with mp.Pool(min(16, mp.cpu_count())) as pool:
            parts = pool.map(_gen_range, bounds)
    else:
        parts = [_gen_range((seed, 0, n_convs))]
    t_rows, g_triples, g_comp, g_edges = [], [], [], []
    for t, gt, gc, ge in parts:
        t_rows += t
        g_triples += gt
        g_comp += gc
        g_edges += ge

    def _df(rows, ts_cols):
        df = pd.DataFrame(rows)
        for c in ts_cols:
            df[c] = pd.to_datetime(df[c], utc=True).dt.tz_localize(None)
        return df

    transcripts = _df(t_rows, ["ts"])
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    return (transcripts,
            _df(g_triples, ["valid_at", "invalid_at"]),
            pd.DataFrame(g_comp),
            _df(g_edges, ["valid_at", "invalid_at"]))


def ensure_corpus(sf: float, root: str | None = None, seed: int = SEED) -> str:
    """Write (if missing) the corpus for scale factor `sf`; return its dir."""
    root = root or os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")
    out = os.path.join(root, f"transcripts_sf{sf:g}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    tr, gt, gc, ge = generate(sf, seed)
    # micro-second timestamps: Spark cannot read TIMESTAMP(NANOS) parquet.
    # Small row groups keep the file SPLITTABLE — a single 300 MB row group
    # would force Spark to scan the whole corpus in one task.
    kw = dict(index=False, coerce_timestamps="us",
              allow_truncated_timestamps=True, row_group_size=100_000)
    tr.to_parquet(os.path.join(out, "transcripts.parquet"), **kw)
    gt.to_parquet(os.path.join(out, "golden_triples.parquet"), **kw)
    gc.to_parquet(os.path.join(out, "golden_components.parquet"), index=False)
    ge.to_parquet(os.path.join(out, "golden_edges.parquet"), **kw)
    with open(marker, "w") as f:
        f.write(f"sf={sf} seed={seed}\n")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    print(ensure_corpus(args.sf, args.root))
