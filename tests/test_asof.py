"""asof_join (operators/asof.py) vs pandas.merge_asof and hand cases."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import functions as F

from graphiti_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _rand_frames(seed, n_left=60, n_right=80, keys=3):
    rng = random.Random(seed)
    left = [(f"u{rng.randrange(keys)}", T0 + dt.timedelta(seconds=rng.randrange(10_000)),
             i) for i in range(n_left)]
    # unique (key, ts) on the right so pandas' duplicate-ts pick is moot
    seen, right = set(), []
    while len(right) < n_right:
        r = (f"u{rng.randrange(keys)}",
             T0 + dt.timedelta(seconds=rng.randrange(10_000)))
        if r not in seen:
            seen.add(r)
            right.append((*r, len(right) * 10))
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    lp = pd.DataFrame(left, columns=["k", "ts", "lid"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "rv"]).sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction,
                      tolerance=tolerance, suffixes=("", "_r"))
    return {int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
            for r in m.itertuples()}


def _spark_asof(spark, left, right, direction, tolerance=None):
    l = _mk(spark, left, "k string, ts timestamp, lid long")
    r = _mk(spark, right, "k string, ts timestamp, rv long")
    out = asof_join(l, r, on=["k"], direction=direction, tolerance=tolerance)
    return {int(x["lid"]): (None if x["r_rv"] is None else int(x["r_rv"]))
            for x in out.collect()}


def test_backward_matches_pandas(spark):
    left, right = _rand_frames(11)
    assert _spark_asof(spark, left, right, "backward") == \
        _pandas_asof(left, right, "backward")


def test_forward_matches_pandas(spark):
    left, right = _rand_frames(22)
    assert _spark_asof(spark, left, right, "forward") == \
        _pandas_asof(left, right, "forward")


def test_tolerance_matches_pandas(spark):
    left, right = _rand_frames(33)
    tol = dt.timedelta(seconds=500)
    got = _spark_asof(spark, left, right, "backward",
                      tolerance=F.expr("INTERVAL 500 SECOND"))
    assert got == _pandas_asof(left, right, "backward", tolerance=tol)


def test_exact_ts_matches(spark):
    t = T0 + dt.timedelta(seconds=5)
    got = _spark_asof(spark, [("a", t, 1)], [("a", t, 7)], "backward")
    assert got == {1: 7}
    got = _spark_asof(spark, [("a", t, 1)], [("a", t, 7)], "forward")
    assert got == {1: 7}


def test_unmatched_left_keeps_nulls(spark):
    t = T0 + dt.timedelta(seconds=5)
    got = _spark_asof(spark, [("a", t, 1)],
                      [("a", t + dt.timedelta(seconds=1), 7)], "backward")
    assert got == {1: None}


def test_tie_break_is_deterministic(spark):
    t = T0 + dt.timedelta(seconds=5)
    l = _mk(spark, [("a", t + dt.timedelta(seconds=1), 1)],
            "k string, ts timestamp, lid long")
    r = _mk(spark, [("a", t, 10), ("a", t, 20), ("a", t, 15)],
            "k string, ts timestamp, rv long")
    out = asof_join(l, r, on=["k"], tie_break=["rv"])
    # backward: largest tie-break tuple wins
    assert [x["r_rv"] for x in out.collect()] == [20]
    out = asof_join(l.withColumn("ts", F.col("ts") - F.expr("INTERVAL 2 SECOND")),
                    r, on=["k"], direction="forward", tie_break=["rv"])
    # forward: smallest tie-break tuple wins
    assert [x["r_rv"] for x in out.collect()] == [10]


def test_null_timestamps_never_match(spark):
    """A NULL-ts right row must not become a universal earliest match
    (it sorts NULLS FIRST in the backward window without the filter),
    and a NULL-ts left row must come back unmatched, both directions —
    pandas merge_asof / DuckDB ASOF semantics."""
    left = [("u0", T0 + dt.timedelta(seconds=50), 1),
            ("u0", None, 2)]
    right = [("u0", None, 999),
             ("u0", T0 + dt.timedelta(seconds=200), 7)]
    for direction, want1 in (("backward", None), ("forward", 7)):
        got = _spark_asof(spark, left, right, direction)
        assert got[1] == want1, direction
        assert got[2] is None, direction
