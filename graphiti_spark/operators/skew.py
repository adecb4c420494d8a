"""Salted-key skew handling (north-star requirement; SURVEY.md §4).

The reference never reaches a scale where key skew matters; at 10^12 turns a
handful of hot canonical entities ("user", a famous org) dominate any
groupBy keyed on entity uuid. Two mitigations, composable with AQE's
skew-join splitting (enabled in :mod:`graphiti_spark.session`):

  * :func:`salted` — append a deterministic salt ``pmod(hash(row_key), S)``
    so one hot key fans out over S reducers;
  * :func:`two_phase_agg` — partial aggregate per (key, salt), then final
    merge per key. Correct for algebraic aggregates (count/sum/min/max,
    collect_list-of-partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted(df: DataFrame, unique_col: str, buckets: int = DEFAULT_SALT,
           salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a per-row unique column (never from
    rand(), which would break reproducibility across retries)."""
    return df.withColumn(salt_col,
                         F.pmod(F.hash(F.col(unique_col)), F.lit(buckets)))


def two_phase_agg(df: DataFrame, keys: list[str], unique_col: str,
                  partial_aggs: list[Column], final_aggs: list[Column],
                  buckets: int = DEFAULT_SALT) -> DataFrame:
    """groupBy(keys) resistant to hot keys: phase 1 aggregates per
    (keys, salt) — spreading a hot key over `buckets` reducers — phase 2
    merges partials per key. Caller supplies matching partial/final aggs,
    e.g. partial ``count(*) as c`` + final ``sum(c) as cnt``."""
    part = (salted(df, unique_col, buckets)
            .groupBy(*keys, "_salt")
            .agg(*partial_aggs))
    return part.groupBy(*keys).agg(*final_aggs)


def salted_count(df: DataFrame, keys: list[str], unique_col: str,
                 out: str = "cnt", buckets: int = DEFAULT_SALT) -> DataFrame:
    return two_phase_agg(
        df, keys, unique_col,
        [F.count(F.lit(1)).alias("_c")],
        [F.sum("_c").alias(out)],
        buckets,
    )
