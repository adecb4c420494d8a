"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the single most recent right row whose
timestamp is ``<=`` the left timestamp (``direction="backward"``; forward
mirrors it) sharing the equality keys. The reference pipeline's temporal
semantics (graphiti_core/utils/maintenance/temporal_operations.py — which
edge version was valid *at* an episode's time) are exactly this shape, and
every event-log / feature-store consumer of the same tables needs it.

Scale shape — why NOT the naive join:

* ``left ⋈ right ON keys AND r.ts <= l.ts`` + groupBy-max explodes to
  O(|left| · matches) intermediate rows — a per-key cross product on hot
  keys, quadratic at 100 TB.
* Here both sides are unioned and resolved by ONE window over
  ``(keys, ts)``: a single hash shuffle on the keys, a sort within
  partitions, and a running ``last(right_struct, ignorenulls=True)``.
  Linear in |left| + |right|, no fan-out, AQE-skew-splittable, and the
  shuffle is the same one any per-key window already pays.

Determinism: right rows sort before left rows at equal timestamps (so an
exactly-simultaneous right row matches backward joins, pandas
``merge_asof`` semantics), and ties *within* the right side are broken by
``tie_break`` columns — required when (keys, ts) is not unique on the
right, otherwise window order (and thus the picked row) would depend on
partition layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance: Column | None = None,
              tie_break: list[str] | None = None,
              prefix: str = "r_") -> DataFrame:
    """Left rows + ``prefix``-renamed columns of the as-of matched right row.

    ``direction="backward"``: latest right with ``right_ts <= left_ts``;
    ``"forward"``: earliest right with ``right_ts >= left_ts``. Unmatched
    left rows keep nulls (left-outer semantics). ``tolerance`` (an
    INTERVAL Column, e.g. ``F.expr("INTERVAL 1 HOUR")``) bounds the
    lookback/lookahead: matches farther than that are nulled. ``tie_break``
    columns (from the right side) make the pick deterministic when
    (on, right_ts) repeats; the LARGEST tie_break tuple wins backward and
    the SMALLEST wins forward.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    tie_break = tie_break or []
    rcols = [c for c in right.columns if c not in on]
    lcols = [c for c in left.columns]

    # A NULL-timestamp right row can never be "the most recent at-or-
    # before t" — without this filter it sorts NULLS FIRST in backward
    # mode and becomes a universal earliest match (pandas merge_asof and
    # DuckDB ASOF both ignore NULL/NaT keys). NULL-ts left rows are kept
    # but forced unmatched below, for the same reason.
    right = right.where(F.col(right_ts).isNotNull())

    r = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tie_break)],
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("_r"))
    l = left.select(
        *on, F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb{i}")
          for i, c in enumerate(tie_break)],
        F.struct(*[F.col(c).alias(c) for c in lcols]).alias("_l"))
    # Align schemas for the union: each side lacks the other's struct.
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    l = l.withColumn("_r", F.lit(None).cast(r.schema["_r"].dataType))
    u = r.select(*on, "_ts", "_side", *[f"_tb{i}" for i in range(len(tie_break))],
                 "_r", "_l").unionByName(
        l.select(*on, "_ts", "_side", *[f"_tb{i}" for i in range(len(tie_break))],
                 "_r", "_l"))

    tb = [F.col(f"_tb{i}") for i in range(len(tie_break))]
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(),
                 *[c.asc_nulls_first() for c in tb]]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(),
                 *[c.desc_nulls_first() for c in tb]]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last("_r", ignorenulls=True).over(w)

    out = (u.withColumn("_m", matched)
           .withColumn("_m", F.when(F.col("_ts").isNotNull(), F.col("_m")))
           .where(F.col("_side") == 1))
    if tolerance is not None:
        far = (F.col("_ts") - F.col(f"_m.{right_ts}") > tolerance
               if direction == "backward"
               else F.col(f"_m.{right_ts}") - F.col("_ts") > tolerance)
        out = out.withColumn(
            "_m", F.when(F.col("_m").isNotNull() & far, F.lit(None)
                         .cast(r.schema["_r"].dataType))
                   .otherwise(F.col("_m")))
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in rcols])
