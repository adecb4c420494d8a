"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in :mod:`graphiti_spark.queries`; the KG-construction
pipeline itself is :mod:`graphiti_spark.plans.pipeline` (golden-gated by
``tests/test_pipeline_golden.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Self-locating: a harness may import this file by path from any cwd.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _shipped(fn):
    """Wrap a query so the graphiti_spark package is shipped to executors
    (addPyFile ≙ spark-submit --py-files) before any pandas UDF runs."""
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from graphiti_spark.session import ship_package
        ship_package(spark)
        return fn(spark, sf_dir)
    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline (episode assembly →
    vectorized extraction UDFs → LSH+CC canonicalization → edge dedup →
    temporal versioning) over transcripts derived from sf0.001 tables."""
    from graphiti_spark.plans.pipeline import build_graph
    from graphiti_spark.queries import RUN_TS, derived_transcripts
    from graphiti_spark.session import ship_package

    ship_package(spark)
    tr = derived_transcripts(spark, "/root/testdata/sf0.001",
                             with_negation=True)
    g = build_graph(spark, tr, run_ts=RUN_TS)
    return g.edges.select("uuid", "group_id", "source_node_uuid",
                          "target_node_uuid", "name", "fact", "valid_at",
                          "invalid_at", "expired_at")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graphiti_spark.queries import QUERIES
    return {name: _shipped(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from graphiti_spark.queries import ORACLES
    return dict(ORACLES)
