"""Plan audit: dump .explain('formatted') for every queries() entry and
flag scale anti-patterns:

  * CartesianProduct / BroadcastNestedLoopJoin without an intended cross
  * BatchEvalPython (row-at-a-time Python UDF — must be ArrowEvalPython)
  * parquet scans without PushedFilters/ReadSchema pruning where a filter
    or narrow projection exists upstream

Usage: python scripts/explain_audit.py [names...] (default: all, sf0.001)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

RED_FLAGS = [
    ("CartesianProduct", "cartesian product"),
    ("BatchEvalPython", "row-at-a-time Python UDF (want ArrowEvalPython)"),
]
ALLOW_NESTED_LOOP = {"embedding_knn", "embedding_knn_ivf",
                     "embedding_near_dup",
                     "dedup_minhash",   # intended broadcast cross joins
                                        # (8-row seed table × tokens)
                     "bm25_search",     # 1-row corpus-stats (N, avgdl)
                                        # broadcast onto the tf join
                     "composite_search",  # same bm25 stats broadcast,
                                          # once per layer
                     "kg_mmr"}            # 4-row query-id broadcast onto
                                          # the candidate table
# Queries whose global (unpartitioned) windows rank only bounded inputs
# (sort().limit() upstream): rrf_fusion ranks ≤200-row candidate lists,
# build_ivf's seed ranking runs over ≤n_cells rows.
ALLOW_GLOBAL_WINDOW = {"rrf_fusion", "embedding_knn_ivf",
                       # per-layer RRF rank windows over sort().limit(2k)
                       # bounded method lists (≤20 rows each)
                       "composite_search"}


def global_windows(plan: str) -> int:
    """Count Window nodes with NO partition spec — every corpus row
    through one task, the #1 scale-killer shape. In formatted explain a
    partitioned Window's Arguments line has three top-level bracket
    groups (functions, partition cols, order cols) = two `], [`
    separators; a global one has only two groups = one separator."""
    n = 0
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "Arguments:" in line \
                and line.count("], [") == 1:
            n += 1
    return n


def main():
    import __spark_entry__ as entrymod
    from graphiti_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    names = sys.argv[1:] or [n for n in qs if n != "kg_build_edges"]

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    problems = []
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        flags = []
        for pat, desc in RED_FLAGS:
            if pat in plan:
                flags.append(desc)
        if ("BroadcastNestedLoopJoin" in plan
                and name not in ALLOW_NESTED_LOOP):
            flags.append("unintended nested-loop join")
        gw = global_windows(plan)
        if gw and name not in ALLOW_GLOBAL_WINDOW:
            flags.append(f"{gw} global unpartitioned Window(s)")
        scans = len(re.findall(r"Scan parquet", plan))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        wsc = len(re.findall(r"WholeStageCodegen", plan))
        status = "FLAG " + "; ".join(flags) if flags else "ok"
        print(f"{name:24s} scans={scans} pushedFilterScans={pushed} "
              f"codegenSpans={wsc} {status}")
        if flags:
            problems.append((name, flags, plan))
    for name, flags, plan in problems:
        print(f"\n===== {name}: {flags} =====")
        print(plan[:4000])
    spark.stop()
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
