"""Row-level MERGE writer (S4 — the reference's ``add_nodes_and_edges_bulk``
UNWIND+MERGE persistence, ``/root/reference/graphiti_core/utils/
bulk_utils.py:84-165`` and the per-model ``MERGE INTO`` statements in
``models/*/**_db_queries.py:28-35``), re-expressed for tables:

* With an Iceberg catalog configured, ``merge()`` executes a real
  ``MERGE INTO`` (matched → update all columns, not-matched → insert),
  plus a scoped ``DELETE`` when a ``delete_keys`` slice is being replaced.
* Without one (this sandbox has no Iceberg jar), the SAME semantics are
  emulated on parquet with **snapshot commits**: every merge writes a new
  version directory ``v<N>/`` and then atomically swaps a ``_LATEST``
  pointer file (``os.replace``). Readers resolve the pointer first, so a
  process killed anywhere mid-merge leaves the previous snapshot fully
  intact — resuming simply re-runs the merge (deterministic from its
  inputs), which is exactly Iceberg's optimistic-snapshot-commit model and
  what makes a kill-and-resume test byte-equal to an uninterrupted run.

Because reads always come from the OLD version directory and writes go to
a NEW one, the recompute plan never reads files the write replaces — the
hazard ``StreamingGraphWriter`` must localCheckpoint around does not exist
here, and no extra materialization barrier is needed.

``merge_plan()`` additionally exposes the MERGE-shaped row sets
(matched-update / not-matched-insert) so callers — e.g. the
entity-granular incremental path (operators/incremental.py), which
already computes its delta — can inspect or ship exactly what a MERGE
would write.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.sources.tables import _has_iceberg

_POINTER = "_LATEST"
#: snapshots retained after a commit (current + rollback margin).
KEEP_VERSIONS = 2


def merge_plan(target: DataFrame | None, source: DataFrame,
               key_cols: list[str]) -> dict[str, DataFrame]:
    """The two row sets a ``MERGE INTO`` would write, as DataFrames:
    ``matched`` (source rows whose key exists in target → WHEN MATCHED
    UPDATE) and ``not_matched`` (→ WHEN NOT MATCHED INSERT). Pure plan
    surgery, nothing executed. No broadcast hint: the build side here is
    the TARGET key set (the 100 TB side at scale — never force-broadcast
    it); AQE downgrades to broadcast on its own when the target is
    actually small, and key-partitioned semi/anti joins handle the rest."""
    if target is None:
        return {"matched": source.limit(0), "not_matched": source}
    keys = target.select(*key_cols)
    return {
        "matched": source.join(keys, key_cols, "left_semi"),
        "not_matched": source.join(keys, key_cols, "left_anti"),
    }


class MergeWriter:
    """One logical table with row-level MERGE commits on ``key_cols``.

    ``merge(updates, delete_keys=None)``: rows matching an existing key
    replace that row; new keys insert; rows matching ``delete_keys``
    (a DataFrame of key-prefix columns, e.g. the affected
    ``(group_id, source_node_uuid)`` slice) and NOT re-asserted by
    ``updates`` are deleted — the shape ``incremental_update_entity``'s
    ``delta_only`` output needs to land a micro-batch exactly."""

    def __init__(self, spark: SparkSession, root: str, name: str,
                 key_cols: tuple[str, ...] = ("uuid",)):
        self.spark = spark
        self.name = name
        self.dir = os.path.join(root, name)
        self.key_cols = list(key_cols)
        os.makedirs(self.dir, exist_ok=True)

    # -- snapshot plumbing (parquet backend) --------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.dir, _POINTER)

    def current_version(self) -> int | None:
        # ONLY a missing pointer means "no snapshot yet". Any other
        # failure (EIO, EACCES, truncated/corrupt JSON) must raise: if it
        # were mapped to None, the next merge would treat the table as
        # empty, commit v1 containing only the micro-batch, and rmtree
        # the live snapshot dir as a presumed orphan — silent truncation.
        try:
            with open(self._pointer_path()) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame | None:
        """Snapshot-consistent read: resolve the pointer, read that
        version dir. Returns None before the first commit."""
        v = self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.dir, f"v{v}"))

    def _commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next snapshot, then atomically swap the
        pointer. A kill BEFORE the ``os.replace`` leaves the table at the
        previous snapshot (the half-written ``v<N>`` dir is orphaned and
        reclaimed by the next commit's GC); ``os.replace`` itself is the
        atomic commit point, as in Iceberg's metadata swap."""
        v = (self.current_version() or 0) + 1
        out = os.path.join(self.dir, f"v{v}")
        if os.path.exists(out):              # orphan from a killed commit
            shutil.rmtree(out)
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v, "table": self.name}, f)
        os.replace(tmp, self._pointer_path())
        self._gc(keep_from=v - KEEP_VERSIONS + 1)
        return v

    def _gc(self, keep_from: int) -> None:
        for d in os.listdir(self.dir):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < keep_from:
                shutil.rmtree(os.path.join(self.dir, d), ignore_errors=True)

    # -- the MERGE -----------------------------------------------------------
    def full(self, df: DataFrame) -> None:
        """Initial (or replace-all) load."""
        self._commit(df)

    def merge(self, updates: DataFrame,
              delete_keys: DataFrame | None = None) -> None:
        """Upsert ``updates`` on ``key_cols``; within the optional
        ``delete_keys`` slice, rows not re-asserted by ``updates`` are
        deleted (replace-slice semantics for the recomputed edge
        slice)."""
        if _has_iceberg(self.spark):
            self._merge_iceberg(updates, delete_keys)
            return
        target = self.read()
        if target is None:
            self._commit(updates)
            return
        survivors = target.join(F.broadcast(updates.select(*self.key_cols)),
                                self.key_cols, "left_anti")
        if delete_keys is not None:
            survivors = survivors.join(F.broadcast(delete_keys),
                                       list(delete_keys.columns), "left_anti")
        self._commit(survivors.unionByName(updates.select(target.columns)))

    def _merge_iceberg(self, updates: DataFrame,
                       delete_keys: DataFrame | None) -> None:
        """Real ``MERGE INTO`` (bulk_utils.py:84-165 /
        edge_db_queries.py:28-35 semantics) — runs only when an Iceberg
        catalog is configured (no jar in this sandbox; the parquet
        snapshot path above is the tested twin with equal semantics)."""
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
        updates.createOrReplaceTempView(f"_upd_{self.name}")
        if delete_keys is not None:
            delete_keys.createOrReplaceTempView(f"_dk_{self.name}")
            dk_on = " AND ".join(f"t.{k} = d.{k}"
                                 for k in delete_keys.columns)
            upd_on = " AND ".join(f"t.{k} = u.{k}" for k in self.key_cols)
            self.spark.sql(
                f"DELETE FROM {self.name} t WHERE EXISTS ("
                f"SELECT 1 FROM _dk_{self.name} d WHERE {dk_on}) "
                f"AND NOT EXISTS (SELECT 1 FROM _upd_{self.name} u "
                f"WHERE {upd_on})")
        self.spark.sql(
            f"MERGE INTO {self.name} t USING _upd_{self.name} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")

    def plan(self, updates: DataFrame) -> dict[str, DataFrame]:
        """MERGE-shaped row sets vs the CURRENT snapshot (see
        :func:`merge_plan`)."""
        return merge_plan(self.read(), updates, self.key_cols)
