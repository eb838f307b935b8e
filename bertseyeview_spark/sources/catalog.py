"""Iceberg-shaped table catalog, parquet-backed in this image.

Production runs this engine over Iceberg tables (north rule): hidden
partitioning ``days(warc_ts)`` on the corpus, ``label`` partitioning on
nodes, row-level ``MERGE INTO`` for idempotent upserts, snapshot
timestamps for cache recency. The local image ships no Iceberg jars, so
this catalog keeps the same surface on parquet:

* ``write_table`` / ``read_table`` with optional partition columns;
* ``merge_into`` — upsert by key: the parquet emulation is
  anti-join(existing, incoming by key) ∪ incoming + atomic-ish swap
  (Iceberg does this as a metadata-only row-level operation);
* a JSON snapshot log per table (append-only: ts, operation, row
  count) standing in for Iceberg snapshot history — it powers the
  same recency checks plans/cache.py uses.

If Iceberg jars ARE on the classpath (``spark.sql.catalog.*``
configured), set ``format="iceberg"`` and the calls map to
``saveAsTable`` / SQL ``MERGE INTO`` — gated behind a capability probe
so this module never import-fails.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """Probe for an Iceberg catalog without hard-failing."""
    try:
        for k in spark.sparkContext.getConf().getAll():
            if k[0].startswith("spark.sql.catalog.") and "iceberg" in k[1].lower():
                return True
    except Exception:  # noqa: BLE001
        pass
    return False


class TableCatalog:
    def __init__(
        self, spark: SparkSession, warehouse_dir: str, format: str = "parquet"
    ) -> None:
        if format == "iceberg" and not iceberg_available(spark):
            raise RuntimeError(
                "format='iceberg' requested but no Iceberg catalog is "
                "configured on this session (jars not in this image); "
                "use format='parquet'"
            )
        self.spark = spark
        self.warehouse = warehouse_dir
        self.format = format
        os.makedirs(warehouse_dir, exist_ok=True)

    # ------------- paths / snapshots -------------

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _snap_path(self, name: str) -> str:
        return os.path.join(self.warehouse, f"_{name}_snapshots.jsonl")

    def _log_snapshot(self, name: str, op: str, n_rows: int) -> None:
        with open(self._snap_path(name), "a") as f:
            f.write(
                json.dumps({"ts": time.time(), "op": op, "rows": n_rows}) + "\n"
            )

    def snapshots(self, name: str) -> list[dict]:
        p = self._snap_path(name)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f]

    def last_snapshot_ts(self, name: str) -> float | None:
        snaps = self.snapshots(name)
        return snaps[-1]["ts"] if snaps else None

    # ------------- table ops -------------

    def write_table(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))
        self._log_snapshot(name, "overwrite", self.read_table(name).count())

    def read_table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def table_exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def merge_into(
        self, incoming: DataFrame, name: str, keys: list[str]
    ) -> None:
        """Upsert-by-key (Iceberg MERGE INTO ... WHEN MATCHED THEN
        UPDATE WHEN NOT MATCHED THEN INSERT, with incoming winning).
        Parquet emulation: keep existing rows whose key is absent from
        incoming, union incoming, rewrite. Incoming must be key-unique
        (enforced here with dropDuplicates on the keys)."""
        inc = incoming.dropDuplicates(keys)
        if self.table_exists(name):
            existing = self.read_table(name)
            kept = existing.join(inc.select(*keys).distinct(), keys, "anti")
            merged = kept.unionByName(inc)
        else:
            merged = inc
        # write to a staging dir then swap — parquet has no atomic
        # commit; Iceberg's snapshot commit replaces this dance
        tmp = self._path(f"_{name}_staging")
        merged.write.mode("overwrite").parquet(tmp)
        final = self._path(name)
        back = self._path(f"_{name}_old")
        if os.path.exists(back):
            import shutil

            shutil.rmtree(back)
        if os.path.exists(final):
            os.rename(final, back)
        os.rename(tmp, final)
        self._log_snapshot(name, "merge", self.read_table(name).count())


class BucketedStore:
    """Bucketed managed tables (Spark `bucketBy` + `saveAsTable`) — the
    co-located-join layout the node/edge stores use at real scale: two
    tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle on either side (SortMergeJoin reads pre-bucketed
    files directly). This is the parquet-era analogue of Iceberg's
    bucket partition transform (`bucket(N, id)`).

    Managed tables need a metastore-backed session (`spark.sql.
    warehouse.dir` + derby metastore — available in plain local mode),
    unlike the path-based TableCatalog above; keep instances of the two
    separate."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_col: str,
        n_buckets: int = 16,
        sort: bool = True,
    ) -> None:
        # a table dropped in a *previous* session's metastore leaves its
        # warehouse directory behind; saveAsTable then refuses the name.
        # Drop + clear the stale location so overwrite is truly idempotent.
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        try:
            warehouse = self.spark.conf.get("spark.sql.warehouse.dir")
            loc = os.path.join(
                warehouse.removeprefix("file:"), name.lower()
            )
            if os.path.exists(loc):
                import shutil

                shutil.rmtree(loc)
        except Exception:  # noqa: BLE001 - best-effort cleanup
            pass
        writer = df.write.mode("overwrite").format("parquet")
        writer = writer.bucketBy(n_buckets, bucket_col)
        if sort:
            writer = writer.sortBy(bucket_col)
        writer.saveAsTable(name)

    def read(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def colocated_join(
        self, left_name: str, right_name: str, on: str | list[str]
    ) -> DataFrame:
        """Join two same-bucketed tables on the bucket key. With equal
        bucket counts Spark plans a shuffle-free SortMergeJoin — assert
        with plan_has_shuffle()."""
        return self.read(left_name).join(self.read(right_name), on)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE exchange (hash/
    range/single-partition repartitioning). BroadcastExchange is not a
    shuffle — it replicates one small side without repartitioning."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        marker in plan
        for marker in (
            "Exchange hashpartitioning",
            "Exchange rangepartitioning",
            "Exchange SinglePartition",
        )
    )
