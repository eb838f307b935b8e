"""S10 — materialized result cache with recency gating.

Reference analogues:
* cytoscape query results memoized to a JSON file and reused until
  stale (shared/helper/neo4j_helper.py:1870-1931);
* the ``Stats`` node holding ``last_embedding`` so embeddings are only
  recomputed when older than ``max_integration_age`` seconds
  (knowledge-graph-manager/__main__.py:1453-1483).

Spark-first shape: results materialize to parquet tables keyed by a
deterministic query signature; a tiny stats ledger records when each
key was refreshed. ``cached_result`` replays the stored table when the
entry is fresh, else recomputes and overwrites — the "materialized
view + TTL" pattern (Iceberg snapshot timestamps in production).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def query_signature(name: str, params: dict) -> str:
    blob = json.dumps({"name": name, "params": params}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class ResultCache:
    def __init__(self, spark: SparkSession, cache_dir: str) -> None:
        self.spark = spark
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._stats_path = os.path.join(cache_dir, "_stats.json")

    def _stats(self) -> dict:
        if os.path.exists(self._stats_path):
            with open(self._stats_path) as f:
                return json.load(f)
        return {}

    def _mark(self, sig: str) -> None:
        stats = self._stats()
        stats[sig] = time.time()
        with open(self._stats_path, "w") as f:
            json.dump(stats, f)

    def age_seconds(self, name: str, params: dict) -> float | None:
        """Age of the cached entry, or None if absent (the reference's
        Stats.last_embedding recency check)."""
        ts = self._stats().get(query_signature(name, params))
        return None if ts is None else time.time() - ts

    def cached_result(
        self,
        name: str,
        params: dict,
        compute,  # Callable[[], DataFrame]
        max_age_seconds: float = 604_800.0,  # reference default: 7 days
    ) -> tuple[DataFrame, bool]:
        """-> (result_df, was_cache_hit)."""
        sig = query_signature(name, params)
        path = os.path.join(self.cache_dir, sig)
        age = self.age_seconds(name, params)
        if age is not None and age <= max_age_seconds and os.path.exists(path):
            return self.spark.read.parquet(path), True
        df = compute()
        df.write.mode("overwrite").parquet(path)
        self._mark(sig)
        return self.spark.read.parquet(path), False
