"""TTL result cache — SURVEY.md T5 / §4 "result caching".

The reference keeps a Postgres LRU of API responses keyed by a
SHA-256 of the normalized request, valid for 3600 s
(backend/utility.py:428-494 key, :497-544 TTL lookup, :664-746 store,
:615-638 invalidation). Spark has no TTL cache, so this is the small
custom layer SURVEY §4 allows: results are materialized to parquet
under ``cache_dir/<sha256>/`` with a sidecar timestamp, and a lookup
within ``ttl_seconds`` re-reads the materialized result instead of
recomputing the plan.

Scale posture: the cache stores RESULTS (small, post-aggregation),
never inputs; keys are uniform SHA-256 so the directory fan-out is
flat; eviction is O(entries) driver-side metadata work. Equivalent
prod shape: a Delta results table with a ``created_at`` column and a
``DELETE WHERE created_at < now() - interval`` maintenance job.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TTL_SECONDS = 3600  # reference: backend/utility.py:514


def request_key(url: str, params: dict | None = None, payload: dict | None = None) -> str:
    """F17: canonical SHA-256 request key (backend/utility.py:428-494).

    Params/payload are serialized with sorted keys — the reference's
    normalization — so logically-equal requests share a key.
    """
    canon = "||".join(
        [
            url,
            json.dumps(params or {}, sort_keys=True, default=str),
            json.dumps(payload or {}, sort_keys=True, default=str),
        ]
    )
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


class ResultCache:
    """Parquet-backed TTL cache of materialized query results."""

    def __init__(self, cache_dir: str, ttl_seconds: int = DEFAULT_TTL_SECONDS):
        self.cache_dir = cache_dir
        self.ttl_seconds = ttl_seconds
        os.makedirs(cache_dir, exist_ok=True)

    def _entry(self, key: str) -> str:
        return os.path.join(self.cache_dir, key)

    def _meta(self, key: str) -> str:
        return os.path.join(self._entry(key), "_cache_meta.json")

    def lookup(self, spark: SparkSession, key: str) -> DataFrame | None:
        """Return the cached result if present and fresh, else None."""
        meta_path = self._meta(key)
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        if time.time() - meta["created_at"] > self.ttl_seconds:
            return None
        return spark.read.parquet(os.path.join(self._entry(key), "data"))

    def store(self, key: str, result: DataFrame) -> DataFrame:
        """Materialize a result under the key; empty results are NOT
        cached (reference evicts empty responses, utility.py:732-737)."""
        spark = result.sparkSession
        entry = self._entry(key)
        tmp = entry + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        result.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        n = spark.read.parquet(os.path.join(tmp, "data")).count()
        if n == 0:
            shutil.rmtree(tmp, ignore_errors=True)
            return result
        with open(os.path.join(tmp, "_cache_meta.json"), "w") as f:
            json.dump({"created_at": time.time(), "rows": n}, f)
        shutil.rmtree(entry, ignore_errors=True)
        # node-local scratch swap, NOT a cross-writer publish point: a
        # torn/lost cache entry is a miss and recomputes, so this needs
        # no LogStore seam (deploy the cache dir on local disk; see
        # SCALE.md "Object-store data plane")
        os.replace(tmp, entry)
        return spark.read.parquet(os.path.join(entry, "data"))

    def get_or_compute(
        self, spark: SparkSession, key: str, compute
    ) -> tuple[DataFrame, bool]:
        """(result, was_hit): the reference's cache-aside read path."""
        hit = self.lookup(spark, key)
        if hit is not None:
            return hit, True
        return self.store(key, compute()), False

    def invalidate(self, key_prefix: str = "") -> int:
        """Drop entries by key prefix (utility.py:615-638); '' = all."""
        n = 0
        for name in os.listdir(self.cache_dir):
            if name.startswith(key_prefix) and os.path.isdir(self._entry(name)):
                shutil.rmtree(self._entry(name), ignore_errors=True)
                n += 1
        return n

    def evict_expired(self) -> int:
        """Maintenance sweep: remove entries older than the TTL."""
        n = 0
        now = time.time()
        for name in os.listdir(self.cache_dir):
            meta_path = self._meta(name)
            if not os.path.exists(meta_path):
                continue
            with open(meta_path) as f:
                created = json.load(f)["created_at"]
            if now - created > self.ttl_seconds:
                shutil.rmtree(self._entry(name), ignore_errors=True)
                n += 1
        return n
