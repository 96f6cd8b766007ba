"""Snapshot-versioned query result cache — the Snowflake result-cache
semantics (the reference's warehouse layer serves repeated BI queries
from cached result sets) re-expressed on this engine's snapshot
tables, where correct invalidation is trivial: a result is keyed by
(query identity, exact input table versions), and any commit to an
input moves its version, so a stale hit is impossible by
construction. No TTLs, no manual invalidation, no "eventually".

Reference parity: Snowflake's result cache returns a prior result for
a syntactically-identical query when underlying table data is
unchanged — this module implements that contract for the medallion/
snapshot tables (`Stream_Analytics_Platform.md` warehouse tier).

Scale design: a cache entry is the materialized RESULT (typically the
small end of an aggregation), written once as parquet and served with
a metadata-only version check — a dashboard refresh against an
unchanged 100 TB fact table costs two pointer reads instead of a
scan. Entries land via write-to-staging + atomic rename, so
concurrent readers of the same key see a complete entry or none;
losers of a populate race overwrite with identical content.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from group5_spark.medallion.snapshots import _current_version  # noqa: SLF001


class ResultCache:
    """A directory of materialized query results keyed by
    (query_name, input snapshot versions).

    ``max_entries`` bounds the cache; eviction is LRU by last-served
    time (touched on every hit). Version changes naturally strand old
    entries, which age out the same way.
    """

    def __init__(self, cache_root: str, max_entries: int = 64):
        self.root = Path(cache_root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.max_entries = max_entries

    # -------------------------------------------------- internals --
    def _key(self, name: str, versions: dict[str, int]) -> str:
        payload = json.dumps({"q": name, "v": versions}, sort_keys=True)
        return hashlib.md5(payload.encode()).hexdigest()[:20]

    def _entry(self, key: str) -> Path:
        return self.root / key

    # ------------------------------------------------------ api ----
    def versions_of(self, inputs: list[str]) -> dict[str, int]:
        return {p: _current_version(Path(p)) for p in inputs}

    def get_or_compute(
        self,
        spark: SparkSession,
        name: str,
        inputs: list[str],
        compute: Callable[[], DataFrame],
        max_retries: int = 3,
    ) -> tuple[DataFrame, bool]:
        """Serve ``name`` from cache when every input table is at the
        version the entry was built against; else run ``compute()``,
        materialize, and serve. Returns ``(df, was_hit)``.

        Concurrency: versions are captured BEFORE compute() runs, but
        compute() reads whatever the inputs' heads are at
        materialization time. If a commit lands in between, the
        materialized bytes may reflect the NEWER data — publishing
        them under the older-version key would let a later caller be
        served data that does not match its key. So versions are
        re-read after materialization; on mismatch the staged result
        is discarded and the compute retried against the new head
        (the key moves with it). After ``max_retries`` under sustained
        commit pressure the last result is served UNPUBLISHED — still
        correct for this caller, never poisoning the cache.
        """
        for _ in range(max_retries + 1):
            versions = self.versions_of(inputs)
            key = self._key(name, versions)
            entry = self._entry(key)
            if (entry / "_META.json").exists():
                (entry / "_META.json").touch()  # LRU: record the hit
                return spark.read.parquet(str(entry / "data")), True

            df = compute()
            staging = self.root / f"_stage.{key}.{time.time_ns()}"
            df.write.mode("overwrite").parquet(str(staging / "data"))
            if self.versions_of(inputs) != versions:
                # a commit raced the compute: the bytes in staging may
                # belong to the new version — never publish them under
                # the key captured for the old one
                shutil.rmtree(staging, ignore_errors=True)
                continue
            meta = {
                "query": name,
                "versions": versions,
                "built_ts": time.time(),
            }
            (staging / "_META.json").write_text(json.dumps(meta, indent=1))
            try:
                staging.rename(entry)  # atomic publish
            except OSError:
                shutil.rmtree(staging, ignore_errors=True)  # lost the race
            self._evict()
            return spark.read.parquet(str(entry / "data")), False

        # sustained commit pressure: serve the freshest compute without
        # caching (an ephemeral staging dir would vanish under the
        # reader, so materialize nothing and return the live plan)
        return compute(), False

    def _evict(self) -> None:
        entries = [
            p for p in self.root.iterdir()
            if p.is_dir() and (p / "_META.json").exists()
        ]
        if len(entries) <= self.max_entries:
            return
        entries.sort(key=lambda p: (p / "_META.json").stat().st_mtime)
        for p in entries[: len(entries) - self.max_entries]:
            shutil.rmtree(p, ignore_errors=True)

    def stats(self) -> dict:
        entries = [
            json.loads((p / "_META.json").read_text())
            for p in self.root.iterdir()
            if p.is_dir() and (p / "_META.json").exists()
        ]
        return {"entries": len(entries), "queries": sorted({e["query"] for e in entries})}
