"""Tracked persist() handles — cache hygiene for multi-read plans.

Some operators persist an intermediate because their plan reads it more
than once (the MinHash signature table, the range-partitioned layout
behind the global rank). The returned DataFrame still depends on that
cache, so the operator cannot unpersist before the caller's action runs;
left alone, repeated calls accumulate cached partitions for the session.

This registry is the documented handle: operators register every
internal persist here, and callers (or a job's finally block) release
them all with ``release_caches()`` once results are materialized.
``spark.catalog.clearCache()`` also works but is a blunt instrument — it
evicts caches the CALLER created too.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                    ) -> DataFrame:
    """persist() + register for later release_caches()."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every operator-internal cache registered since the last
    release. Call after the consuming action; returns how many were
    released."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    _TRACKED.clear()
    return n


def tracked_count() -> int:
    return len(_TRACKED)
