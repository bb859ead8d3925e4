"""Bounded persist() registry.

Operators that must cache an intermediate (MinHash signatures, embedding
vectors fanned out to several LSH tables) return lazy DataFrames, so the
operator itself has no point at which it can safely unpersist.  Left
alone, each call pins a MEMORY_AND_DISK cache for the application's
lifetime (Spark's CacheManager holds the reference).  This registry caps
the number of such transient caches: persisting a new one evicts —
unpersists — the oldest beyond the cap.  Results stay correct after
eviction (the lineage recomputes); only reuse speed is lost.
"""

from __future__ import annotations

from collections import deque

from pyspark import StorageLevel
from pyspark.sql import DataFrame

__all__ = ["transient_persist", "clear_transient_caches"]

_MAX_TRANSIENT_CACHES = 8
_RECENT: deque[DataFrame] = deque()


def clear_transient_caches() -> None:
    """Unpersist every registered transient cache (cold-measurement
    hook: identical rebuilt plans would otherwise be served from the
    CacheManager across bench passes)."""
    while _RECENT:
        try:
            _RECENT.popleft().unpersist()
        except Exception:
            pass


def transient_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    df = df.persist(level)
    _RECENT.append(df)
    while len(_RECENT) > _MAX_TRANSIENT_CACHES:
        oldest = _RECENT.popleft()
        try:
            oldest.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    return df
