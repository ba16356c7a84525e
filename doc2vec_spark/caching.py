"""Invocation-scoped DataFrame caches.

Multi-consumer intermediates (posting lists, LSH signature tables, centroid
assignments, term-frequency tables) must be cached — two join sides or an
aggregate plus a probe read them, and an uncached plan recomputes the whole
upstream subtree per consumer. But a bare ``.cache()`` with no matching
unpersist leaks executor storage for the life of the session: a long
correctness run or a resident engine session accumulates every invocation's
blocks until storage memory is exhausted.

``scoped_cache`` ties a cache's lifetime to the *invocation* instead. The
registry wraps every query function so that entering a new invocation first
releases the caches recorded by prior invocations; storage therefore stays
flat across an arbitrarily long sequence of queries without a global
``clearCache`` (which would also evict caller-owned caches). Unpersisting a
DataFrame whose plan has not been consumed yet is safe — Spark simply
recomputes — so callers that interleave invocation and consumption lose
only the intra-query reuse, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for release at the next invocation."""
    df = df.cache()
    _LIVE.append(df)
    return df


def release_scoped_caches() -> None:
    """Unpersist every scoped cache recorded since the last release."""
    global _LIVE
    live, _LIVE = _LIVE, []
    for df in live:
        try:
            df.unpersist()
        except Exception:
            # a stopped/replaced SparkSession invalidates old handles; the
            # storage died with its context, nothing left to free
            pass
