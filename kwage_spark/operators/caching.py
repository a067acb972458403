"""Tracked persist() handles — cache hygiene for multi-read plans.

Some operators persist an intermediate because their plan reads it more
than once (the MinHash signature table, the LSH bucketed-row tables). The
returned DataFrame still depends on that cache, so the operator cannot
unpersist before the caller's action runs; left alone, repeated calls
accumulate cached partitions for the session.

Two release mechanisms, both thread-safe:

* ``cache_scope()`` — the precise tool. Caches registered inside the
  ``with`` block are released on exit, and ONLY those: a concurrent
  job's caches (tracked in its own scope or the global registry) are
  untouched. The caller must materialize (or ``localCheckpoint``) the
  result inside the scope, since the caches die at scope exit::

      with cache_scope():
          pairs = minhash_lsh_pairs(df, "id", "text")
          pairs = pairs.localCheckpoint(eager=True)   # cut the cache deps
      return pairs                                    # caches released

* ``release_caches()`` — the blunt tool for single-job sessions (bench
  loops, tests): releases every cache registered OUTSIDE any scope since
  the last call.

Scopes are per-thread (a thread-local stack), so two jobs on different
driver threads never see each other's scopes.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LOCK = threading.RLock()
_GLOBAL: list[DataFrame] = []
_TLS = threading.local()


def _scope_stack() -> list[list[DataFrame]]:
    stack = getattr(_TLS, "stack", None)
    if stack is None:
        stack = _TLS.stack = []
    return stack


def persist_tracked(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                    ) -> DataFrame:
    """persist() + register for release at the innermost active
    ``cache_scope`` exit (or via ``release_caches()`` when no scope is
    active on this thread)."""
    df.persist(level)
    with _LOCK:
        stack = _scope_stack()
        (stack[-1] if stack else _GLOBAL).append(df)
    return df


def _unpersist_all(dfs: list[DataFrame]) -> int:
    n = len(dfs)
    for df in dfs:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    dfs.clear()
    return n


@contextmanager
def cache_scope():
    """Release exactly the operator-internal caches registered inside
    this block on exit — materialize results before leaving the scope."""
    scope: list[DataFrame] = []
    with _LOCK:
        _scope_stack().append(scope)
    try:
        yield scope
    finally:
        with _LOCK:
            stack = _scope_stack()
            # remove by IDENTITY, never value: two empty scope lists
            # compare equal, so a value-based remove() of an inner scope
            # could pop the OUTER scope's list and leak its caches
            for i in range(len(stack) - 1, -1, -1):
                if stack[i] is scope:
                    del stack[i]
                    break
        _unpersist_all(scope)


def scoped_materialize(build) -> DataFrame:
    """Run ``build()`` (an operator invocation) inside a ``cache_scope``
    and cut its cache dependencies with an eager ``localCheckpoint``: the
    operator's internal persists release at scope exit instead of
    accumulating for the session, and the caller still gets a
    materialized DataFrame to collect. The pattern behind every
    registered query whose operator persists internally."""
    with cache_scope():
        return build().localCheckpoint(eager=True)


def release_caches() -> int:
    """Unpersist every UNSCOPED cache registered since the last release.
    Call after the consuming action; returns how many were released."""
    with _LOCK:
        pending = list(_GLOBAL)
        _GLOBAL.clear()
    return _unpersist_all(pending)


def tracked_count() -> int:
    """Currently-registered caches visible to this thread (global +
    this thread's open scopes)."""
    with _LOCK:
        return len(_GLOBAL) + sum(len(s) for s in _scope_stack())
