"""Tracked lazy persists for exactly-once kernel materialization.

Several operators persist() an Arrow-kernel output before feeding it to both
sides of a self-join: AQE's BroadcastExchange is never reused against a
shuffle, so without the cache the mapInPandas kernel would re-execute once
per join side (accumulator-measured 2-4x corpus re-reads — see
operators/dedup.py).  The persist is LAZY and keeps lineage, but the storage
blocks outlive the returned plan's terminal action; in a long-lived session
repeated operator calls accumulate cached frames until the caller releases
them (r5 ADVICE).

Caller contract: after the terminal action on an operator's result, release
storage with either ``spark.catalog.clearCache()`` (global) or
:func:`release_caches` (only the frames this package cached).  Every
operator that persists internally says so in its docstring and registers the
frame here via :func:`track`.
"""

from __future__ import annotations

# Strong references on purpose: the caller only holds the RESULT plan, not
# the internally-persisted frame, so a weakref would die the moment the
# operator returns while the JVM cache blocks live on.  The Python-side cost
# is one small object per tracked frame until release.
_TRACKED: list = []


def track(df):
    """Register an internally-persisted DataFrame so :func:`release_caches`
    can unpersist it later; returns ``df`` unchanged."""
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every DataFrame that this package's operators persisted
    internally.  Safe to call at any time (lazy plans re-derive from lineage
    on the next action).  Returns the number released."""
    global _TRACKED
    released = 0
    for df in _TRACKED:
        df.unpersist()
        released += 1
    _TRACKED = []
    return released
