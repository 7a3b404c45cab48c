"""Small shared utilities."""

from __future__ import annotations

import json
import os

# Cache-entry registry: library operators (LSH candidate sets, k-means
# assignments, centroid sums, pipeline stage pins) persist intermediates that
# outlive the function that created them — the returned lazy plan still reads
# them. A long-lived session that builds many such plans would accumulate
# entries (each is plan-keyed and LRU-evictable, so this is storage pressure,
# not a leak — but measured GC inflation across a 30-query suite is real).
# Operators register their persists here; entry points (the query-registry
# wrapper, run_text_pipeline, bench.py) release PREVIOUS entries before/after
# building, which bounds live cache entries to one query's working set.
_LIVE_CACHES: list = []


def tracked_cache(df):
    """``df.persist()`` plus registration for later bulk release."""
    df = df.persist()
    _LIVE_CACHES.append(df)
    return df


def release_tracked_caches() -> None:
    """Unpersist every registered cache entry (idempotent, error-tolerant:
    a stopped session just drops the handles)."""
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def atomic_write_json(path: str, obj) -> None:
    """Write JSON durably-by-rename: serialize to ``path + '.tmp'`` then
    ``os.replace`` — readers see either the old or the new complete file,
    never a torn write. The parent directory is created if missing."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
