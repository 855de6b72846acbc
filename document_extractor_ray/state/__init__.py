"""Shared-state helpers: broadcast small lookups once per job.

The reference holds no cross-file state (each file is a fresh
subprocess); the Ray build's only shared state is broadcast read-only
lookups (dimension maps, dedup winners, query matrices) — put in the
object store once, fetched per worker.  A shared *mutable* index would
be the one case for a raw @ray.remote actor; nothing in the reference
needs one.
"""

from __future__ import annotations

from typing import Any, Callable

import ray

_CACHE: dict = {}


def broadcast(value: Any) -> "ray.ObjectRef":
    """ray.put once on the driver; workers ray.get (zero-copy for
    numpy/Arrow payloads)."""
    return ray.put(value)


def cached_get(ref: "ray.ObjectRef") -> Any:
    """Per-worker-process cached ray.get — avoids re-deserializing a
    broadcast value on every batch when the payload is not
    zero-copyable (dicts, sets)."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
