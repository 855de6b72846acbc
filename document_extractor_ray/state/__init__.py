"""Shared-state helpers: broadcast small lookups once per job.

The reference holds no cross-file state (each file is a fresh
subprocess); the Ray build's only shared state is broadcast read-only
lookups (dimension maps, dedup winners, query matrices) — put in the
object store once, fetched per worker.  A shared *mutable* index would
be the one case for a raw @ray.remote actor; nothing in the reference
needs one.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable

import ray

# LRU-capped: long-lived workers serve MANY queries (each broadcast is
# a new ref), and iterative operators broadcast per round — an
# unbounded cache would pin every historical value (and its plasma
# buffer for zero-copy payloads) for the worker's lifetime.  Eviction
# only drops this worker's reference; a re-use simply re-fetches.
_CACHE_CAP = 32
_CACHE: "OrderedDict" = OrderedDict()


def _cache_put(key, value):
    _CACHE[key] = value
    _CACHE.move_to_end(key)
    while len(_CACHE) > _CACHE_CAP:
        _CACHE.popitem(last=False)


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
        _cache_put(key, ray.get(ref))
    else:
        _CACHE.move_to_end(key)
    return _CACHE[key]


def lookup_join(
    batch: "pa.Table",
    key_col: str,
    dim: "pa.Table",
    dim_key: str,
    value_cols: list[str],
    fill: Any = None,
) -> "pa.Table":
    """Vectorized broadcast-dim attach: ``pc.index_in`` on the key
    column, then ``pc.take`` per value column — no Python per-row
    loop, no dict.  ``dim`` is the broadcast small side (an Arrow
    table travels zero-copy through the object store); unmatched keys
    yield null, or ``fill`` when given."""
    import pyarrow.compute as pc

    idx = pc.index_in(batch[key_col], value_set=dim[dim_key].combine_chunks())
    for col in value_cols:
        vals = pc.take(dim[col].combine_chunks(), idx)
        if fill is not None:
            vals = pc.fill_null(vals, fill)
        batch = batch.append_column(col, vals)
    return batch


def cached_make(ref: "ray.ObjectRef", maker: Callable, extra_key: str = "") -> Any:
    """Per-worker-process cached DERIVED state: ``maker(broadcast
    value)`` runs once per worker (not per batch, not per actor), so a
    plain task-pool stage gets actor-grade state amortization without
    pool spin-up (PERF.md step 19/25).  ``extra_key`` disambiguates
    different derivations of the same ref (e.g. dtype variants)."""
    key = ("mk", ref.hex() if hasattr(ref, "hex") else id(ref), extra_key)
    if key not in _CACHE:
        _cache_put(key, maker(cached_get(ref)))
    else:
        _CACHE.move_to_end(key)
    return _CACHE[key]
