"""Hash-bucketed group-aggregation helpers.

Ray 2.49's hash aggregate pays per-GROUP cost, which collapses on
key-per-row groupbys (4M distinct url keys measured 301 s @32 cpus vs
6.3 s bucketed — PERF.md step 20).  The fix is always the same shape:

1. per-batch partial aggregation with one Arrow group_by (combiner);
2. assign each partial row a bucket = hash(key) % ~CPU-count parts;
3. ``groupby("part").map_groups(resolve)`` — ONE Python call per
   PARTITION, and the per-partition resolve is a second vectorized
   Arrow group_by.

Identical all-to-all bytes as the naive groupby; per-partition work
instead of per-group work.  These helpers own step 2 for the key
dtypes the repo shuffles (int64 hashes, binary digests, strings).
"""

from __future__ import annotations

import zlib
from typing import Iterable

import numpy as np
import pyarrow as pa

import ray

_MIX = np.uint64(0x9E3779B97F4A7C15)


def n_shuffle_parts() -> int:
    """Bucket count ~ cluster CPUs (each bucket is one task + one
    resolve call; more buckets only add scheduling overhead)."""
    if ray.is_initialized():
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    return 32


def part_of_int64(xs: np.ndarray, n_parts: int) -> pa.Array:
    """Bucket ids for int64/uint64 hash keys: Fibonacci multiply-mix
    then mod, vectorized (the keys may be biased — e.g. shingle sums —
    so mix before mod)."""
    with np.errstate(over="ignore"):
        h = xs.astype(np.uint64) * _MIX
    return pa.array(((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32))


def part_of_binary(bs: Iterable[bytes], n_parts: int) -> pa.Array:
    """Bucket ids for digest-valued keys (sha1/md5 bytes): the digest
    is already uniform, so the first 8 bytes mod n_parts suffice."""
    return pa.array(
        [int.from_bytes((b or b"\0")[:8], "big") % n_parts for b in bs],
        pa.int32(),
    )


def part_of_strings(ss: Iterable[str], n_parts: int) -> pa.Array:
    """Bucket ids for string keys: crc32 mod n_parts (one C call per
    DISTINCT value — call this on batch-deduped partials)."""
    return pa.array(
        [zlib.crc32((s or "").encode("utf-8")) % n_parts for s in ss],
        pa.int32(),
    )
