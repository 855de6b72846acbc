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
import pyarrow.compute as pc

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


def _mix_key_arrays(arrs, n_parts: int) -> pa.Array:
    h = np.zeros(len(arrs[0]), np.uint64)
    with np.errstate(over="ignore"):
        for a in arrs:
            h = h * np.uint64(0xC2B2AE3D27D4EB4F) + np.asarray(a).astype(
                np.uint64
            )
        h *= _MIX
    return pa.array(((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32))


def bucketed_bucket_pairs(
    exploded: "ray.data.Dataset",
    key_cols,
    pair_fn,
    empty: pa.Table,
    n_parts: int = None,
    min_rows: int = 2,
) -> "ray.data.Dataset":
    """``groupby(key_cols).map_groups(pair_fn)`` without per-bucket
    Python: LSH band/chunk buckets are mostly SINGLETONS (one group
    per doc-band), so the naive map_groups pays a Python call per doc.
    Here rows hash-bucket on the key tuple into ~CPU-count partitions,
    each partition sorts once, bucket boundaries fall out of one
    vectorized neighbor-compare, and ``pair_fn`` runs only on buckets
    with >= 2 rows (the rare, interesting ones)."""
    import ray.data  # noqa: F401

    n_parts = n_parts or n_shuffle_parts()

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", key_part_column(t, key_cols, n_parts))

    def partition_pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([(c, "ascending") for c in key_cols])
        ks = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        n = t.num_rows
        if n < min_rows:
            return empty
        change = np.zeros(n - 1, bool)
        for k in ks:
            change |= k[1:] != k[:-1]
        starts = np.flatnonzero(np.concatenate(([True], change)))
        ends = np.append(starts[1:], n)
        outs = [
            pair_fn(t.slice(int(s), int(e - s)))
            for s, e in zip(starts, ends)
            if e - s >= min_rows
        ]
        outs = [o for o in outs if o.num_rows]
        return pa.concat_tables(outs) if outs else empty

    return (
        exploded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pyarrow")
    )


def bucketed_minmax(
    ds: "ray.data.Dataset",
    key_cols,
    val_col: str,
    how: str,
    n_parts: int = None,
) -> "ray.data.Dataset":
    """``groupby(key_cols).aggregate(Min/Max(val_col))`` for
    key-per-row cardinality (e.g. dedup of (doc_a, doc_b) pair rows):
    per-batch Arrow group_by partial, key-tuple hash bucket, one
    vectorized Arrow group_by per partition."""
    assert how in ("min", "max")
    n_parts = n_parts or n_shuffle_parts()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, list(key_cols)).aggregate([(val_col, how)])
        cols = {c: g[c] for c in key_cols}
        cols[val_col] = g[f"{val_col}_{how}"]
        out = pa.table(cols)
        return out.append_column("part", key_part_column(out, key_cols, n_parts))

    def resolve(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, list(key_cols)).aggregate([(val_col, how)])
        cols = {c: g[c] for c in key_cols}
        cols[val_col] = g[f"{val_col}_{how}"]
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )


def _key_u64(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Any key column -> uint64 hash material: numeric/temporal
    reinterpret (bijective), strings crc32 (one C call per value)."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return np.fromiter(
            (zlib.crc32((s or "").encode("utf-8")) for s in col.to_pylist()),
            np.uint64,
            len(col),
        )
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        return np.fromiter(
            (
                int.from_bytes((b or b"\0")[:8], "big")
                for b in col.to_pylist()
            ),
            np.uint64,
            len(col),
        )
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":  # datetime64
        arr = arr.view(np.int64)
    return arr.astype(np.uint64)


def key_part_column(t: pa.Table, key_cols, n_parts: int) -> pa.Array:
    """int32 bucket column for a mixed-dtype key tuple."""
    if t.num_rows == 0:
        return pa.array([], pa.int32())
    return _mix_key_arrays(
        [_key_u64(t[c].combine_chunks()) for c in key_cols], n_parts
    )



def agg_apply(t: pa.Table, key_cols, aggs, merge: bool) -> pa.Table:
    """One Arrow group_by level of ``bucketed_agg``: the PARTIAL form
    (merge=False; count emits row counts) or the MERGE form
    (merge=True; count partials re-combine via sum, min/min, max/max,
    sum/sum).  Module-level so the merge-correctness property —
    resolve(concat(partials over ANY row partition)) == direct
    groupby — is pinned by a pure hypothesis test without Ray."""
    specs, renames = [], {}
    for col, how, out in aggs:
        if how == "count" and not merge:
            specs.append(([], "count_all"))
            renames["count_all"] = out
        else:
            src = out if merge else col
            h = "sum" if (how == "count" and merge) else how
            specs.append((src, h))
            renames[f"{src}_{h}"] = out
    g = pa.TableGroupBy(t, list(key_cols)).aggregate(specs)
    cols = {c: g[c] for c in key_cols}
    for raw, out in renames.items():
        cols[out] = (
            pc.cast(g[raw], pa.int64()) if raw == "count_all" else g[raw]
        )
    return pa.table(cols)


def bucketed_agg(
    ds: "ray.data.Dataset",
    key_cols,
    aggs,
    n_parts: int = None,
) -> "ray.data.Dataset":
    """General key-per-row grouped aggregate: ``aggs`` is a list of
    (col, how, out_name) with how in {sum, min, max, count} — count
    passes col=None.  Per-batch Arrow group_by partials (count partials
    re-merge via sum), key-tuple hash bucketing, one vectorized Arrow
    group_by per partition.  Use INSTEAD of
    ``groupby(keys).aggregate(...)`` whenever key cardinality grows
    with the data (users, urls, hashes, pairs) — Ray 2.49's aggregate
    pays per-group cost there (PERF.md steps 20-22)."""
    n_parts = n_parts or n_shuffle_parts()
    key_cols = list(key_cols)

    def partial(t: pa.Table) -> pa.Table:
        out = agg_apply(t, key_cols, aggs, merge=False)
        return out.append_column(
            "part", key_part_column(out, key_cols, n_parts)
        )

    def resolve(t: pa.Table) -> pa.Table:
        return agg_apply(t.drop_columns(["part"]), key_cols, aggs, merge=True)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )
