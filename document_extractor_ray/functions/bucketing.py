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

from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_MIX = np.uint64(0x9E3779B97F4A7C15)
_POLY = np.uint64(0x100000001B3)  # FNV-1a prime (odd => invertible mod 2^64)


def _inv_u64(a: np.uint64) -> np.uint64:
    """Modular inverse of an odd uint64 modulo 2**64 (Newton)."""
    with np.errstate(over="ignore"):
        x = a
        for _ in range(6):
            x = x * (np.uint64(2) - a * x)
    return x


_POLY_INV = _inv_u64(_POLY)

# P^j / P^-j tables, grown on demand and cached per worker process —
# the cumulative products are the expensive part of the segmented
# hash, and they depend only on the constant _POLY, never the data.
_PW: np.ndarray = np.ones(1, np.uint64)
_IPW: np.ndarray = np.ones(1, np.uint64)


def _powers(t: int):
    global _PW, _IPW
    if len(_PW) <= t:
        size = max(t + 1, 2 * len(_PW), 1 << 16)
        with np.errstate(over="ignore"):
            pw = np.empty(size, np.uint64)
            pw[0] = np.uint64(1)
            np.cumprod(np.full(size - 1, _POLY, np.uint64), out=pw[1:])
            ipw = np.empty(size, np.uint64)
            ipw[0] = np.uint64(1)
            np.cumprod(np.full(size - 1, _POLY_INV, np.uint64), out=ipw[1:])
        _PW, _IPW = pw, ipw
    return _PW, _IPW


def _bytes_hash_u64(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Vectorized uint64 hash of a string/binary Arrow column straight
    from its offsets/data buffers — ZERO per-row Python (the round-2
    scale-killer was a ``zlib.crc32`` generator over ``to_pylist()``
    here, one interpreter iteration per key on the shuffle backbone).

    Scheme: segmented polynomial rolling hash.  With byte stream ``d``
    and prefix sums ``pref[j] = sum_{i<j} d[i]*P^i (mod 2^64)``, a
    value spanning ``[s, e)`` hashes to ``(pref[e]-pref[s]) * P^-s``
    (P odd => invertible mod 2^64), all computed with three cumulative
    numpy passes over the data buffer plus gathers at the offsets.
    Length is mixed in so "" and "\\0" differ.  Used only for bucket
    assignment — never an output value — so the exact function is
    free to differ from the SQL-oracle-pinned CRC32s in sqlhash.py."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64)
    col = pc.cast(col, pa.large_binary())
    if col.null_count:
        col = pc.fill_null(col, b"")
    buffers = col.buffers()
    offs = np.frombuffer(buffers[1], np.int64)[col.offset : col.offset + n + 1]
    data = np.frombuffer(buffers[2], np.uint8)
    start, end = offs[:-1], offs[1:]
    t = int(offs[-1])
    pw, ipw = _powers(t)
    with np.errstate(over="ignore"):
        pref = np.zeros(t + 1, np.uint64)
        if t:
            np.cumsum(np.multiply(data[:t], pw[:t], dtype=np.uint64), out=pref[1:])
        seg = (pref[end] - pref[start]) * ipw[start]
        return (seg + (end - start).astype(np.uint64)) * _MIX


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


def _as_bytes_array(xs) -> pa.Array:
    if isinstance(xs, (pa.Array, pa.ChunkedArray)):
        return xs
    return pa.array(list(xs))


def part_of_binary(bs, n_parts: int) -> pa.Array:
    """Bucket ids for binary keys (digests etc.), fully vectorized
    from the Arrow buffers.  Accepts an Arrow array (preferred) or any
    bytes iterable."""
    h = _bytes_hash_u64(_as_bytes_array(bs))
    return pa.array(((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32))


def part_of_strings(ss, n_parts: int) -> pa.Array:
    """Bucket ids for string keys, fully vectorized from the Arrow
    buffers (round-2 VERDICT item 1: no more per-row crc32).  Accepts
    an Arrow array (preferred) or any str iterable."""
    h = _bytes_hash_u64(_as_bytes_array(ss))
    return pa.array(((h >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32))


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
    reinterpret (bijective), strings/binary via the buffer-level
    segmented polynomial hash (no per-row Python)."""
    if (
        pa.types.is_string(col.type)
        or pa.types.is_large_string(col.type)
        or pa.types.is_binary(col.type)
        or pa.types.is_large_binary(col.type)
    ):
        return _bytes_hash_u64(col)
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


def fold_partials(
    ds: "ray.data.Dataset",
    key_cols,
    val_cols,
    *,
    max_keys: int = 200_000,
) -> dict:
    """Driver-side fold of per-block PARTIAL aggregates: sums
    ``val_cols`` grouped by ``key_cols`` across the non-empty Arrow
    blocks of ``ds`` (hash-agg empty-schema blocks skipped — the
    CLAUDE.md trap).  Returns {key: val} with scalar key/val when a
    single column name is passed, tuples otherwise.

    ONLY legal when key cardinality is bounded by a small domain
    (nation / status / day / type ...): the guard raises if the
    folded rows exceed ``max_keys`` so a future unbounded key can't
    silently move a dataset onto the driver (VERDICT r3 item 6).
    Once partials are bounded, this fold costs ~1.5 s fixed vs a
    further Ray exchange (PERF.md step 32)."""
    single_key = isinstance(key_cols, str)
    single_val = isinstance(val_cols, str)
    kc = [key_cols] if single_key else list(key_cols)
    vc = [val_cols] if single_val else list(val_cols)

    tables = [t for t in map(ray.get, ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return {}
    t = pa.concat_tables([tb.select(kc + vc) for tb in tables])
    if t.num_rows > max_keys * max(len(tables), 1):
        raise ValueError(
            f"fold_partials: {t.num_rows} partial rows from "
            f"{len(tables)} blocks exceeds max_keys={max_keys} per "
            "block — the key is not driver-bounded; use bucketed_agg"
        )
    g = pa.TableGroupBy(t, kc).aggregate([(c, "sum") for c in vc])
    if g.num_rows > max_keys:
        raise ValueError(
            f"fold_partials: {g.num_rows} distinct keys exceeds "
            f"max_keys={max_keys}; use bucketed_agg"
        )
    key_lists = [g[c].to_pylist() for c in kc]
    val_lists = [g[f"{c}_sum"].to_pylist() for c in vc]
    out: dict = {}
    for row in zip(*key_lists, *val_lists):
        k = row[0] if single_key else row[: len(kc)]
        v = row[len(kc)] if single_val else row[len(kc) :]
        out[k] = v
    return out


def bitmask_pair_counts(
    exploded: "ray.data.Dataset",
    key_cols,
    code_col: str,
    n_codes: int,
):
    """Pairwise intersection counts over a BOUNDED member catalog
    (sources, languages, shards — anything <= 63): distinct
    (key, code) rows collapse per key to ONE int64 OR-mask (disjoint
    bits sum exactly), only the mask HISTOGRAM leaves the shuffle
    (bounded by observed combinations, never key count), and the
    driver expands pair + per-code counts with a vectorized popcount
    pass.  Returns (pair_counts, code_counts) numpy dicts:
    {(i, j): n_shared} for i < j and {i: n_distinct}.  This is the
    anti-self-join: nothing pair-shaped ever shuffles."""
    import pyarrow.compute as pc  # noqa: F401

    if n_codes > 63:
        raise ValueError(f"bitmask fold packs codes into int64; got {n_codes}")
    key_cols = list(key_cols)

    def to_bit(t: pa.Table) -> pa.Table:
        codes = t[code_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t[c] for c in key_cols}
        cols["bit"] = pa.array(np.int64(1) << codes, pa.int64())
        return pa.table(cols)

    distinct = bucketed_agg(
        exploded.map_batches(to_bit, batch_format="pyarrow"),
        key_cols + ["bit"],
        [(None, "count", "n")],
    )

    masks = bucketed_agg(
        distinct.map_batches(
            lambda t: pa.table({**{c: t[c] for c in key_cols}, "mask": t["bit"]}),
            batch_format="pyarrow",
        ),
        key_cols,
        [("mask", "sum", "mask")],
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"mask": t["mask"]}), ["mask"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"mask": g["mask"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    hist = bucketed_agg(
        masks.map_batches(hist_partial, batch_format="pyarrow"),
        ["mask"],
        [("n", "sum", "n")],
    ).take_all()

    m = np.array([r["mask"] for r in hist], dtype=np.int64)
    c = np.array([r["n"] for r in hist], dtype=np.int64)
    pair_counts, code_counts = {}, {}
    for i in range(n_codes):
        has_i = ((m >> np.int64(i)) & np.int64(1)).astype(bool)
        code_counts[i] = int(c[has_i].sum())
        for j in range(i + 1, n_codes):
            both = has_i & (((m >> np.int64(j)) & np.int64(1)).astype(bool))
            pair_counts[(i, j)] = int(c[both].sum())
    return pair_counts, code_counts
