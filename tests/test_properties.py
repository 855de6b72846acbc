"""Property-based tests (hypothesis): codec round-trips, scalar
parity with the reference semantics, chunk-assignment invariants —
no Ray needed."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from document_extractor_ray.config import DEFAULT_CONFIG
from document_extractor_ray.core import blocks, chunking, sniff
from document_extractor_ray.core.scoring import (
    alnum_count,
    likely_scan_only,
    median,
    sample_page_indices,
    score_reliability,
)

text_strategy = st.text(max_size=400)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_score_reliability_matches_reference_loop(text):
    naive = sum(ch.isalnum() for ch in text)
    assert alnum_count(text) == naive
    if not text:
        assert score_reliability(text) == 0.0
    else:
        expected = round(max(0.0, min(1.0, naive / len(text))), 4)
        assert score_reliability(text) == expected


@given(st.lists(st.floats(min_value=0, max_value=1), max_size=20))
@settings(deadline=None)
def test_median_bounds(vals):
    m = median(vals)
    if vals:
        assert min(vals) <= m <= max(vals)
    else:
        assert m == 0.0


@given(st.integers(min_value=0, max_value=2000), st.integers(min_value=1, max_value=10))
@settings(deadline=None)
def test_sampler_invariants(n, t):
    picks = sample_page_indices(n, t)
    assert picks == sorted(set(picks))
    assert all(1 <= p <= n for p in picks)
    assert len(picks) == min(n, t)


@given(st.lists(st.text(max_size=50), max_size=6))
@settings(deadline=None)
def test_likely_scan_only_total_order(samples):
    # strings path must equal evaluating the joined text directly
    joined = " ".join(samples)
    if samples and isinstance(samples[0], str):
        assert likely_scan_only(samples) == likely_scan_only(joined or "")


@given(st.lists(st.text(max_size=200), max_size=8))
@settings(deadline=None)
def test_multiframe_roundtrip(frames):
    assert sniff.decode_multiframe(sniff.encode_multiframe(frames)) == frames


name_st = st.text(alphabet=string.ascii_letters + string.digits + "._-", min_size=1, max_size=20)


@given(st.lists(st.tuples(name_st, st.binary(max_size=300)), max_size=5))
@settings(deadline=None)
def test_container_roundtrip(children):
    assert sniff.decode_container(sniff.encode_container(children)) == children


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_sniff_total_and_stable(payload):
    kind = sniff.sniff_kind(payload)
    assert kind in {
        "html", "txt", "multi_unit", "container", "noise", "unsupported", "docx", "doc",
    }
    assert sniff.sniff_kind(payload) == kind


@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=50),
    st.integers(min_value=100, max_value=3000),
)
@settings(deadline=None)
def test_chunk_assignment_invariants(sizes, max_bytes):
    ids = list(chunking.assign_chunks(sizes, max_bytes=max_bytes))
    # monotone, 1-based, no gaps
    assert ids[0] == 1
    for a, b in zip(ids, ids[1:]):
        assert b in (a, a + 1)
    # no chunk except via a single oversized doc exceeds the budget
    totals = {}
    counts = {}
    for cid, s in zip(ids, sizes):
        totals[cid] = totals.get(cid, 0) + s + chunking.DOCUMENT_BREAK_BYTES
        counts[cid] = counts.get(cid, 0) + 1
    for cid, tot in totals.items():
        if counts[cid] > 1:
            # remove the last doc's break (the check the reference does
            # counts the break only after appending)
            assert tot - chunking.DOCUMENT_BREAK_BYTES <= max_bytes + chunking.DOCUMENT_BREAK_BYTES * counts[cid]


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=99), st.text(max_size=80)),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_block_spans_always_index_correctly(pages):
    b = blocks.build_block(
        "https://fixtures.test/x/000001", pages, "html_text", 0.5, "OK", DEFAULT_CONFIG
    )
    texts = [t for _, t in pages]
    if not any(t and t.strip() for t in texts):
        assert b.extracted_text == ""
        return
    assert b.extracted_text.endswith("\n")
    for (page, start, end), (pnum, text) in zip(b.spans, pages):
        assert page == pnum
        expected = str(text) if text else ""
        assert b.extracted_text[start:end] == expected


# ---------------------------------------------------------------------------
# Round-2 numeric kernels
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_pairwise_hamming_matches_popcount(fps):
    import numpy as np

    from document_extractor_ray.functions.dedup import _pairwise_hamming64

    f = np.array(fps, dtype=np.uint64)
    d = _pairwise_hamming64(f)
    n = len(fps)
    for i in range(n):
        for j in range(n):
            assert d[i, j] == bin(fps[i] ^ fps[j]).count("1")


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=80, deadline=None)
def test_cluster_pairs_matches_bfs_reference(edges):
    from document_extractor_ray.functions.dedup import cluster_pairs

    roots = cluster_pairs(edges)

    # BFS reference over the same graph
    adj: dict = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        nodes |= {a, b}
    seen: dict = {}
    for start in sorted(nodes):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen[x] = True
            comp.append(x)
            stack.extend(adj.get(x, ()))
        rep = min(comp)
        for x in comp:
            assert roots.get(x, x) == rep, (x, comp)


@given(st.text(alphabet=string.printable + "äöü日本", max_size=300))
@settings(max_examples=80, deadline=None)
def test_simhash_vectorized_matches_reference(text):
    import zlib

    import numpy as np

    from document_extractor_ray.functions.dedup import _SIMHASH_MIX, simhash64

    words = (text or "").lower().split()
    if not words:
        assert simhash64(text) == 0
        return
    acc = [0] * 64
    for w in words:
        h = (zlib.crc32(w.encode("utf-8")) * int(_SIMHASH_MIX)) & ((1 << 64) - 1)
        for i in range(64):
            bit = (h >> (63 - i)) & 1
            acc[i] += 1 if bit else -1
    want = 0
    for i, v in enumerate(acc):
        if v > 0:
            want |= 1 << (63 - i)
    assert simhash64(text) == want


@given(
    st.integers(1, 12).flatmap(
        lambda dim: st.lists(
            st.lists(st.floats(-10, 10, width=32), min_size=dim, max_size=dim),
            min_size=1,
            max_size=20,
        )
    )
)
@settings(max_examples=60, deadline=None)
def test_embedding_matrix_roundtrip(rows):
    import numpy as np
    import pyarrow as pa

    from document_extractor_ray.functions.similarity import embedding_matrix

    col = pa.array(rows, pa.list_(pa.float32()))
    mat = embedding_matrix(col)
    assert mat.shape == (len(rows), len(rows[0]))
    np.testing.assert_array_equal(mat, np.asarray(rows, dtype=np.float32))


# ---------------------------------------------------------------------------
# bucketed_agg merge-correctness (the property Ray's shuffle relies on)
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),                       # k1
            st.sampled_from(["a", "b", "c"]),        # k2
            st.integers(-1000, 1000),                # v
        ),
        min_size=1,
        max_size=60,
    ),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_bucketed_agg_partials_merge_under_any_partition(rows, data):
    """resolve(concat(partial(batch) for ANY row partitioning)) must
    equal the direct one-shot groupby — the exact algebra bucketed_agg
    asks of Ray's shuffle (sum/min/max merge, count re-merges as sum)."""
    import pyarrow as pa

    from document_extractor_ray.functions.bucketing import agg_apply

    aggs = [
        ("v", "sum", "sv"),
        ("v", "min", "mn"),
        ("v", "max", "mx"),
        (None, "count", "n"),
    ]
    keys = ["k1", "k2"]
    t = pa.table(
        {
            "k1": pa.array([r[0] for r in rows], pa.int64()),
            "k2": pa.array([r[1] for r in rows], pa.string()),
            "v": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    # random contiguous partitioning into 1..5 batches
    n_batches = data.draw(st.integers(1, 5))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, t.num_rows), min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    bounds = [0] + cuts + [t.num_rows]
    partials = [
        agg_apply(t.slice(lo, hi - lo), keys, aggs, merge=False)
        for lo, hi in zip(bounds, bounds[1:])
        if hi > lo
    ]
    merged = agg_apply(pa.concat_tables(partials), keys, aggs, merge=True)
    direct = agg_apply(t, keys, aggs, merge=False)

    def canon(tbl):
        return sorted(map(tuple, (r.values() for r in tbl.to_pylist())))

    assert canon(merged) == canon(direct)


# ---------------------------------------------------------------------------
# _bytes_hash_u64: the vectorized string/binary key hash the shuffle
# bucketing relies on (round-2 VERDICT item 1 — no per-row Python)
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40)), min_size=1, max_size=80
    ),
    st.data(),
)
@settings(max_examples=80, deadline=None)
def test_bytes_hash_u64_is_value_determined(vals, data):
    """hash(x) must depend only on x's bytes: identical across batch
    composition, array slicing, chunking, and large/small offset types
    — otherwise equal keys land in different shuffle partitions.
    Nulls hash like ""."""
    import pyarrow as pa

    from document_extractor_ray.functions.bucketing import _bytes_hash_u64

    col = pa.array(vals, pa.string())
    h = _bytes_hash_u64(col)

    # singleton == batched (cross-batch determinism)
    i = data.draw(st.integers(0, len(vals) - 1))
    assert _bytes_hash_u64(pa.array([vals[i]], pa.string()))[0] == h[i]

    # slice-invariance (nonzero array offset)
    lo = data.draw(st.integers(0, len(vals) - 1))
    assert _bytes_hash_u64(col.slice(lo)).tolist() == h[lo:].tolist()

    # chunk-invariance
    ch = pa.chunked_array([col.slice(0, lo), col.slice(lo)])
    assert _bytes_hash_u64(ch).tolist() == h.tolist()

    # large_string agrees
    assert _bytes_hash_u64(pa.array(vals, pa.large_string())).tolist() == h.tolist()

    # equal values <-> equal hashes on this sample (collision odds ~2^-64)
    canon = [v or "" for v in vals]
    hmap = {}
    for v, hv in zip(canon, h.tolist()):
        assert hmap.setdefault(v, hv) == hv
    assert len(set(hmap.values())) == len(set(canon))


def test_bytes_hash_u64_binary_and_edge_cases():
    import numpy as np
    import pyarrow as pa

    from document_extractor_ray.functions.bucketing import _bytes_hash_u64

    b = pa.array([b"", b"\x00", b"\x00\x00", b"abc", None, b"abc"], pa.binary())
    h = _bytes_hash_u64(b)
    assert h[0] == h[4] != h[1] != h[2]  # null==empty; "\0" pads distinguished
    assert h[3] == h[5]
    assert _bytes_hash_u64(pa.array([], pa.string())).shape == (0,)
    # dtype is uint64 material for _mix_key_arrays
    assert h.dtype == np.uint64


# ---------------------------------------------------------------------------
# Property pins for the round-3 nonstandard kernels (brute-force refs)
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # n_tok
            st.integers(min_value=0, max_value=8),   # n_chars
        ),
        max_size=24,
    )
)
@settings(max_examples=200, deadline=None)
def test_frontier_mask_matches_n_squared(points):
    """_frontier_mask (sorted prefix-min kernel) == O(n²) strict-
    dominance definition on arbitrary small point sets."""
    import numpy as np

    from document_extractor_ray.functions.textstats import _frontier_mask

    tok = np.array([p[0] for p in points], np.int64)
    ch = np.array([p[1] for p in points], np.int64)
    got = _frontier_mask(tok, ch)
    for i in range(len(points)):
        dominated = any(
            (tok[j] >= tok[i] and ch[j] <= ch[i])
            and (tok[j] > tok[i] or ch[j] < ch[i])
            for j in range(len(points))
        )
        assert got[i] == (not dominated)


@given(
    st.lists(  # events: (user, ts)
        st.tuples(st.integers(0, 4), st.integers(0, 50)), max_size=30
    ),
    st.lists(  # orders: (user, lo_ts)
        st.tuples(st.integers(0, 4), st.integers(0, 50)), max_size=12
    ),
)
@settings(max_examples=150, deadline=None)
def test_boundary_marker_sweep_matches_brute(events, orders):
    """The order_window_event_counts sweep kernel (lexsort + marker
    cumsum) == brute-force inclusive interval counting, single
    partition."""
    import numpy as np
    import pyarrow as pa

    span = 7
    user = np.array(
        [u for u, _ in events] + [u for u, _ in orders] * 2, np.int64
    )
    ts = np.array(
        [t for _, t in events]
        + [t for _, t in orders]
        + [t + span for _, t in orders],
        np.int64,
    )
    kind = np.array(
        [0] * len(events) + [-1] * len(orders) + [1] * len(orders), np.int8
    )
    okey = np.array(
        [0] * len(events) + list(range(1, len(orders) + 1)) * 2, np.int64
    )
    t = pa.table(
        {
            "part": pa.array(np.zeros(len(user), np.int32), pa.int32()),
            "user": pa.array(user),
            "t": pa.array(ts),
            "kind": pa.array(kind),
            "okey": pa.array(okey, pa.int64()),
        }
    )
    if len(user) == 0:
        return
    # re-derive the inner sweep exactly as order_window_event_counts does
    order = np.lexsort((kind, ts, user))
    u2, t2, k2 = user[order], ts[order], kind[order]
    o2 = okey[order]
    cum = np.cumsum(k2 == 0)
    change = np.concatenate(([True], u2[1:] != u2[:-1]))
    starts = np.flatnonzero(change)
    base_at_start = np.where(starts > 0, cum[starts - 1], 0)
    base = np.repeat(base_at_start, np.diff(np.append(starts, len(u2))))
    c = cum - base
    lo, hi = k2 == -1, k2 == 1
    got: dict = {}
    for key, v in zip(
        np.concatenate((o2[lo], o2[hi])),
        np.concatenate((-c[lo], c[hi])),
    ):
        got[int(key)] = got.get(int(key), 0) + int(v)
    for i, (u, lo_ts) in enumerate(orders, start=1):
        want = sum(
            1 for eu, et in events if eu == u and lo_ts <= et <= lo_ts + span
        )
        assert got.get(i, 0) == want


# ---------------------------------------------------------------------------
# Streak run-length kernel vs brute force
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=60, deadline=None)
def test_streak_kernel_matches_brute(pairs):
    """The vectorized reduceat streak kernel must agree with a per-user
    Python brute force on arbitrary (user, day) multisets."""
    import numpy as np
    import pyarrow as pa

    u = np.array([p[0] for p in pairs], dtype=np.int64)
    d = np.array([p[1] for p in pairs], dtype=np.int64)
    uniq = np.unique(np.stack([u, d], axis=1), axis=0)
    uu, dd = uniq[:, 0], uniq[:, 1]

    # kernel (mirrors analytics.user_streaks.streaks_part)
    new = np.ones(len(uu), dtype=bool)
    new[1:] = (uu[1:] != uu[:-1]) | (dd[1:] != dd[:-1] + 1)
    starts = np.flatnonzero(new)
    run_len = np.diff(np.append(starts, len(uu)))
    run_user = uu[starts]
    ub = np.ones(len(run_user), dtype=bool)
    ub[1:] = run_user[1:] != run_user[:-1]
    ustarts = np.flatnonzero(ub)
    got = {
        int(run_user[i]): (
            int(np.add.reduceat(run_len, ustarts)[j]),
            int(np.maximum.reduceat(run_len, ustarts)[j]),
        )
        for j, i in enumerate(ustarts)
    }

    # brute force
    for user in set(u.tolist()):
        days = sorted({int(x) for x in d[u == user]})
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        assert got[user] == (len(days), best)


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=300))
@settings(max_examples=60, deadline=None)
def test_kmv_bottomk_matches_sorted_distinct(vals):
    """KMV's lexsort bottom-k must equal the k smallest DISTINCT
    hashes, ranks 1..k, for any value multiset."""
    import numpy as np

    from document_extractor_ray.functions.analytics import _hll_hash

    h = _hll_hash(np.asarray(vals, dtype=np.uint64))
    k = 8
    expect = sorted(set(h.tolist()))[:k]

    # kernel shape from analytics.kmv_registers.bottomk (single type)
    pairs = np.unique(
        np.stack([np.zeros(len(h), np.int64), h.view(np.int64)], axis=1), axis=0
    )
    hcol = pairs[:, 1].view(np.uint64)
    order = np.argsort(hcol, kind="mergesort")
    got = hcol[order][:k]
    assert got.tolist() == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 500)),
        min_size=1,
        max_size=100,
    )
)
@settings(max_examples=50, deadline=None)
def test_drawdown_segmented_cummax_matches_brute(pairs):
    """The per-segment-offset accumulate trick must equal a per-user
    Python running-max drawdown for any (user, value) sequence."""
    import numpy as np

    u = np.array([p[0] for p in pairs], dtype=np.int64)
    x = np.array([p[1] for p in pairs], dtype=np.int64)
    order = np.argsort(u, kind="mergesort")  # stable: keeps sequence order
    u, x = u[order], x[order]

    new = np.ones(len(u), dtype=bool)
    new[1:] = u[1:] != u[:-1]
    starts = np.flatnonzero(new)
    seg_id = np.cumsum(new) - 1
    BIG = np.int64(int(x.max()) + 1)
    shifted = x + seg_id * BIG
    np.maximum.accumulate(shifted, out=shifted)
    runmax = shifted - seg_id * BIG
    got = dict(zip(u[starts].tolist(),
                   np.maximum.reduceat(runmax - x, starts).tolist()))

    for user in set(u.tolist()):
        xs = x[u == user]
        rm, dd = -1, 0
        for v in xs:
            rm = max(rm, v)
            dd = max(dd, rm - v)
        assert got[user] == dd


@given(st.lists(st.integers(0, 100), min_size=1, max_size=60))
@settings(max_examples=50, deadline=None)
def test_gini_rank_weighted_matches_pairwise(vals):
    """Rank-weighted Gini numerator Σ(2i−n−1)x_(i) must equal the
    pairwise ΣΣ|xi−xj| / 2 definition."""
    import numpy as np

    x = np.sort(np.array(vals, dtype=np.int64))
    n = len(x)
    i = np.arange(1, n + 1)
    num_rank = int(((2 * i - n - 1) * x).sum())
    num_pair = int(np.abs(x[:, None] - x[None, :]).sum()) // 2
    assert num_rank == num_pair


@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=80),
    st.integers(0, 5),
)
@settings(max_examples=50, deadline=None)
def test_blocking_convolution_matches_pair_enumeration(lengths, delta):
    """The histogram-convolution pair count must equal brute-force
    enumeration of |len_a − len_b| <= delta pairs."""
    import numpy as np

    arr = np.array(lengths, dtype=np.int64)
    brute = sum(
        1
        for a in range(len(arr))
        for b in range(a + 1, len(arr))
        if abs(int(arr[a]) - int(arr[b])) <= delta
    )
    k, c = np.unique(arr, return_counts=True)
    within = int((c * (c - 1) // 2).sum())
    pref = np.concatenate(([0], c.cumsum()))
    hi = np.searchsorted(k, k + delta, side="right")
    lo = np.arange(1, len(k) + 1)
    cross = int((c * (pref[hi] - pref[lo - 1] - c)).sum())
    assert within + cross == brute
