"""Similarity search over the ``embeddings`` table
(``embedding: list<float>``, 64-dim).

- ``knn_brute``: exact cosine top-k — the query matrix is broadcast
  once with ray.put; every batch does one numpy matmul against it and
  emits only its local top-k (k rows per query per batch), so the
  driver-side merge is tiny.  This is the scale-correct baseline: no
  shuffle, O(batch x queries) compute, mergeable partial results.
- ``knn_lsh``: random-hyperplane LSH bucketing — candidates are
  restricted to vectors sharing a hash bucket with the query
  (multi-probe over exact bucket + 1-bit flips), the scale path when
  the corpus is too big for a full scan per query.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _read_embeddings(sf_dir: str, with_label: bool = False):
    from document_extractor_ray.functions.analytics import _n_blocks

    from document_extractor_ray.sources import read_parquet_clean

    cols = ["vec_id", "embedding"] + (["label"] if with_label else [])
    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=cols,
        override_num_blocks=_n_blocks(),
    )


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def embedding_matrix(col) -> np.ndarray:
    """(n, dim) float32 matrix from a ``list<float>`` Arrow column —
    zero-copy: reshape a view of the flat values buffer instead of
    round-tripping through ``to_pylist`` (which builds n*dim Python
    floats).  Falls back to the copy path only for ragged lists."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if (widths != widths[0]).any():  # ragged: no rectangular view exists
        return np.asarray(col.to_pylist(), dtype=np.float32)
    dim = int(widths[0])
    vals = col.values.to_numpy(zero_copy_only=True)
    return vals[offs[0] : offs[-1]].reshape(n, dim).astype(np.float32, copy=False)


def default_queries(sf_dir: str, n_queries: int = 8) -> pa.Table:
    """Deterministic query set: the first n embeddings by vec_id."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id").slice(0, n_queries)
    return t


def _pooled(cls, ref, **params):
    """Task-pool stage with actor-grade state amortization: the stage
    object is constructed ONCE PER WORKER PROCESS from the broadcast
    value (state.cached_make), so plain tasks replace the actor pool
    and its measured multi-second spin-up/teardown (PERF.md steps
    19/25).  cloudpickle ships only (cls, ref, params) per task."""
    from document_extractor_ray import state

    key = cls.__name__ + repr(sorted(params.items()))

    def run(t: pa.Table) -> pa.Table:
        inst = state.cached_make(ref, lambda v: cls(v, **params), extra_key=key)
        return inst(t)

    return run


class BatchTopK:
    """Actor stage: holds the broadcast query matrix; per batch, one
    matmul and a partial top-k per query.

    ``dtype``: float32 is the scale default; knn_brute uses float64 so
    its scores are reproducible by the DuckDB oracle (both sides then
    agree to ~1e-16, and the measured rank gaps / micro-rounding
    margins on the sf corpora are >= 1e-5 — ten orders wider)."""

    def __init__(self, q: dict, k: int, dtype: str = "float32"):
        self.dtype = np.dtype(dtype)
        self.query_ids = q["ids"]
        self.qm = _normalize_rows(q["matrix"].astype(self.dtype, copy=False))
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        mat = embedding_matrix(t["embedding"])
        if mat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        mat = _normalize_rows(mat.astype(self.dtype, copy=False))
        sims = self.qm @ mat.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            for j in idx[qi]:
                out_q.append(int(qid))
                out_v.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def knn_brute(
    ds: "ray.data.Dataset",
    query_table: pa.Table,
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k per query.  Returns (query_id, rank, vec_id,
    score_micro) sorted, with deterministic tie-break on vec_id;
    scores are computed in float64 and emitted as half-up micro ints
    so the DuckDB oracle (KNN_BRUTE_SQL) reproduces them exactly."""
    qids = query_table["vec_id"].to_pylist()
    qm = embedding_matrix(query_table["embedding"])
    ref = ray.put({"ids": qids, "matrix": qm})

    partials = ds.map_batches(
        _pooled(BatchTopK, ref, k=k, dtype="float64"),
        batch_format="pyarrow",
        batch_size=4096,
    )
    # Merge partial top-ks on the driver: tiny (n_queries * k * n_blocks
    # rows); ties break to the lower vec_id.
    return _merge_topk(partials, k)


def knn_brute_embeddings(sf_dir: str, k: int = 10) -> pa.Table:
    return knn_brute(_read_embeddings(sf_dir), default_queries(sf_dir), k=k)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path)
# ---------------------------------------------------------------------------

N_PLANES = 12  # 4096 buckets


def _planes(dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(N_PLANES, dim)).astype(np.float32)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0  # (n, planes)
    weights = (1 << np.arange(N_PLANES)).astype(np.int64)
    return bits.astype(np.int64) @ weights


def knn_lsh(
    ds: "ray.data.Dataset",
    query_table: pa.Table,
    k: int = 10,
    n_probes: int = 1 + N_PLANES,
) -> pa.Table:
    """ANN via random-hyperplane LSH: score only vectors whose bucket
    is the query's bucket or one bit-flip away (multi-probe).  Same
    output schema as knn_brute; recall < 1.0 by design."""
    qids = query_table["vec_id"].to_pylist()
    qm = embedding_matrix(query_table["embedding"])
    dim = qm.shape[1]
    planes = _planes(dim)
    q_buckets = _bucket_of(_normalize_rows(qm), planes)
    probe_sets = []
    for qb in q_buckets:
        probes = {int(qb)}
        for bit in range(N_PLANES):
            probes.add(int(qb) ^ (1 << bit))
        probe_sets.append(probes)
    wanted = set().union(*probe_sets) if probe_sets else set()
    ref = ray.put(
        {
            "ids": qids,
            "matrix": qm,
            "planes": planes,
            "probe_sets": probe_sets,
            "wanted": wanted,
        }
    )

    class LshTopK:
        def __init__(self, state: dict):
            self.query_ids = state["ids"]
            # float64 like knn_brute, so KNN_LSH_SQL reproduces the
            # scores exactly (bucket signs are dtype-robust: measured
            # min |plane dot| >= 5.4e-5 on the sf corpora, 0 f32/f64
            # sign flips).
            self.qm = _normalize_rows(state["matrix"].astype(np.float64))
            self.planes = state["planes"]
            self.probe_sets = state["probe_sets"]
            self.wanted = state["wanted"]

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            mat = embedding_matrix(t["embedding"])
            empty = pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
            if mat.size == 0:
                return empty
            mat = _normalize_rows(mat.astype(np.float64))
            buckets = _bucket_of(mat, self.planes)
            keep = np.isin(buckets, np.fromiter(self.wanted, dtype=np.int64))
            if not keep.any():
                return empty
            mat, ids, buckets = mat[keep], ids[keep], buckets[keep]
            sims = self.qm @ mat.T
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                cand = np.isin(
                    buckets, np.fromiter(self.probe_sets[qi], dtype=np.int64)
                )
                if not cand.any():
                    continue
                cs = sims[qi][cand]
                cids = ids[cand]
                k_ = min(k, cs.size)
                idx = np.argpartition(-cs, k_ - 1)[:k_]
                for j in idx:
                    out_q.append(int(qid))
                    out_v.append(int(cids[j]))
                    out_s.append(float(cs[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(
        _pooled(LshTopK, ref), batch_format="pyarrow", batch_size=4096
    )
    return _merge_topk(partials, k)


def knn_lsh_embeddings(sf_dir: str, k: int = 10) -> pa.Table:
    return knn_lsh(_read_embeddings(sf_dir), default_queries(sf_dir), k=k)


# ---------------------------------------------------------------------------
# IVF ANN (inverted-file index: the coarse-quantizer scale path)
# ---------------------------------------------------------------------------

N_CENTROIDS = 64
IVF_TRAIN_SAMPLE = 4096
LLOYD_ITERS = 5


def train_centroids(
    sample: np.ndarray, n_centroids: int = N_CENTROIDS, iters: int = LLOYD_ITERS
) -> np.ndarray:
    """Deterministic k-means-lite on a normalized sample: evenly spaced
    seed points, a few Lloyd iterations (cosine/k-means duality on the
    unit sphere: assignment by max dot product, centroids re-normalized).
    Empty clusters keep their previous centroid — fully deterministic."""
    sample = _normalize_rows(sample.astype(np.float32))
    n = len(sample)
    k = min(n_centroids, n)
    idx = np.linspace(0, n - 1, k).astype(np.int64)
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cents[c] = v / norm
    return cents


def _ivf_centroids(ds: "ray.data.Dataset", n_centroids: int) -> np.ndarray:
    """Deterministic coarse-quantizer training sample WITHOUT a global
    sort: the IVF_TRAIN_SAMPLE vectors with the smallest multiply-mixed
    hash of vec_id (hash-as-PRF = uniform sample, order-free, stable).
    Each block emits only its local smallest-hash rows (argpartition),
    the driver merges the bounded partials — rank-k selection, no
    shuffle (PERF step 33: the previous head-by-vec_id sample paid a
    full Dataset sort to feed a 4096-row sample)."""
    import pyarrow.compute as pc

    def samp(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": t["embedding"],
                }
            )
        ids = t["vec_id"].to_numpy()
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        keep = (
            np.argpartition(h, IVF_TRAIN_SAMPLE - 1)[:IVF_TRAIN_SAMPLE]
            if n > IVF_TRAIN_SAMPLE
            else np.arange(n)
        )
        return pa.table(
            {
                "h": pa.array(h[keep]),
                "vec_id": t["vec_id"].take(pa.array(keep)),
                "embedding": t["embedding"].take(pa.array(keep)),
            }
        )

    parts = pa.concat_tables(
        tb
        for tb in map(
            ray.get,
            ds.map_batches(samp, batch_format="pyarrow").to_arrow_refs(),
        )
        if tb.num_rows
    ).combine_chunks()
    order = pc.sort_indices(
        parts, sort_keys=[("h", "ascending"), ("vec_id", "ascending")]
    )[:IVF_TRAIN_SAMPLE]
    return train_centroids(
        embedding_matrix(parts["embedding"].take(order)), n_centroids=n_centroids
    )


def knn_ivf(
    ds: "ray.data.Dataset",
    query_table: pa.Table,
    k: int = 10,
    n_probes: int = 8,
    n_centroids: int = N_CENTROIDS,
) -> pa.Table:
    """ANN via an inverted-file index: a coarse quantizer (k-means-lite
    centroids trained on a deterministic sample) assigns every vector
    to its nearest centroid inside map_batches; each query scores only
    vectors whose centroid is among its ``n_probes`` closest.  Same
    output schema as knn_brute; recall < 1.0 by design, tunable via
    n_probes (n_probes == n_centroids degrades to brute force).

    Scale shape: centroids are broadcast once (tiny); the per-batch
    work is two matmuls (assign + score) and a boolean mask — no
    shuffle at all.  At 10^12 vectors the training sample comes from a
    Dataset sample pass instead of the head read, and the inverted
    lists would be persisted as centroid-partitioned parquet so probes
    prune at the read (documented partitioning assumption)."""
    qids = query_table["vec_id"].to_pylist()
    qm = embedding_matrix(query_table["embedding"])
    cents = _ivf_centroids(ds, n_centroids)

    q_norm = _normalize_rows(qm)
    probe = np.argsort(-(q_norm @ cents.T), axis=1)[:, :n_probes]  # (nq, probes)
    ref = ray.put({"ids": qids, "qm": q_norm.astype(np.float32), "cents": cents, "probe": probe})

    class IvfTopK:
        def __init__(self, st: dict):
            self.query_ids = st["ids"]
            self.qm = st["qm"]
            self.cents = st["cents"]
            self.probe_sets = [set(p.tolist()) for p in st["probe"]]
            self.wanted = np.fromiter(
                set().union(*self.probe_sets) if self.probe_sets else set(),
                dtype=np.int64,
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            mat = embedding_matrix(t["embedding"])
            empty = pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
            if mat.size == 0:
                return empty
            mat = _normalize_rows(mat)
            assign = np.argmax(mat @ self.cents.T, axis=1)
            keep = np.isin(assign, self.wanted)
            if not keep.any():
                return empty
            mat, ids, assign = mat[keep], ids[keep], assign[keep]
            sims = self.qm @ mat.T
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                cand = np.isin(assign, np.fromiter(self.probe_sets[qi], dtype=np.int64))
                if not cand.any():
                    continue
                cs = sims[qi][cand]
                cids = ids[cand]
                k_ = min(k, cs.size)
                idx = np.argpartition(-cs, k_ - 1)[:k_]
                for j in idx:
                    out_q.append(int(qid))
                    out_v.append(int(cids[j]))
                    out_s.append(float(cs[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(
        _pooled(IvfTopK, ref), batch_format="pyarrow", batch_size=4096
    )
    return _merge_topk(partials, k)


def _merge_topk(partials: "ray.data.Dataset", k: int) -> pa.Table:
    """Driver-side merge of per-batch partial top-ks (tiny:
    n_queries * k * n_blocks rows), deterministic tie-break on vec_id."""
    best: dict = {}
    for r in partials.take_all():
        best.setdefault(r["query_id"], []).append((-r["score"], r["vec_id"]))
    out_q, out_rank, out_v, out_s = [], [], [], []
    for qid in sorted(best):
        top = heapq.nsmallest(k, best[qid])
        for rank, (neg, vid) in enumerate(top, 1):
            out_q.append(qid)
            out_rank.append(rank)
            out_v.append(vid)
            # half-up micro-int score: floor(s*1e6 + 0.5) is what the
            # SQL oracle computes too (DuckDB round() is half-away,
            # np.round is half-even — floor(+0.5) sidesteps both).
            out_s.append(int(np.floor(-neg * 1e6 + 0.5)))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score_micro": pa.array(out_s, pa.int64()),
        }
    )


def knn_ivf_embeddings(sf_dir: str, k: int = 10) -> pa.Table:
    return knn_ivf(_read_embeddings(sf_dir), default_queries(sf_dir), k=k)


# ---------------------------------------------------------------------------
# SQL oracles (exact variants only — LSH/IVF are seeded-RNG approximations)
# ---------------------------------------------------------------------------

# knn_brute: same 8 lowest-vec_id queries, cosine in DOUBLE, rank ties
# broken on vec_id, score as the half-up micro int both engines agree
# on (measured sf margins: rank gaps >= 7.8e-6, micro margins >= 3.5e-3
# vs ~4e-16 cross-engine float noise).
KNN_BRUTE_SQL = """
WITH qy AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8
),
s AS (
  SELECT qy.query_id, e.vec_id,
         list_cosine_similarity(qy.qe, e.embedding::DOUBLE[]) AS score
  FROM qy CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, rank, vec_id,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""


def pair_topk_batch(t: pa.Table, corpus_ref=None, n_pairs: int = 50) -> pa.Table:
    """Task-pool stage for exact top-pairs: the broadcast normalized
    corpus matrix arrives via the worker-cached ray.get
    (state.cached_get — one fetch per worker PROCESS, zero-copy for
    the numpy payload), so plain tasks get the same state amortization
    an actor pool would WITHOUT paying pool spin-up.  Measured: the
    actor-pool variant cost 3.4-12 s at sf0.1 (2000 vectors, ~256
    MFLOP — pure startup); the task-pool variant is sub-second warm.
    Per batch: one (batch x corpus) matmul masked to vec_a < vec_b,
    partial top-n pairs emitted."""
    from document_extractor_ray import state

    c = state.cached_get(corpus_ref)
    ids, mat, n = c["ids"], c["matrix"], n_pairs
    bids = t["vec_id"].to_numpy()
    bm = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
    empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if bm.size == 0:
        return empty
    sims = bm @ mat.T  # (batch, corpus)
    mask = bids[:, None] < ids[None, :]
    flat = np.where(mask, sims, -np.inf).ravel()
    n = min(n, int(mask.sum()))
    if n == 0:
        return empty
    idx = np.argpartition(-flat, n - 1)[:n]
    bi, cj = np.unravel_index(idx, sims.shape)
    return pa.table(
        {
            "vec_a": pa.array(bids[bi], pa.int64()),
            "vec_b": pa.array(ids[cj], pa.int64()),
            "score": pa.array(flat[idx], pa.float64()),
        }
    )


def embedding_topk_pairs(sf_dir: str, n_pairs: int = 50) -> pa.Table:
    """Exact top-``n_pairs`` most-similar embedding pairs by cosine
    (vec_a < vec_b), ranked desc with (vec_a, vec_b) tie-break.

    This is the exact audit/verification primitive for the
    LSH-bucketed ``embedding_dup_pairs`` scale path: it broadcasts the
    normalized corpus matrix once (ray.put) and streams batches
    against it — O(corpus x batch) compute, partial top-n per batch,
    tiny driver merge.  Use it up to the memory budget of one
    broadcast matrix (~10^7 x 64 f64 = 5 GB); beyond that the bucketed
    operators are the only option."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
    ref = ray.put({"ids": ids, "matrix": mat})

    partials = _read_embeddings(sf_dir).map_batches(
        pair_topk_batch,
        fn_kwargs={"corpus_ref": ref, "n_pairs": n_pairs},
        batch_format="pyarrow",
        batch_size=4096,
    )
    rows = [
        (-r["score"], r["vec_a"], r["vec_b"]) for r in partials.take_all()
    ]
    top = heapq.nsmallest(n_pairs, rows)
    return pa.table(
        {
            "rank": pa.array(range(1, len(top) + 1), pa.int64()),
            "vec_a": pa.array([a for _, a, _ in top], pa.int64()),
            "vec_b": pa.array([b for _, _, b in top], pa.int64()),
            "sim_micro": pa.array(
                [int(np.floor(-neg * 1e6 + 0.5)) for neg, _, _ in top], pa.int64()
            ),
        }
    )


EMBEDDING_TOPK_PAIRS_SQL = """
WITH s AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
r AS (
  SELECT va AS vec_a, vb AS vec_b, score,
         row_number() OVER (ORDER BY score DESC, va, vb) AS rank
  FROM s
)
SELECT rank, vec_a, vec_b,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS sim_micro
FROM r WHERE rank <= 50
ORDER BY rank
"""


def knn_lsh_sql(dim: int = 64, k: int = 10, n_queries: int = 8) -> str:
    """Oracle for ``knn_lsh_embeddings``: the seeded hyperplanes are
    inlined as DOUBLE[] literals (float32 plane values are exactly
    representable as doubles), bucket bits are raw-dot signs (sign is
    normalization-invariant), probes are the bucket plus every 1-bit
    flip, and candidate scores use the same float64 cosine + half-up
    micro int as KNN_BRUTE_SQL."""
    p = _planes(dim).astype(np.float64)
    plane_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in p[i])
        )
        for i in range(N_PLANES)
    )
    flip_rows = ", ".join(["(0)"] + [f"({1 << b})" for b in range(N_PLANES)])
    return f"""
WITH planes(pid, pvec) AS (VALUES
    {plane_rows}
),
qy AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings ORDER BY vec_id LIMIT {n_queries}
),
eb AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], p.pvec) > 0
                       THEN (1::BIGINT << p.pid) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
qb AS (
  SELECT q.query_id,
         CAST(sum(CASE WHEN list_inner_product(q.qe, p.pvec) > 0
                       THEN (1::BIGINT << p.pid) ELSE 0 END) AS BIGINT) AS bucket
  FROM qy q CROSS JOIN planes p GROUP BY q.query_id
),
flips(f) AS (VALUES {flip_rows}),
probes AS (
  SELECT DISTINCT qb.query_id, xor(qb.bucket, f.f) AS pb
  FROM qb CROSS JOIN flips f
),
cand AS (
  SELECT DISTINCT p.query_id, eb.vec_id FROM probes p JOIN eb ON eb.bucket = p.pb
),
s AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(qy.qe, e.embedding::DOUBLE[]) AS score
  FROM cand c
  JOIN qy ON qy.query_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.vec_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, rank, vec_id,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# Vector aggregate: per-label centroid sums
# ---------------------------------------------------------------------------

def label_centroids(sf_dir: str):
    """Per-label embedding centroid as exact integer sums — the
    vector-aggregate building block (class centroids for IVF training,
    cluster summaries, embedding drift checks).  Emits one row per
    (label, dim) with sum_micro (components rounded half-up to 1e-6
    before summing, so addition is exact and order-free) and n_vecs;
    centroid = sum_micro / n_vecs is the consumer's one division.

    Scale shape: each batch reduces its vectors to |labels| x dim
    partial rows (zero-copy matrix view + one segment-sum), so the
    shuffle carries partials bounded by label cardinality, never the
    vector count."""
    from ray.data.aggregate import Sum

    from document_extractor_ray.functions.analytics import _n_blocks

    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding", "label"],
        override_num_blocks=_n_blocks(),
    )

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        dim = m.shape[1] if m.size else 0
        if dim > 256:
            raise ValueError(
                "label_centroids oracle (LABEL_CENTROIDS_SQL) unrolls "
                f"at most 256 dims; got {dim} — raise both caps together"
            )
        micro = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        np.add.at(sums, inv, micro)  # one linear scatter-add pass
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(uniq)), pa.int64()),
                "sum_micro": pa.array(sums.ravel(), pa.int64()),
                "n_vecs": pa.array(np.repeat(counts, dim), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_micro", alias_name="sum_micro"),
                   Sum("n_vecs", alias_name="n_vecs"))
        .sort(["label", "dim"])
    )


# DuckDB's range() table function cannot take lateral column refs, so
# the dim axis comes from a constant-bounded range filtered to the
# actual vector length (cap 256 >> the 64-dim test embeddings).
LABEL_CENTROIDS_SQL = """
SELECT CAST(e.label AS BIGINT) AS label,
       CAST(r.d AS BIGINT) AS dim,
       CAST(sum(CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
       count(*) AS n_vecs
FROM embeddings e, range(0, 256) r(d)
WHERE r.d < len(e.embedding)
GROUP BY 1, 2
ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# Cosine range search (threshold variant of knn) and nearest-seed assignment
# ---------------------------------------------------------------------------

RANGE_SEARCH_MICRO = 300_000  # cosine >= 0.30


def range_search(sf_dir: str, threshold_micro: int = RANGE_SEARCH_MICRO):
    """All corpus vectors within a cosine radius of each query (the
    epsilon-neighborhood / radius-search API next to knn's top-k):
    returns (query_id, vec_id, score_micro) for score >= threshold.

    Same scale shape as knn_brute — broadcast query matrix, one
    float64 matmul per batch — but WITHOUT a top-k merge: the
    threshold filter runs inside the batch, so <= matches rows ever
    leave a block and the result streams (no driver heap).  The
    threshold compares the SAME half-up micro ints the oracle emits,
    so boundary ties cannot diverge."""
    from document_extractor_ray import state

    q = default_queries(sf_dir)
    qids = np.asarray(q["vec_id"].to_pylist(), np.int64)
    qm = _normalize_rows(embedding_matrix(q["embedding"]).astype(np.float64))
    ref = state.broadcast({"ids": qids, "matrix": qm})

    def scan(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        ids = t["vec_id"].to_numpy()
        mat = embedding_matrix(t["embedding"])
        if mat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score_micro": pa.array([], pa.int64()),
                }
            )
        mat = _normalize_rows(mat.astype(np.float64))
        sims = st["matrix"] @ mat.T  # (q, batch)
        micro = np.floor(sims * 1_000_000 + 0.5).astype(np.int64)
        qi, vj = np.nonzero(micro >= threshold_micro)
        return pa.table(
            {
                "query_id": pa.array(st["ids"][qi], pa.int64()),
                "vec_id": pa.array(ids[vj], pa.int64()),
                "score_micro": pa.array(micro[qi, vj], pa.int64()),
            }
        )

    ds = _read_embeddings(sf_dir)
    return (
        ds.map_batches(scan, batch_format="pyarrow", batch_size=4096)
        .sort(["query_id", "score_micro", "vec_id"], descending=[False, True, False])
    )


RANGE_SEARCH_SQL = f"""
WITH qy AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8
),
s AS (
  SELECT qy.query_id, e.vec_id,
         CAST(floor(list_cosine_similarity(qy.qe, e.embedding::DOUBLE[])
                    * 1000000 + 0.5) AS BIGINT) AS score_micro
  FROM qy CROSS JOIN embeddings e
)
SELECT query_id, vec_id, score_micro
FROM s WHERE score_micro >= {RANGE_SEARCH_MICRO}
ORDER BY query_id, score_micro DESC, vec_id
"""


KMEANS_K = 8


def kmeans_assign(sf_dir: str, n_seeds: int = KMEANS_K):
    """One Lloyd assignment step: every vector labeled with its
    nearest seed centroid by cosine (seeds = the first n_seeds
    vectors by vec_id — deterministic, the kmeans++-free baseline),
    ties -> lower seed id.  This is the vector-quantization /
    IVF-list-assignment primitive; the centroid UPDATE half is
    label_centroids (integer segment sums), so a full kmeans
    iteration is this operator composed with that one.

    Scale: seeds broadcast once (k x dim), one float64 matmul +
    argmax per batch, output one row per vector — streams, no
    shuffle.  float64 scores with half-up micro emission keep the
    argmax and the oracle's row_number() in exact agreement (the
    knn_brute margin audit applies verbatim)."""
    from document_extractor_ray import state

    q = default_queries(sf_dir, n_queries=n_seeds)
    sids = np.asarray(q["vec_id"].to_pylist(), np.int64)
    sm = _normalize_rows(embedding_matrix(q["embedding"]).astype(np.float64))
    ref = state.broadcast({"ids": sids, "matrix": sm})

    def assign(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        ids = t["vec_id"].to_numpy()
        mat = embedding_matrix(t["embedding"])
        if mat.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "score_micro": pa.array([], pa.int64()),
                }
            )
        mat = _normalize_rows(mat.astype(np.float64))
        sims = mat @ st["matrix"].T  # (batch, seeds)
        best = np.argmax(sims, axis=1)  # ties -> first (lowest seed id)
        micro = np.floor(
            sims[np.arange(len(ids)), best] * 1_000_000 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(st["ids"][best], pa.int64()),
                "score_micro": pa.array(micro, pa.int64()),
            }
        )

    ds = _read_embeddings(sf_dir)
    return ds.map_batches(assign, batch_format="pyarrow", batch_size=4096).sort(
        "vec_id"
    )


KMEANS_ASSIGN_SQL = f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding::DOUBLE[] AS se
  FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}
),
s AS (
  SELECT e.vec_id, seeds.sid,
         list_cosine_similarity(e.embedding::DOUBLE[], seeds.se) AS score
  FROM embeddings e CROSS JOIN seeds
),
r AS (
  SELECT vec_id, sid, score,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, sid) AS rk
  FROM s
)
SELECT vec_id, sid AS cluster_id,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
FROM r WHERE rk = 1
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Full spherical k-means training (iterative Lloyd, integer-exact merge)
# ---------------------------------------------------------------------------

KMEANS_TRAIN_ITERS = 4
KMEANS_QUANT = 16384  # 2^14: quantized coords; 10^12-row cluster sums still < 2^63


def kmeans_train(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_TRAIN_ITERS):
    """Full spherical k-means (Lloyd's): ``iters`` assign+update rounds
    from the deterministic first-k seeds, then a final labeling pass —
    the iterative-convergence ML shape next to textrank's graph
    iterations.

    Determinism at scale is the design problem: float centroid sums
    depend on block merge ORDER, so a distributed update would drift
    between runs/cluster sizes.  Fix: per-batch partials QUANTIZE
    coordinates to int64 (x * 2^14, round) and emit integer segment
    sums + counts per cluster — integer addition commutes, so the
    merged centroid is bit-identical regardless of execution order,
    and the float division happens ONCE per round on the driver.
    Per round: one streamed pass, partials are k rows per batch with
    the sum vector packed to a binary blob; driver state is k x dim.
    Empty clusters keep their previous centroid.  Assignment ties
    break to the lower cluster id (argmax-first), matching
    kmeans_assign."""
    from document_extractor_ray import state

    q = default_queries(sf_dir, n_queries=k)
    cents = _normalize_rows(embedding_matrix(q["embedding"]).astype(np.float64))

    for _ in range(iters):
        ref = state.broadcast(cents)

        def upd_partial(t: pa.Table, ref=ref, k=k) -> pa.Table:
            c = state.cached_get(ref)
            mat = embedding_matrix(t["embedding"])
            if mat.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "blob": pa.array([], pa.binary()),
                    }
                )
            m64 = _normalize_rows(mat.astype(np.float64))
            best = np.argmax(m64 @ c.T, axis=1)
            qx = np.floor(mat.astype(np.float64) * KMEANS_QUANT + 0.5).astype(
                np.int64
            )
            sums = np.zeros((k, qx.shape[1]), np.int64)
            np.add.at(sums, best, qx)
            cnts = np.bincount(best, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(cnts),
                    "blob": pa.array([sums[i].tobytes() for i in range(k)]),
                }
            )

        parts = (
            _read_embeddings(sf_dir)
            .map_batches(upd_partial, batch_format="pyarrow")
            .to_pandas()
        )
        new = cents.copy()
        for cid in range(k):
            rows = parts[parts["cluster"] == cid]
            n = int(rows["cnt"].sum())
            if n == 0:
                continue
            acc = None
            for blob in rows["blob"]:
                v = np.frombuffer(blob, dtype=np.int64)
                acc = v.copy() if acc is None else acc + v
            mean = acc.astype(np.float64) / (n * KMEANS_QUANT)
            nrm = np.linalg.norm(mean)
            if nrm > 0:
                new[cid] = mean / nrm
        cents = new

    ref = state.broadcast({"matrix": cents})

    def final_assign(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        ids = t["vec_id"].to_numpy()
        mat = embedding_matrix(t["embedding"])
        if mat.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "score_micro": pa.array([], pa.int64()),
                }
            )
        m64 = _normalize_rows(mat.astype(np.float64))
        sims = m64 @ st["matrix"].T
        best = np.argmax(sims, axis=1)
        micro = np.floor(
            sims[np.arange(len(ids)), best] * 1_000_000 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(best.astype(np.int64)),
                "score_micro": pa.array(micro),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(final_assign, batch_format="pyarrow", batch_size=4096)
        .sort("vec_id")
    )


# ---------------------------------------------------------------------------
# Pairwise centroid geometry audit (exact integer dot / norms)
# ---------------------------------------------------------------------------

def centroid_distances(sf_dir: str):
    """Pairwise geometry of the per-label centroids: for every label
    pair (a < b) the exact integer dot product and squared norms of
    the QUANTIZED centroids (components half-up-rounded to 1e-6) —
    cosine = dot_q / sqrt(norm2_a * norm2_b) is the consumer's one
    irrational step, everything shipped is integer-exact on both
    engines.  Quantization is floor((2*sum + n) / (2*n)) — true floor
    division (negative components round half-up correctly), mirrored
    in SQL with an explicit floor correction because DuckDB's ``//``
    truncates toward zero.

    Scale shape: rides label_centroids' bounded aggregate (per-batch
    segment-sum partials, shuffle bounded by |labels| x dim); the
    pairwise step runs on the driver over a |labels| x dim integer
    matrix — label cardinality is a model constant, never data-sized."""
    cent = label_centroids(sf_dir).to_pandas()
    labels = np.sort(cent["label"].unique()).astype(np.int64)
    dim = int(cent["dim"].max()) + 1 if len(cent) else 0
    q = np.zeros((len(labels), dim), dtype=np.int64)
    pos = {lab: i for i, lab in enumerate(labels)}
    s = cent["sum_micro"].to_numpy().astype(np.int64)
    n = cent["n_vecs"].to_numpy().astype(np.int64)
    li = cent["label"].map(pos).to_numpy()
    di = cent["dim"].to_numpy().astype(np.int64)
    q[li, di] = (2 * s + n) // (2 * n)  # numpy // is floor division
    dots = q @ q.T
    norms = np.diag(dots)
    ia, ib = np.triu_indices(len(labels), k=1)
    return pa.table(
        {
            "label_a": pa.array(labels[ia], pa.int64()),
            "label_b": pa.array(labels[ib], pa.int64()),
            "dot_q": pa.array(dots[ia, ib], pa.int64()),
            "norm2_a": pa.array(norms[ia], pa.int64()),
            "norm2_b": pa.array(norms[ib], pa.int64()),
        }
    )


# floor((2s+n)/(2n)) with an explicit correction: DuckDB // truncates
# toward zero, so subtract 1 when the exact quotient is negative with
# a remainder (2n is always positive).
_Q_NUM = "(2 * sum_micro + n_vecs)"
_Q_DEN = "(2 * n_vecs)"
_Q_EXPR = (
    f"({_Q_NUM} // {_Q_DEN}"
    f" - CASE WHEN {_Q_NUM} < 0 AND ({_Q_NUM} % {_Q_DEN}) <> 0"
    f" THEN 1 ELSE 0 END)"
)

CENTROID_DISTANCES_SQL = f"""
WITH cent AS (
  SELECT CAST(e.label AS BIGINT) AS label,
         CAST(r.d AS BIGINT) AS dim,
         CAST(sum(CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
         CAST(count(*) AS BIGINT) AS n_vecs
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
  GROUP BY 1, 2
),
q AS (SELECT label, dim, CAST({_Q_EXPR} AS BIGINT) AS q FROM cent),
norms AS (SELECT label, CAST(sum(q * q) AS BIGINT) AS norm2 FROM q GROUP BY label)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(sum(a.q * b.q) AS BIGINT) AS dot_q,
       CAST(any_value(na.norm2) AS BIGINT) AS norm2_a,
       CAST(any_value(nb.norm2) AS BIGINT) AS norm2_b
FROM q a
JOIN q b ON a.dim = b.dim AND a.label < b.label
JOIN norms na ON na.label = a.label
JOIN norms nb ON nb.label = b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
"""


# ---------------------------------------------------------------------------
# ANN recall audit: LSH top-k vs exact brute-force top-k
# ---------------------------------------------------------------------------

def knn_recall_audit(sf_dir: str, k: int = 10):
    """Measured recall of the LSH ANN path against the exact
    brute-force top-k, per query — the measure-don't-guess audit that
    justifies shipping the bucketed variant at scale (the
    minhash_calibration pattern for the embedding family).  Both
    sides are the engine's own pipelines (brute: broadcast query
    matmul + partial top-k; LSH: hyperplane buckets); the comparison
    is a driver-bounded set intersection over n_queries x k rows.
    recall_permille uses floor division, integer on both engines."""
    brute = knn_brute_embeddings(sf_dir, k=k).to_pandas()
    lsh = knn_lsh_embeddings(sf_dir, k=k).to_pandas()
    lsh_sets = {
        q: set(g["vec_id"]) for q, g in lsh.groupby("query_id", sort=True)
    }
    out_q, out_h, out_r = [], [], []
    for q, g in brute.groupby("query_id", sort=True):
        hits = len(set(g["vec_id"]) & lsh_sets.get(q, set()))
        out_q.append(int(q))
        out_h.append(hits)
        out_r.append(1000 * hits // k)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "hits": pa.array(out_h, pa.int64()),
            "recall_permille": pa.array(out_r, pa.int64()),
        }
    )


def knn_recall_audit_sql(k: int = 10) -> str:
    """Oracle: both engine oracles as subquery CTE blocks (DuckDB
    allows WITH inside a derived table), joined on (query, neighbor)."""
    return f"""
SELECT b.query_id,
       CAST(count(l.vec_id) AS BIGINT) AS hits,
       CAST(1000 * count(l.vec_id) // {k} AS BIGINT) AS recall_permille
FROM ({KNN_BRUTE_SQL}) b
LEFT JOIN ({knn_lsh_sql(k=k)}) l
       ON l.query_id = b.query_id AND l.vec_id = b.vec_id
GROUP BY b.query_id
ORDER BY b.query_id
"""


# ---------------------------------------------------------------------------
# Column-wise statistics over the embedding matrix (per-dim moments)
# ---------------------------------------------------------------------------

def embedding_dim_stats(sf_dir: str):
    """Per-dimension count / sum / sum-of-squares over the quantized
    embedding matrix (components half-up micro ints, the
    label_centroids quantization) — the vector-column profile that
    catches dead dims, scale drift and normalization bugs before
    training.  mean = s/n and var = (ss - s²/n)/n are the consumer's
    divisions; the shipped terms are exact integers.  Scale shape:
    each batch folds its matrix to ONE (dim x 3) partial via matmul-
    free column sums; the shuffle carries dim-bounded rows only.
    int64 sumsq holds to ~9e6 unit vectors; past that, widen to per-
    shard HUGEINT merges (documented ceiling)."""
    from ray.data.aggregate import Sum

    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding"],
        override_num_blocks=_n_blocks(),
    )

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_micro": pa.array([], pa.int64()),
                    "sumsq_micro2": pa.array([], pa.int64()),
                }
            )
        q = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(q.shape[1], dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(q.shape[1], len(q), np.int64), pa.int64()),
                "sum_micro": pa.array(q.sum(axis=0), pa.int64()),
                "sumsq_micro2": pa.array((q * q).sum(axis=0), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_micro", alias_name="sum_micro"),
            Sum("sumsq_micro2", alias_name="sumsq_micro2"),
        )
        .sort("dim")
    )


EMBEDDING_DIM_STATS_SQL = """
SELECT CAST(d AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_micro,
       CAST(sum(q * q) AS BIGINT) AS sumsq_micro2
FROM (
  SELECT r.d AS d,
         CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
)
GROUP BY d
ORDER BY dim
"""


# ---------------------------------------------------------------------------
# Pairwise dimension correlation ingredients (exact integer Gram fold)
# ---------------------------------------------------------------------------

DIM_CORR_DIMS = 8


def embedding_dim_corr(sf_dir: str, d: int = DIM_CORR_DIMS):
    """Exact Pearson-correlation ingredients for every pair of the
    first ``d`` embedding dimensions: per pair (i < j) the integers
    n, cov_num = n·Σxy − ΣxΣy and var_{i,j}_num = n·Σx² − (Σx)² over
    micro-quantized components (the embedding_dim_stats quantization);
    corr = cov_num / sqrt(var_i·var_j) is the consumer's float.  Finds
    redundant / entangled dimensions before an IVF or PCA step.
    Scale shape: each batch folds its matrix to ONE d×d partial Gram
    via X^T·X (a single matmul), the shuffle carries d(d−1)/2-bounded
    rows, and the cross-multiplied finals are computed in exact Python
    ints over that bounded table (int64 partials hold to ~9e6 unit
    vectors per batch — the dim_stats ceiling)."""
    from ray.data.aggregate import Sum

    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding"],
        override_num_blocks=_n_blocks(),
    )

    iu, ju = np.triu_indices(d, k=1)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "dim_i": pa.array([], pa.int64()),
                "dim_j": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64()),
                "syy": pa.array([], pa.int64()),
            }
        )
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return empty
        q = np.floor(m[:, :d] * 1_000_000 + 0.5).astype(np.int64)
        gram = q.T @ q                       # d x d integer Gram
        sums = q.sum(axis=0)
        return pa.table(
            {
                "dim_i": pa.array(iu.astype(np.int64), pa.int64()),
                "dim_j": pa.array(ju.astype(np.int64), pa.int64()),
                "n": pa.array(np.full(len(iu), len(q), np.int64), pa.int64()),
                "sx": pa.array(sums[iu], pa.int64()),
                "sy": pa.array(sums[ju], pa.int64()),
                "sxy": pa.array(gram[iu, ju], pa.int64()),
                "sxx": pa.array(gram[iu, iu], pa.int64()),
                "syy": pa.array(gram[ju, ju], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dim_i", "dim_j"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
    )
    # d(d-1)/2-bounded: exact Python-int cross multiplies on the driver
    rows = sorted(merged.take_all(), key=lambda r: (r["dim_i"], r["dim_j"]))
    return pa.table(
        {
            "dim_i": pa.array([r["dim_i"] for r in rows], pa.int64()),
            "dim_j": pa.array([r["dim_j"] for r in rows], pa.int64()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "cov_num": pa.array(
                [r["n"] * r["sxy"] - r["sx"] * r["sy"] for r in rows], pa.int64()
            ),
            "var_i_num": pa.array(
                [r["n"] * r["sxx"] - r["sx"] * r["sx"] for r in rows], pa.int64()
            ),
            "var_j_num": pa.array(
                [r["n"] * r["syy"] - r["sy"] * r["sy"] for r in rows], pa.int64()
            ),
        }
    )


def embedding_dim_corr_sql(d: int = DIM_CORR_DIMS) -> str:
    parts = []
    for i in range(d):
        for j in range(i + 1, d):
            parts.append(
                f"""
SELECT CAST({i} AS BIGINT) AS dim_i, CAST({j} AS BIGINT) AS dim_j,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_num,
       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS var_i_num,
       CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS var_j_num
FROM (
  SELECT CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS y
  FROM embeddings
)"""
            )
    return " UNION ALL ".join(parts) + "\nORDER BY dim_i, dim_j"


# ---------------------------------------------------------------------------
# Top principal direction via exact integer Gram + driver power iteration
# ---------------------------------------------------------------------------

PCA_POWER_ITERS = 3000


def embedding_pca_power(sf_dir: str, iters: int = PCA_POWER_ITERS):
    """Top principal direction of the embedding second-moment matrix:
    each batch folds to ONE d×d integer Gram blob (micro-quantized
    X^T·X packed to int64 bytes — exact, merge-order-free), the blobs
    merge with a vectorized frombuffer sum, and the bounded d×d matrix
    gets a fixed-seed power iteration on the driver (3000 iterations:
    random unit vectors are near-isotropic, so the eigengap is small
    and the d×d matvec is driver-trivial).  Deterministic
    end to end: integer Gram + fixed float op order, so the micro-
    rounded output is stable across runs and cluster sizes (the
    pytest golden asserts cosine agreement with numpy eigh).  The
    d×d-bounded merge is the scale story — nothing vector-count-sized
    ever reaches the driver.  int64 partials hold to ~9e6 unit vectors
    per batch (the dim_stats ceiling); past that, widen per-shard."""
    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding"],
        override_num_blocks=_n_blocks(),
    )

    def gram_blob(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int32()),
                    "d": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "blob": pa.array([], pa.binary()),
                }
            )
        q = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        gram = q.T @ q
        return pa.table(
            {
                "g": pa.array([0], pa.int32()),
                "d": pa.array([q.shape[1]], pa.int64()),
                "n": pa.array([len(q)], pa.int64()),
                "blob": pa.array([gram.tobytes()], pa.binary()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        d = int(t["d"][0].as_py())
        n = int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
        acc = np.zeros(d * d, np.int64)
        for b in t["blob"].to_pylist():
            acc += np.frombuffer(b, np.int64)
        return pa.table(
            {
                "d": pa.array([d], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "blob": pa.array([acc.tobytes()], pa.binary()),
            }
        )

    merged = (
        ds.map_batches(gram_blob, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: merge(t.drop_columns(["g"])), batch_format="pyarrow")
        .take_all()
    )
    d = int(merged[0]["d"])
    n = int(merged[0]["n"])
    gram = np.frombuffer(merged[0]["blob"], np.int64).reshape(d, d).astype(np.float64)

    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = gram @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            break
        v = w / nrm
    lam = float(v @ gram @ v)          # micro^2-scaled second-moment eigenvalue
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    comp = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
    lam_per_row = int(np.floor(lam / max(n, 1) + 0.5))
    return pa.table(
        {
            "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "component_micro": pa.array(comp, pa.int64()),
            "eigval_micro2_per_row": pa.array(
                np.full(d, lam_per_row, np.int64), pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# kNN majority-vote classification (leave-one-out over the label column)
# ---------------------------------------------------------------------------


def knn_classify(sf_dir: str, k: int = 10):
    """Leave-one-out kNN label prediction for the benchmark query set:
    the knn_brute top-k (which includes the query itself at rank 1) is
    voted over with SELF EXCLUDED, majority label wins, ties break to
    the smallest label — all deterministic so the SQL oracle matches
    exactly.  Reports predicted vs true label per query, the accuracy
    primitive an embedding-quality gate runs.

    Scale shape: all the heavy lifting is knn_brute's broadcast-matrix
    batch matmul with per-batch partial top-k; the vote folds the
    (queries × k)-row result on the driver."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.similarity import knn_brute_embeddings

    nn = knn_brute_embeddings(sf_dir, k=k)
    lab_t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    label_of = dict(
        zip(lab_t["vec_id"].to_pylist(), lab_t["label"].to_pylist())
    )
    votes: dict[int, dict[int, int]] = {}
    for q, v in zip(nn["query_id"].to_pylist(), nn["vec_id"].to_pylist()):
        if v == q:
            continue
        d = votes.setdefault(int(q), {})
        lab = int(label_of[v])
        d[lab] = d.get(lab, 0) + 1
    rows = []
    for q in sorted(votes):
        lab, n = min(votes[q].items(), key=lambda kv: (-kv[1], kv[0]))
        true = int(label_of[q])
        rows.append((q, lab, n, true, 1 if lab == true else 0))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "pred_label": pa.array([r[1] for r in rows], pa.int64()),
            "votes": pa.array([r[2] for r in rows], pa.int64()),
            "true_label": pa.array([r[3] for r in rows], pa.int64()),
            "correct": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


KNN_CLASSIFY_SQL = f"""
WITH base AS ({KNN_BRUTE_SQL}),
n AS (
  SELECT b.query_id, e.label
  FROM base b JOIN embeddings e ON e.vec_id = b.vec_id
  WHERE b.vec_id <> b.query_id
),
v AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
  FROM n GROUP BY 1, 2
),
r AS (
  SELECT query_id, label, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label) AS rk
  FROM v
)
SELECT r.query_id,
       CAST(r.label AS BIGINT) AS pred_label,
       r.votes,
       CAST(e.label AS BIGINT) AS true_label,
       CAST(CASE WHEN r.label = e.label THEN 1 ELSE 0 END AS BIGINT) AS correct
FROM r JOIN embeddings e ON e.vec_id = r.query_id
WHERE rk = 1
ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# Persisted IVF index: centroid-partitioned parquet, probes prune at the READ
# ---------------------------------------------------------------------------


def build_ivf_index(
    ds: "ray.data.Dataset", out_dir: str, n_centroids: int = N_CENTROIDS
) -> np.ndarray:
    """Materialize the inverted-file index the knn_ivf docstring
    promises at 10^12 scale: every vector is assigned to its nearest
    coarse centroid and written to ``out_dir/cid=<c>/`` partitioned
    parquet, so a later search READS only the probed partitions —
    pruning moves from a per-batch mask to the storage layer.
    Centroids land beside the data (``centroids.npy``) with a marker
    committed LAST, so a killed build is re-run, never half-read
    (the resume.py commit discipline)."""
    import os

    from document_extractor_ray import state

    cents = _ivf_centroids(ds, n_centroids)
    # centroids broadcast at full precision: the assignment arithmetic
    # must MIRROR knn_ivf's in-memory mask (float32 rows @ float64
    # centroids) or near-equidistant vectors could flip partitions and
    # break the pinned knn_ivf == knn_ivf_indexed identity
    cref = state.broadcast(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = state.cached_get(cref)
        mat = _normalize_rows(embedding_matrix(t["embedding"]))
        cid = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        # cid duplicated as a data column: partition_cols values live
        # only in directory names, and the scorer needs them per row
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
                "cid_col": pa.array(cid),
                "cid": pa.array(cid),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cid"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return cents


def knn_ivf_indexed(
    sf_dir: str, k: int = 10, n_probes: int = 8, n_centroids: int = N_CENTROIDS
) -> pa.Table:
    """knn_ivf over the PERSISTED centroid-partitioned index: the
    probed centroids' partitions are the ONLY parquet directories
    read (``read_parquet`` on the selected ``cid=`` paths) — the
    storage-level pruning knn_ivf's in-memory mask simulates.  Bit-
    identical to knn_ivf by construction (same deterministic sample,
    same centroids, same probe sets — pinned in pytest), so the
    committed knn_ivf golden covers both.

    Scale note: at 10^12 vectors the index build is the one full pass;
    every subsequent query workload reads n_probes/n_centroids of the
    data.  Index cached under /tmp keyed by corpus version + row
    count."""
    import os

    import pyarrow.parquet as pq

    from document_extractor_ray import fixtures

    ds = _read_embeddings(sf_dir)
    n_rows = pq.read_metadata(os.path.join(sf_dir, "embeddings.parquet")).num_rows
    idx = (
        f"/tmp/docray_ivf_v{fixtures.CORPUS_VERSION}_n{n_rows}_c{n_centroids}"
    )
    if not os.path.exists(os.path.join(idx, "_SUCCESS")):
        build_ivf_index(ds, idx, n_centroids=n_centroids)
    cents = np.load(os.path.join(idx, "centroids.npy"))

    query_table = default_queries(sf_dir)
    qids = query_table["vec_id"].to_pylist()
    q_norm = _normalize_rows(embedding_matrix(query_table["embedding"]))
    probe = np.argsort(-(q_norm @ cents.T), axis=1)[:, :n_probes]
    probed = sorted(set(probe.ravel().tolist()))

    import ray.data as rd

    import glob

    # Ray's read_parquet wants concrete files when given a path LIST
    paths = [
        f
        for c in probed
        for f in sorted(glob.glob(os.path.join(idx, f"cid={c}", "*.parquet")))
    ]
    if not paths:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score_micro": pa.array([], pa.int64()),
            }
        )
    pruned = rd.read_parquet(paths, columns=["vec_id", "embedding", "cid_col"])
    ref = ray.put(
        {
            "ids": qids,
            "qm": q_norm.astype(np.float32),
            "probe": probe,
        }
    )

    class IndexedTopK:
        def __init__(self, st: dict):
            self.query_ids = st["ids"]
            self.qm = st["qm"]
            self.probe_sets = [
                np.fromiter(set(p.tolist()), dtype=np.int64) for p in st["probe"]
            ]

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            cid = t["cid_col"].to_numpy()
            mat = embedding_matrix(t["embedding"])
            if mat.size == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            mat = _normalize_rows(mat)
            sims = self.qm @ mat.T
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                cand = np.isin(cid, self.probe_sets[qi])
                if not cand.any():
                    continue
                cs = sims[qi][cand]
                cids_ = ids[cand]
                k_ = min(k, cs.size)
                idx_ = np.argpartition(-cs, k_ - 1)[:k_]
                for j in idx_:
                    out_q.append(int(qid))
                    out_v.append(int(cids_[j]))
                    out_s.append(float(cs[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = pruned.map_batches(
        _pooled(IndexedTopK, ref), batch_format="pyarrow", batch_size=4096
    )
    return _merge_topk(partials, k)


# ---------------------------------------------------------------------------
# Dominant-dimension profile (argmax distribution)
# ---------------------------------------------------------------------------

def argmax_dim_stats(sf_dir: str):
    """Distribution of each vector's DOMINANT dimension (first argmax,
    ties -> lowest index): per dim, how many vectors peak there and
    the permille share — a cheap anisotropy/collapse probe (a healthy
    embedding space spreads argmaxes; a collapsed one concentrates).

    Scale shape: per batch, one zero-copy matrix view + np.argmax +
    bincount -> a dim-bounded partial (<= 256 rows); the driver folds
    partials (PERF 32/34).  Cross-engine exactness: comparisons happen
    on the same stored float32 values (DOUBLE cast is order-preserving),
    and both sides break ties toward the lowest index."""
    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding"],
        override_num_blocks=_n_blocks(),
    )

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"])
        if m.size == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        am = np.argmax(m, axis=1)
        bc = np.bincount(am, minlength=m.shape[1]).astype(np.int64)
        nz = np.nonzero(bc)[0]
        return pa.table(
            {
                "dim": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(bc[nz], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[int, int] = {}
    for r in parts:
        agg[int(r["dim"])] = agg.get(int(r["dim"]), 0) + int(r["n"])
    total = sum(agg.values())
    dims = sorted(agg)
    return pa.table(
        {
            "dim": pa.array(dims, pa.int64()),
            "n_vectors": pa.array([agg[d] for d in dims], pa.int64()),
            "share_permille": pa.array(
                [agg[d] * 1000 // max(total, 1) for d in dims], pa.int64()
            ),
        }
    )


ARGMAX_DIM_STATS_SQL = """
WITH expl AS (
  SELECT e.vec_id, r.d AS dim,
         CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE) AS v
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
am AS (
  SELECT vec_id, dim FROM (
    SELECT vec_id, dim,
           row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, dim ASC) AS rn
    FROM expl
  ) WHERE rn = 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM am)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(*) * 1000 // t.n AS BIGINT) AS share_permille
FROM am CROSS JOIN tot t
GROUP BY dim, t.n
ORDER BY dim
"""


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (cluster, then prune within cluster)
# ---------------------------------------------------------------------------

SEMDEDUP_TAU_MICRO = 300_000  # cosine >= 0.30 (p99 of the corpus pair dist)


def semdedup_prune(sf_dir: str, n_seeds: int = KMEANS_K,
                   tau_micro: int = SEMDEDUP_TAU_MICRO):
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): cluster every vector to its nearest seed
    centroid (the oracled ``kmeans_assign`` step), then within each
    cluster flag a vector as a semantic duplicate of its cluster-mates
    with LOWER vec_id — keep-first.  The dup rule is 'cosine >= tau to
    ANY earlier cluster-mate' (deterministic and SQL-expressible; the
    paper's greedy keep-set variant differs only through chains of
    near-dups, and the chain rule is available downstream via
    near_dup_clusters on the emitted pairs).  Output per vector:
    cluster, number of earlier near-dup mates, max similarity to any
    earlier mate (-1 when first in its cluster), and the kept flag.

    Scale shape: seed matrix broadcast once, one matmul+argmax per
    batch assigns (no shuffle); ONE shuffle on cluster_id co-locates
    clusters; inside a cluster the lower-triangular comparison runs
    as BLOCKED numpy matmuls (1024-row strips vs the prefix), so peak
    memory is strip x cluster, never cluster^2.  At 100 TB raise
    n_seeds so clusters stay ~10^5 vectors (the paper uses 50k
    clusters for LAION) — the plan is unchanged, only the constant.
    Sim threshold compares HALF-UP MICRO ints on both engines (the
    knn_brute margin audit applies)."""
    from document_extractor_ray import state

    q = default_queries(sf_dir, n_queries=n_seeds)
    sids = np.asarray(q["vec_id"].to_pylist(), np.int64)
    sm = _normalize_rows(embedding_matrix(q["embedding"]).astype(np.float64))
    ref = state.broadcast({"ids": sids, "matrix": sm})

    def assign(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        mat = embedding_matrix(t["embedding"])
        if mat.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "embedding": t["embedding"],
                }
            )
        m = _normalize_rows(mat.astype(np.float64))
        best = np.argmax(m @ st["matrix"].T, axis=1)
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "cluster_id": pa.array(st["ids"][best], pa.int64()),
                "embedding": t["embedding"],
            }
        )

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "n_dup_prior": pa.array([], pa.int64()),
            "max_prior_sim_micro": pa.array([], pa.int64()),
            "kept": pa.array([], pa.int64()),
        }
    )

    def prune_cluster(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by("vec_id")
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
        n = len(ids)
        n_prior = np.zeros(n, np.int64)
        max_prior = np.full(n, -1, np.int64)
        step = 1024
        for s in range(1, n, step):
            e = min(s + step, n)
            sims = m[s:e] @ m[:e].T  # strip vs its full prefix
            micro = np.floor(sims * 1_000_000 + 0.5).astype(np.int64)
            # columns < s are visible to every strip row; columns
            # s..e-1 only below the strict diagonal (vectorized mask)
            base = micro[:, :s]
            n_p = (base >= tau_micro).sum(axis=1)
            mx = base.max(axis=1)
            diag = micro[:, s:e]
            tri = np.tri(e - s, e - s, k=-1, dtype=bool)
            n_p += ((diag >= tau_micro) & tri).sum(axis=1)
            # masked fill must be INT64_MIN (real sims can be negative
            # micro; every strip row already sees column 0 via `base`)
            dmx = np.where(tri, diag, np.iinfo(np.int64).min).max(axis=1)
            n_prior[s:e] = n_p
            max_prior[s:e] = np.maximum(mx, dmx)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": t["cluster_id"],
                "n_dup_prior": pa.array(n_prior, pa.int64()),
                "max_prior_sim_micro": pa.array(max_prior, pa.int64()),
                "kept": pa.array((n_prior == 0).astype(np.int64), pa.int64()),
            }
        )

    ds = _read_embeddings(sf_dir)
    return (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)
        .groupby("cluster_id")  # bounded: n_seeds groups
        .map_groups(prune_cluster, batch_format="pyarrow")
        .sort("vec_id")
    )


SEMDEDUP_PRUNE_SQL = f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding::DOUBLE[] AS se
  FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}
),
s AS (
  SELECT e.vec_id, seeds.sid,
         list_cosine_similarity(e.embedding::DOUBLE[], seeds.se) AS score
  FROM embeddings e CROSS JOIN seeds
),
asg AS (
  SELECT vec_id, sid AS cluster_id FROM (
    SELECT vec_id, sid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, sid) AS rk
    FROM s
  ) WHERE rk = 1
),
p AS (
  SELECT a.vec_id,
         CAST(floor(list_cosine_similarity(
             ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) * 1000000 + 0.5)
           AS BIGINT) AS sm
  FROM asg a
  JOIN asg b ON b.cluster_id = a.cluster_id AND b.vec_id < a.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
),
agg AS (
  SELECT vec_id,
         CAST(count(*) FILTER (sm >= {SEMDEDUP_TAU_MICRO}) AS BIGINT)
           AS n_dup_prior,
         CAST(max(sm) AS BIGINT) AS max_prior_sim_micro
  FROM p GROUP BY vec_id
)
SELECT a.vec_id, a.cluster_id,
       CAST(coalesce(g.n_dup_prior, 0) AS BIGINT) AS n_dup_prior,
       CAST(coalesce(g.max_prior_sim_micro, -1) AS BIGINT)
         AS max_prior_sim_micro,
       CAST(coalesce(g.n_dup_prior, 0) = 0 AS BIGINT) AS kept
FROM asg a LEFT JOIN agg g USING (vec_id)
ORDER BY a.vec_id
"""


# ---------------------------------------------------------------------------
# Per-label medoid (exact integer-sum selection)
# ---------------------------------------------------------------------------

def label_medoid(sf_dir: str):
    """Per label, the MEDOID member: the vector maximizing the summed
    cosine similarity to its label-mates (ties -> lower vec_id) — the
    representative-selection primitive behind cluster summarization
    and SemDeDup's keep-the-centroid-nearest variant.  Each pair
    contributes its HALF-UP MICRO int, so the per-member total is an
    integer sum both engines compute identically (summation-order-
    free), and singleton labels are their own medoid with total 0.

    Scale shape: one label shuffle (bounded groups), per-label BLOCKED
    strip matmuls (strip x members, never members²), integer row sums.
    The exact medoid is inherently quadratic per label — at 100 TB cap
    members per label by hash-threshold sampling (the knn_ivf PERF 33
    selector) and log the cap; the sf corpora are far below it."""
    empty = pa.table(
        {
            "label": pa.array([], pa.int64()),
            "medoid_vec_id": pa.array([], pa.int64()),
            "sum_sim_micro": pa.array([], pa.int64()),
            "n_members": pa.array([], pa.int64()),
        }
    )

    def medoid(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by("vec_id")
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = int(t["label"][0].as_py())
        m = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
        n = len(ids)
        tot = np.zeros(n, np.int64)
        step = 1024
        for s in range(0, n, step):
            e = min(s + step, n)
            micro = np.floor((m[s:e] @ m.T) * 1_000_000 + 0.5).astype(np.int64)
            # exclude self-pairs: zero the diagonal entries of the strip
            rows = np.arange(s, e)
            micro[rows - s, rows] = 0
            tot[s:e] = micro.sum(axis=1)
        best = int(np.argmax(tot))  # ties -> first = lowest vec_id
        return pa.table(
            {
                "label": pa.array([lab], pa.int64()),
                "medoid_vec_id": pa.array([int(ids[best])], pa.int64()),
                "sum_sim_micro": pa.array([int(tot[best])], pa.int64()),
                "n_members": pa.array([n], pa.int64()),
            }
        )

    ds = _read_embeddings(sf_dir, with_label=True)
    return ds.groupby("label").map_groups(
        medoid, batch_format="pyarrow"
    ).sort("label")


LABEL_MEDOID_SQL = """
WITH pair AS (
  SELECT a.vec_id,
         CAST(floor(list_cosine_similarity(
             a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000 + 0.5)
           AS BIGINT) AS sm
  FROM embeddings a
  JOIN embeddings b ON b.label = a.label AND b.vec_id != a.vec_id
),
tots AS (SELECT vec_id, CAST(sum(sm) AS BIGINT) AS tot FROM pair GROUP BY 1),
base AS (
  SELECT e.label, e.vec_id, coalesce(t.tot, 0) AS tot
  FROM embeddings e LEFT JOIN tots t USING (vec_id)
),
nm AS (SELECT label, CAST(count(*) AS BIGINT) AS n_members
       FROM embeddings GROUP BY 1),
r AS (
  SELECT label, vec_id, tot,
         row_number() OVER (PARTITION BY label
                            ORDER BY tot DESC, vec_id) AS rk
  FROM base
)
SELECT CAST(r.label AS BIGINT) AS label, r.vec_id AS medoid_vec_id,
       CAST(r.tot AS BIGINT) AS sum_sim_micro, nm.n_members
FROM r JOIN nm USING (label) WHERE rk = 1
ORDER BY label
"""


# ---------------------------------------------------------------------------
# Assignment-margin profile (cluster-boundary confidence)
# ---------------------------------------------------------------------------

def assign_margin_stats(sf_dir: str, n_seeds: int = KMEANS_K):
    """Per vector, the confidence MARGIN of its nearest-seed
    assignment: best and runner-up seed (the kmeans_assign ordering:
    score DESC, seed id ASC) plus margin_micro = micro(best) −
    micro(second) — the boundary-population profile that tells you
    how much a re-clustering or a quantized index can scramble
    assignments.  Scale: broadcast seed matrix, one matmul + stable
    argsort over n_seeds columns per batch; streams, no shuffle."""
    from document_extractor_ray import state

    q = default_queries(sf_dir, n_queries=n_seeds)
    sids = np.asarray(q["vec_id"].to_pylist(), np.int64)
    sm = _normalize_rows(embedding_matrix(q["embedding"]).astype(np.float64))
    ref = state.broadcast({"ids": sids, "matrix": sm})

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "second_id": pa.array([], pa.int64()),
            "margin_micro": pa.array([], pa.int64()),
        }
    )

    def margins(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        mat = embedding_matrix(t["embedding"])
        if mat.size == 0:
            return empty
        m = _normalize_rows(mat.astype(np.float64))
        sims = m @ st["matrix"].T
        # stable argsort on -score: equal scores keep ascending seed id
        order = np.argsort(-sims, axis=1, kind="stable")
        b, s2 = order[:, 0], order[:, 1]
        rows = np.arange(len(m))
        mb = np.floor(sims[rows, b] * 1_000_000 + 0.5).astype(np.int64)
        ms = np.floor(sims[rows, s2] * 1_000_000 + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "cluster_id": pa.array(st["ids"][b], pa.int64()),
                "second_id": pa.array(st["ids"][s2], pa.int64()),
                "margin_micro": pa.array(mb - ms, pa.int64()),
            }
        )

    ds = _read_embeddings(sf_dir)
    return ds.map_batches(margins, batch_format="pyarrow", batch_size=4096).sort(
        "vec_id"
    )


ASSIGN_MARGIN_STATS_SQL = f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding::DOUBLE[] AS se
  FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}
),
s AS (
  SELECT e.vec_id, seeds.sid,
         list_cosine_similarity(e.embedding::DOUBLE[], seeds.se) AS score
  FROM embeddings e CROSS JOIN seeds
),
r AS (
  SELECT vec_id, sid, score,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, sid) AS rk
  FROM s
)
SELECT a.vec_id, a.sid AS cluster_id, b.sid AS second_id,
       CAST(floor(a.score * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(b.score * 1000000 + 0.5) AS BIGINT) AS margin_micro
FROM r a JOIN r b ON b.vec_id = a.vec_id AND a.rk = 1 AND b.rk = 2
ORDER BY a.vec_id
"""


# ---------------------------------------------------------------------------
# Per-vector outlier score vs the global centroid (exact integers)
# ---------------------------------------------------------------------------

OUTLIER_TOP_K = 20


def embedding_outlier_scores(sf_dir: str, k: int = OUTLIER_TOP_K):
    """Top-k embedding outliers by EXACT integer squared distance to
    the global centroid: components quantize to half-up micro ints
    (the embedding_dim_stats quantization), the centroid is the
    floor-divided per-dim mean, and the score is sum_d (q_d - mean_d)^2
    — the curation signal for junk/garbled vectors before ANN
    indexing.  The floor is written as (S - ((S%n + n)%n)) // n in
    BOTH engines, so negative dimension sums cannot split on
    truncate-vs-floor division conventions.

    Scale shape: pass 1 is the dim-bounded column-sum fold (same
    partials as embedding_dim_stats); the centroid broadcasts in the
    closure; pass 2 is one vectorized (m - mean)^2 matmul-free batch
    kernel with a per-batch local top-k, so <= k rows leave each
    block."""
    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        override_num_blocks=_n_blocks(),
    )

    def sums(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        q = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(q.shape[1], dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(q.shape[1], len(q), np.int64), pa.int64()),
                "s": pa.array(q.sum(axis=0), pa.int64()),
            }
        )

    agg: dict[int, list] = {}
    for tb in map(
        ray.get, ds.map_batches(sums, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for d, n, s in zip(
            tb["dim"].to_pylist(), tb["n"].to_pylist(), tb["s"].to_pylist()
        ):
            a = agg.setdefault(int(d), [0, 0])
            a[0] += int(n)
            a[1] += int(s)
    dims = sorted(agg)
    mean = np.array(
        [
            (agg[d][1] - ((agg[d][1] % agg[d][0] + agg[d][0]) % agg[d][0]))
            // agg[d][0]
            for d in dims
        ],
        dtype=np.int64,
    )

    def score(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "outlier_score": pa.array([], pa.int64()),
                }
            )
        q = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        dev = q - mean[None, :]
        sc = (dev * dev).sum(axis=1)
        out = pa.table(
            {
                "vec_id": t["vec_id"],
                "outlier_score": pa.array(sc, pa.int64()),
            }
        )
        return out.sort_by(
            [("outlier_score", "descending"), ("vec_id", "ascending")]
        ).slice(0, k)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["outlier_score", "vec_id"], descending=[True, False])
        .limit(k)
    )


EMBEDDING_OUTLIER_SQL = f"""
WITH q AS (
  SELECT e.vec_id, r.d AS d,
         CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
m AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s
  FROM q GROUP BY d
),
mean AS (
  SELECT d, (s - ((s % n + n) % n)) // n AS mu FROM m
)
SELECT q.vec_id,
       CAST(sum((q.q - mean.mu) * (q.q - mean.mu)) AS BIGINT) AS outlier_score
FROM q JOIN mean USING (d)
GROUP BY q.vec_id
ORDER BY outlier_score DESC, vec_id
LIMIT {OUTLIER_TOP_K}
"""


# ---------------------------------------------------------------------------
# Mutual-kNN graph symmetrization (ANN-graph construction substrate)
# ---------------------------------------------------------------------------

MUTUAL_K = 5


def mutual_knn_pairs(sf_dir: str, k: int = MUTUAL_K):
    """Mutual k-nearest-neighbor pairs: (a, b) kept iff b is in a's
    top-k by cosine AND a is in b's — the symmetrization step that
    turns a directed kNN sweep into the undirected graph HNSW /
    NN-descent / kNN-clustering builds on (mutuality filters hub
    false-friends: a hub appears in everyone's top-k but reciprocates
    few).  Neighbor order is (score desc, vec_id asc) via a STABLE
    argsort over the id-sorted corpus, matching SQL row_number
    exactly; scores stay float64 cosine with half-up micro reporting
    (the embedding_topk_pairs convention).

    Scale shape: one broadcast of the normalized corpus matrix
    (ray.put), one batched matmul sweep emitting N*k directed edges,
    mutuality as a driver set-intersection here (N*k-bounded); at
    10^7+ vectors the directed edge table stays a Dataset and
    mutuality becomes one pair-keyed bucketed count == 2 — the
    IVF-bucketed sweep replaces the broadcast, same as knn_ivf."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id")
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
    ref = ray.put({"ids": ids, "matrix": mat})

    def directed(b: pa.Table) -> pa.Table:
        from document_extractor_ray import state

        st = state.cached_get(ref)
        cids, cmat = st["ids"], st["matrix"]
        q = _normalize_rows(embedding_matrix(b["embedding"]).astype(np.float64))
        qids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        sims = q @ cmat.T
        order = np.argsort(-sims, axis=1, kind="stable")  # ties -> id asc
        src, dst, sc = [], [], []
        take = order[:, : k + 1]
        for i in range(len(qids)):
            row = take[i]
            row = row[cids[row] != qids[i]][:k]
            src.extend([qids[i]] * len(row))
            dst.extend(cids[row].tolist())
            sc.extend(sims[i, row].tolist())
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )

    edges: dict[tuple, float] = {}
    for tb in map(
        ray.get,
        _read_embeddings(sf_dir)
        .map_batches(directed, batch_format="pyarrow", batch_size=2048)
        .to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for s, d, sc in zip(
            tb["src"].to_pylist(), tb["dst"].to_pylist(), tb["score"].to_pylist()
        ):
            edges[(s, d)] = sc
    mutual = sorted(
        (a, b) for (a, b) in edges if a < b and (b, a) in edges
    )
    return pa.table(
        {
            "vec_a": pa.array([a for a, _ in mutual], pa.int64()),
            "vec_b": pa.array([b for _, b in mutual], pa.int64()),
            "sim_micro": pa.array(
                [int(np.floor(edges[p] * 1e6 + 0.5)) for p in mutual], pa.int64()
            ),
        }
    )


MUTUAL_KNN_PAIRS_SQL = f"""
WITH s AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT va, vb, score,
         row_number() OVER (PARTITION BY va ORDER BY score DESC, vb) AS rn
  FROM s
),
knn AS (SELECT va, vb, score FROM r WHERE rn <= {MUTUAL_K}),
m AS (
  SELECT k1.va AS vec_a, k1.vb AS vec_b, k1.score
  FROM knn k1 JOIN knn k2 ON k2.va = k1.vb AND k2.vb = k1.va
  WHERE k1.va < k1.vb
)
SELECT vec_a, vec_b,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS sim_micro
FROM m ORDER BY vec_a, vec_b
"""


# ---------------------------------------------------------------------------
# Silhouette-style separation margins over the labeled embeddings
# ---------------------------------------------------------------------------

def label_silhouette(sf_dir: str):
    """Per-vector cluster-separation margin: a_micro = floored mean
    pair-similarity to the OWN label (self excluded), b_micro = the
    best other-label floored mean, margin_micro = a - b (positive =
    the vector sits with its own cluster) — the silhouette-style
    clustering-quality audit next to label_centroids/label_medoid,
    kept integer end to end: each pair contributes its half-up micro
    int (summation-order-free), and every mean uses the
    convention-proof floor (S - ((S%n + n)%n)) // n so negative
    similarity sums cannot split on division conventions.  Vectors in
    singleton labels have no own-pairs and are dropped (the SQL inner
    join does the same).

    Scale shape: one broadcast of the corpus matrix + labels; per
    batch ONE matmul then |labels| masked column sums — never a
    members^2 table; self-pairs are excluded by position via
    searchsorted against the id-sorted corpus."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    ).sort_by("vec_id")
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    labels = np.asarray(t["label"].to_pylist(), dtype=np.int64)
    mat = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
    uniq = np.unique(labels)
    ref = ray.put({"ids": ids, "labels": labels, "matrix": mat, "uniq": uniq})

    def margins(b: pa.Table) -> pa.Table:
        from document_extractor_ray import state

        st = state.cached_get(ref)
        cids, clab, cmat, ulab = (
            st["ids"], st["labels"], st["matrix"], st["uniq"],
        )
        q = _normalize_rows(embedding_matrix(b["embedding"]).astype(np.float64))
        qids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        qlab = np.asarray(b["label"].to_pylist(), dtype=np.int64)
        micro = np.floor((q @ cmat.T) * 1_000_000 + 0.5).astype(np.int64)
        pos = np.searchsorted(cids, qids)
        self_micro = micro[np.arange(len(qids)), pos]
        sums = np.stack(
            [micro[:, clab == l].sum(axis=1) for l in ulab], axis=1
        )
        counts = np.array([(clab == l).sum() for l in ulab], dtype=np.int64)

        def fdiv(s, n):
            return (s - ((s % n + n) % n)) // n

        out = {"vec_id": [], "label": [], "a_micro": [], "b_micro": [],
               "margin_micro": []}
        for i in range(len(qids)):
            li = int(qlab[i])
            col = int(np.nonzero(ulab == li)[0][0])
            n_own = int(counts[col]) - 1
            if n_own <= 0:
                continue
            a = int(fdiv(sums[i, col] - self_micro[i], n_own))
            b_best = None
            for c, l in enumerate(ulab):
                if c == col:
                    continue
                m = int(fdiv(sums[i, c], int(counts[c])))
                b_best = m if b_best is None else max(b_best, m)
            out["vec_id"].append(int(qids[i]))
            out["label"].append(li)
            out["a_micro"].append(a)
            out["b_micro"].append(b_best)
            out["margin_micro"].append(a - b_best)
        return pa.table(
            {
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "label": pa.array(out["label"], pa.int64()),
                "a_micro": pa.array(out["a_micro"], pa.int64()),
                "b_micro": pa.array(out["b_micro"], pa.int64()),
                "margin_micro": pa.array(out["margin_micro"], pa.int64()),
            }
        )

    return (
        _read_embeddings(sf_dir, with_label=True)
        .map_batches(margins, batch_format="pyarrow", batch_size=2048)
        .sort("vec_id")
    )


LABEL_SILHOUETTE_SQL = """
WITH pair AS (
  SELECT a.vec_id, CAST(a.label AS BIGINT) AS la, CAST(b.label AS BIGINT) AS lb,
         CAST(floor(list_cosine_similarity(
             a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000 + 0.5)
           AS BIGINT) AS sm
  FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
),
agg AS (
  SELECT vec_id, la, lb, CAST(sum(sm) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM pair GROUP BY 1, 2, 3
),
mean AS (
  SELECT vec_id, la, lb, (s - ((s % n + n) % n)) // n AS m FROM agg
),
a AS (SELECT vec_id, la AS label, CAST(m AS BIGINT) AS a_micro
      FROM mean WHERE la = lb),
b AS (SELECT vec_id, CAST(max(m) AS BIGINT) AS b_micro
      FROM mean WHERE la != lb GROUP BY vec_id)
SELECT a.vec_id, a.label, a.a_micro, b.b_micro,
       CAST(a.a_micro - b.b_micro AS BIGINT) AS margin_micro
FROM a JOIN b USING (vec_id)
ORDER BY a.vec_id
"""


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection + full-corpus assignment
# ---------------------------------------------------------------------------

KCENTER_K = 16          # centers selected
KCENTER_CANDIDATES = 128  # target candidate-pool size (vec_id stride sample)


def kcenter_coreset(
    sf_dir: str, k: int = KCENTER_K, n_cand: int = KCENTER_CANDIDATES
):
    """Greedy k-center (farthest-point-first) coreset selection — the
    classic 2-approximation data-pruning / active-learning selector —
    followed by a full-corpus nearest-center assignment.

    Selection runs over a deterministic stride sample of candidates
    (vec_id % stride == 0, stride = max(1, n//n_cand)): seed = lowest
    candidate vec_id, then k−1 rounds of "pick the candidate farthest
    from every selected center" (cosine distance as half-up micro ints,
    ties to the lowest vec_id — each engine replays the identical
    integer recursion, so the greedy trajectory is bit-reproducible).
    Assignment then maps EVERY embedding to its nearest center (min
    dist_micro, tie lowest center id) and folds per-center counts and
    distance mass.

    Output: (step, center_id, sel_dist_micro, n_assigned,
    sum_dist_micro); sel_dist_micro is the candidate's min-distance to
    the previously selected set at pick time (−1 for the seed) — the
    k-center radius curve a data-pruning run reads coverage off.

    Scale shape: greedy k-center is inherently sequential in k, so the
    selection is a driver fold over a BOUNDED candidate matrix (the
    standard sample-then-select coreset recipe; the candidate scan is
    the only corpus pass and ships k·dim floats per block at most);
    assignment is one broadcast (k×dim matrix via ray.put) matmul per
    batch with per-block bounded partials — no shuffle wider than k
    keys ever exists."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    n_total = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    stride = max(1, n_total // n_cand)

    ds = _read_embeddings(sf_dir)

    def cand_partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids % stride == 0
        return t.filter(pa.array(keep))

    cand_tables = [
        tb
        for tb in map(
            ray.get,
            ds.map_batches(cand_partial, batch_format="pyarrow").to_arrow_refs(),
        )
        if tb.num_rows
    ]
    cand = pa.concat_tables(cand_tables).combine_chunks().sort_by("vec_id")
    cids = cand["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cm = _normalize_rows(embedding_matrix(cand["embedding"]).astype(np.float64))
    # all-pairs candidate distances as half-up micro ints (M x M bounded)
    micro = np.floor(cm @ cm.T * 1_000_000 + 0.5).astype(np.int64)
    dist = 1_000_000 - micro

    k_eff = min(k, len(cids))
    sel_idx = [0]  # seed: lowest candidate vec_id (cand is id-sorted)
    sel_d = [-1]
    mind = dist[0].copy()
    for _ in range(1, k_eff):
        j = int(np.argmax(mind))  # first max == lowest vec_id on ties
        sel_idx.append(j)
        sel_d.append(int(mind[j]))
        mind = np.minimum(mind, dist[j])

    center_ids = cids[sel_idx]
    # assignment matrix ordered by center vec_id so argmin ties pick
    # the lowest center id (matches the SQL ORDER BY dist, vec_id)
    order = np.argsort(center_ids, kind="stable")
    a_ids = center_ids[order]
    a_mat = cm[np.array(sel_idx)[order]]
    ref = state.broadcast({"ids": a_ids, "mat": a_mat})

    def assign_partial(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        bm = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
        if bm.size == 0:
            return pa.table(
                {
                    "center_id": pa.array([], pa.int64()),
                    "n_p": pa.array([], pa.int64()),
                    "d_p": pa.array([], pa.int64()),
                }
            )
        dm = 1_000_000 - np.floor(
            bm @ st["mat"].T * 1_000_000 + 0.5
        ).astype(np.int64)
        nearest = np.argmin(dm, axis=1)  # first min == lowest center id
        dbest = dm[np.arange(len(dm)), nearest]
        nb = np.bincount(nearest, minlength=len(st["ids"]))
        db = np.bincount(nearest, weights=dbest, minlength=len(st["ids"]))
        return pa.table(
            {
                "center_id": pa.array(st["ids"], pa.int64()),
                "n_p": pa.array(nb.astype(np.int64), pa.int64()),
                "d_p": pa.array(db.astype(np.int64), pa.int64()),
            }
        )

    n_asg: dict[int, int] = {}
    d_asg: dict[int, int] = {}
    for tb in map(
        ray.get,
        ds.map_batches(assign_partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for c, n, d in zip(
            tb["center_id"].to_pylist(), tb["n_p"].to_pylist(), tb["d_p"].to_pylist()
        ):
            n_asg[c] = n_asg.get(c, 0) + int(n)
            d_asg[c] = d_asg.get(c, 0) + int(d)

    return pa.table(
        {
            "step": pa.array(range(k_eff), pa.int64()),
            "center_id": pa.array(center_ids, pa.int64()),
            "sel_dist_micro": pa.array(sel_d, pa.int64()),
            "n_assigned": pa.array(
                [n_asg.get(int(c), 0) for c in center_ids], pa.int64()
            ),
            "sum_dist_micro": pa.array(
                [d_asg.get(int(c), 0) for c in center_ids], pa.int64()
            ),
        }
    )


def kcenter_coreset_sql(k: int = KCENTER_K, n_cand: int = KCENTER_CANDIDATES) -> str:
    return f"""
WITH RECURSIVE
cand AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id % (SELECT greatest(1, count(*) // {n_cand}) FROM embeddings) = 0
),
dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         1000000 - CAST(floor(list_cosine_similarity(a.e, b.e) * 1000000 + 0.5)
                        AS BIGINT) AS dist
  FROM cand a CROSS JOIN cand b
),
seed AS (SELECT min(vec_id) AS sid FROM cand),
st AS (
  SELECT 0 AS step, c.vec_id, d.dist AS mind
  FROM cand c, seed s, dots d WHERE d.i = s.sid AND d.j = c.vec_id
  UNION ALL
  SELECT s.step + 1, s.vec_id, least(s.mind, d.dist)
  FROM (SELECT step, vec_id, mind,
               first_value(vec_id) OVER (ORDER BY mind DESC, vec_id) AS pick
        FROM st) s
  JOIN dots d ON d.i = s.pick AND d.j = s.vec_id
  WHERE s.step < {k} - 2
),
sel AS (
  SELECT 0 AS step, sid AS center_id, CAST(-1 AS BIGINT) AS sel_dist_micro
  FROM seed
  UNION ALL
  SELECT step + 1, vec_id, mind FROM (
    SELECT step, vec_id, mind,
           row_number() OVER (PARTITION BY step ORDER BY mind DESC, vec_id) AS rn
    FROM st) WHERE rn = 1
),
asg AS (
  SELECT vec_id, center_id, dist FROM (
    SELECT e.vec_id, s.center_id,
           1000000 - CAST(floor(list_cosine_similarity(
               e.embedding::DOUBLE[], c.e) * 1000000 + 0.5) AS BIGINT) AS dist,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY 1000000 - CAST(floor(
                                list_cosine_similarity(e.embedding::DOUBLE[], c.e)
                                * 1000000 + 0.5) AS BIGINT), s.center_id) AS rn
    FROM embeddings e CROSS JOIN sel s JOIN cand c ON c.vec_id = s.center_id
  ) WHERE rn = 1
)
SELECT CAST(s.step AS BIGINT) AS step,
       CAST(s.center_id AS BIGINT) AS center_id,
       s.sel_dist_micro,
       CAST(count(a.vec_id) AS BIGINT) AS n_assigned,
       CAST(coalesce(sum(a.dist), 0) AS BIGINT) AS sum_dist_micro
FROM sel s LEFT JOIN asg a ON a.center_id = s.center_id
GROUP BY 1, 2, 3
ORDER BY step
"""


KCENTER_CORESET_SQL = kcenter_coreset_sql()


# ---------------------------------------------------------------------------
# Maximal-marginal-relevance (MMR) diverse retrieval
# ---------------------------------------------------------------------------

MMR_QUERIES = 2      # queries (first vec_ids)
MMR_CANDIDATES = 48  # relevance-top-N candidate pool per query
MMR_K = 8            # picks per query
MMR_LAMBDA_PM = 700  # relevance weight, permille


def mmr_select(
    sf_dir: str,
    n_queries: int = MMR_QUERIES,
    n_cand: int = MMR_CANDIDATES,
    k: int = MMR_K,
    lambda_pm: int = MMR_LAMBDA_PM,
):
    """Maximal marginal relevance: for each query, greedily pick k
    results maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    picked (Carbonell & Goldstein '98) — the diversity-aware
    re-ranking step of a retrieval/data-selection pipeline.  All
    scores are half-up cosine micro ints and λ is permille, so the
    greedy trajectory is an integer recursion both engines replay
    bit-identically (ties: unpicked first, score desc, vec_id asc).

    Scale shape: the corpus pass is a per-block local top-``n_cand``
    relevance partial (≤ n_queries·n_cand slim rows leave each block,
    embeddings ride along so no second lookup pass); the greedy
    re-rank is a driver fold over the bounded candidate matrix —
    exactly how MMR is deployed at scale (re-rank the retrieved pool,
    never the corpus)."""
    from document_extractor_ray import state

    qt = default_queries(sf_dir, n_queries)
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qm = _normalize_rows(embedding_matrix(qt["embedding"]).astype(np.float64))
    qref = state.broadcast({"ids": q_ids, "mat": qm})

    ds = _read_embeddings(sf_dir)

    def topk_partial(t: pa.Table) -> pa.Table:
        st = state.cached_get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = _normalize_rows(embedding_matrix(t["embedding"]).astype(np.float64))
        out = []
        if bm.size:
            rel = np.floor(bm @ st["mat"].T * 1_000_000 + 0.5).astype(np.int64)
            for qi, qid in enumerate(st["ids"]):
                r = rel[:, qi]
                mask = ids != qid  # the query never retrieves itself
                order = np.lexsort((ids[mask], -r[mask]))[:n_cand]
                sel = np.flatnonzero(mask)[order]
                out.append(
                    pa.table(
                        {
                            "query_id": pa.array(
                                np.full(len(sel), qid), pa.int64()
                            ),
                            "vec_id": pa.array(ids[sel], pa.int64()),
                            "rel_micro": pa.array(r[mask][order], pa.int64()),
                            "embedding": t["embedding"].take(pa.array(sel)),
                        }
                    )
                )
        if not out:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "rel_micro": pa.array([], pa.int64()),
                    "embedding": t["embedding"].slice(0, 0),
                }
            )
        return pa.concat_tables(out)

    parts = [
        tb
        for tb in map(
            ray.get,
            ds.map_batches(topk_partial, batch_format="pyarrow").to_arrow_refs(),
        )
        if tb.num_rows
    ]
    pool = pa.concat_tables(parts).combine_chunks()

    rows = {"query_id": [], "step": [], "vec_id": [], "rel_micro": [],
            "maxsim_micro": [], "mmr_score": []}
    for qid in q_ids:
        sub = pool.filter(pc.equal(pool["query_id"], pa.scalar(int(qid), pa.int64())))
        ids = sub["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rel = sub["rel_micro"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -rel))[:n_cand]  # global top-n_cand merge
        ids, rel = ids[order], rel[order]
        cm = _normalize_rows(
            embedding_matrix(sub["embedding"].take(pa.array(order))).astype(
                np.float64
            )
        )
        sims = np.floor(cm @ cm.T * 1_000_000 + 0.5).astype(np.int64)
        # candidate order for deterministic ties: sort by vec_id
        vid_order = np.argsort(ids, kind="stable")
        ids, rel = ids[vid_order], rel[vid_order]
        sims = sims[np.ix_(vid_order, vid_order)]
        maxsim = np.zeros(len(ids), dtype=np.int64)
        picked = np.zeros(len(ids), dtype=bool)
        for step in range(min(k, len(ids))):
            score = lambda_pm * rel - (1000 - lambda_pm) * maxsim
            masked = np.where(picked, np.iinfo(np.int64).min, score)
            j = int(np.argmax(masked))  # first max == lowest vec_id on ties
            rows["query_id"].append(int(qid))
            rows["step"].append(step)
            rows["vec_id"].append(int(ids[j]))
            rows["rel_micro"].append(int(rel[j]))
            rows["maxsim_micro"].append(int(maxsim[j]))
            rows["mmr_score"].append(int(score[j]))
            picked[j] = True
            maxsim = np.maximum(maxsim, sims[j])
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "step": pa.array(rows["step"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "rel_micro": pa.array(rows["rel_micro"], pa.int64()),
            "maxsim_micro": pa.array(rows["maxsim_micro"], pa.int64()),
            "mmr_score": pa.array(rows["mmr_score"], pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("step", "ascending")])


def mmr_select_sql(
    n_queries: int = MMR_QUERIES,
    n_cand: int = MMR_CANDIDATES,
    k: int = MMR_K,
    lambda_pm: int = MMR_LAMBDA_PM,
) -> str:
    mu = 1000 - lambda_pm
    return f"""
WITH RECURSIVE
qy AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings ORDER BY vec_id LIMIT {n_queries}
),
rel AS (
  SELECT q.query_id, e.vec_id, e.embedding::DOUBLE[] AS ee,
         CAST(floor(list_cosine_similarity(q.qe, e.embedding::DOUBLE[])
                    * 1000000 + 0.5) AS BIGINT) AS rel
  FROM qy q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
),
cand AS (
  SELECT query_id, vec_id, ee, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, vec_id) AS rn
    FROM rel) WHERE rn <= {n_cand}
),
sims AS (
  SELECT a.query_id, a.vec_id AS i, b.vec_id AS j,
         CAST(floor(list_cosine_similarity(a.ee, b.ee) * 1000000 + 0.5)
              AS BIGINT) AS s
  FROM cand a JOIN cand b USING (query_id)
),
st AS (
  SELECT 0 AS step, query_id, vec_id, rel,
         CAST(0 AS BIGINT) AS maxsim, FALSE AS picked
  FROM cand
  UNION ALL
  SELECT s.step + 1, s.query_id, s.vec_id, s.rel,
         greatest(s.maxsim, sim.s),
         s.picked OR s.vec_id = s.pick
  FROM (SELECT *,
               first_value(vec_id) OVER (
                 PARTITION BY query_id
                 ORDER BY picked, {lambda_pm} * rel - {mu} * maxsim DESC,
                          vec_id) AS pick
        FROM st) s
  JOIN sims sim
    ON sim.query_id = s.query_id AND sim.i = s.pick AND sim.j = s.vec_id
  WHERE s.step < {k} - 1
)
SELECT query_id, CAST(step AS BIGINT) AS step, vec_id, rel_micro,
       maxsim_micro, mmr_score
FROM (
  SELECT query_id, step, vec_id, rel AS rel_micro, maxsim AS maxsim_micro,
         CAST({lambda_pm} * rel - {mu} * maxsim AS BIGINT) AS mmr_score,
         row_number() OVER (PARTITION BY query_id, step
                            ORDER BY picked,
                                     {lambda_pm} * rel - {mu} * maxsim DESC,
                                     vec_id) AS rn
  FROM st) WHERE rn = 1
ORDER BY query_id, step
"""


MMR_SELECT_SQL = mmr_select_sql()


# ---------------------------------------------------------------------------
# Int8 quantization error audit (embedding compression planning)
# ---------------------------------------------------------------------------

def embedding_quantize_audit(sf_dir: str):
    """Per-dimension audit of symmetric int8 quantization (scale 127,
    the faiss/SQ8 layout for unit-norm vectors): quantize every
    component, report count, total and max absolute reconstruction
    error, and saturation count per dimension — the table a storage
    planner reads before committing the corpus to int8.

    All arithmetic is integer-exact end to end: component micro
    vi = floor(v·1e6 + 0.5), code q = round_half_up(vi·127 / 1e6)
    (convention-proof floor division, clamped to ±127), error
    |vi·127 − q·1e6| in micro-127ths of full scale.  Scale shape:
    one vectorized pass, per-block (dim × 4) partials, driver fold
    bounded by the dimensionality."""
    ds = _read_embeddings(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_p": pa.array([], pa.int64()),
                    "s_p": pa.array([], pa.int64()),
                    "mx_p": pa.array([], pa.int64()),
                    "sat_p": pa.array([], pa.int64()),
                }
            )
        vi = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        q = np.clip((vi * 127 + 500_000) // 1_000_000, -127, 127)
        err = np.abs(vi * 127 - q * 1_000_000)
        sat = np.abs(q) == 127
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "n_p": pa.array(np.full(d, len(m), dtype=np.int64), pa.int64()),
                "s_p": pa.array(err.sum(axis=0).astype(np.int64), pa.int64()),
                "mx_p": pa.array(err.max(axis=0).astype(np.int64), pa.int64()),
                "sat_p": pa.array(sat.sum(axis=0).astype(np.int64), pa.int64()),
            }
        )

    agg: dict[int, list] = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for d, n, s, mx, st_ in zip(
            tb["dim"].to_pylist(),
            tb["n_p"].to_pylist(),
            tb["s_p"].to_pylist(),
            tb["mx_p"].to_pylist(),
            tb["sat_p"].to_pylist(),
        ):
            cur = agg.setdefault(int(d), [0, 0, 0, 0])
            cur[0] += int(n)
            cur[1] += int(s)
            cur[2] = max(cur[2], int(mx))
            cur[3] += int(st_)
    dims = sorted(agg)
    return pa.table(
        {
            "dim": pa.array(dims, pa.int64()),
            "n_vals": pa.array([agg[d][0] for d in dims], pa.int64()),
            "sum_abs_err": pa.array([agg[d][1] for d in dims], pa.int64()),
            "max_abs_err": pa.array([agg[d][2] for d in dims], pa.int64()),
            "n_saturated": pa.array([agg[d][3] for d in dims], pa.int64()),
        }
    )


# round_half_up(vi*127/1e6) via a floor division immune to the engine's
# negative-division convention: subtract the true non-negative modulus
# first, so the quotient is exact whichever way `//` rounds.
EMBEDDING_QUANTIZE_AUDIT_SQL = """
WITH v AS (
  SELECT CAST(r.d AS BIGINT) AS dim,
         CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS vi
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
q AS (
  SELECT dim, vi,
         greatest(-127, least(127,
           (vi * 127 + 500000
            - (((vi * 127 + 500000) % 1000000 + 1000000) % 1000000))
           // 1000000)) AS code
  FROM v
)
SELECT dim,
       CAST(count(*) AS BIGINT) AS n_vals,
       CAST(sum(abs(vi * 127 - code * 1000000)) AS BIGINT) AS sum_abs_err,
       CAST(max(abs(vi * 127 - code * 1000000)) AS BIGINT) AS max_abs_err,
       CAST(sum(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_saturated
FROM q GROUP BY dim ORDER BY dim
"""


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign-projection distortion audit
# ---------------------------------------------------------------------------

JL_PROJ_DIMS = 16
JL_CANDIDATES = 64


def jl_distortion_audit(
    sf_dir: str, k: int = JL_PROJ_DIMS, n_cand: int = JL_CANDIDATES
):
    """Measured distortion of a deterministic ±1 (Achlioptas)
    projection R^dim → R^k on a stride pair sample: for every
    candidate pair, the exact squared distance and the projected
    squared distance (whose expectation over signs is k·d² — the JL
    guarantee), both as half-up micro ints — the table that says
    whether k is enough before re-encoding the corpus.

    The sign matrix is hash-deterministic (s(d,p) from a
    multiplicative hash of d·k+p), so both engines build the identical
    projection.  Scale shape: the corpus pass is the same bounded
    stride-candidate fold as kcenter_coreset; projection and the
    O(M²) pair table are a driver pass over the bounded sample —
    exactly how a JL parameter sweep is run in practice (audit a
    sample, then project the corpus with one map_batches matmul)."""
    import pyarrow.parquet as pq

    n_total = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    stride = max(1, n_total // n_cand)

    ds = _read_embeddings(sf_dir)

    def cand_partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % stride == 0))

    tables = [
        tb
        for tb in map(
            ray.get,
            ds.map_batches(cand_partial, batch_format="pyarrow").to_arrow_refs(),
        )
        if tb.num_rows
    ]
    cand = pa.concat_tables(tables).combine_chunks().sort_by("vec_id")
    ids = cand["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = embedding_matrix(cand["embedding"]).astype(np.float64)
    dim = m.shape[1]
    keys = np.arange(dim, dtype=np.int64)[:, None] * k + np.arange(k, dtype=np.int64)
    signs = np.where((keys * 2654435761) % 2147483648 % 2 == 0, 1.0, -1.0)
    y = m @ signs  # (M, k)

    n = len(ids)
    ii, jj = np.triu_indices(n, 1)
    d2o = ((m[ii] - m[jj]) ** 2).sum(axis=1)
    d2p = ((y[ii] - y[jj]) ** 2).sum(axis=1)
    return pa.table(
        {
            "vec_a": pa.array(ids[ii], pa.int64()),
            "vec_b": pa.array(ids[jj], pa.int64()),
            "d2_micro": pa.array(
                np.floor(d2o * 1_000_000 + 0.5).astype(np.int64), pa.int64()
            ),
            "d2_proj_micro": pa.array(
                np.floor(d2p * 1_000_000 + 0.5).astype(np.int64), pa.int64()
            ),
        }
    )


def jl_distortion_audit_sql(
    k: int = JL_PROJ_DIMS, n_cand: int = JL_CANDIDATES
) -> str:
    return f"""
WITH cand AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE vec_id % (SELECT greatest(1, count(*) // {n_cand}) FROM embeddings) = 0
),
sgn AS (
  SELECT d.d, p.p,
         CASE WHEN ((d.d * {k} + p.p) * 2654435761) % 2147483648 % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM range(0, 256) d(d) CROSS JOIN range(0, {k}) p(p)
),
proj AS (
  SELECT c.vec_id, s.p, sum(c.e[CAST(s.d AS INTEGER) + 1] * s.s) AS y
  FROM cand c JOIN sgn s ON s.d < len(c.e)
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, a.e AS ea, b.e AS eb
  FROM cand a JOIN cand b ON a.vec_id < b.vec_id
),
d2o AS (
  SELECT va, vb,
         sum((ea[CAST(d.d AS INTEGER) + 1] - eb[CAST(d.d AS INTEGER) + 1])
             * (ea[CAST(d.d AS INTEGER) + 1] - eb[CAST(d.d AS INTEGER) + 1]))
           AS d2
  FROM pairs, range(0, 256) d(d)
  WHERE d.d < len(ea)
  GROUP BY 1, 2
),
d2p AS (
  SELECT p.va, p.vb, sum((pa.y - pb.y) * (pa.y - pb.y)) AS d2
  FROM (SELECT va, vb FROM pairs) p
  JOIN proj pa ON pa.vec_id = p.va
  JOIN proj pb ON pb.vec_id = p.vb AND pb.p = pa.p
  GROUP BY 1, 2
)
SELECT o.va AS vec_a, o.vb AS vec_b,
       CAST(floor(o.d2 * 1000000 + 0.5) AS BIGINT) AS d2_micro,
       CAST(floor(pp.d2 * 1000000 + 0.5) AS BIGINT) AS d2_proj_micro
FROM d2o o JOIN d2p pp ON pp.va = o.va AND pp.vb = o.vb
ORDER BY vec_a, vec_b
"""


JL_DISTORTION_AUDIT_SQL = jl_distortion_audit_sql()


# ---------------------------------------------------------------------------
# Scalar-quantization bit-width sweep (4/6/8 bits, one pass)
# ---------------------------------------------------------------------------

QUANT_SWEEP_BITS = (4, 6, 8)


def quantize_bits_sweep(sf_dir: str, bits=QUANT_SWEEP_BITS):
    """Reconstruction-error sweep of symmetric scalar quantization at
    4/6/8 bits over the whole embedding corpus — the bits-vs-quality
    table a storage planner reads next to ``embedding_quantize_audit``
    (which fixes 8 bits and details per-dimension).  All three widths
    are evaluated in ONE pass (PERF-36 rule).  Exactness: component
    micro vi = floor(v·1e6 + ½), code = clamp(round_half_up(vi·S/1e6))
    with S = 2^(b−1)−1 via convention-proof floor division; errors
    ship as the exact numerator |vi·S − code·1e6| plus the
    cross-width-comparable mean_err_nano = 10⁹·Σerr // (S·n).

    Scale shape: vectorized per block over the zero-copy embedding
    matrix, (3 widths × 4 counters) partials, driver fold."""
    ds = _read_embeddings(sf_dir)
    scales = [(b, (1 << (b - 1)) - 1) for b in bits]

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        rows = {"bits": [], "n_p": [], "s_p": [], "mx_p": [], "sat_p": []}
        if m.size:
            vi = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
            for b, s in scales:
                num = vi * s + 500_000
                q = np.clip((num - ((num % 1_000_000 + 1_000_000) % 1_000_000))
                            // 1_000_000, -s, s)
                err = np.abs(vi * s - q * 1_000_000)
                rows["bits"].append(b)
                rows["n_p"].append(vi.size)
                rows["s_p"].append(int(err.sum()))
                rows["mx_p"].append(int(err.max()))
                rows["sat_p"].append(int((np.abs(q) == s).sum()))
        return pa.table(
            {
                "bits": pa.array(rows["bits"], pa.int64()),
                "n_p": pa.array(rows["n_p"], pa.int64()),
                "s_p": pa.array(rows["s_p"], pa.int64()),
                "mx_p": pa.array(rows["mx_p"], pa.int64()),
                "sat_p": pa.array(rows["sat_p"], pa.int64()),
            }
        )

    agg: dict = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for b, n, s, mx, st_ in zip(
            tb["bits"].to_pylist(), tb["n_p"].to_pylist(), tb["s_p"].to_pylist(),
            tb["mx_p"].to_pylist(), tb["sat_p"].to_pylist(),
        ):
            cur = agg.setdefault(b, [0, 0, 0, 0])
            cur[0] += n
            cur[1] += s
            cur[2] = max(cur[2], mx)
            cur[3] += st_

    out_bits = sorted(agg)
    mean_nano = [
        (1_000_000_000 * agg[b][1]) // (((1 << (b - 1)) - 1) * agg[b][0])
        if agg[b][0]
        else 0
        for b in out_bits
    ]
    return pa.table(
        {
            "bits": pa.array(out_bits, pa.int64()),
            "n_vals": pa.array([agg[b][0] for b in out_bits], pa.int64()),
            "sum_abs_err": pa.array([agg[b][1] for b in out_bits], pa.int64()),
            "max_abs_err": pa.array([agg[b][2] for b in out_bits], pa.int64()),
            "n_saturated": pa.array([agg[b][3] for b in out_bits], pa.int64()),
            "mean_err_nano": pa.array(mean_nano, pa.int64()),
        }
    )


def _quant_sweep_sql(bits=QUANT_SWEEP_BITS) -> str:
    values = ", ".join(f"({b}, {(1 << (b - 1)) - 1})" for b in bits)
    return f"""
WITH v AS (
  SELECT CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS vi
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
w(bits, s) AS (VALUES {values}),
q AS (
  SELECT w.bits, w.s, v.vi,
         greatest(-w.s, least(w.s,
           (v.vi * w.s + 500000
            - (((v.vi * w.s + 500000) % 1000000 + 1000000) % 1000000))
           // 1000000)) AS code
  FROM v CROSS JOIN w
),
a AS (
  SELECT bits, s,
         CAST(count(*) AS BIGINT) AS n_vals,
         CAST(sum(abs(vi * s - code * 1000000)) AS BIGINT) AS sum_abs_err,
         CAST(max(abs(vi * s - code * 1000000)) AS BIGINT) AS max_abs_err,
         CAST(sum(CASE WHEN abs(code) = s THEN 1 ELSE 0 END) AS BIGINT)
           AS n_saturated
  FROM q GROUP BY 1, 2
)
SELECT CAST(bits AS BIGINT) AS bits, n_vals, sum_abs_err, max_abs_err,
       n_saturated,
       CAST(CASE WHEN n_vals = 0 THEN 0 ELSE
         (1000000000::HUGEINT * sum_abs_err) // (s::HUGEINT * n_vals)
       END AS BIGINT) AS mean_err_nano
FROM a ORDER BY bits
"""


QUANTIZE_BITS_SWEEP_SQL = _quant_sweep_sql()


# ---------------------------------------------------------------------------
# Top-m sparsification energy audit
# ---------------------------------------------------------------------------

SPARSIFY_TOP_M = 32


def embedding_sparsify_audit(sf_dir: str, m: int = SPARSIFY_TOP_M):
    """How much L1 energy survives keeping only the top-m components
    per vector (|value| desc, dimension asc on ties — the exact rule
    both engines share)?  Emits the retained-energy distribution in
    ppm deciles — the table that decides whether sparse storage of the
    embedding corpus is viable.  Component micro = floor(v·1e6 + ½);
    retained ppm is one truncating rational per vector.

    Scale shape: fully vectorized per block over the zero-copy matrix
    (np.argpartition per row, no Python loop), bounded (band → count,
    Σppm) fold on the driver."""
    ds = _read_embeddings(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        mat = embedding_matrix(t["embedding"]).astype(np.float64)
        if mat.size == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "n_p": pa.array([], pa.int64()),
                    "ppm_p": pa.array([], pa.int64()),
                }
            )
        vi = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        av = np.abs(vi)
        d = mat.shape[1]
        # composite key: (|vi| desc, dim asc) == descending (av*1024 - dim)
        comp = av * 1024 - np.arange(d, dtype=np.int64)[None, :]
        keep = min(m, d)
        idx = np.argpartition(-comp, keep - 1, axis=1)[:, :keep]
        retained = np.take_along_axis(av, idx, axis=1).sum(axis=1)
        total = av.sum(axis=1)
        ppm = (1_000_000 * retained) // total
        band = ppm // 100_000
        g = pa.TableGroupBy(
            pa.table(
                {
                    "band": pa.array(band, pa.int64()),
                    "ppm": pa.array(ppm, pa.int64()),
                }
            ),
            ["band"],
        ).aggregate([("ppm", "sum"), ([], "count_all")])
        return pa.table(
            {
                "band": g["band"],
                "n_p": pc.cast(g["count_all"], pa.int64()),
                "ppm_p": g["ppm_sum"],
            }
        )

    acc: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for b, n, s in zip(
            t["band"].to_pylist(), t["n_p"].to_pylist(), t["ppm_p"].to_pylist()
        ):
            cur = acc.setdefault(b, [0, 0])
            cur[0] += n
            cur[1] += s

    bands = sorted(acc)
    return pa.table(
        {
            "band": pa.array(bands, pa.int64()),
            "n_vectors": pa.array([acc[b][0] for b in bands], pa.int64()),
            "sum_ppm": pa.array([acc[b][1] for b in bands], pa.int64()),
        }
    )


EMBEDDING_SPARSIFY_AUDIT_SQL = f"""
WITH v AS (
  SELECT e.vec_id, CAST(r.d AS BIGINT) AS d,
         abs(CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT)) AS av
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
rk AS (
  SELECT vec_id, av,
         row_number() OVER (PARTITION BY vec_id ORDER BY av DESC, d) AS rn
  FROM v
),
p AS (
  SELECT vec_id,
         CAST(sum(av) FILTER (WHERE rn <= {SPARSIFY_TOP_M}) AS BIGINT)
           AS retained,
         CAST(sum(av) AS BIGINT) AS total
  FROM rk GROUP BY 1
),
b AS (
  SELECT (1000000 * retained) // total AS ppm FROM p
)
SELECT CAST(ppm // 100000 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(ppm) AS BIGINT) AS sum_ppm
FROM b GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Linear-kernel MMD between label groups (mean-embedding distance)
# ---------------------------------------------------------------------------

def embedding_mmd_labels(sf_dir: str):
    """Pairwise maximum mean discrepancy with the LINEAR kernel
    between label groups — MMD² = ‖μ_a − μ_b‖², the two-sample
    drift statistic over embedding distributions, exact as ONE integer
    rational per pair: Σ_d (S_a·n_b − S_b·n_a)² / (n_a·n_b)² over
    micro-quantized component sums.

    Scale shape: per-block (label, dim) micro-sum partials (the
    label_centroids fold — bounded by labels × dims); all 45 pairs
    are driver integer math over that bounded table."""
    ds = _read_embeddings(sf_dir, with_label=True)

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        vi = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, vi)
        counts = np.bincount(inv).astype(np.int64)
        labels = np.repeat(uniq, d + 1)
        dims = np.tile(np.r_[np.arange(d, dtype=np.int64), -1], len(uniq))
        vals = np.concatenate(
            [np.r_[sums[i], counts[i]] for i in range(len(uniq))]
        )
        return pa.table(
            {
                "label": pa.array(labels, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "s": pa.array(vals, pa.int64()),
            }
        )

    sums: dict = {}
    counts: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for la, dd, s in zip(
            t["label"].to_pylist(), t["dim"].to_pylist(), t["s"].to_pylist()
        ):
            if dd == -1:
                counts[la] = counts.get(la, 0) + s
            else:
                key = (la, dd)
                sums[key] = sums.get(key, 0) + s

    labels = sorted(counts)
    dims = sorted({dd for _, dd in sums})
    rows = []
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            na, nb = counts[la], counts[lb]
            num = sum(
                (sums.get((la, dd), 0) * nb - sums.get((lb, dd), 0) * na) ** 2
                for dd in dims
            )
            den = (na * nb) ** 2
            rows.append((la, lb, na, nb, (1_000_000 * num) // den))
    return pa.table(
        {
            "label_a": pa.array([r[0] for r in rows], pa.int64()),
            "label_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "mmd2_micro": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


EMBEDDING_MMD_LABELS_SQL = """
WITH v AS (
  SELECT e.label, CAST(r.d AS BIGINT) AS d,
         CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS vi
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
s AS (SELECT label, d, CAST(sum(vi) AS BIGINT) AS s FROM v GROUP BY 1, 2),
n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
pairs AS (
  SELECT a.label AS la, a.n AS na, b.label AS lb, b.n AS nb
  FROM n a JOIN n b ON a.label < b.label
),
agg AS (
  SELECT p.la, p.lb, p.na, p.nb,
         sum((sa.s::HUGEINT * p.nb - sb.s::HUGEINT * p.na)
             * (sa.s::HUGEINT * p.nb - sb.s::HUGEINT * p.na)) AS num
  FROM pairs p
  JOIN s sa ON sa.label = p.la
  JOIN s sb ON sb.label = p.lb AND sb.d = sa.d
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
       na AS n_a, nb AS n_b,
       CAST((1000000::HUGEINT * num)
            // ((na::HUGEINT * nb) * (na::HUGEINT * nb)) AS BIGINT)
         AS mmd2_micro
FROM agg ORDER BY label_a, label_b
"""


# ---------------------------------------------------------------------------
# Fisher-discriminant score per embedding dimension
# ---------------------------------------------------------------------------

FISHER_TOP_DIMS = 8


def embedding_fisher_dims(sf_dir: str, k: int = FISHER_TOP_DIMS):
    """Top-k embedding dimensions by the Fisher discriminant score
    (between-label variance over within-label variance, the ANOVA F
    shape per dimension) — the feature-selection table a probing
    classifier reads.  SS terms are milli-scaled truncating rationals
    (the value_anova_by_type convention); ties break on dimension.

    Scale shape: ONE pass folds (label, dim) → (n, Σv, Σv²) partials
    (bounded by labels × dims); the per-dim F ranking is driver
    integer math."""
    ds = _read_embeddings(sf_dir, with_label=True)

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        if m.size == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "s2": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        vi = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        d = m.shape[1]
        s = np.zeros((len(uniq), d), np.int64)
        s2 = np.zeros((len(uniq), d), np.int64)
        np.add.at(s, inv, vi)
        np.add.at(s2, inv, vi * vi)
        n = np.bincount(inv).astype(np.int64)
        labels = np.repeat(uniq, d)
        dims = np.tile(np.arange(d, dtype=np.int64), len(uniq))
        return pa.table(
            {
                "label": pa.array(labels, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "s": pa.array(s.ravel(), pa.int64()),
                "s2": pa.array(s2.ravel(), pa.int64()),
                "n": pa.array(np.repeat(n, d), pa.int64()),
            }
        )

    acc: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for la, dd, s, s2, n in zip(
            t["label"].to_pylist(), t["dim"].to_pylist(), t["s"].to_pylist(),
            t["s2"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = acc.setdefault((la, dd), [0, 0, 0])
            cur[0] += s
            cur[1] += s2
            cur[2] += n

    dims = sorted({dd for _, dd in acc})
    labels = sorted({la for la, _ in acc})
    rows = []
    for dd in dims:
        cells = [acc[(la, dd)] for la in labels if (la, dd) in acc]
        n_tot = sum(c[2] for c in cells)
        s_tot = sum(c[0] for c in cells)
        s2_tot = sum(c[1] for c in cells)
        grp = sum((1000 * c[0] * c[0]) // c[2] for c in cells)
        ssb = grp - (1000 * s_tot * s_tot) // n_tot
        ssw = 1000 * s2_tot - grp
        df_b, df_w = len(cells) - 1, n_tot - len(cells)
        f = (1_000_000 * ssb * df_w) // (ssw * df_b) if df_b > 0 and ssw > 0 else 0
        rows.append((dd, ssb, ssw, f))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:k]
    return pa.table(
        {
            "dim": pa.array([r[0] for r in rows], pa.int64()),
            "ssb_milli": pa.array([r[1] for r in rows], pa.int64()),
            "ssw_milli": pa.array([r[2] for r in rows], pa.int64()),
            "f_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


EMBEDDING_FISHER_DIMS_SQL = f"""
WITH v AS (
  SELECT e.label, CAST(r.d AS BIGINT) AS d,
         CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS vi
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
g AS (
  SELECT d, label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(vi) AS BIGINT) AS s,
         CAST(sum(vi * vi) AS BIGINT) AS s2
  FROM v GROUP BY 1, 2
),
t AS (
  SELECT d, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_tot,
         CAST(sum(s) AS BIGINT) AS s_tot,
         sum(s2) AS s2_tot,
         CAST(sum((1000::HUGEINT * s * s) // n) AS HUGEINT) AS grp
  FROM g GROUP BY 1
),
x AS (
  SELECT d,
         grp - (1000::HUGEINT * s_tot * s_tot) // n_tot AS ssb,
         1000::HUGEINT * s2_tot - grp AS ssw,
         k - 1 AS df_b, n_tot - k AS df_w
  FROM t
),
f AS (
  SELECT d AS dim, CAST(ssb AS BIGINT) AS ssb_milli,
         CAST(ssw AS BIGINT) AS ssw_milli,
         CAST(CASE WHEN df_b > 0 AND ssw > 0
                   THEN (1000000::HUGEINT * ssb * df_w) // (ssw * df_b)
                   ELSE 0 END AS BIGINT) AS f_micro
  FROM x
)
SELECT dim, ssb_milli, ssw_milli, f_micro
FROM (SELECT *, row_number() OVER (ORDER BY f_micro DESC, dim) AS rn FROM f)
WHERE rn <= {FISHER_TOP_DIMS}
ORDER BY f_micro DESC, dim
"""


# ---------------------------------------------------------------------------
# Dimension-truncation recall audit (cheap-vector retrieval quality)
# ---------------------------------------------------------------------------

TRUNC_DIMS = 16


def dim_truncation_recall(sf_dir: str, k: int = 10, dims: int = TRUNC_DIMS):
    """Retrieval overlap@k between full 64-dim cosine top-k and top-k
    over only the FIRST 16 dims — the measured answer to "can the ANN
    prefilter run on a truncated (4x cheaper, 4x less object-store
    traffic) vector?", per query.  Complements jl_distortion_audit
    (random projection) with the head-dims ablation PCA-ordered
    embeddings make natural.

    Scale shape: two knn_brute passes (broadcast queries, per-block
    partial top-k, driver merge bounded by queries x k x blocks); the
    truncated pass maps each block through one zero-copy list_slice."""
    full = knn_brute(_read_embeddings(sf_dir), default_queries(sf_dir), k=k)

    def truncate(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pc.list_slice(t["embedding"], 0, dims),
            }
        )

    q = default_queries(sf_dir)
    q_tr = pa.table(
        {
            "vec_id": q["vec_id"],
            "embedding": pc.list_slice(q["embedding"], 0, dims),
        }
    )
    trunc = knn_brute(
        _read_embeddings(sf_dir).map_batches(truncate, batch_format="pyarrow"),
        q_tr,
        k=k,
    )
    f_sets: dict = {}
    for r in full.to_pylist():
        f_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    rows = []
    t_sets: dict = {}
    for r in trunc.to_pylist():
        t_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid in sorted(f_sets):
        both = len(f_sets[qid] & t_sets.get(qid, set()))
        rows.append((qid, both, 1000 * both // k))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_overlap": pa.array([r[1] for r in rows], pa.int64()),
            "recall_permille": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DIM_TRUNCATION_RECALL_SQL = f"""
WITH full_k AS ({KNN_BRUTE_SQL.replace('ORDER BY query_id, rank', '')}),
qy AS (
  SELECT vec_id AS query_id, (embedding::DOUBLE[])[1:{TRUNC_DIMS}] AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8
),
st AS (
  SELECT qy.query_id, e.vec_id,
         list_cosine_similarity(qy.qe, (e.embedding::DOUBLE[])[1:{TRUNC_DIMS}])
           AS score
  FROM qy CROSS JOIN embeddings e
),
rt AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM st
),
trunc_k AS (SELECT query_id, vec_id FROM rt WHERE rank <= 10)
SELECT f.query_id,
       CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
       CAST(1000 * count(t.vec_id) // 10 AS BIGINT) AS recall_permille
FROM full_k f
LEFT JOIN trunc_k t ON t.query_id = f.query_id AND t.vec_id = f.vec_id
GROUP BY f.query_id
ORDER BY f.query_id
"""


# ---------------------------------------------------------------------------
# Per-label scatter (within-class variance numerators) of the embeddings
# ---------------------------------------------------------------------------

def label_scatter_stats(sf_dir: str):
    """Within-label scatter of the embedding cloud from sufficient
    statistics only: per label the exact integer
    ``ss_within_num = n·Σ|x|² − |Σx|²`` over milli-quantized
    components (floor(x·1000 + 0.5)) — equal to n² times the
    per-label variance (trace of the covariance); by the pairwise
    identity Σ_{i,j} d²(i,j) = 2·ss_within_num it also yields the
    all-pairs distance mass without ever forming a pair.  The ANOVA
    screen: labels whose scatter dwarfs the rest are incoherent
    classes; near-zero scatter means duplicate-collapsed clusters.

    Milli (not micro) quantization keeps |Σx|² inside int64 up to
    ~4e7 rows per label at 64 dims (documented ceiling; past that the
    driver fold widens to Python ints — partials stay int64 per
    block).

    Scale shape: per-batch (label -> n, per-dim sums, Σ|x|²) partials
    fold on the driver bounded by |labels| x dim; no shuffle."""
    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.sources import read_parquet_clean

    import ray as _ray

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["embedding", "label"],
        override_num_blocks=_n_blocks(),
    )

    def partial(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(m * 1000 + 0.5).astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(labels)
        d = q.shape[1]
        rows = {"label": [], "n": [], "ssq": []}
        dim_sums = []
        for lb in uniq:
            sel = q[labels == lb]
            rows["label"].append(int(lb))
            rows["n"].append(len(sel))
            rows["ssq"].append(int((sel * sel).sum()))
            dim_sums.append(sel.sum(axis=0))
        out = {
            "label": pa.array(rows["label"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "ssq": pa.array(rows["ssq"], pa.int64()),
        }
        ds_arr = np.array(dim_sums, np.int64).reshape(len(uniq), d)
        for j in range(d):
            out[f"s{j}"] = pa.array(ds_arr[:, j], pa.int64())
        return pa.table(out)

    parts = [
        t
        for t in map(
            _ray.get,
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs(),
        )
        if t.num_rows
    ]
    t = pa.concat_tables(parts)
    d = t.num_columns - 3
    g = pa.TableGroupBy(t, ["label"]).aggregate(
        [("n", "sum"), ("ssq", "sum")] + [(f"s{j}", "sum") for j in range(d)]
    )
    labels = g["label"].to_pylist()
    ns = g["n_sum"].to_pylist()
    ssqs = g["ssq_sum"].to_pylist()
    sums = np.stack(
        [g[f"s{j}_sum"].to_numpy(zero_copy_only=False) for j in range(d)], axis=1
    )
    order = np.argsort(labels)
    out_rows = []
    for i in order:
        n, ssq = int(ns[i]), int(ssqs[i])
        norm2 = int((sums[i].astype(object) ** 2).sum())
        out_rows.append((int(labels[i]), n, ssq, n * ssq - norm2))
    return pa.table(
        {
            "label": pa.array([r[0] for r in out_rows], pa.int64()),
            "n": pa.array([r[1] for r in out_rows], pa.int64()),
            "sumsq_milli2": pa.array([r[2] for r in out_rows], pa.int64()),
            "ss_within_num": pa.array([r[3] for r in out_rows], pa.int64()),
        }
    )


LABEL_SCATTER_SQL = """
WITH q AS (
  SELECT e.label, r.d AS d,
         CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1] AS DOUBLE)
                    * 1000 + 0.5) AS BIGINT) AS q
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
),
per_dim AS (
  SELECT label, d, CAST(sum(q) AS HUGEINT) AS s,
         CAST(sum(q * q) AS HUGEINT) AS ssq
  FROM q GROUP BY 1, 2
),
per_label AS (
  SELECT label,
         CAST((SELECT count(*) FROM embeddings e2 WHERE e2.label = per_dim.label)
              AS HUGEINT) AS n,
         CAST(sum(ssq) AS HUGEINT) AS sumsq,
         CAST(sum(s * s) AS HUGEINT) AS norm2
  FROM per_dim GROUP BY label
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(n AS BIGINT) AS n,
       CAST(sumsq AS BIGINT) AS sumsq_milli2,
       CAST(n * sumsq - norm2 AS BIGINT) AS ss_within_num
FROM per_label ORDER BY label
"""


# ---------------------------------------------------------------------------
# Doc length x embedding norm correlation ingredients (cross-table join)
# ---------------------------------------------------------------------------

def doclen_embnorm_corr(sf_dir: str):
    """Exact Pearson ingredients between document length (n_chars)
    and the embedding's quantized squared norm over the vec_id ==
    doc_id inner join — the cross-modal sanity probe (a strong
    length-norm correlation usually means un-normalized vectors
    leaking length into similarity search).  y = (Σ q²) // 1000 with
    q = floor(x·1000 + 0.5) per component (the label_scatter
    quantization; the extra //1000 keeps Σy² in int64 to ~1e8 rows).
    One row: n, sum_x, sum_y, sum_xy, sum_x2, sum_y2 — corr is the
    consumer's division.

    Scale shape: the embeddings side folds each block to (vec_id, y)
    slim pairs; the documents side broadcasts nothing — the join runs
    as a partitioned hash join on the id (both sides pre-slimmed to
    two ints), and the 6 scalar sums fold per block after it."""
    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.functions.bucketing import fold_partials
    from document_extractor_ray.sources import read_parquet_clean

    import ray as _ray

    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        override_num_blocks=_n_blocks(),
    )

    def norm_slim(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(m * 1000 + 0.5).astype(np.int64)
        y = (q * q).sum(axis=1) // 1000
        return pa.table(
            {"vec_id": t["vec_id"], "y": pa.array(y, pa.int64())}
        )

    # embeddings is the smaller side here (2 ints/row after slimming):
    # pull to the driver-broadcast path the dim attaches use
    from document_extractor_ray import state

    side = pa.concat_tables(
        [
            t
            for t in map(
                _ray.get,
                emb.map_batches(norm_slim, batch_format="pyarrow").to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    side_ref = state.broadcast(side)

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"],
        override_num_blocks=_n_blocks(),
    )

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(side_ref)
        t = state.lookup_join(t, "doc_id", d, "vec_id", ["y"])
        t = t.filter(pc.is_valid(t["y"]))
        x = t["n_chars"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sx2": pa.array([int((x * x).sum())], pa.int64()),
                "sy2": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    acc = fold_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        "one",
        ["n", "sx", "sy", "sxy", "sx2", "sy2"],
    )
    n, sx, sy, sxy, sx2, sy2 = acc[1]
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_y": pa.array([sy], pa.int64()),
            "sum_xy": pa.array([sxy], pa.int64()),
            "sum_x2": pa.array([sx2], pa.int64()),
            "sum_y2": pa.array([sy2], pa.int64()),
        }
    )


DOCLEN_EMBNORM_SQL = """
WITH y AS (
  SELECT e.vec_id,
         CAST(sum(CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1]
                                  AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                  * CAST(floor(CAST(e.embedding[CAST(r.d AS INTEGER) + 1]
                                    AS DOUBLE) * 1000 + 0.5) AS BIGINT))
              // 1000 AS BIGINT) AS y
  FROM embeddings e, range(0, 256) r(d)
  WHERE r.d < len(e.embedding)
  GROUP BY e.vec_id
),
j AS (
  SELECT d.n_chars AS x, y.y
  FROM documents d JOIN y ON y.vec_id = d.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * y) AS BIGINT) AS sum_xy,
       CAST(sum(x * x) AS BIGINT) AS sum_x2,
       CAST(sum(y * y) AS BIGINT) AS sum_y2
FROM j
"""


# ---------------------------------------------------------------------------
# Pairwise-cosine histogram over a deterministic vector sample
# ---------------------------------------------------------------------------


def cosine_pair_histogram(sf_dir: str):
    """Distribution of pairwise cosine similarity over a DETERMINISTIC
    hash sample of the embedding corpus (vec_id·2654435761 mod 2³²
    ≡ 0 mod 8 — no RNG state), all ordered pairs a < b within the
    sample, bucketed into 20 width-0.1 bins over [−1, 1] — the
    calibration histogram a semantic-dedup or clustering threshold is
    read off (where does the near-dup mode separate from the bulk?).
    Scores are float64 half-up micro ints (the knn_brute convention,
    oracle-reproducible); bins derive from the SAME integer on both
    engines so float noise cannot flip a bucket.

    Scale shape: the sample fraction is the knob that bounds the
    broadcast matrix; per-batch (sampled-rows × sample) matmul with an
    id mask, 20-bin histogram partials folded on the driver."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_embeddings(sf_dir)
    A1, M32 = 2654435761, 1 << 32

    def keep_mask(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * A1) & (M32 - 1)) % 8 == 0

    sample_tabs = []
    for t in map(ray.get, ds.to_arrow_refs()):
        if not t.num_rows:
            continue
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        sample_tabs.append(t.filter(pa.array(keep_mask(ids))))
    if not sample_tabs or not sum(t.num_rows for t in sample_tabs):
        # No vector passes the deterministic mod-8 sample (tiny /
        # skewed vec_id sets) — the SQL twin's `s` CTE is empty and
        # yields the all-zero 20-bin grid; mirror that (ADVICE r4).
        return pa.table(
            {
                "bin": pa.array(list(range(20)), pa.int64()),
                "lo_micro": pa.array(
                    [-1_000_000 + b * 100_000 for b in range(20)], pa.int64()
                ),
                "n_pairs": pa.array([0] * 20, pa.int64()),
            }
        )
    sample = pa.concat_tables(sample_tabs).combine_chunks()
    s_ids = sample["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_mat = _normalize_rows(
        embedding_matrix(sample["embedding"]).astype(np.float64)
    )
    ref = state.broadcast({"ids": s_ids, "mat": s_mat})

    def partial(t: pa.Table) -> pa.Table:
        s = state.cached_get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = keep_mask(ids)
        if not m.any():
            return pa.table({"bin": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        ids = ids[m]
        mat = _normalize_rows(
            embedding_matrix(t["embedding"]).astype(np.float64)[m]
        )
        sims = mat @ s["mat"].T  # (batch_sampled, n_sample)
        mask = ids[:, None] < s["ids"][None, :]
        micro = np.floor(sims[mask] * 1_000_000 + 0.5).astype(np.int64)
        micro = np.clip(micro, -1_000_000, 1_000_000)
        bins = np.minimum((micro + 1_000_000) // 100_000, 19)
        cnt = np.bincount(bins, minlength=20)
        return pa.table(
            {
                "bin": pa.array(np.arange(20, dtype=np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "bin", "c"
    )
    return pa.table(
        {
            "bin": pa.array(list(range(20)), pa.int64()),
            "lo_micro": pa.array(
                [-1_000_000 + b * 100_000 for b in range(20)], pa.int64()
            ),
            "n_pairs": pa.array(
                [int(acc.get(b, 0)) for b in range(20)], pa.int64()
            ),
        }
    )


COSINE_PAIR_HISTOGRAM_SQL = """
WITH s AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  WHERE (vec_id * 2654435761) % 4294967296 % 8 = 0
),
p AS (
  SELECT least(greatest(
           CAST(floor(list_cosine_similarity(a.e, b.e) * 1000000 + 0.5)
                AS BIGINT), -1000000), 1000000) AS micro
  FROM s a JOIN s b ON a.vec_id < b.vec_id
),
bb AS (SELECT least((micro + 1000000) // 100000, 19) AS bin FROM p),
grid AS (SELECT unnest(generate_series(0, 19)) AS bin)
SELECT CAST(g.bin AS BIGINT) AS bin,
       CAST(-1000000 + g.bin * 100000 AS BIGINT) AS lo_micro,
       CAST(count(bb.bin) AS BIGINT) AS n_pairs
FROM grid g LEFT JOIN bb ON bb.bin = g.bin
GROUP BY g.bin
ORDER BY bin
"""
