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
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _read_embeddings(sf_dir: str):
    from document_extractor_ray.functions.analytics import _n_blocks

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
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


class BatchTopK:
    """Actor stage: holds the broadcast query matrix; per batch, one
    matmul and a partial top-k per query."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref)
        self.query_ids = q["ids"]
        self.qm = _normalize_rows(q["matrix"]).astype(np.float32)
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
        mat = _normalize_rows(mat)
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
    score) sorted, with deterministic tie-break on vec_id."""
    qids = query_table["vec_id"].to_pylist()
    qm = embedding_matrix(query_table["embedding"])
    ref = ray.put({"ids": qids, "matrix": qm})

    partials = ds.map_batches(
        BatchTopK,
        fn_constructor_kwargs={"query_ref": ref, "k": k},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4096,
    )
    # Merge partial top-ks on the driver: tiny (n_queries * k * n_blocks rows).
    rows = partials.take_all()
    best = {}
    for r in rows:
        best.setdefault(r["query_id"], []).append((-r["score"], r["vec_id"]))
    out_q, out_rank, out_v, out_s = [], [], [], []
    for qid in sorted(best):
        top = heapq.nsmallest(k, best[qid])  # by (-score, vec_id): ties -> lower id
        for rank, (neg, vid) in enumerate(top, 1):
            out_q.append(qid)
            out_rank.append(rank)
            out_v.append(vid)
            out_s.append(round(-neg, 6))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )


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
        def __init__(self):
            state = ray.get(ref)
            self.query_ids = state["ids"]
            self.qm = _normalize_rows(state["matrix"]).astype(np.float32)
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
            mat = _normalize_rows(mat)
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
        LshTopK, batch_format="pyarrow", concurrency=2, batch_size=4096
    )
    rows = partials.take_all()
    best = {}
    for r in rows:
        best.setdefault(r["query_id"], []).append((-r["score"], r["vec_id"]))
    out_q, out_rank, out_v, out_s = [], [], [], []
    for qid in sorted(best):
        top = heapq.nsmallest(k, best[qid])
        for rank, (neg, vid) in enumerate(top, 1):
            out_q.append(qid)
            out_rank.append(rank)
            out_v.append(vid)
            out_s.append(round(-neg, 6))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )


def knn_lsh_embeddings(sf_dir: str, k: int = 10) -> pa.Table:
    return knn_lsh(_read_embeddings(sf_dir), default_queries(sf_dir), k=k)
