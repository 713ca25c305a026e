"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: the (small) query matrix is
broadcast once via ``ray.put``; every batch does one numpy matmul against it
and emits its local top-k — the global top-k is the merge of per-batch
candidates (exact, since per-batch top-k supersets the global winners that
live in that batch). Zero shuffle; O(N·Q·D) compute streamed per batch.

The scale path is ``ann_lsh_topk``: seeded random-hyperplane LSH buckets
vectors; a query probes only its bucket and Hamming-distance-1 neighbor
buckets — approximate, with recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def ann_brute_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qids: np.ndarray | None = None,
) -> pa.Table:
    """Exact cosine top-k: (qid, vec_id, cosine), ties (cosine desc, id asc)."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    if qids is None:
        qids = np.arange(len(Q), dtype=np.int64)
    ref = ray.put(Q)

    class BatchTopK:
        def __init__(self):
            self.Q = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col]).astype(np.int64)
            M = _normalize(
                np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            sims = self.Q @ M.T  # (nq, nb)
            kk = min(k, sims.shape[1])
            out_q, out_i, out_s = [], [], []
            for qi in range(sims.shape[0]):
                s = sims[qi]
                part = np.argpartition(-s, kk - 1)[:kk]
                order = part[np.lexsort((ids[part], -s[part]))]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_i.append(ids[order])
                out_s.append(s[order])
            return pa.table(
                {
                    "q": pa.array(np.concatenate(out_q)),
                    id_col: pa.array(np.concatenate(out_i)),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    cand = ds.map_batches(BatchTopK, batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    rows = []
    for qi in range(len(Q)):
        sub = cand[cand["q"] == qi].sort_values(
            ["cosine", id_col], ascending=[False, True]
        ).head(k)
        for _, r in sub.iterrows():
            rows.append((int(qids[qi]), int(r[id_col]), float(r["cosine"])))
    return pa.table(
        {
            "qid": pa.array([r[0] for r in rows], pa.int64()),
            id_col: pa.array([r[1] for r in rows], pa.int64()),
            "cosine": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def ann_lsh_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 13,
    probe_hamming: int = 1,
) -> pa.Table:
    """Approximate cosine top-k via random-hyperplane LSH bucketing.

    Each vector maps to a ``n_planes``-bit bucket (sign of projection on
    seeded Gaussian hyperplanes). A query scores only vectors in buckets
    within Hamming distance ``probe_hamming`` of its own bucket — at scale
    this is the partition key for the candidate fetch (documented
    partitioning assumption: bucket cardinality 2^n_planes >> #workers).
    """
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qbits = (Q @ planes.T) > 0
    qbuckets = (qbits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)

    # probe set per query: own bucket + hamming-1 neighbors
    probe: list[set[int]] = []
    for qb in qbuckets:
        s = {int(qb)}
        if probe_hamming >= 1:
            for j in range(n_planes):
                s.add(int(qb) ^ (1 << j))
        probe.append(s)
    all_probes = set().union(*probe) if probe else set()

    ref = ray.put((Q, planes, all_probes))

    class BucketTopK:
        def __init__(self):
            self.Q, self.planes, self.all_probes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col]).astype(np.int64)
            M = _normalize(
                np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            bits = (M @ self.planes.T) > 0
            buckets = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
            mask = np.isin(buckets, np.fromiter(self.all_probes, dtype=np.uint64))
            if not mask.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "bucket": pa.array([], pa.int64()),
                                 "cos_cols": pa.array([], pa.list_(pa.float64()))})
            sub = M[mask]
            sims = self.Q @ sub.T
            return pa.table(
                {
                    id_col: pa.array(ids[mask], pa.int64()),
                    "bucket": pa.array(buckets[mask].astype(np.int64)),
                    "cos_cols": pa.array(list(sims.T.astype(np.float64))),
                }
            )

    cand = ds.map_batches(BucketTopK, batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    out_rows = []
    if len(cand):
        ids = cand[id_col].to_numpy().astype(np.int64)
        buckets = cand["bucket"].to_numpy().astype(np.uint64)
        sims = np.stack(cand["cos_cols"].to_numpy())  # (ncand, nq)
        for qi in range(len(Q)):
            m = np.isin(buckets, np.fromiter(probe[qi], dtype=np.uint64))
            if not m.any():
                continue
            s = sims[m, qi]
            cids = ids[m]
            order = np.lexsort((cids, -s))[:k]
            for o in order:
                out_rows.append((qi, int(cids[o]), float(s[o])))
    return pa.table(
        {
            "qid": pa.array([r[0] for r in out_rows], pa.int64()),
            id_col: pa.array([r[1] for r in out_rows], pa.int64()),
            "cosine": pa.array([r[2] for r in out_rows], pa.float64()),
        }
    )
