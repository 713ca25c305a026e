"""Deduplication operators for training-data pipelines.

Exact dedup mirrors the reference's idempotent ``_id`` semantics (dedup by
paging token, SURVEY §2.7 D1); the near-dup family (MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine) is the standard large-corpus toolkit.

Shuffle shape: exact dedup is ONE ``groupby(hash)``; MinHash-LSH is
vectorized signature computation in ``map_batches`` → explode to
(band, band_hash, doc_id) rows → ONE ``groupby(band, band_hash)`` →
candidate pairs → pairwise verification (numpy Jaccard) → connected
components by min-label propagation (driver-side union-find on the
candidate-pair set only, which is small relative to the corpus).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from astrologer_ray.functions.tokenizer import _SIMPLE_RE

# ---------------------------------------------------------------- exact dedup


def dedup_exact(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Groups of identical ``text_col``: keep the min-id row per group.

    Returns (keep_id, n_dups) per distinct text — the survivor row id and
    the group size. One hash-groupby; text itself never shuffles (only its
    sha256 + id).
    """

    def hash_project(t: pa.Table) -> pa.Table:
        h = [
            hashlib.sha256((s or "").encode("utf-8")).hexdigest()
            for s in t[text_col].to_pylist()
        ]
        return pa.table({"h": pa.array(h, pa.string()), id_col: t[id_col]})

    def keep_first(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col]).astype(np.int64)
        return pa.table(
            {
                "keep_id": pa.array([int(ids.min())], pa.int64()),
                "n_dups": pa.array([len(ids)], pa.int64()),
            }
        )

    return (
        ds.map_batches(hash_project, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ------------------------------------------------------------ minhash + LSH


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of k-token shingles (blake2b — stable across runs)."""
    toks = _SIMPLE_RE.findall((text or "").lower())
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in set(shingles)
        ),
        dtype=np.uint64,
        count=len(set(shingles)),
    )
    return out


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """num_perm seeded universal-hash permutations; vectorized per doc."""

    def __init__(self, num_perm: int = 128, seed: int = 7, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (P, S) universal hashing mod a Mersenne prime, min over shingles
        v = (self.a[:, None] * (sh[None, :] & _MERSENNE) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)


class MinHashBands:
    """map_batches stage: text -> (band, band_hash, id) rows for LSH."""

    def __init__(self, text_col="text", id_col="doc_id",
                 num_perm=128, bands=32, seed=7, shingle_k=3):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm=num_perm, seed=seed, shingle_k=shingle_k)
        self.bands = bands
        self.rows = num_perm // bands
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t[self.id_col]).astype(np.int64)
        texts = t[self.text_col].to_pylist()
        band_ids, band_hashes, out_ids = [], [], []
        for i, s in enumerate(texts):
            sig = self.mh.signature(s)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows : (bi + 1) * self.rows]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) >> 1  # fit int64
                band_ids.append(bi)
                band_hashes.append(bh)
                out_ids.append(int(ids[i]))
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                self.id_col: pa.array(out_ids, pa.int64()),
            }
        )


def jaccard(text_a: str, text_b: str, shingle_k: int = 3) -> float:
    a = set(_shingle_hashes(text_a, shingle_k).tolist())
    b = set(_shingle_hashes(text_b, shingle_k).tolist())
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def minhash_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 7,
) -> pa.Table:
    """Near-duplicate clusters via MinHash-LSH.

    Returns (doc_id, cluster_id) for every doc in a verified near-dup
    cluster (cluster_id = min doc_id of the cluster). Candidate pairs from
    band collisions are verified with exact shingle Jaccard >= threshold
    before clustering — LSH alone gives false positives.

    The verification needs the two texts: candidate ids are collected
    driver-side (small), texts fetched via a broadcast id->text lookup of
    ONLY the candidate docs.
    """
    import ray

    banded = ds.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            bands=bands, seed=seed, shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def collect_pairs(g: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(g[id_col]).astype(np.int64))
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        # pair every member with the group min — enough for connectivity
        lo = int(ids.min())
        others = ids[ids != lo]
        return pa.table(
            {"id_a": pa.array(np.full(len(others), lo)), "id_b": pa.array(others)}
        )

    pairs = (
        banded.groupby(["band", "band_hash"])
        .map_groups(collect_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    if len(pairs) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})

    cand_ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    id_set = ray.put(np.asarray(cand_ids, dtype=np.int64))

    def fetch_texts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(t[id_col], value_set=pa.array(ray.get(id_set)))
        sub = t.filter(mask)
        return pa.table({id_col: sub[id_col], text_col: sub[text_col]})

    texts_t = ds.map_batches(fetch_texts, batch_format="pyarrow").to_pandas()
    text_of = dict(zip(texts_t[id_col], texts_t[text_col]))

    # verify + union-find over the (small) verified pair set
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for ia, ib in zip(pairs["id_a"], pairs["id_b"]):
        if jaccard(text_of[ia], text_of[ib], shingle_k) >= threshold:
            union(int(ia), int(ib))

    clusters: dict[int, list[int]] = {}
    for x in parent:
        clusters.setdefault(find(x), []).append(x)
    rows = [
        (m, root)
        for root, ms in sorted(clusters.items())
        if len(ms) > 1
        for m in sorted(ms)
    ]
    return pa.table(
        {
            id_col: pa.array([m for m, _ in rows], pa.int64()),
            "cluster_id": pa.array([c for _, c in rows], pa.int64()),
        }
    )


# ------------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over simple tokens weighted by tf."""
    toks = _SIMPLE_RE.findall((text or "").lower())
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(), "big")
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for j in range(64):
        if acc[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return int(out)


def simhash_stage(ds: Dataset, text_col: str = "text", keep: list[str] | None = None) -> Dataset:
    keep = keep or []

    def fn(t: pa.Table) -> pa.Table:
        out = {n: t[n] for n in (keep or [c for c in t.column_names if c != text_col])}
        out["simhash"] = pa.array(
            [simhash64(s) >> 1 for s in t[text_col].to_pylist()], pa.int64()
        )  # >>1 keeps it in int64 range for parquet/SQL friendliness
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------- embedding cosine near-dup


def embedding_near_dup_pairs(
    ds: Dataset, vec_col: str = "embedding", id_col: str = "vec_id",
    threshold: float = 0.95,
) -> pa.Table:
    """Brute-force cosine near-dup pairs (id_a < id_b, sim >= threshold).

    The full normalized matrix is broadcast once (``ray.put``); each batch
    multiplies against it (numpy matmul) — O(N^2) compute distributed per
    batch, zero shuffle. The documented scale path is LSH bucketing first
    (pipelines/ann.py) to cut the candidate space.
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = full[id_col].to_numpy().astype(np.int64)
    M = np.stack(full[vec_col].to_numpy())
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M.astype(np.float64)))

    class PairFinder:
        def __init__(self):
            self.ids, self.M = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bids = np.asarray(t[id_col]).astype(np.int64)
            B = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
            B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
            sims = B.astype(np.float64) @ self.M.T
            ii, jj = np.nonzero(sims >= threshold)
            keep = bids[ii] < self.ids[jj]
            return pa.table(
                {
                    "id_a": pa.array(bids[ii][keep], pa.int64()),
                    "id_b": pa.array(self.ids[jj][keep], pa.int64()),
                    "cosine": pa.array(sims[ii, jj][keep], pa.float64()),
                }
            )

    return (
        ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=(1, 8))
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .pipe(pa.Table.from_pandas, preserve_index=False)
    )
