"""Hashed TF-IDF vectors: numpy reference parity, unit norm,
partitioning invariance, ANN composability."""
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from astrologer_ray.functions.tokenizer import tokenize
from astrologer_ray.pipelines.textstats import (
    TfidfVectorStage,
    _hash_bucket,
    bucket_df,
    hashed_tfidf_vectors,
)
from astrologer_ray.state.bm25 import idf

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "a a a b b c",
    "",
    "fox fox fox dog dog wizards",
]
DIM = 32


def _reference_vectors():
    docs = [tokenize(t, mode="simple") for t in TEXTS]
    df = np.zeros(DIM, dtype=np.int64)
    for toks in docs:
        for b in {_hash_bucket(w, DIM)[0] for w in set(toks)}:
            df[b] += 1
    n = len(TEXTS)
    idf_vec = np.array([idf(n, int(d)) for d in df])
    vecs = np.zeros((n, DIM))
    for i, toks in enumerate(docs):
        for w, c in Counter(toks).items():
            b, s = _hash_bucket(w, DIM)
            vecs[i, b] += s * c
    vecs *= idf_vec
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    np.divide(vecs, norms, out=vecs, where=norms > 0)
    return df, n, vecs


def test_bucket_df_matches_reference(ray_session):
    ds = ray.data.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(TEXTS)]).repartition(3)
    df, n = bucket_df(ds, dim=DIM)
    want_df, want_n, _ = _reference_vectors()
    assert n == want_n
    assert np.array_equal(df, want_df)


def test_vectors_match_reference_and_are_unit_norm(ray_session):
    ds = ray.data.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(TEXTS)])
    out = hashed_tfidf_vectors(ds, dim=DIM, batch_size=2).take_all()
    _, _, want = _reference_vectors()
    got = {r["doc_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in out}
    assert set(got) == set(range(len(TEXTS)))
    for i, v in got.items():
        assert np.allclose(v, want[i], atol=1e-6), i
        nrm = np.linalg.norm(v)
        assert nrm == 0.0 or abs(nrm - 1.0) < 1e-5
    # the empty doc hashes to the zero vector, not NaN
    assert np.all(got[4] == 0.0)
    # text column dropped, id preserved
    assert "text" not in out[0]


def test_partitioning_invariance(ray_session):
    items = [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    a = hashed_tfidf_vectors(ray.data.from_items(items).repartition(1),
                             dim=DIM).take_all()
    b = hashed_tfidf_vectors(ray.data.from_items(items).repartition(6),
                             dim=DIM, batch_size=1).take_all()
    va = {r["doc_id"]: r["embedding"] for r in a}
    vb = {r["doc_id"]: r["embedding"] for r in b}
    assert set(va) == set(vb)
    for i in va:
        assert np.array_equal(va[i], vb[i])


def test_composes_with_ann_brute_topk(ray_session):
    from astrologer_ray.pipelines.ann import ann_brute_topk

    items = [{"vec_id": i, "text": t} for i, t in enumerate(TEXTS)]
    vecs = hashed_tfidf_vectors(ray.data.from_items(items), dim=DIM)
    _, _, ref = _reference_vectors()
    # query with doc 0's own vector: it must rank first with cosine ~1
    res = ann_brute_topk(vecs, queries=ref[0:1], k=3).to_pandas()
    top = res.iloc[0]
    assert int(top["vec_id"]) == 0
    assert abs(float(top["cosine"]) - 1.0) < 1e-6


def test_ann_filter_expr_is_prefilter(ray_session):
    """ES knn.filter semantics: the filter applies BEFORE scoring, so
    top-k holds k matching vectors; every hit satisfies the predicate."""
    import numpy as np
    import ray as _ray

    from astrologer_ray.pipelines.ann import ann_brute_topk

    rng = np.random.default_rng(7)
    V = rng.normal(size=(40, 8)).astype(np.float32)
    items = [{"vec_id": i, "embedding": V[i], "label": i % 3}
             for i in range(40)]
    ds = _ray.data.from_items(items)
    q = V[0:1].astype(np.float64)
    got = ann_brute_topk(ds, queries=q, k=5, filter_expr="label == 1")
    ids = got["vec_id"].to_pylist()
    assert len(ids) == 5 and all(i % 3 == 1 for i in ids)
    # brute reference over the filtered subset
    keep = np.array([i for i in range(40) if i % 3 == 1])
    Vn = V[keep] / np.linalg.norm(V[keep], axis=1, keepdims=True)
    qn = (q / np.linalg.norm(q))[0]
    sims = Vn @ qn
    order = sorted(range(len(keep)), key=lambda j: (-sims[j], keep[j]))[:5]
    assert ids == [int(keep[j]) for j in order]
