"""BM25 scoring (k1=1.2, b=0.75) + the brute-force oracle.

The reference relies on Elasticsearch's default Lucene BM25 for relevance
order (SURVEY §1.1); here the formula is owned natively and the brute-force
oracle is the golden ground truth for rank-identical tests (SURVEY §5.2):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))          (Lucene idf)
    w(t, d)  = idf * (tf * (k1+1)) / (tf + k1 * (1 - b + b*dl/avgdl))
    score(d) = sum over *sorted unique* query terms of w(t, d)

Bit-identical floats between engine and oracle are guaranteed by sharing the
same expression tree (``bm25_term_weight``) in IEEE float64 and summing term
contributions in the same (sorted-term) order — float addition is not
associative, so the order is part of the contract (SURVEY §7 hard part (a)).
Only documents matching >=1 query term are returned (ES semantics); ties
break by ascending doc_id.
"""

from __future__ import annotations

import math

import numpy as np

from astrologer_ray import B, K1


def idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_term_weight(idf_t, tf, dl, avgdl, k1: float = K1, b: float = B):
    """One term's BM25 contribution. Works on scalars or numpy arrays —
    the SAME expression tree everywhere, so engine == oracle bit-for-bit."""
    return idf_t * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def oracle_topk(
    contents: list[str],
    query_terms: list[str],
    k: int = 10,
    *,
    mode: str = "code",
    k1: float = K1,
    b: float = B,
    doc_ids: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
    avgdl: float | None = None,
    n_docs: int | None = None,
    boosts: dict[str, float] | None = None,
) -> list[tuple[int, float]]:
    """Brute-force BM25 top-k over raw contents (pure python/numpy).

    ``contents`` must be in doc_id order (index i == doc_id i unless
    ``doc_ids`` given). ``allowed`` is an optional boolean mask (term
    filters, e.g. lang). ``avgdl``/``n_docs`` default to this corpus's own —
    pass them when scoring a subset against a larger index's stats.
    ``boosts`` maps term -> query-time boost, applied as weight*boost
    (the engine's association, so floats stay bit-identical).
    """
    from astrologer_ray.functions.tokenizer import token_counts

    counters = [token_counts(c or "", mode=mode) for c in contents]
    n = len(contents)
    if n_docs is None:
        n_docs = n
    dls = np.array([sum(c.values()) for c in counters], dtype=np.float64)
    if avgdl is None:
        avgdl = float(dls.sum() / n_docs) if n_docs else 0.0

    scores = np.zeros(n, dtype=np.float64)
    matched = np.zeros(n, dtype=bool)
    for t in sorted(set(query_terms)):
        tf = np.array([c.get(t, 0) for c in counters], dtype=np.float64)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        has = tf > 0
        w = np.zeros(n, dtype=np.float64)
        idf_t = idf(n_docs, df)
        w[has] = bm25_term_weight(idf_t, tf[has], dls[has], avgdl, k1, b)
        if boosts and t in boosts:
            w[has] = w[has] * float(boosts[t])
        scores += w
        matched |= has

    if allowed is not None:
        matched &= np.asarray(allowed, dtype=bool)
    ids = np.flatnonzero(matched)
    if doc_ids is not None:
        out_ids = np.asarray(doc_ids)[ids]
    else:
        out_ids = ids
    order = np.lexsort((out_ids, -scores[ids]))[:k]
    return [(int(out_ids[i]), float(scores[ids[i]])) for i in order]
