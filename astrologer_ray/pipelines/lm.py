"""N-gram language model training + perplexity scoring.

The CCNet-style quality filter (Wenzek et al. 2020, "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data" — which scores
web text with a KenLM n-gram model and drops the worst-perplexity
tail): train an n-gram LM on an in-domain corpus, score every candidate
document's perplexity under it, filter on the score.  Scoring uses
stupid backoff (Brants et al. 2007, "Large Language Models in Machine
Translation") — at web scale backoff weights need no normalization:

    S(w | ctx)  = count(ctx w) / count(ctx)      if count(ctx w) > 0
                = alpha * S(w | shorter ctx)      otherwise (alpha = 0.4)
    S(w)        = count(w) / total_tokens         (unigram base)
    OOV         = floor probability (1 / (total_tokens + 1))

Scale shape:

- **Training is one combiner shuffle per order** (same discipline as
  ``textstats.ngram_topk``): each batch pre-aggregates its n-gram
  counts into ``(gram, c)`` partial rows, one ``groupby(gram).sum``
  reduces.  ``min_count`` prunes the Zipf tail BEFORE the model ships;
  ``model_row_budget`` is an explicit guard (the dedup-pipeline budget
  contract) against broadcasting an unbounded table.
- **Scoring is an actor-pool map_batches stage**: the count dicts build
  once per actor from the broadcast model table; each doc scores with a
  vectorized-enough tight loop over its token stream and emits
  ``log10_prob_per_token`` + ``ppl``.  Documents never shuffle.

Determinism: counts are exact integers and scoring is a pure function
of (model, text), so scores are independent of partitioning and
parallelism (property-tested).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

ALPHA = 0.4  # the stupid-backoff constant from Brants et al. 2007

MODEL_SCHEMA = pa.schema(
    [("order", pa.int8()), ("gram", pa.string()), ("c", pa.int64())]
)
SEP = "\x1f"  # joins tokens inside a gram key; cannot appear in tokens


# simple-mode batch tokenization shared with the duplicate-span scanner
from astrologer_ray.functions.tokenizer import (  # noqa: E402
    flat_simple_tokens as _flat_simple_tokens,
)


def _count_ngrams_vec(
    inv: np.ndarray, uniq: pa.Array, doc_of_tok: np.ndarray, n: int
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Count all 1..n-grams of the factorized token stream with packed-key
    hash factorization per order (iterative grouped-rank: the (k)-gram id
    at position i packs the (k-1)-gram id with the k-th token id into one
    int64 — both sides are < 2^32 per batch).  Windows never cross
    document boundaries.  Gram STRINGS materialize once per distinct
    gram via Arrow take + binary_join_element_wise (C kernels), from a
    representative position — gram strings NEVER materialize as Python
    objects (returned as Arrow arrays)."""
    import pandas as pd

    orders: list[np.ndarray] = []
    grams: list[pa.Array] = []
    counts: list[np.ndarray] = []
    L = len(inv)
    empty = (np.empty(0, np.int8), pa.array([], pa.string()),
             np.empty(0, np.int64))
    if L == 0:
        return empty
    prev_ids = inv          # (k-1)-gram id at each start position
    prev_valid = np.ones(L, dtype=bool)
    for k in range(1, n + 1):
        m = L - k + 1
        if m <= 0:
            break
        if k == 1:
            ids, valid, codes, vpos = inv, prev_valid, inv, None
            cnt = np.bincount(inv, minlength=len(uniq))
        else:
            # window i..i+k-1 stays in one doc iff its (k-1)-prefix does
            # and position i+k-1 is still the same doc (doc ids are
            # non-decreasing along the stream)
            valid = prev_valid[:m] & (doc_of_tok[:m] == doc_of_tok[k - 1:])
            key = (prev_ids[:m] << 32) | inv[k - 1:]
            vpos = np.flatnonzero(valid)
            if len(vpos) == 0:
                break
            # hash-based factorize: O(m), no sort (np.unique's argsort
            # was 2x the whole kernel); codes are first-appearance ids
            codes, _uq = pd.factorize(key[vpos])
            cnt = np.bincount(codes)
            ids = np.empty(m, dtype=np.int64)
            ids[valid] = codes
            ids[~valid] = -1
        # first-occurrence representative per distinct gram: reversed
        # fancy store — the LAST write per code wins, which walking the
        # stream backwards is the FIRST occurrence
        rep = np.empty(len(cnt), dtype=np.int64)
        if vpos is None:
            rep[codes[::-1]] = np.arange(L - 1, -1, -1)
        else:
            rep[codes[::-1]] = vpos[::-1]
        # distinct gram strings from representative positions — Arrow
        # take + join kernels, so even the per-DISTINCT-gram work is C
        parts = [uniq.take(pa.array(inv[rep + j], pa.int64()))
                 for j in range(k)]
        g = parts[0] if k == 1 else \
            pc.binary_join_element_wise(*parts, SEP)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        orders.append(np.full(len(rep), k, dtype=np.int8))
        grams.append(g)
        counts.append(cnt.astype(np.int64, copy=False))
        prev_ids, prev_valid = ids, (valid if k > 1 else prev_valid)
    if not orders:
        return empty
    return (np.concatenate(orders),
            pa.concat_arrays(grams),
            np.concatenate(counts))


def train_ngram_lm(
    ds: Dataset,
    n: int = 2,
    text_col: str = "text",
    mode: str = "simple",
    min_count: int = 1,
    model_row_budget: int = 20_000_000,
) -> pa.Table:
    """Count 1..n-grams over the corpus; returns the model table
    (order, gram, c) plus a single ``order=0`` row carrying the total
    token count. ``min_count`` prunes orders >= 2 only — unigram counts
    must stay exact for the base distribution."""
    from ray.data.aggregate import Sum

    from astrologer_ray.functions.tokenizer import tokenize

    part_schema = pa.schema(
        [("order", pa.int8()), ("gram", pa.string()), ("c", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        # vectorized CSR n-gram assembly (r4 advice): tokenize the whole
        # batch into one flat factorized id stream + doc attribution,
        # count occurrences with packed-key np.unique per order, and only
        # materialize Python strings for the batch's DISTINCT grams (the
        # combiner exchange rows) — never per occurrence
        if mode == "simple":
            inv, uniq, doc_of_tok = _flat_simple_tokens(t[text_col])
        else:
            flat, doc_l = [], []
            for i, tx in enumerate(t[text_col].to_pylist()):
                toks = tokenize(tx or "", mode=mode)
                flat.extend(toks)
                doc_l.append(len(toks))
            doc_of_tok = np.repeat(
                np.arange(len(doc_l), dtype=np.int64),
                np.asarray(doc_l, dtype=np.int64))
            enc = pc.dictionary_encode(pa.array(flat, pa.string()))
            inv = enc.indices.to_numpy().astype(np.int64)
            uniq = enc.dictionary
        orders, grams, counts = _count_ngrams_vec(inv, uniq, doc_of_tok, n)
        return pa.table(
            {
                "order": pa.concat_arrays(
                    [pa.array([0], pa.int8()), pa.array(orders, pa.int8())]),
                "gram": pa.concat_arrays(
                    [pa.array([""], pa.string()), grams]),
                "c": pa.concat_arrays(
                    [pa.array([len(inv)], pa.int64()),
                     pa.array(counts, pa.int64())]),
            },
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["order", "gram"])
        .aggregate(Sum("c", alias_name="c"))
    )
    if min_count > 1:
        agg = agg.filter(expr=f"order <= 1 or c >= {min_count}")
    nrows = agg.count()
    if nrows > model_row_budget:
        raise RuntimeError(
            f"n-gram model has {nrows} rows > model_row_budget="
            f"{model_row_budget}; raise min_count or the budget"
        )
    import ray

    t = pa.concat_tables(ray.get(agg.to_arrow_refs()))
    return t.sort_by([("order", "ascending"), ("gram", "ascending")])


def _model_dicts(model: pa.Table):
    """order -> {gram: count} plus the total-token count."""
    by_order: dict[int, dict[str, int]] = {}
    total = 0
    for o, g, c in zip(model["order"].to_pylist(),
                       model["gram"].to_pylist(),
                       model["c"].to_pylist()):
        if o == 0:
            total = int(c)
        else:
            by_order.setdefault(int(o), {})[g] = int(c)
    return by_order, total


def score_tokens(
    toks: list[str], by_order: dict[int, dict[str, int]], total: int,
    n: int, alpha: float = ALPHA,
) -> float:
    """Sum of log10 stupid-backoff scores over the token stream (each
    token conditioned on up to n-1 predecessors). Pure function — the
    reference for the distributed stage and the tests."""
    if total <= 0:
        raise ValueError("empty model")
    floor = 1.0 / (total + 1.0)
    uni = by_order.get(1, {})
    lp = 0.0
    for i, w in enumerate(toks):
        score = None
        mult = 1.0
        for k in range(min(n - 1, i), 0, -1):  # longest context first
            ctx = SEP.join(toks[i - k: i])
            num = by_order.get(k + 1, {}).get(ctx + SEP + w)
            if num:
                den = by_order.get(k, {}).get(ctx)
                if den:
                    score = mult * (num / den)
                    break
            mult *= alpha
        if score is None:
            cw = uni.get(w)
            score = mult * (cw / total) if cw else mult * floor
        lp += math.log10(score)
    return lp


class PerplexityStage:
    """Actor-pool scorer: model dicts built once per actor from the
    broadcast model table (object-store constructor arg)."""

    def __init__(self, model: pa.Table, n: int = 2,
                 text_col: str = "text", mode: str = "simple"):
        self.by_order, self.total = _model_dicts(model)
        self.n = n
        self.text_col = text_col
        self.mode = mode

    def __call__(self, t: pa.Table) -> pa.Table:
        from astrologer_ray.functions.tokenizer import tokenize

        lps, ppls, ntoks = [], [], []
        for tx in t[self.text_col].to_pylist():
            toks = tokenize(tx or "", mode=self.mode)
            if not toks:
                lps.append(0.0)
                ppls.append(float("inf"))
                ntoks.append(0)
                continue
            lp = score_tokens(toks, self.by_order, self.total, self.n)
            per_tok = lp / len(toks)
            lps.append(per_tok)
            ppls.append(10.0 ** (-per_tok))
            ntoks.append(len(toks))
        out = {c: t[c] for c in t.column_names if c != self.text_col}
        out["log10_prob_per_token"] = pa.array(lps, pa.float64())
        out["ppl"] = pa.array(ppls, pa.float64())
        out["n_tokens"] = pa.array(ntoks, pa.int64())
        return pa.table(out)


def perplexity_scores(
    ds: Dataset,
    model: pa.Table,
    n: int = 2,
    text_col: str = "text",
    mode: str = "simple",
    concurrency=(1, 8),
    batch_size: int = 512,
) -> Dataset:
    """Score every document's per-token log-probability and perplexity
    under the n-gram model (the CCNet filter signal). Streaming: docs
    never shuffle; the model broadcasts once per actor."""
    return ds.map_batches(
        PerplexityStage,
        fn_constructor_kwargs={
            "model": model, "n": n, "text_col": text_col, "mode": mode,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
