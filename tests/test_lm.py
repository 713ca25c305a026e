"""N-gram LM + perplexity: exact counts, stupid-backoff reference
parity, partitioning invariance, in-domain < out-of-domain sanity."""
import math
from collections import Counter

import pytest
import ray

from astrologer_ray.functions.tokenizer import tokenize
from astrologer_ray.pipelines.lm import (
    ALPHA,
    SEP,
    PerplexityStage,
    _model_dicts,
    perplexity_scores,
    score_tokens,
    train_ngram_lm,
)

TEXTS = [
    "the cat sat on the mat",
    "the cat ran on the mat",
    "a dog sat on a log",
    "the dog and the cat",
]


def _ref_counts(n):
    counts = Counter()
    total = 0
    for t in TEXTS:
        toks = tokenize(t, mode="simple")
        total += len(toks)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                counts[(k, SEP.join(toks[i:i + k]))] += 1
    return counts, total


def test_training_counts_exact_and_partition_invariant(ray_session):
    want, total = _ref_counts(3)
    for parts in (1, 4):
        ds = ray.data.from_items(
            [{"text": t} for t in TEXTS]).repartition(parts)
        m = train_ngram_lm(ds, n=3)
        got = {
            (o, g): c for o, g, c in zip(
                m["order"].to_pylist(), m["gram"].to_pylist(),
                m["c"].to_pylist()) if o > 0
        }
        assert got == dict(want)
        by_order, tot = _model_dicts(m)
        assert tot == total


def test_stupid_backoff_reference():
    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    m = train_ngram_lm(ds, n=2)
    by_order, total = _model_dicts(m)
    # seen bigram: P(cat | the) = c(the cat)/c(the)
    lp = score_tokens(["the", "cat"], by_order, total, n=2)
    want = math.log10(by_order[1]["the"] / total) + \
        math.log10(by_order[2]["the" + SEP + "cat"] / by_order[1]["the"])
    assert lp == pytest.approx(want, abs=1e-12)
    # unseen bigram, seen unigram: alpha * P(dog)
    lp2 = score_tokens(["mat", "dog"], by_order, total, n=2)
    want2 = math.log10(by_order[1]["mat"] / total) + \
        math.log10(ALPHA * by_order[1]["dog"] / total)
    assert lp2 == pytest.approx(want2, abs=1e-12)
    # OOV word: alpha * floor
    lp3 = score_tokens(["zebra"], by_order, total, n=2)
    assert lp3 == pytest.approx(math.log10(1.0 / (total + 1)), abs=1e-12)


def test_perplexity_stage_matches_reference_and_ranks_domains(ray_session):
    train = ray.data.from_items([{"text": t} for t in TEXTS])
    m = train_ngram_lm(train, n=2)
    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},   # in-domain
        {"doc_id": 1, "text": "zebra quantum flux entropy"},  # garbage
        {"doc_id": 2, "text": ""},                          # empty
    ]
    out = {r["doc_id"]: r for r in perplexity_scores(
        ray.data.from_items(docs), m, n=2, batch_size=1).take_all()}
    by_order, total = _model_dicts(m)
    for d in docs:
        toks = tokenize(d["text"], mode="simple")
        if not toks:
            assert out[d["doc_id"]]["ppl"] == float("inf")
            continue
        lp = score_tokens(toks, by_order, total, n=2) / len(toks)
        assert out[d["doc_id"]]["log10_prob_per_token"] == \
            pytest.approx(lp, abs=1e-12)
        assert out[d["doc_id"]]["ppl"] == pytest.approx(10 ** -lp, rel=1e-12)
    assert out[0]["ppl"] < out[1]["ppl"]  # the CCNet filter signal
    assert "text" not in out[0]


def test_min_count_prunes_tail_only_and_budget_guards(ray_session):
    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    m = train_ngram_lm(ds, n=2, min_count=2)
    orders = m["order"].to_pylist()
    cs = m["c"].to_pylist()
    # unigrams stay exact; bigrams with c < 2 are gone
    assert all(c >= 2 for o, c in zip(orders, cs) if o >= 2)
    want, _ = _ref_counts(1)
    got_uni = {g for o, g in zip(orders, m["gram"].to_pylist()) if o == 1}
    assert got_uni == {g for (k, g) in want if k == 1}
    with pytest.raises(RuntimeError, match="model_row_budget"):
        train_ngram_lm(ds, n=2, model_row_budget=3)
