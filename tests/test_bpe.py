"""BPE tokenizer training: driver loop == naive recount reference ==
distributed per-merge path; partitioning invariance; application
round-trip."""
from collections import Counter

import pyarrow as pa
import pytest
import ray

from astrologer_ray.pipelines.bpe import (
    END,
    apply_bpe,
    encode_word,
    train_bpe,
    train_bpe_from_vocab,
    word_counts,
)

TEXTS = [
    "the lower the newer the lowest",
    "low low low lower lower newest newest",
    "wider wide widest new newer",
    "a ab abc abcd abcde low",
    "the the the wide wide lowest newest",
]


def _naive_reference(words, counts, num_merges):
    """Textbook BPE: full recount of weighted adjacent pairs per merge,
    (count desc, pair asc) tie-break."""
    vocab = {
        i: (tuple(w[:-1]) + (w[-1] + END,), int(c))
        for i, (w, c) in enumerate(zip(words, counts))
    }
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for syms, c in vocab.values():
            for p in zip(syms, syms[1:]):
                stats[p] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, c))
        for i, (syms, wc) in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            vocab[i] = (tuple(out), wc)
    return merges


def _wc_lists(texts):
    c = Counter(w for t in texts for w in t.split())
    words = sorted(c)
    return words, [c[w] for w in words]


def test_driver_loop_matches_naive_reference():
    words, counts = _wc_lists(TEXTS)
    got = train_bpe_from_vocab(words, counts, 25)
    want = _naive_reference(words, counts, 25)
    assert list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                    got["count"].to_pylist())) == want


def test_train_bpe_partitioning_invariant(ray_session):
    ds1 = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(1)
    ds8 = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(8)
    m1 = train_bpe(ds1, num_merges=20)
    m8 = train_bpe(ds8, num_merges=20)
    assert m1.equals(m8)


def test_distributed_path_matches_driver(ray_session):
    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    drv = train_bpe(ds, num_merges=8, distributed=False)
    dst = train_bpe(ds, num_merges=8, distributed=True)
    assert drv.equals(dst)


def test_word_counts_and_min_count(ray_session):
    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    wc = {r["word"]: r["c"] for r in word_counts(ds).take_all()}
    ref = Counter(w for t in TEXTS for w in t.split())
    assert wc == dict(ref)
    wc2 = {r["word"]: r["c"]
           for r in word_counts(ds, min_count=3).take_all()}
    assert wc2 == {w: c for w, c in ref.items() if c >= 3}


def test_driver_budget_guard(ray_session):
    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    with pytest.raises(RuntimeError, match="driver_word_budget"):
        train_bpe(ds, num_merges=4, distributed=False, driver_word_budget=3)


def test_encode_word_equals_sequential_merge_application():
    words, counts = _wc_lists(TEXTS)
    merges = train_bpe_from_vocab(words, counts, 30)
    ranks = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    rank_map = {p: i for i, p in enumerate(ranks)}
    for w in words + ["unseenword", "x", "lowestest"]:
        syms = tuple(w[:-1]) + (w[-1] + END,)
        for a, b in ranks:  # apply in rank order, textbook-style
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = tuple(out)
        assert tuple(encode_word(w, rank_map)) == syms, w


def test_apply_bpe_round_trip(ray_session):
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    )
    merges = train_bpe(ds, num_merges=15)
    out = apply_bpe(ds, merges, concurrency=2, batch_size=2).take_all()
    assert len(out) == len(TEXTS)
    for row in sorted(out, key=lambda r: r["doc_id"]):
        text = TEXTS[row["doc_id"]]
        toks = row["bpe_tokens"]
        assert row["n_bpe_tokens"] == len(toks)
        assert "text" not in row
        # detokenization: strip END markers, concatenation recovers the
        # pre-token stream exactly
        joined = "".join(toks).replace(END, " ").split()
        assert joined == text.split()
