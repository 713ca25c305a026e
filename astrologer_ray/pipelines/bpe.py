"""Distributed BPE tokenizer training + application.

The tokenizer-training op a 100 TB pretraining pipeline needs: learn a
byte-pair-encoding merge table from the corpus, then encode documents
with it.  The reference delegates analysis to Elasticsearch's built-in
analyzers (/root/reference/es/indices.go mappings); a trainable subword
vocabulary is the modern equivalent surface.

Scale shape (the sentencepiece / fastBPE approach):

1. **Word-count shuffle** — the only stage that touches the corpus.
   Each batch pre-aggregates its pre-token counts into ``(word, c)``
   combiner rows (one row per DISTINCT word per batch, never one per
   occurrence), then ONE ``groupby(word).sum`` reduces partials.  The
   weighted dictionary is orders of magnitude smaller than the corpus
   (Heaps' law: ~10^7 distinct words at 10^11 tokens after ``min_count``
   pruning), so everything after this step is dictionary-sized, not
   corpus-sized.
2. **Merge loop over the weighted dictionary** — exact BPE with
   incremental pair statistics (Sennrich et al. 2016, "Neural Machine
   Translation of Rare Words with Subword Units", the learn_bpe
   algorithm): only words containing the merged pair are touched per
   iteration.  Runs on the driver while the dictionary fits
   ``driver_word_budget`` (an explicit knob, same contract as
   ``pipelines/dedup.py`` budgets); beyond it, ``distributed=True``
   re-counts pairs with a ``map_batches`` pass per merge over the
   dictionary Dataset — O(merges) small passes, never a corpus pass.
3. **Application** — an actor-pool ``map_batches`` stage; the merge
   table rides the object store once (zero-copy to every actor), and a
   per-actor word->tokens cache collapses the Zipf head (encoding cost
   is per DISTINCT word per actor, not per occurrence).

Determinism: pair ties break lexicographically ascending, so the merge
sequence is a pure function of the weighted dictionary — independent of
partitioning, batch size, and parallelism (property-tested).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
from ray.data import Dataset

END = "</w>"  # end-of-word marker: makes detokenization unambiguous

MERGES_SCHEMA = pa.schema(
    [("rank", pa.int64()), ("left", pa.string()), ("right", pa.string()),
     ("count", pa.int64())]
)


# --------------------------------------------------------------- stage 1

def word_counts(
    ds: Dataset,
    text_col: str = "text",
    mode: str = "simple",
    min_count: int = 1,
) -> Dataset:
    """Weighted word dictionary: ``(word, c)`` with total occurrence
    counts, combiner-pre-aggregated per batch before the one shuffle."""
    from ray.data.aggregate import Sum

    from astrologer_ray.functions.tokenizer import tokenize

    part_schema = pa.schema([("word", pa.string()), ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for tx in t[text_col].to_pylist():
            counts.update(tokenize(tx or "", mode=mode))
        if not counts:
            return part_schema.empty_table()
        return pa.table(
            {"word": list(counts.keys()), "c": list(counts.values())},
            schema=part_schema,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
    )
    if min_count > 1:
        out = out.filter(expr=f"c >= {min_count}")
    return out


# ----------------------------------------------------- exact driver loop

def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,)


def _pair_stats(vocab: list[tuple[tuple[str, ...], int]]):
    """Initial pair counts + pair -> {word_id: occurrences} index."""
    stats: Counter = Counter()
    index: dict[tuple[str, str], dict[int, int]] = {}
    for wid, (syms, c) in enumerate(vocab):
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] += c
            index.setdefault((a, b), {})
            index[(a, b)][wid] = index[(a, b)].get(wid, 0) + 1
    return stats, index


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    a, b = pair
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_vocab(
    words: list[str], counts: list[int], num_merges: int
) -> pa.Table:
    """Exact BPE merge learning over a weighted word dictionary with
    incremental pair statistics — per merge, only the words containing
    the merged pair are re-segmented and only their neighbor pairs'
    counts move. Tie-break: (count desc, pair lexicographically asc)."""
    vocab = [(_symbols(w), int(c)) for w, c in zip(words, counts)
             if len(w) > 0]
    stats, index = _pair_stats(vocab)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        for p, c in stats.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair, c = best
        merges.append((pair[0], pair[1], int(c)))
        for wid in list(index.get(pair, ())):
            syms, wc = vocab[wid]
            if wc == 0:
                continue
            new = _merge_word(syms, pair)
            if new == syms:
                continue
            # retract the old adjacencies, add the new ones
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] -= wc
                d = index.get((a, b))
                if d is not None:
                    d.pop(wid, None)
            for a, b in zip(new, new[1:]):
                stats[(a, b)] += wc
                index.setdefault((a, b), {})
                index[(a, b)][wid] = index[(a, b)].get(wid, 0) + 1
            vocab[wid] = (new, wc)
        stats.pop(pair, None)
        index.pop(pair, None)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "count": pa.array([m[2] for m in merges], pa.int64()),
        },
        schema=MERGES_SCHEMA,
    )


# ------------------------------------------------------------- encoding

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy encode: repeatedly merge the lowest-rank
    adjacent pair. Exactly reproduces applying the learned merges in
    rank order (property-tested)."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _ranks(merges: pa.Table) -> dict[tuple[str, str], int]:
    return {
        (l, r): int(k)
        for k, l, r in zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    }


# ------------------------------------------------- distributed fallback

def _distributed_pair_counts(
    wc: Dataset, merges_so_far: list[tuple[str, str]]
) -> pa.Table:
    """One dictionary pass: count weighted adjacent pairs under the
    current segmentation. The merge list rides the closure into the
    object store once; each task re-encodes its words (per-task cache)."""
    ranks = {p: i for i, p in enumerate(merges_so_far)}
    schema = pa.schema(
        [("left", pa.string()), ("right", pa.string()), ("c", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        cache: dict[str, list[str]] = {}
        for w, c in zip(t["word"].to_pylist(), t["c"].to_pylist()):
            syms = cache.get(w)
            if syms is None:
                syms = encode_word(w, ranks)
                cache[w] = syms
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            return schema.empty_table()
        ks = list(counts.keys())
        return pa.table(
            {"left": [k[0] for k in ks], "right": [k[1] for k in ks],
             "c": list(counts.values())}, schema=schema,
        )

    from ray.data.aggregate import Sum

    return (
        wc.map_batches(partial, batch_format="pyarrow")
        .groupby(["left", "right"])
        .aggregate(Sum("c", alias_name="c"))
        .to_arrow_refs()
    )


def _train_bpe_distributed(wc: Dataset, num_merges: int) -> pa.Table:
    """Over-budget path: a dictionary-Dataset pair-count pass per merge
    (O(num_merges) small passes; the corpus is never re-read). Identical
    merge sequence to the driver loop (same tie-break, property-tested)."""
    import ray

    wc = wc.materialize()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        refs = _distributed_pair_counts(wc, [(l, r) for l, r, _ in merges])
        best = None
        for t in (ray.get(r) for r in refs):
            for l, r, c in zip(
                t["left"].to_pylist(), t["right"].to_pylist(),
                t["c"].to_pylist(),
            ):
                c = int(c)
                if c <= 0:
                    continue
                key = (l, r)
                if (best is None or c > best[2]
                        or (c == best[2] and key < (best[0], best[1]))):
                    best = (l, r, c)
        if best is None:
            break
        merges.append(best)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "count": pa.array([m[2] for m in merges], pa.int64()),
        },
        schema=MERGES_SCHEMA,
    )


# ----------------------------------------------------------- public API

def train_bpe(
    ds: Dataset,
    num_merges: int = 200,
    text_col: str = "text",
    mode: str = "simple",
    min_count: int = 1,
    driver_word_budget: int = 5_000_000,
    distributed: bool | None = None,
) -> pa.Table:
    """Learn a BPE merge table from a corpus Dataset.

    ``distributed=None`` (default) auto-selects: the exact incremental
    driver loop while the dictionary fits ``driver_word_budget``, the
    per-merge distributed pair-count path beyond it. Both produce the
    same merge sequence."""
    wc = word_counts(ds, text_col=text_col, mode=mode, min_count=min_count)
    if distributed is None:
        wc = wc.materialize()
        distributed = wc.count() > driver_word_budget
    if distributed:
        return _train_bpe_distributed(wc, num_merges)
    t = pa.concat_tables(_collect(wc))
    n = t.num_rows
    if n > driver_word_budget:
        raise RuntimeError(
            f"BPE dictionary has {n} words > driver_word_budget="
            f"{driver_word_budget}; raise the budget or pass "
            "distributed=True / a higher min_count"
        )
    # sort for a partitioning-independent, deterministic input order
    t = t.sort_by("word")
    return train_bpe_from_vocab(
        t["word"].to_pylist(), t["c"].to_pylist(), num_merges
    )


def _collect(ds: Dataset) -> list[pa.Table]:
    import ray

    return [ray.get(r) for r in ds.to_arrow_refs()]


class BPEApplyStage:
    """Actor-pool encode stage: merge ranks built once per actor in
    ``__init__`` (the merges table is a broadcast constructor arg — it
    ships through the object store once, not per batch), per-actor
    word->tokens cache so the Zipf head is encoded once per actor."""

    def __init__(self, merges: pa.Table, mode: str = "simple",
                 text_col: str = "text"):
        self.ranks = _ranks(merges)
        self.mode = mode
        self.text_col = text_col
        self.cache: dict[str, list[str]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        from astrologer_ray.functions.tokenizer import tokenize

        toks_out, n_out = [], []
        for tx in t[self.text_col].to_pylist():
            toks: list[str] = []
            for w in tokenize(tx or "", mode=self.mode):
                enc = self.cache.get(w)
                if enc is None:
                    enc = encode_word(w, self.ranks)
                    self.cache[w] = enc
                toks.extend(enc)
            toks_out.append(toks)
            n_out.append(len(toks))
        out = t.select([c for c in t.column_names if c != self.text_col])
        out = out.append_column(
            "bpe_tokens", pa.array(toks_out, pa.list_(pa.string()))
        )
        return out.append_column("n_bpe_tokens", pa.array(n_out, pa.int64()))


def apply_bpe(
    ds: Dataset,
    merges: pa.Table,
    text_col: str = "text",
    mode: str = "simple",
    concurrency: int = 4,
    batch_size: int = 512,
) -> Dataset:
    """Encode every document with the learned merge table (drops the raw
    text column, appends ``bpe_tokens`` + ``n_bpe_tokens``)."""
    return ds.map_batches(
        BPEApplyStage,
        fn_constructor_kwargs={
            "merges": merges, "mode": mode, "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
