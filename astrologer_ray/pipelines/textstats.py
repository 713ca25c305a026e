"""Text-analysis stages for large-scale training-data pipelines.

Beyond the reference's own operators (per the build brief): language ID
(stopword-profile heuristic), quality scoring (length/punct/stopword
ratios), token counting (the engine's ``simple`` tokenizer —
SQL-expressible for the oracle gate) and document fingerprinting.

Everything runs on Arrow compute kernels (`count_substring_regex`,
`split_pattern_regex`, `is_in`) + numpy bincount over list offsets — no
per-row Python loops in the counting paths. Tokenization convention: the
``simple`` split treats control chars as separators (no scrub), exactly
matching the SQL oracle ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from astrologer_ray.functions.tokenizer import _SIMPLE_RE

STOPWORDS = {
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was",
}

# tiny per-language stopword profiles for the heuristic lang-id
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "des", "dans"},
    "es": {"el", "la", "los", "las", "es", "y", "un", "una", "de", "que"},
}


def _nonempty_token_stats(
    col, split_pattern: str, value_sets: list[pa.Array]
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Per-row (n_tokens, [hits-in-set ...]) via one Arrow split + bincounts.

    Splitting on the separator pattern yields the same maximal runs as
    ``findall`` on its complement, plus empty strings at the boundaries,
    which are excluded from both counts. All hot work is C: split kernel,
    is_in, bincount over the list offsets.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lower = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.split_pattern_regex(lower, split_pattern)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_tokens = np.bincount(doc_idx, weights=nonempty, minlength=len(lens)).astype(np.int64)
    hit_counts = []
    for vs in value_sets:
        hits = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False) & nonempty
        hit_counts.append(
            np.bincount(doc_idx, weights=hits, minlength=len(lens)).astype(np.int64)
        )
    return n_tokens, hit_counts


def token_count_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(…, n_tokens) with the ``simple`` tokenizer — matches the SQL
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` oracle exactly.
    One C regex pass per batch (`count_substring_regex`)."""
    lower = pc.utf8_lower(pc.fill_null(
        t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray)
        else t[text_col], ""))
    n = pc.cast(pc.count_substring_regex(lower, "[a-z0-9]+"), pa.int64())
    out = {name: t[name] for name in t.column_names if name != text_col}
    out["n_tokens"] = n
    return pa.table(out)


def token_counts(ds: Dataset, text_col: str = "text", keep: list[str] | None = None) -> Dataset:
    keep = keep or []

    def fn(t: pa.Table) -> pa.Table:
        sub = t.select(keep + [text_col]) if keep else t
        return token_count_table(sub, text_col)

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Heuristic language ID: stopword-profile overlap per language.

    Deterministic tie-break: highest overlap ratio, then language code
    ascending; 'und' (undetermined) when no profile word matches.
    Vectorized: one split pass, one is_in + bincount per language.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(_LANG_PROFILES)
        self.value_sets = [
            pa.array(sorted(_LANG_PROFILES[lg]), pa.string()) for lg in self.langs
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        # lang-id words are alpha runs only (digits break words)
        n_tok, hits = _nonempty_token_stats(t[self.text_col], "[^a-z]+", self.value_sets)
        denom = np.maximum(n_tok, 1).astype(np.float64)
        best_ratio = np.zeros(len(n_tok), dtype=np.float64)
        best_lang = np.full(len(n_tok), "und", dtype=object)
        for lg, h in zip(self.langs, hits):
            ratio = h / denom
            better = ratio > best_ratio
            best_ratio[better] = ratio[better]
            best_lang[better] = lg
        out = {n: t[n] for n in t.column_names if n != self.text_col}
        out["pred_lang"] = pa.array(best_lang, pa.string())
        return pa.table(out)


class QualityScore:
    """Quality signals: chars, tokens, stopword ratio, ASCII-alpha ratio.
    All components SQL-expressible for the oracle gate; all Arrow/numpy."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop_set = pa.array(sorted(STOPWORDS), pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        filled = pc.fill_null(arr, "")
        n_chars = pc.utf8_length(filled).to_numpy(zero_copy_only=False).astype(np.int64)
        n_alpha = pc.count_substring_regex(filled, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_tok, (n_stop,) = _nonempty_token_stats(arr, "[^a-z0-9]+", [self.stop_set])
        out = {n: t[n] for n in t.column_names if n != self.text_col}
        out["n_chars"] = pa.array(n_chars)
        out["n_tokens"] = pa.array(n_tok)
        out["stop_ratio"] = pa.array(
            np.where(n_tok > 0, n_stop / np.maximum(n_tok, 1), 0.0), pa.float64()
        )
        out["alpha_ratio"] = pa.array(
            np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0), pa.float64()
        )
        return pa.table(out)


def _doc_tokens(arr: pa.Array, split_pattern: str = "[^a-z0-9]+"):
    """(doc_idx int64, flat tokens object ndarray) for non-empty lowered
    tokens — the shared vectorized front-end for the repetition and
    decontamination ops (one Arrow split, no per-row Python)."""
    lower = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.split_pattern_regex(lower, split_pattern)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return doc_idx[keep], np.asarray(flat, dtype=object)[keep]


class RepetitionStats:
    """Gopher-style repetition signals per document (training-data quality
    filtering): ``dup_token_frac`` = 1 - unique_tokens/tokens and
    ``top_bigram_frac`` = occurrences of the most frequent token bigram /
    total bigrams. High values flag boilerplate/spam docs that LLM data
    pipelines drop. Fully vectorized (factorize + bincount + maximum.at);
    both components SQL-expressible for the oracle gate."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        col = t[self.text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ndocs = len(arr)
        doc_idx, toks = _doc_tokens(arr)
        n_tok = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)
        dup_frac = np.zeros(ndocs, dtype=np.float64)
        top_big = np.zeros(ndocs, dtype=np.float64)
        if len(toks):
            codes, uniq = pd.factorize(toks)
            V = len(uniq)
            # unique tokens per doc: factorize (doc, code) composite
            _, udt = pd.factorize(doc_idx * V + codes)
            u_per_doc = np.bincount((udt // V).astype(np.int64),
                                    minlength=ndocs)
            nz = n_tok > 0
            dup_frac[nz] = 1.0 - u_per_doc[nz] / n_tok[nz]
            # bigrams: consecutive tokens within one doc
            same = doc_idx[1:] == doc_idx[:-1]
            if same.any():
                bd = doc_idx[:-1][same]
                # pair codes first (V^2 keys), then doc x pair — two small
                # factorizes sidestep a doc*V*V int64 overflow
                pcodes, _ = pd.factorize(codes[:-1][same] * V + codes[1:][same])
                P = int(pcodes.max()) + 1
                inv, uk = pd.factorize(bd * P + pcodes)
                cnt = np.bincount(inv)
                mx = np.zeros(ndocs, dtype=np.int64)
                np.maximum.at(mx, (uk // P).astype(np.int64), cnt)
                tot = np.bincount(bd, minlength=ndocs).astype(np.int64)
                bz = tot > 0
                top_big[bz] = mx[bz] / tot[bz]
        out = {n: t[n] for n in t.column_names if n != self.text_col}
        out["n_tokens"] = pa.array(n_tok)
        out["dup_token_frac"] = pa.array(dup_frac, pa.float64())
        out["top_bigram_frac"] = pa.array(top_big, pa.float64())
        return pa.table(out)


class DecontaminateStage:
    """Test-set decontamination (training-data hygiene): flag documents
    containing any token ``n``-gram from a benchmark set — the standard
    guard against evaluation contamination in LLM training corpora.

    The benchmark n-gram set is built ONCE (driver), shipped via
    ``ray.put`` and read by every actor from the object store (broadcast
    small side — never re-shipped per batch). The per-batch scan is
    anchor-vectorized: only positions whose FIRST token appears in the
    benchmark vocabulary (rare, one ``isin`` pass) are verified exactly
    against the n-gram set in Python — exact semantics, vectorized
    common path.
    """

    def __init__(self, bench_ref, n: int = 8, text_col: str = "text"):
        import ray

        obj = ray.get(bench_ref) if not isinstance(bench_ref, tuple) else bench_ref
        self.ngrams, self.anchors = obj  # set[tuple[str]], set[str]
        self.n = int(n)
        self.text_col = text_col
        self._anchor_arr = pa.array(sorted(self.anchors), pa.string())

    @staticmethod
    def build_benchmark(texts: list[str], n: int = 8):
        """(ngram set, anchor-token set) for ``ray.put`` broadcast."""
        ngrams: set[tuple] = set()
        for s in texts:
            tk = _SIMPLE_RE.findall((s or "").lower())
            ngrams.update(
                tuple(tk[i:i + n]) for i in range(len(tk) - n + 1)
            )
        return ngrams, {g[0] for g in ngrams}

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ndocs = len(arr)
        doc_idx, toks = _doc_tokens(arr)
        hits = np.zeros(ndocs, dtype=np.int64)
        n = self.n
        if len(toks) >= n and self.ngrams:
            anchor = pc.is_in(
                pa.array(toks, pa.string()), value_set=self._anchor_arr
            ).to_numpy(zero_copy_only=False)
            # candidate window starts: anchor token, full window in-doc
            cand = np.flatnonzero(anchor[: len(toks) - n + 1])
            cand = cand[doc_idx[cand] == doc_idx[cand + n - 1]]
            for i in cand:  # rare by construction
                if tuple(toks[i:i + n]) in self.ngrams:
                    hits[doc_idx[i]] += 1
        out = {c: t[c] for c in t.column_names if c != self.text_col}
        out["contaminated_ngrams"] = pa.array(hits, pa.int64())
        return pa.table(out)


def decontaminate(ds: Dataset, benchmark_texts: list[str], n: int = 8,
                  text_col: str = "text") -> Dataset:
    """Per-doc benchmark n-gram hit counts over a Dataset; filter
    ``contaminated_ngrams == 0`` downstream to drop contaminated docs."""
    import ray

    ref = ray.put(DecontaminateStage.build_benchmark(benchmark_texts, n))
    return ds.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs={"bench_ref": ref, "n": n, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


class FuzzyDecontaminateStage:
    """MinHash-LSH test-set decontamination: flag documents NEAR-matching
    a benchmark doc (paraphrased / lightly-edited contamination the exact
    n-gram guard misses).

    Same candidate model as the LSH dedup (``pipelines.dedup``): the
    benchmark side is banded ONCE on the driver and broadcast via
    ``ray.put`` — a ``(band, band_hash) -> bench ids`` map plus each
    bench doc's sorted shingle-hash set. Per batch, a doc's band hashes
    (identical MinHasher arithmetic) probe the map; candidates are
    verified with EXACT Jaccard over shingle-hash sets (sorted-array
    ``np.intersect1d``), so flagged docs are true >= ``threshold``
    matches (LSH affects recall only, never precision). Corpus streams;
    the benchmark never shuffles.
    """

    def __init__(self, bench_ref, *, threshold: float = 0.5,
                 num_perm: int = 128, bands: int = 32, seed: int = 7,
                 shingle_k: int = 3, text_col: str = "text"):
        import ray

        from astrologer_ray.pipelines.dedup import MinHashBands

        obj = ray.get(bench_ref) if not isinstance(bench_ref, tuple) \
            else bench_ref
        self.band_map, self.bench_shingles = obj
        self.threshold = float(threshold)
        self.text_col = text_col
        # reuse the dedup banding stage for its vectorized signature +
        # band-hash arithmetic (bench side used the same constructor)
        self._bander = MinHashBands(text_col=text_col, num_perm=num_perm,
                                    bands=bands, seed=seed,
                                    shingle_k=shingle_k)

    @staticmethod
    def build_benchmark(texts: list[str], *, num_perm: int = 128,
                        bands: int = 32, seed: int = 7, shingle_k: int = 3):
        """Broadcast payload: ((band, band_hash) -> [bench ids] map,
        per-bench-doc sorted shingle-hash arrays)."""
        from astrologer_ray.pipelines.dedup import (MinHashBands,
                                                    _shingle_hashes)

        bander = MinHashBands(num_perm=num_perm, bands=bands, seed=seed,
                              shingle_k=shingle_k)
        t = pa.table({"text": pa.array(texts, pa.string()),
                      "doc_id": pa.array(range(len(texts)), pa.int64())})
        rows = bander(t)
        band_map: dict[tuple[int, int], list[int]] = {}
        for b, h, i in zip(rows["band"].to_pylist(),
                           rows["band_hash"].to_pylist(),
                           rows["doc_id"].to_pylist()):
            band_map.setdefault((b, h), []).append(i)
        shingles = [np.unique(_shingle_hashes(s, shingle_k))
                    for s in texts]
        return band_map, shingles

    def __call__(self, t: pa.Table) -> pa.Table:
        from astrologer_ray.pipelines.dedup import _shingle_hashes

        texts = t[self.text_col].to_pylist()
        n = len(texts)
        # band rows for this batch via the shared bander (needs an id col)
        bt = pa.table({self.text_col: t[self.text_col],
                       self._bander.id_col:
                           pa.array(range(n), pa.int64())})
        rows = self._bander(bt)
        cands: list[set[int]] = [set() for _ in range(n)]
        for b, h, i in zip(rows["band"].to_pylist(),
                           rows["band_hash"].to_pylist(),
                           rows[self._bander.id_col].to_pylist()):
            hit = self.band_map.get((b, h))
            if hit:
                cands[i].update(hit)
        best_j = np.zeros(n, dtype=np.float64)
        best_id = np.full(n, -1, dtype=np.int64)
        for i, cand in enumerate(cands):
            if not cand:
                continue
            mine = np.unique(
                _shingle_hashes(texts[i], self._bander.mh.shingle_k))
            if len(mine) == 0:
                continue
            for bid in sorted(cand):
                other = self.bench_shingles[bid]
                inter = len(np.intersect1d(mine, other,
                                           assume_unique=True))
                union = len(mine) + len(other) - inter
                j = inter / union if union else 0.0
                if j > best_j[i]:
                    best_j[i], best_id[i] = j, bid
        out = {c: t[c] for c in t.column_names if c != self.text_col}
        out["bench_jaccard"] = pa.array(best_j, pa.float64())
        out["bench_id"] = pa.array(
            np.where(best_j >= self.threshold, best_id, -1), pa.int64())
        return pa.table(out)


def fuzzy_decontaminate(ds: Dataset, benchmark_texts: list[str], *,
                        threshold: float = 0.5, num_perm: int = 128,
                        bands: int = 32, seed: int = 7, shingle_k: int = 3,
                        text_col: str = "text") -> Dataset:
    """Near-duplicate benchmark contamination over a Dataset: adds
    ``bench_jaccard`` (best exact Jaccard among LSH candidates) and
    ``bench_id`` (matched benchmark doc, -1 below ``threshold``); filter
    ``bench_id < 0`` downstream to keep clean docs."""
    import ray

    ref = ray.put(FuzzyDecontaminateStage.build_benchmark(
        benchmark_texts, num_perm=num_perm, bands=bands, seed=seed,
        shingle_k=shingle_k))
    return ds.map_batches(
        FuzzyDecontaminateStage,
        fn_constructor_kwargs={
            "bench_ref": ref, "threshold": threshold, "num_perm": num_perm,
            "bands": bands, "seed": seed, "shingle_k": shingle_k,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def fingerprint64(text: str) -> int:
    """Deterministic 63-bit fingerprint of the simple-token stream.

    blake2b over the \\x1f-joined token stream — one C hash per document
    (vs the per-byte Python rolling hash it replaced); whitespace/punct
    normalization still applies because only the token stream is hashed.
    """
    toks = _SIMPLE_RE.findall((text or "").lower())
    if not toks:
        return 0
    h = hashlib.blake2b("\x1f".join(toks).encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") >> 1  # fit int64


def fingerprints(ds: Dataset, text_col: str = "text", keep: list[str] | None = None) -> Dataset:
    keep = keep or []

    def fn(t: pa.Table) -> pa.Table:
        fps = [fingerprint64(s) for s in t[text_col].to_pylist()]
        out = {n: t[n] for n in (keep or [c for c in t.column_names if c != text_col])}
        out["fingerprint"] = pa.array(fps, pa.int64())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 8,
) -> Dataset:
    """Overlapping fixed-window document chunking — the RAG/pretraining
    prep step: each doc's whitespace tokens become ceil(max(n-overlap,1) /
    (max_tokens-overlap)) windows of up to ``max_tokens`` tokens, adjacent
    windows sharing ``overlap`` tokens. Empty docs produce no chunks.

    Fully vectorized 1→N explosion inside one ``map_batches``: CSR window
    arithmetic in numpy over the split-token list array, one gather, and
    an Arrow ``binary_join`` to materialize chunk text — no Python loop
    over rows, chunks, or tokens. Emits (id, chunk_id, n_tokens, chunk)."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap

    def explode(t: pa.Table) -> pa.Table:
        # ascii_ (not utf8_) split: pyarrow 16's utf8_split_whitespace
        # intermittently emits whitespace-containing fragments inside warm
        # Ray workers on plasma-backed columns (observed ~1/8 runs:
        # "   " -> ["", " "]); the ASCII byte-compare path never does, and
        # it IS the oracle's semantics (DuckDB regexp_split_to_array with
        # RE2 \s+ splits on ASCII whitespace only)
        toks = pc.ascii_split_whitespace(t[text_col])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        # split_whitespace emits '' fragments for leading/trailing
        # whitespace; drop them (CSR re-offset below) so token counts
        # match the SQL oracle's non-empty filter
        flat = toks.values
        keep = pc.not_equal(flat, "")
        # rebuild offsets over the filtered values
        offs = np.frombuffer(toks.buffers()[1], dtype=np.int32)
        offs = offs[toks.offset: toks.offset + len(toks) + 1].astype(np.int64)
        keep_np = np.asarray(keep)
        kept_cum = np.concatenate([[0], np.cumsum(keep_np)])
        # raw offsets are ABSOLUTE child positions (valid for any array
        # offset); kept_cum maps them into the filtered child's index space
        offs = kept_cum[offs]
        vals = flat.filter(keep)

        n_tok = np.diff(offs)
        n_chunks = np.where(
            n_tok > 0,
            np.ceil(np.maximum(n_tok - overlap, 1) / stride).astype(np.int64),
            0,
        )
        doc_rep = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_chunks)
        chunk_base = np.concatenate([[0], np.cumsum(n_chunks)])
        cidx = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(
            chunk_base[:-1], n_chunks
        )
        starts = cidx * stride
        lens = np.minimum(max_tokens, n_tok[doc_rep] - starts)
        new_offs = np.concatenate([[0], np.cumsum(lens)])
        within = np.arange(int(new_offs[-1]), dtype=np.int64) - np.repeat(
            new_offs[:-1], lens
        )
        idx = np.repeat(offs[:-1][doc_rep] + starts, lens) + within
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), vals.take(pa.array(idx))
        )
        return pa.table({
            id_col: t[id_col].take(pa.array(doc_rep)),
            "chunk_id": pa.array(cidx, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk": pc.binary_join(chunk_lists, " "),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


# PII patterns: RE2 syntax on BOTH sides of the gate (Arrow's
# replace_substring_regex and DuckDB's regexp_replace are both RE2), so
# the redaction is exactly oracle-checkable. Applied in list order —
# email before phone so a phone-like digit run inside an address never
# splits it.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]\b", "<PHONE>"),
]


def redact_pii(
    ds: Dataset,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    keep: list[str] | None = None,
) -> Dataset:
    """Training-data PII scrub: replace emails / IPv4s / phone-like digit
    runs with typed placeholder tokens. One vectorized Arrow regex kernel
    per pattern per batch; patterns are module constants so a pipeline
    and its audit query can never disagree on the rule set."""
    pats = [(p, r) for k, p, r in PII_PATTERNS if k in kinds]
    unknown = set(kinds) - {k for k, _, _ in PII_PATTERNS}
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")

    def scrub(t: pa.Table) -> pa.Table:
        col = t[text_col]
        for pat, repl in pats:
            col = pc.replace_substring_regex(
                col, pattern=pat, replacement=repl
            )
        out = {n: t[n] for n in (keep or
               [c for c in t.column_names if c != text_col])}
        out[f"{text_col}_redacted"] = col
        return pa.table(out)

    return ds.map_batches(scrub, batch_format="pyarrow")


def ngram_topk(
    ds: Dataset,
    text_col: str = "text",
    n: int = 3,
    k: int = 20,
) -> Dataset:
    """Corpus-wide top-k word ``n``-grams by occurrence count (vocabulary /
    boilerplate / contamination analysis).

    Shuffle shape: each batch pre-aggregates its n-gram counts into
    ``(ngram, c)`` partial rows (a combiner — the exchange carries one row
    per DISTINCT n-gram per batch, never one per occurrence), then one
    ``groupby(ngram).sum`` reduces partials and a k-row sort serves the
    head. Ties break ngram-ascending, deterministically. Tokens are the
    simple ``[a-z0-9]+`` split — token-for-token the SQL oracle's split.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    part_schema = pa.schema([("ngram", pa.string()), ("c", pa.int64())])

    def partial_counts(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for tx in t[text_col].to_pylist():
            toks = _SIMPLE_RE.findall((tx or "").lower())
            counts.update(
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
            )
        if not counts:
            return part_schema.empty_table()
        return pa.table({"ngram": list(counts.keys()),
                         "c": list(counts.values())}, schema=part_schema)

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("c", alias_name="n"))
        .sort(["n", "ngram"], descending=[True, False])
        .limit(k)
    )


# --------------------------------------------- hashed TF-IDF doc vectors

def _hash_bucket(word: str, dim: int) -> tuple[int, float]:
    """Stable (bucket, sign) for a term — sign-hashing (Weinberger et al.
    2009, "Feature Hashing for Large Scale Multitask Learning") keeps the
    hashed inner product an unbiased estimate of the true one."""
    from astrologer_ray.functions.codec import term_hash64

    h = term_hash64(word)
    return h % dim, (1.0 if (h >> 32) & 1 else -1.0)


def bucket_df(
    ds: Dataset, text_col: str = "text", dim: int = 128, mode: str = "simple"
) -> tuple[np.ndarray, int]:
    """Pass 1: per-bucket document frequency + corpus size. Each batch
    pre-aggregates into a dense ``dim``-sized partial (the exchange is
    O(dim) rows per batch — never vocabulary-sized), one tiny
    ``groupby(bucket).sum`` reduces. Returns ``(df[dim], N)``."""
    from ray.data.aggregate import Sum

    from astrologer_ray.functions.tokenizer import tokenize

    schema = pa.schema([("bucket", pa.int64()), ("df", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        df = np.zeros(dim + 1, dtype=np.int64)
        df[dim] = len(t)  # sentinel bucket carries the doc count
        cache: dict[str, int] = {}
        for tx in t[text_col].to_pylist():
            bs = set()
            for w in set(tokenize(tx or "", mode=mode)):
                b = cache.get(w)
                if b is None:
                    b = _hash_bucket(w, dim)[0]
                    cache[w] = b
                bs.add(b)
            for b in bs:
                df[b] += 1
        nz = np.flatnonzero(df)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()),
             "df": pa.array(df[nz], pa.int64())}, schema=schema,
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("df", alias_name="df"))
        .take_all()  # <= dim+1 rows — never corpus-sized
    )
    df = np.zeros(dim, dtype=np.int64)
    n = 0
    for r in rows:
        if r["bucket"] == dim:
            n = int(r["df"])
        else:
            df[int(r["bucket"])] = int(r["df"])
    return df, n


class TfidfVectorStage:
    """Actor-pool vectorize stage: the idf vector (``dim`` float64s) is a
    broadcast constructor arg built once from pass 1; a per-actor
    term->(bucket, sign) cache collapses the Zipf head. Emits an
    L2-normalized ``list<float32>`` column named like the ``embeddings``
    table's, so the output composes directly with ``pipelines/ann`` and
    ``pipelines/dedup`` (SemDedup, embedding near-dup)."""

    def __init__(self, idf: np.ndarray, text_col: str = "text",
                 mode: str = "simple", out_col: str = "embedding"):
        self.idf = np.asarray(idf, dtype=np.float64)
        self.dim = len(self.idf)
        self.text_col = text_col
        self.mode = mode
        self.out_col = out_col
        self.cache: dict[str, tuple[int, float]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        from collections import Counter

        from astrologer_ray.functions.tokenizer import tokenize

        vecs = np.zeros((len(t), self.dim), dtype=np.float64)
        for i, tx in enumerate(t[self.text_col].to_pylist()):
            for w, c in Counter(tokenize(tx or "", mode=self.mode)).items():
                bs = self.cache.get(w)
                if bs is None:
                    bs = _hash_bucket(w, self.dim)
                    self.cache[w] = bs
                vecs[i, bs[0]] += bs[1] * c
        vecs *= self.idf
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        np.divide(vecs, norms, out=vecs, where=norms > 0)
        out = {n: t[n] for n in t.column_names if n != self.text_col}
        out[self.out_col] = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.astype(np.float32).ravel(), pa.float32()), self.dim
        ).cast(pa.list_(pa.float32()))
        return pa.table(out)


def hashed_tfidf_vectors(
    ds: Dataset,
    text_col: str = "text",
    dim: int = 128,
    mode: str = "simple",
    out_col: str = "embedding",
    concurrency=(1, 8),
    batch_size: int = 512,
) -> Dataset:
    """Feature-hashed TF-IDF document vectors (the classic hashing-trick
    vectorizer): pass 1 aggregates per-bucket df (O(dim) exchange), pass
    2 emits one L2-normalized ``list<float32>`` vector per doc. idf is
    the engine's Lucene-form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` so
    text and index agree on rarity. The output column is ANN-ready:
    brute/LSH/IVF/PQ top-k, k-means and SemDedup consume it unchanged."""
    from astrologer_ray.state.bm25 import idf as _idf

    df, n = bucket_df(ds, text_col=text_col, dim=dim, mode=mode)
    idf_vec = np.array([_idf(n, int(d)) for d in df], dtype=np.float64)
    return ds.map_batches(
        TfidfVectorStage,
        fn_constructor_kwargs={
            "idf": idf_vec, "text_col": text_col, "mode": mode,
            "out_col": out_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
