"""Text-analysis stages for large-scale training-data pipelines.

Beyond the reference's own operators (per the build brief): language ID
(n-gram/stopword heuristic), quality scoring (length/punct/stopword ratios),
token counting (the engine's ``simple`` tokenizer — SQL-expressible for the
oracle gate) and document fingerprinting (rolling hash). All are stateless
vectorized ``map_batches`` stages except ``LangId``/``QualityScore``, which
compile their patterns once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from astrologer_ray.functions.tokenizer import _SIMPLE_RE, scrub_text

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


def token_count_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_tokens) with the ``simple`` tokenizer — matches the SQL
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` oracle exactly."""
    texts = t[text_col].to_pylist()
    n = np.fromiter(
        (len(_SIMPLE_RE.findall(scrub_text(s or "").lower())) for s in texts),
        dtype=np.int64,
        count=len(texts),
    )
    out = {name: t[name] for name in t.column_names if name != text_col}
    out["n_tokens"] = pa.array(n)
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
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[a-z]+")

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = []
        for s in t[self.text_col].to_pylist():
            toks = self.word.findall((s or "").lower())
            if not toks:
                preds.append("und")
                continue
            best = ("und", 0.0)
            for lang in sorted(_LANG_PROFILES):
                hits = sum(1 for w in toks if w in _LANG_PROFILES[lang])
                ratio = hits / len(toks)
                if ratio > best[1]:
                    best = (lang, ratio)
            preds.append(best[0])
        out = {n: t[n] for n in t.column_names if n != self.text_col}
        out["pred_lang"] = pa.array(preds, pa.string())
        return pa.table(out)


class QualityScore:
    """Quality signals: chars, tokens, mean token length, alpha ratio,
    stopword ratio. All components SQL-expressible for the oracle gate."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.alpha = re.compile(r"[a-zA-Z]")  # ASCII alpha: SQL-expressible

    def __call__(self, t: pa.Table) -> pa.Table:
        stats = {"n_chars": [], "n_tokens": [], "stop_ratio": [], "alpha_ratio": []}
        for s in t[self.text_col].to_pylist():
            s = s or ""
            toks = _SIMPLE_RE.findall(s.lower())
            n_alpha = len(self.alpha.findall(s))
            stats["n_chars"].append(len(s))
            stats["n_tokens"].append(len(toks))
            stats["stop_ratio"].append(
                (sum(1 for w in toks if w in STOPWORDS) / len(toks)) if toks else 0.0
            )
            stats["alpha_ratio"].append((n_alpha / len(s)) if s else 0.0)
        out = {n: t[n] for n in t.column_names if n != self.text_col}
        out["n_chars"] = pa.array(stats["n_chars"], pa.int64())
        out["n_tokens"] = pa.array(stats["n_tokens"], pa.int64())
        out["stop_ratio"] = pa.array(stats["stop_ratio"], pa.float64())
        out["alpha_ratio"] = pa.array(stats["alpha_ratio"], pa.float64())
        return pa.table(out)


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def fingerprint64(text: str) -> int:
    """Deterministic rolling polynomial hash of the simple-token stream."""
    h = 0
    for tok in _SIMPLE_RE.findall(scrub_text(text or "").lower()):
        th = 0
        for ch in tok.encode("utf-8"):
            th = (th * 257 + ch) % _FP_MOD
        h = (h * _FP_BASE + th + 1) % _FP_MOD
    return h


def fingerprints(ds: Dataset, text_col: str = "text", keep: list[str] | None = None) -> Dataset:
    keep = keep or []

    def fn(t: pa.Table) -> pa.Table:
        fps = [fingerprint64(s) for s in t[text_col].to_pylist()]
        out = {n: t[n] for n in (keep or [c for c in t.column_names if c != text_col])}
        out["fingerprint"] = pa.array(fps, pa.int64() if max(fps, default=0) < 2**63 else pa.uint64())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")
