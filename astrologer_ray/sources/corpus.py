"""Deterministic synthetic source-code corpus (Parquet).

Input shape per BASELINE.json ``input_hint``: one row per source file at one
commit, columns ``(repo:string, path:string, commit:string, lang:string,
content:string)``. This replaces the reference's Postgres tables
(``ledgerheaders``/``txhistory``, /root/reference/db/ledger_header_row.go:11-18)
as the primary source. Everything is seeded — same knobs => byte-identical
parquet — so tests, resume checks and the two-parallelism-level scaling bench
all run over identical inputs (FIXTURES.md F1).

Content is synthetic code text drawn from a Zipf-weighted identifier
vocabulary mixing camelCase / snake_case / SCREAMING_CASE / dotted calls /
string literals / comments, so a known head-term set exists for shuffle-skew
tests and BM25 length normalization is exercised (log-normal doc lengths).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

LANGS = ["python", "go", "rust", "java", "js", "markdown"]
_EXT = {"python": "py", "go": "go", "rust": "rs", "java": "java", "js": "js", "markdown": "md"}

# Identifier fragments combined into camelCase / snake_case identifiers.
_FRAGMENTS = [
    "get", "set", "read", "write", "parse", "build", "index", "query", "term",
    "doc", "batch", "block", "merge", "sort", "hash", "key", "value", "list",
    "map", "node", "tree", "cache", "buffer", "stream", "file", "path", "row",
    "col", "count", "score", "rank", "token", "split", "join", "filter",
    "group", "shard", "chunk", "delta", "code", "byte", "flush", "spill",
    "load", "store", "sync", "lock", "pool", "task", "actor", "state", "meta",
    "stat", "util", "core", "main", "init", "run", "exec", "emit", "scan",
]


def _make_vocab(rng: np.random.Generator, vocab_size: int) -> list[str]:
    """Seeded identifier vocabulary: camelCase, snake_case, SCREAMING, plain."""
    frags = np.array(_FRAGMENTS)
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < vocab_size:
        n = int(rng.integers(1, 4))
        parts = [str(f) for f in rng.choice(frags, size=n)]
        style = int(rng.integers(0, 5))
        if style == 0:  # camelCase
            ident = parts[0] + "".join(p.capitalize() for p in parts[1:])
        elif style == 1:  # snake_case
            ident = "_".join(parts)
        elif style == 2:  # SCREAMING_CASE
            ident = "_".join(p.upper() for p in parts)
        elif style == 3:  # PascalCase
            ident = "".join(p.capitalize() for p in parts)
        else:  # plain + numeric suffix for uniqueness spread
            ident = parts[0] + str(int(rng.integers(0, 100)))
        if ident not in seen:
            seen.add(ident)
            vocab.append(ident)
    return vocab


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _render_docs(
    rng: np.random.Generator,
    vocab: np.ndarray,
    probs: np.ndarray,
    lengths: np.ndarray,
) -> list[str]:
    """Render all docs' synthetic code-ish text in one vectorized pass.

    One big Zipf draw for every token of every doc, decorations (calls,
    comments, quotes, dotted access, line breaks) applied by position
    pattern via numpy fancy indexing, then one C-level ``join`` per doc.
    """
    total = int(lengths.sum())
    toks = rng.choice(vocab, size=total, p=probs).astype(object)
    idx = np.arange(total)
    # decorations keyed on position patterns (deterministic, vectorized)
    call = idx % 11 == 3
    toks[call] = np.array([f"{t}({t})" for t in toks[call]], dtype=object)
    comment = idx % 13 == 7
    toks[comment] = np.array([f"# {t}" for t in toks[comment]], dtype=object)
    quote = idx % 17 == 5
    toks[quote] = np.array([f'"{t}"' for t in toks[quote]], dtype=object)
    defs = idx % 23 == 11
    toks[defs] = np.array([f"def {t}():" for t in toks[defs]], dtype=object)
    # separator after each token: newline every 6th, else space
    seps = np.where(idx % 6 == 5, "\n", " ").astype(object)
    pieces = np.empty(total * 2, dtype=object)
    pieces[0::2] = toks
    pieces[1::2] = seps
    ends = np.cumsum(lengths) * 2
    starts = ends - lengths * 2
    return ["".join(pieces[s : e - 1]) for s, e in zip(starts, ends)]


def generate_corpus(
    out_dir: str,
    n_files: int = 2_000,
    n_repos: int = 20,
    vocab_size: int = 5_000,
    dup_rate: float = 0.02,
    seed: int = 42,
    rows_per_file: int = 1_000,
    mean_len: float = 80.0,
    include_edge_rows: bool = True,
) -> list[str]:
    """Write a deterministic corpus to ``out_dir`` as multiple parquet files.

    Returns the sorted list of written file paths. Re-running with identical
    knobs produces byte-identical files (fixed seed, fixed row order).
    ``dup_rate`` rows repeat a previous row's content (distinct (repo,path,
    commit) key) to exercise content-level dedup (SURVEY §2.7 D1).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = np.array(_make_vocab(rng, vocab_size))
    probs = _zipf_weights(vocab_size)

    repos = [f"org{i % 5}/repo{i}" for i in range(n_repos)]
    repo_probs = _zipf_weights(n_repos, s=1.2)  # skewed repo sizes

    lengths = np.maximum(1, rng.lognormal(np.log(mean_len), 0.7, size=n_files).astype(np.int64))
    repo_idx = rng.choice(n_repos, size=n_files, p=repo_probs)
    lang_idx = rng.integers(0, len(LANGS), size=n_files)

    rows_content = _render_docs(rng, vocab, probs, lengths)
    # exact-duplicate contents (SURVEY §2.7 D1 dedup semantics): overwrite a
    # seeded subset with the content of an earlier doc
    n_dups = int(n_files * dup_rate)
    if n_dups and n_files > 1:
        dup_targets = rng.choice(np.arange(1, n_files), size=n_dups, replace=False)
        for t in dup_targets:
            rows_content[t] = rows_content[int(rng.integers(0, t))]

    pkg_idx = rng.integers(0, 50, size=n_files)
    rows_repo: list[str] = []
    rows_path: list[str] = []
    rows_commit: list[str] = []
    rows_lang: list[str] = []
    for i in range(n_files):
        repo = repos[repo_idx[i]]
        lang = LANGS[lang_idx[i]]
        path = f"src/pkg{int(pkg_idx[i])}/file{i}.{_EXT[lang]}"
        rows_repo.append(repo)
        rows_path.append(path)
        rows_commit.append(hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest())
        rows_lang.append(lang)

    if include_edge_rows:
        # Edge rows (FIXTURES.md F1): empty content; NUL + control chars
        # (mirrors the reference's utf8 scrub, /root/reference/db/main.go:14-37);
        # single-term doc; df=1 rare-term doc; case-twin docs.
        edge = [
            ("org0/repo0", "edge/empty.py", "python", ""),
            ("org0/repo0", "edge/nul.py", "python", "null\x00Byte\x00and\ttabs\x00here"),
            ("org0/repo0", "edge/single.py", "python", "lonelyterm"),
            ("org0/repo0", "edge/rare.py", "python", "zzqxrareterm_only_here"),
            ("org0/repo0", "edge/case_a.py", "python", "CaseTwin token alpha"),
            ("org0/repo0", "edge/case_b.py", "python", "casetwin token alpha"),
        ]
        for repo, path, lang, content in edge:
            rows_repo.append(repo)
            rows_path.append(path)
            rows_commit.append(hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest())
            rows_lang.append(lang)
            rows_content.append(content)

    table = pa.table(
        {
            "repo": rows_repo,
            "path": rows_path,
            "commit": rows_commit,
            "lang": rows_lang,
            "content": rows_content,
        },
        schema=CORPUS_SCHEMA,
    )

    paths: list[str] = []
    n = table.num_rows
    n_out = max(1, (n + rows_per_file - 1) // rows_per_file)
    for i in range(n_out):
        part = table.slice(i * rows_per_file, rows_per_file)
        p = os.path.join(out_dir, f"corpus-{i:05d}.parquet")
        pq.write_table(part, p, compression="zstd")
        paths.append(p)
    return sorted(paths)


def read_corpus(paths_or_dir, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` over the corpus with column pruning.

    Replaces the reference's ledger-range batch reader
    (/root/reference/db/ledger_header_row.go:40-57): parquet file/row-group
    slicing stands in for the BETWEEN windows.
    """
    import ray.data as rd

    return rd.read_parquet(paths_or_dir, columns=columns, **kwargs)
