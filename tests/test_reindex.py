"""ES _reindex analog (pipelines/reindex.py): filter pushdown, residual
match predicate, painless ctx._source scripts, and a destination index
build over the reindexed corpus."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from astrologer_ray.pipelines.reindex import (
    compile_script,
    reindex,
    translate_query,
)


def _docs(n=400, seed=3):
    rng = np.random.default_rng(seed)
    words = ["data", "merge", "index", "query", "shard", "actor"]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(rng.choice(words, rng.integers(3, 12)))
                 for _ in range(n)],
        "lang": rng.choice(["en", "de"], n),
        "n_chars": rng.integers(10, 500, n).astype(np.int64),
    })


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    p = tmp_path_factory.mktemp("reidx") / "docs.parquet"
    _docs().to_parquet(p, index=False)
    return str(p)


def test_translate_scan_only():
    scan, residual = translate_query(
        {"bool": {"filter": [{"term": {"lang": "en"}},
                             {"range": {"n_chars": {"gte": 100, "lt": 400}}}],
                  "must_not": [{"terms": {"lang": ["xx", "yy"]}}]}})
    assert scan is not None and residual == []


def test_translate_residual_match():
    scan, residual = translate_query({"match": {"text": "data"}})
    assert scan is None and len(residual) == 1


def test_compile_script_rejects_nonassign():
    with pytest.raises(NotImplementedError):
        compile_script("if (ctx._source.x > 1) { ctx.op = 'delete' }")


def test_reindex_end_to_end(ray_session, src, tmp_path):
    df = _docs()
    stats = reindex(
        src, str(tmp_path),
        query={"bool": {"filter": [{"term": {"lang": "en"}}],
                        "must": [{"match": {"text": "data"}}]}},
        script="ctx._source.kchars = ctx._source.n_chars / 1000.0",
        fields=["doc_id", "n_chars", "kchars"],
    )
    exp = df[(df.lang == "en")
             & df.text.str.contains(r"(?:^|[^a-z0-9])data(?:[^a-z0-9]|$)")]
    got = pd.read_parquet(stats["corpus_dir"]).sort_values(
        "doc_id").reset_index(drop=True)
    assert stats["n_docs"] == len(exp) == len(got)
    assert got.doc_id.tolist() == sorted(exp.doc_id.tolist())
    assert np.allclose(got.kchars, got.n_chars / 1000.0)
    assert list(got.columns) == ["doc_id", "n_chars", "kchars"]


def test_reindex_multi_term_match_is_or(ray_session, src, tmp_path):
    df = _docs()
    stats = reindex(src, str(tmp_path / "m"),
                    query={"match": {"text": "shard actor"}},
                    fields=["doc_id"])
    pat = r"(?:^|[^a-z0-9])(?:shard|actor)(?:[^a-z0-9]|$)"
    exp = df[df.text.str.contains(pat)]
    assert stats["n_docs"] == len(exp)


def test_reindexed_corpus_builds_and_serves(ray_session, src, tmp_path):
    """The destination corpus is a first-class build input: index it and
    run a search (the full _reindex -> dest-index round trip)."""
    from astrologer_ray.pipelines.build import build_index
    from astrologer_ray.state.searcher import Searcher

    stats = reindex(src, str(tmp_path),
                    query={"range": {"n_chars": {"gte": 100}}})
    files = sorted(glob.glob(os.path.join(stats["corpus_dir"], "*.parquet")))
    idx = str(tmp_path / "index")
    build_index(files, idx, mode="simple",
                column_map={"repo": "lang", "path": None, "commit": None,
                            "lang": "lang", "content": "text"},
                key_cols=("doc_id",))
    s = Searcher(idx)
    hits = s.search(["data"], k=5)
    assert hits and all(h["score"] > 0 for h in hits)


def test_cli_reindex_with_build(ray_session, src, tmp_path, capsys):
    import json

    from astrologer_ray.cli import main

    dest = str(tmp_path / "cli_out")
    rc = main(["reindex", src, dest,
               "--query", '{"range": {"n_chars": {"gte": 100}}}',
               "--script", "ctx._source.kchars = ctx._source.n_chars / 1000.0",
               "--build"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] > 0 and "index" in out
    df = pd.read_parquet(out["corpus_dir"])
    assert (df.n_chars >= 100).all() and "kchars" in df.columns
