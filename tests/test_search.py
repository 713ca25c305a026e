import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from astrologer_ray.pipelines.build import build_index
from astrologer_ray.stages.spimi import KEY_SEP
from astrologer_ray.state.bm25 import oracle_topk
from astrologer_ray.state.searcher import Searcher, SearchStage


@pytest.fixture(scope="module")
def index_and_oracle(ray_session, small_corpus_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("sindex"))
    build_index(small_corpus_dir, index_dir, partition_rows=64, n_shards=4,
                chunk_bits=6)  # small chunks => multi-chunk terms get exercised
    src = pq.read_table(sorted(glob.glob(small_corpus_dir + "/*.parquet")))
    rows = sorted(
        zip(src.column("repo").to_pylist(), src.column("path").to_pylist(),
            src.column("commit").to_pylist(), src.column("lang").to_pylist(),
            src.column("content").to_pylist()),
        key=lambda r: f"{r[0]}{KEY_SEP}{r[1]}{KEY_SEP}{r[2]}",
    )
    contents = [r[4] for r in rows]
    langs = np.array([r[3] for r in rows], dtype=object)
    return index_dir, contents, langs


def _queries(searcher):
    """Reference query set (FIXTURES F2): head, mid, df=1, absent terms."""
    terms_by_df = sorted(searcher.df.items(), key=lambda kv: -kv[1])
    head = [t for t, _ in terms_by_df[:5]]
    mid = [t for t, _ in terms_by_df[len(terms_by_df) // 2: len(terms_by_df) // 2 + 5]]
    rare = [t for t, d in terms_by_df if d == 1][:3]
    qs = [
        ([head[0]], 10),
        (head[:3], 10),
        ([head[0], mid[0]], 10),
        (mid[:2], 1),
        ([rare[0]] if rare else [mid[0]], 10),
        (["zzz_no_such_term"], 10),
        ([head[0], "zzz_no_such_term"], 10),
        (head[:2] + mid[:2] + rare[:1], 100),
        ([mid[0], mid[0], mid[0]], 10),  # duplicate query terms
        (["lonelyterm"], 5),
        (["zzqxrareterm_only_here"], 5),  # df=1 idf extreme (edge row)
    ]
    return qs


@pytest.mark.parametrize("strategy", ["taat", "wand"])
def test_topk_rank_and_score_identical(index_and_oracle, strategy):
    index_dir, contents, _ = index_and_oracle
    s = Searcher(index_dir)
    for terms, k in _queries(s):
        want = oracle_topk(contents, terms, k=k)
        got = [
            (h["doc_id"], h["score"])
            for h in s.search(terms, k=k, strategy=strategy)
        ]
        assert got == want, f"[{strategy}] query {terms} k={k}:\n got {got}\nwant {want}"


def test_topk_with_lang_filter(index_and_oracle):
    index_dir, contents, langs = index_and_oracle
    s = Searcher(index_dir)
    terms_by_df = sorted(s.df.items(), key=lambda kv: -kv[1])
    head = [t for t, _ in terms_by_df[:3]]
    for lang in ["python", "go", "markdown"]:
        want = oracle_topk(contents, head, k=10, allowed=(langs == lang))
        got = [(h["doc_id"], h["score"]) for h in s.search(head, k=10, lang=lang)]
        assert got == want, f"lang={lang}"


def test_search_text_and_decorate(index_and_oracle):
    index_dir, contents, _ = index_and_oracle
    s = Searcher(index_dir)
    hits = s.search_text("getIndex mergeSort", k=5, decorate=True)
    assert hits and all("repo" in h and "doc_key" in h for h in hits)
    ranks = [h["rank"] for h in hits]
    assert ranks == list(range(len(hits)))


def test_sharded_searchers_merge_to_full(index_and_oracle):
    """Scatter-gather: per-shard top-k merged == unsharded top-k (J5/O2)."""
    index_dir, contents, _ = index_and_oracle
    full = Searcher(index_dir)
    shards = [Searcher(index_dir, shards=[i]) for i in range(4)]
    terms_by_df = sorted(full.df.items(), key=lambda kv: -kv[1])
    terms = [t for t, _ in terms_by_df[:4]]
    k = 10
    # per-doc partial scores from each shard merge by SUM (a doc's terms may
    # span shards); final rank by (score desc, doc_id asc)
    partial: dict[int, list] = {}
    for sh in shards:
        for h in sh.search(terms, k=len(contents)):
            partial.setdefault(h["doc_id"], []).append(h["score"])
    merged = sorted(
        ((d, float(np.sum(sorted(ss)))) for d, ss in partial.items()),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    want = [(h["doc_id"], h["score"]) for h in full.search(terms, k=k)]
    assert [d for d, _ in merged] == [d for d, _ in want]
    for (_, sa), (_, sb) in zip(merged, want):
        assert abs(sa - sb) < 1e-12


def test_search_stage_batch(index_and_oracle):
    import ray.data as rd

    index_dir, contents, _ = index_and_oracle
    s = Searcher(index_dir)
    qs = _queries(s)
    queries = rd.from_items(
        [{"qid": i, "terms": list(t), "k": k} for i, (t, k) in enumerate(qs)]
    )
    out = queries.map_batches(
        SearchStage,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    for i, (terms, k) in enumerate(qs):
        want = oracle_topk(contents, terms, k=k)
        sub = out[out.qid == i].sort_values("rank")
        got = list(zip(sub.doc_id.astype(int), sub.score))
        assert got == want, f"qid={i} {terms}"
