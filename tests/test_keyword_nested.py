"""Multi-valued / nested keyword fields (stages/spimi.TokenizePartials.
_kw_values): ES array + nested-object keyword semantics — the reference maps
list and nested struct fields as keyword (/root/reference/es/indices.go:
63-69, 126-135, 149-155). A keyword source spec may be a list<string>
column, a dotted struct path, or a dotted path through list<struct>."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from astrologer_ray.pipelines.build import build_index
from astrologer_ray.state.searcher import Searcher

WORDS = ["alpha", "beta", "gamma", "delta", "merge", "sort", "index"]


def _nested_corpus(path: str, n: int = 120, seed: int = 5) -> list[dict]:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        tags = list(rng.choice(["red", "green", "blue", "cyan"],
                               size=int(rng.integers(0, 4))))
        if tags and rng.random() < 0.5:
            tags.append(tags[0])  # duplicate value: must collapse to one term
        rows.append({
            "repo": f"r{i:05d}", "path": f"f{i}.py", "commit": "c0",
            "lang": ["py", "go"][i % 2],
            "content": " ".join(rng.choice(WORDS, size=int(rng.integers(3, 12)))),
            "tags": tags if rng.random() > 0.1 else None,  # null lists too
            "attrs": {"owner": f"team{i % 3}", "tier": int(i % 2)},
            "links": [{"kind": k, "label": f"l{j}"}
                      for j, k in enumerate(
                          rng.choice(["dep", "doc", "test"],
                                     size=int(rng.integers(0, 3))))],
        })
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, path, row_group_size=32)
    return rows


@pytest.fixture(scope="module")
def nested_env(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("nestedkw")
    f = str(d / "part-000.parquet")
    rows = _nested_corpus(f)
    idx = str(d / "idx")
    build_index(
        [f], idx, partition_rows=40, chunk_bits=6, positions=True,
        keyword_fields={"tag": "tags", "owner": "attrs.owner",
                        "tier": "attrs.tier", "lk": "links.kind"},
    )
    plain = str(d / "plain")
    build_index([f], plain, partition_rows=40, chunk_bits=6)
    return idx, plain, rows


def test_list_string_field_lookup(nested_env):
    idx, _plain, rows = nested_env
    s = Searcher(idx)
    for v in ["red", "green", "blue", "cyan"]:
        want = [i for i, r in enumerate(rows) if r["tags"] and v in r["tags"]]
        got = [h["doc_id"] for h in s.field_lookup({"field_term": {"tag": v}})]
        assert got == want, v


def test_duplicate_values_collapse(nested_env):
    """A doc listing the same tag twice contributes df=1 and ONE posting."""
    idx, _plain, rows = nested_env
    s = Searcher(idx)
    for v in ["red", "green", "blue", "cyan"]:
        n_docs = sum(1 for r in rows if r["tags"] and v in r["tags"])
        assert s.count({"field_term": {"tag": v}}) == n_docs


def test_struct_path_lookup(nested_env):
    idx, _plain, rows = nested_env
    s = Searcher(idx)
    for v in ["team0", "team1", "team2"]:
        want = [i for i, r in enumerate(rows) if r["attrs"]["owner"] == v]
        got = [h["doc_id"] for h in s.field_lookup({"field_term": {"owner": v}})]
        assert got == want, v
    # integer struct field goes through the zero-pad key formatter
    want = [i for i, r in enumerate(rows) if r["attrs"]["tier"] == 1]
    got = [h["doc_id"]
           for h in s.field_lookup({"field_term": {"tier": f"{1:012d}"}})]
    assert got == want


def test_list_struct_path_lookup(nested_env):
    idx, _plain, rows = nested_env
    s = Searcher(idx)
    for v in ["dep", "doc", "test"]:
        want = [i for i, r in enumerate(rows)
                if any(lk["kind"] == v for lk in r["links"])]
        got = [h["doc_id"] for h in s.field_lookup({"field_term": {"lk": v}})]
        assert got == want, v


def test_bool_across_nested_fields(nested_env):
    idx, _plain, rows = nested_env
    s = Searcher(idx)
    want = [i for i, r in enumerate(rows)
            if r["tags"] and "red" in r["tags"] and r["attrs"]["owner"] == "team0"]
    got = [h["doc_id"] for h in s.field_lookup({"bool": {"must": [
        {"field_term": {"tag": "red"}}, {"field_term": {"owner": "team0"}},
    ]}})]
    assert got == want


def test_nested_keywords_do_not_change_bm25(nested_env):
    idx, plain, _rows = nested_env
    a, b = Searcher(idx, load_docs=False), Searcher(plain, load_docs=False)
    assert a.N == b.N and a.avgdl == b.avgdl
    for q in (["merge"], ["alpha", "sort"], ["index", "gamma", "delta"]):
        ha = [(h["doc_id"], round(h["score"], 10)) for h in a.search(q, k=15)]
        hb = [(h["doc_id"], round(h["score"], 10)) for h in b.search(q, k=15)]
        assert ha == hb


def test_bad_path_raises(ray_session, tmp_path):
    f = str(tmp_path / "p.parquet")
    _nested_corpus(f, n=10)
    with pytest.raises(Exception, match="cannot descend|no field|No match"):
        build_index([f], str(tmp_path / "idx"), partition_rows=10,
                    keyword_fields={"bad": "attrs.owner.nope"})


def test_nested_dsl_query(nested_env):
    """ES ``nested`` query over a list<struct> path executes through the
    DSL adapter as the flattened multi-valued keyword lookup; the
    non-representable multi-condition form refuses loudly."""
    from astrologer_ray.state.dsl import execute_dsl

    idx, _plain, rows = nested_env
    s = Searcher(idx, load_docs=True)
    body = {"query": {"nested": {
        "path": "links", "query": {"term": {"lk": "dep"}}}}, "size": 200}
    got = execute_dsl(s, body)
    want = [i for i, r in enumerate(rows)
            if any(l["kind"] == "dep" for l in r["links"])]
    assert [h["_id"] for h in got["hits"]["hits"]] == want
    assert got["hits"]["total"]["value"] == len(want)
    # nested inside a bool filter composes
    lang = rows[0]["lang"]
    body = {"query": {"bool": {"filter": [
        {"nested": {"path": "links", "query": {"term": {"lk": "doc"}}}},
        {"term": {"lang": lang}}]}}, "size": 200}
    got = execute_dsl(s, body)
    want = [i for i, r in enumerate(rows)
            if any(l["kind"] == "doc" for l in r["links"])
            and r["lang"] == lang]
    assert [h["_id"] for h in got["hits"]["hits"]] == want
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        execute_dsl(s, {"query": {"nested": {
            "path": "links", "query": {"bool": {"must": [
                {"term": {"lk": "dep"}}, {"term": {"lk": "doc"}}]}}}}})
