"""Percolator: brute-force reference parity, bool semantics,
validation, partitioning invariance."""
import pytest
import ray

from astrologer_ray.functions.tokenizer import tokenize
from astrologer_ray.pipelines.percolate import PercolateStage, percolate

TEXTS = [
    "data fast query engine",
    "slow query planner",
    "merge sort join table",
    "customer table report",
    "customer batch load",
    "merge only here",
    "",
]
QUERIES = [
    {"id": 0, "must": ["data", "fast"]},
    {"id": 1, "must": ["query"], "must_not": ["slow"]},
    {"id": 2, "should": ["merge", "join", "sort"], "min_should": 2},
    {"id": 3, "must": ["customer"], "should": ["table", "batch"]},
    {"id": 4, "should": ["merge"]},  # min_should defaults to 1 (no must)
]


def _brute():
    out = set()
    for did, tx in enumerate(TEXTS):
        toks = set(tokenize(tx, mode="simple"))
        for q in QUERIES:
            must, mnot = set(q.get("must", ())), set(q.get("must_not", ()))
            should = set(q.get("should", ()))
            ms = q.get("min_should", 1 if (should and not must) else 0)
            if must <= toks and not (mnot & toks) and \
                    (not ms or len(should & toks) >= ms):
                out.add((did, q["id"]))
    return out


def test_matches_brute_force_and_partitioning_invariant(ray_session):
    items = [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    want = _brute()
    # semantics sanity on the fixture itself
    assert (0, 0) in want and (1, 1) not in want and (2, 2) in want
    assert (5, 2) not in want and (5, 4) in want
    for parts, bs in ((1, 512), (5, 1)):
        ds = ray.data.from_items(items).repartition(parts)
        got = {(r["doc_id"], r["query_id"])
               for r in percolate(ds, QUERIES, batch_size=bs).take_all()}
        assert got == want


def test_min_should_default_and_must_only(ray_session):
    # with a must clause, should is pure OPTIONAL scoring context in ES;
    # min_should defaults to 0 -> doc 3 matches query 3 without "batch"
    st = PercolateStage(QUERIES)
    t = percolate(
        ray.data.from_items([{"doc_id": 3, "text": TEXTS[3]}]), QUERIES
    ).take_all()
    assert (3, 3) in {(r["doc_id"], r["query_id"]) for r in t}


def test_validation():
    with pytest.raises(ValueError, match="matches nothing"):
        PercolateStage([{"id": 0, "must_not": ["x"]}])
    with pytest.raises(ValueError, match="min_should"):
        PercolateStage([{"id": 0, "should": ["a"], "min_should": 2}])
    with pytest.raises(ValueError, match="duplicate"):
        PercolateStage([{"id": 0, "must": ["a"]}, {"id": 0, "must": ["b"]}])
