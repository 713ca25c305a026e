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


def test_percolate_index_prunes_10k_queries():
    """VERDICT r4 #3: with 10k stored queries the candidate index must
    verify far fewer than docs x queries pairs while matching the
    linear-scan (brute) result exactly. No Ray needed: drive the stage
    class directly."""
    import random

    import pyarrow as pa

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(2000)]
    queries = []
    for qid in range(10_000):
        kind = rng.random()
        if kind < 0.7:
            must = rng.sample(vocab, rng.randint(1, 3))
            q = {"id": qid, "must": must}
            if rng.random() < 0.3:
                q["must_not"] = rng.sample(vocab, 1)
        elif kind < 0.95:
            q = {"id": qid, "should": rng.sample(vocab, rng.randint(2, 4)),
                 "min_should": 1}
        else:  # pure must_not screens stay on the always list
            q = {"id": qid, "should": rng.sample(vocab, 2), "min_should": 0,
                 "must_not": rng.sample(vocab, 2)}
        queries.append(q)

    docs = [" ".join(rng.sample(vocab, 40)) for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    st = PercolateStage(queries)
    got = st(t)
    got_pairs = set(zip(got["doc_id"].to_pylist(),
                        got["query_id"].to_pylist()))

    # brute reference over the same normalized semantics
    want = set()
    for did, tx in enumerate(docs):
        toks = set(tokenize(tx, mode="simple"))
        for q in queries:
            must, mnot = set(q.get("must", ())), set(q.get("must_not", ()))
            should = set(q.get("should", ()))
            ms = q.get("min_should", 1 if (should and not must) else 0)
            if must <= toks and not (mnot & toks) and \
                    (not ms or len(should & toks) >= ms):
                want.add((did, q["id"]))
    assert got_pairs == want
    assert len(want) > 0

    # pruning power: candidate checks << docs x queries (the r4 linear
    # scan did exactly docs*queries checks)
    linear = len(docs) * len(queries)
    assert st.n_docs_seen == len(docs)
    assert st.n_candidate_checks < linear / 5, (
        st.n_candidate_checks, linear)
