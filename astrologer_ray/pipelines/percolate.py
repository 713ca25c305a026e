"""Percolator: reverse search — stream documents against a STORED query
set and emit (doc, query) matches.

ES parity: the percolate query (``.percolator`` mapping type) stores
boolean term queries in an index and matches incoming documents against
all of them — the reference's alerting/classification direction, inverse
of the serving path in ``state/searcher.py``.  In a training-data
pipeline the same op is rule-based tagging: route every document through
a broadcast rulebook (topic tags, contamination screens, licensing
filters) in one streaming pass.

Scale shape: the query set is the SMALL side (10^2-10^5 rules) — it
broadcasts once into every actor's ``__init__`` (object-store constructor
arg, never re-shipped per batch); documents stream through ``map_batches``
and never shuffle.  Per batch each doc is tokenized ONCE into a set;
every query then tests set containment/overlap — O(|terms|) per (doc,
query) pair with no corpus-side state.

Query spec (one dict per stored query):
    {"id": int, "must": [...], "must_not": [...], "should": [...],
     "min_should": int}
Match = every must term present AND no must_not term present AND at
least min_should of the should terms present (min_should defaults to 1
when should is non-empty and must is empty — the ES bool default — else
0).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

MATCH_SCHEMA = pa.schema([("doc_id", pa.int64()), ("query_id", pa.int64())])


def _norm_query(q: dict) -> tuple[int, frozenset, frozenset, frozenset, int]:
    must = frozenset(q.get("must", ()))
    must_not = frozenset(q.get("must_not", ()))
    should = frozenset(q.get("should", ()))
    ms = q.get("min_should")
    if ms is None:
        ms = 1 if (should and not must) else 0
    if ms > len(should):
        raise ValueError(
            f"query {q.get('id')}: min_should={ms} > |should|={len(should)}"
        )
    if not (must or should):
        raise ValueError(f"query {q.get('id')}: empty query matches nothing")
    return int(q["id"]), must, must_not, should, int(ms)


class PercolateStage:
    """Actor-pool matcher: queries compiled once per actor in
    ``__init__`` into an ES-style candidate index; ``__call__``
    tokenizes each doc once and exact-verifies only the CANDIDATE
    queries the index admits.

    Candidate index (the ES percolator model — index the stored
    queries, not the docs): a query with ``must`` terms can only match
    a doc containing its rarest must term (rarity proxied by term
    frequency across the stored-query set — no corpus df is needed for
    correctness, only for pruning power), so it is bucketed under that
    single anchor term.  A must-less query with ``min_should >= 1``
    needs at least one should term, so it is bucketed under EVERY
    should term.  A must-less ``min_should == 0`` query is a pure
    must_not screen that matches almost everything — it stays on an
    always-verify list.  Per doc, candidates = union of the buckets of
    the doc's tokens + the always list; the exact bool verify is
    unchanged, so results are identical to the linear scan while the
    verify count drops from |queries| to |candidates| per doc
    (pytest ``test_percolate_index_prunes`` measures the ratio)."""

    def __init__(self, queries: list[dict], text_col: str = "text",
                 id_col: str = "doc_id", mode: str = "simple",
                 index_queries: bool = True):
        self.queries = [_norm_query(q) for q in queries]
        ids = [q[0] for q in self.queries]
        if len(set(ids)) != len(ids):
            raise ValueError("duplicate percolate query ids")
        self.text_col = text_col
        self.id_col = id_col
        self.mode = mode
        # ---- candidate index (index_queries=False keeps the r4 linear
        # scan — every query on the always list — for benchmarking the
        # index's pruning win; results are identical either way)
        from collections import Counter

        tf = Counter()
        for _qid, must, _mn, should, _ms in self.queries:
            tf.update(must)
            tf.update(should)
        self.buckets: dict[str, list[int]] = {}
        self.always: list[int] = []
        for i, (_qid, must, _mn, should, ms) in enumerate(self.queries):
            if not index_queries:
                self.always.append(i)
            elif must:
                anchor = min(must, key=lambda w: (tf[w], w))
                self.buckets.setdefault(anchor, []).append(i)
            elif ms >= 1:
                for w in should:
                    self.buckets.setdefault(w, []).append(i)
            else:
                self.always.append(i)
        # instrumentation for the pruning test/bench (per-actor totals)
        self.n_candidate_checks = 0
        self.n_docs_seen = 0

    def _candidates(self, toks: frozenset) -> list[int]:
        cand = set(self.always)
        for w in toks:
            b = self.buckets.get(w)
            if b:
                cand.update(b)
        return sorted(cand)  # stored-query order, like the linear scan

    def __call__(self, t: pa.Table) -> pa.Table:
        from astrologer_ray.functions.tokenizer import tokenize

        out_d, out_q = [], []
        for did, tx in zip(t[self.id_col].to_pylist(),
                           t[self.text_col].to_pylist()):
            toks = frozenset(tokenize(tx or "", mode=self.mode))
            cand = self._candidates(toks)
            self.n_candidate_checks += len(cand)
            self.n_docs_seen += 1
            for i in cand:
                qid, must, must_not, should, ms = self.queries[i]
                if not must <= toks:
                    continue
                if must_not & toks:
                    continue
                if ms and len(should & toks) < ms:
                    continue
                out_d.append(did)
                out_q.append(qid)
        return pa.table(
            {"doc_id": pa.array(out_d, pa.int64()),
             "query_id": pa.array(out_q, pa.int64())},
            schema=MATCH_SCHEMA,
        )


def percolate(
    ds: Dataset,
    queries: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "simple",
    concurrency=(1, 8),
    batch_size: int = 512,
    index_queries: bool = True,
) -> Dataset:
    """Match every document against the stored query set; returns the
    (doc_id, query_id) match pairs as a streaming Dataset."""
    return ds.map_batches(
        PercolateStage,
        fn_constructor_kwargs={
            "queries": queries, "text_col": text_col,
            "id_col": id_col, "mode": mode, "index_queries": index_queries,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
