"""Sharded query-serving actor pool: scatter-gather top-k over doc ranges.

The reference serves queries from Elasticsearch indexes with per-index
shard counts (/root/reference/es/indices.go:28,58,97) and the cluster
scatter-gathers per query. The Ray-native analog partitions by DOCUMENT
(the ES topology): each long-lived actor loads only the posting chunks of
its doc-id range (``chunk_id`` ranges — memory per actor shrinks with the
pool), so every doc it scores has its COMPLETE multi-term score, computed
from corpus-global statistics (df, N, avgdl from ``stats/meta.json``).
Per-actor top-k lists therefore merge EXACTLY by (score desc, doc_id asc)
(property-tested against a single full Searcher). Term-hash sharding
(``Searcher(shards=)``) remains for term-partitioned placements, where
partial scores merge by per-doc sum instead.

This is the one place the Dataset API genuinely can't express the
topology: ``map_batches`` routes a row to ONE actor, while a sharded query
must reach ALL actors. Plain ``@ray.remote`` actors + ``ray.get`` on the
scatter futures is the right primitive.
"""

from __future__ import annotations

import numpy as np


def _merge_topk(hit_lists: list[list[dict]], k: int) -> list[dict]:
    """Exact merge of per-shard top-k: (score desc, doc_id asc), re-ranked."""
    all_hits = [h for hits in hit_lists for h in hits]
    if not all_hits:
        return []
    scores = np.array([h["score"] for h in all_hits])
    ids = np.array([h["doc_id"] for h in all_hits])
    order = np.lexsort((ids, -scores))[:k]
    out = []
    for rank, i in enumerate(order):
        h = dict(all_hits[int(i)])
        h["rank"] = rank
        out.append(h)
    return out


class ShardedSearchPool:
    """N long-lived Searcher actors, each owning a disjoint shard group.

    ``search`` scatters one query to every actor and merges; ``search_many``
    keeps all actors busy by scattering the whole query list before any
    gather (per-actor work pipelines in Ray's queues).
    """

    def __init__(self, index_dir: str, n_actors: int = 4, *,
                 load_docs: bool = False, num_cpus: float = 1.0):
        import ray

        from astrologer_ray.pipelines.build import load_meta
        from astrologer_ray.pipelines.segments import combined_stats
        from astrologer_ray.state.searcher import Searcher

        meta = load_meta(index_dir)
        # doc count spans base + delta segments (pipelines/segments.py)
        n_docs = combined_stats(index_dir)["n_docs"]
        max_chunk = (max(0, n_docs - 1) >> int(meta["chunk_bits"])) + 1
        n_actors = max(1, min(n_actors, max_chunk))
        bounds = np.linspace(0, max_chunk, n_actors + 1).astype(int)
        actor_cls = ray.remote(num_cpus=num_cpus)(Searcher)
        self.actors = [
            actor_cls.remote(index_dir, load_docs=load_docs,
                             chunk_range=(int(lo), int(hi)))
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]
        self.n_actors = n_actors

    def search(self, terms: list[str], k: int = 10, **kw) -> list[dict]:
        import ray

        futs = [a.search.remote(terms, k=k, **kw) for a in self.actors]
        return _merge_topk(ray.get(futs), k)

    def search_many(self, queries: list[tuple[list[str], int]]) -> list[list[dict]]:
        """Batch scatter-gather: queries[i] = (terms, k). All scatters are
        issued before any gather so every actor's queue stays full."""
        import ray

        futs = [
            [a.search.remote(terms, k=k) for a in self.actors]
            for terms, k in queries
        ]
        return [_merge_topk(ray.get(fs), k)
                for fs, (_terms, k) in zip(futs, queries)]

    def phrase_search(self, terms: list[str], k: int = 10, **kw) -> list[dict]:
        """Scatter a consecutive-phrase query (requires positions=True index).
        Doc-range actors each return complete scores for their docs, so the
        top-k lists merge exactly, same as :meth:`search`."""
        import ray

        futs = [a.phrase_search.remote(terms, k=k, **kw) for a in self.actors]
        return _merge_topk(ray.get(futs), k)

    def search_synonyms(self, groups: list[list[str]], k: int = 10,
                        **kw) -> list[dict]:
        """Scatter a synonym-group query. Exact on this pool topology:
        actors are doc-RANGE shards, so each owns every member's postings
        for its docs and blends tf locally, while df/N come from the
        global dictionary — per-doc scores are complete and the top-k
        lists merge exactly."""
        import ray

        futs = [a.search_synonyms.remote(groups, k=k, **kw)
                for a in self.actors]
        return _merge_topk(ray.get(futs), k)

    def execute_dsl(self, body: dict, shard_size: int | None = None
                    ) -> dict:
        """Scatter one ES ``_search`` body to every doc-range shard and
        merge (the ES data-node topology): hits merge EXACTLY (each shard
        scores its docs completely from global stats), totals sum, and
        aggregations merge per :func:`astrologer_ray.state.dsl.shard_plan`
        — bucket counts by key, metrics by their merge op, ``terms`` with
        ES shard semantics (``shard_size`` per shard +
        ``doc_count_error_upper_bound``). Unsupported shapes raise
        client-side before any scatter."""
        import ray

        from astrologer_ray.state.dsl import merge_sharded, shard_plan

        sbody, plan = shard_plan(body, shard_size)
        futs = [a.run_dsl.remote(sbody) for a in self.actors]
        return merge_sharded(ray.get(futs), plan)

    def msearch(self, bodies: list[dict],
                shard_size: int | None = None) -> list[dict]:
        """ES ``_msearch`` over the sharded topology: every body is
        scattered to ALL shards (all scatters issued before any gather),
        responses merge per body in request order."""
        import ray

        from astrologer_ray.state.dsl import merge_sharded, shard_plan

        plans = [shard_plan(b, shard_size) for b in bodies]
        futs = [[a.run_dsl.remote(sb) for a in self.actors]
                for sb, _ in plans]
        return [merge_sharded(ray.get(fs), plan)
                for fs, (_sb, plan) in zip(futs, plans)]

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


class ReplicatedSearchPool:
    """N full-index Searcher replicas; each query routes to ONE actor.

    The ES replica topology (replicas serve whole queries, cf. the
    reference's per-index shard/replica settings,
    /root/reference/es/indices.go:28,58,97): adding replicas scales QPS
    until the node's memory bandwidth saturates, and every query costs one
    actor hop instead of ``ShardedSearchPool``'s scatter-gather fan-out.
    Prefer replicas when the index fits comfortably in one actor's heap;
    prefer doc-range shards when per-actor memory (or bandwidth per
    working set) is the constraint.
    """

    def __init__(self, index_dir: str, n_actors: int = 4, *,
                 load_docs: bool = False, num_cpus: float = 1.0):
        import ray

        from astrologer_ray.state.searcher import Searcher

        actor_cls = ray.remote(num_cpus=num_cpus)(Searcher)
        self.actors = [
            actor_cls.remote(index_dir, load_docs=load_docs)
            for _ in range(max(1, n_actors))
        ]
        self.n_actors = len(self.actors)
        self._rr = 0

    def warm(self) -> None:
        """Block until every replica has loaded its index state."""
        import ray

        ray.get([a.search.remote([], k=1) for a in self.actors])

    def search(self, terms: list[str], k: int = 10, **kw) -> list[dict]:
        import ray

        a = self.actors[self._rr % self.n_actors]
        self._rr += 1
        return ray.get(a.search.remote(terms, k=k, **kw))

    def search_many(self, queries: list[tuple[list[str], int]]) -> list[list[dict]]:
        """Round-robin scatter of whole queries; all issued before any
        gather so every replica's queue stays full."""
        import ray

        futs = [
            self.actors[i % self.n_actors].search.remote(terms, k=k)
            for i, (terms, k) in enumerate(queries)
        ]
        return ray.get(futs)

    def msearch(self, bodies: list[dict]) -> list[dict]:
        """ES ``_msearch``: N ``_search`` request bodies served in one
        round trip — each body routes whole to one replica (round-robin,
        all scattered before any gather), responses return in request
        order like ES's ``responses`` array. Bodies that touch doc attrs
        (aggs, sort, top_hits, ...) need the pool built with
        ``load_docs=True``."""
        import ray

        futs = [
            self.actors[i % self.n_actors].run_dsl.remote(body)
            for i, body in enumerate(bodies)
        ]
        return ray.get(futs)

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


class MultiIndexSearchPool:
    """ES multi-index search (``GET /idx1,idx2/_search``): one Searcher
    actor per INDEX; a request scatters to every index and responses
    merge with the same contract as doc-range shards.

    This is the time-partitioned-indices topology (the classic ES
    operating pattern the reference's ingest feeds: one index per
    period, queries span several). Semantics follow ES's default
    ``query_then_fetch``: each index scores its hits from ITS OWN
    statistics (df/N/avgdl), merged by score as-is — identical text can
    rank differently across indexes, exactly as in ES. Every hit
    carries ``_index`` (the index directory's basename). Doc ids are
    per-index; (score desc, doc_id asc) ordering is made deterministic
    across indexes by the stable merge (ties keep request index order).

    Each actor re-analyzes the request body with its own index's
    tokenizer mode (translation happens inside ``run_dsl``), so mixed
    ``simple``/``code`` indexes compose correctly on the DSL path.
    """

    def __init__(self, index_dirs: list[str], *, load_docs: bool = False,
                 num_cpus: float = 1.0):
        import os

        import ray

        from astrologer_ray.state.searcher import Searcher

        if not index_dirs:
            raise ValueError("MultiIndexSearchPool needs >= 1 index dir")
        actor_cls = ray.remote(num_cpus=num_cpus)(Searcher)
        self.actors = [actor_cls.remote(d, load_docs=load_docs)
                       for d in index_dirs]
        self.names = [os.path.basename(os.path.normpath(d))
                      for d in index_dirs]

    def _label(self, resps: list[dict]) -> list[dict]:
        for name, r in zip(self.names, resps):
            for h in r["hits"]["hits"]:
                h["_index"] = name
        return resps

    def search(self, terms: list[str], k: int = 10, **kw) -> list[dict]:
        """Plain BM25 top-k across all indexes (pre-tokenized terms —
        indexes must share an analyzer mode on this path; use
        :meth:`execute_dsl` for mixed modes)."""
        import ray

        futs = [a.search.remote(terms, k=k, **kw) for a in self.actors]
        hit_lists = ray.get(futs)
        for name, hits in zip(self.names, hit_lists):
            for h in hits:
                h["_index"] = name
        return _merge_topk(hit_lists, k)

    def execute_dsl(self, body: dict, shard_size: int | None = None
                    ) -> dict:
        """Scatter one ES ``_search`` body to every index and merge:
        hits by (score desc, doc_id asc; ties keep index order), totals
        sum, aggregations by the :func:`~astrologer_ray.state.dsl.
        shard_plan` per-kind merge ops (bucket counts by key sum across
        indexes — exact)."""
        import ray

        from astrologer_ray.state.dsl import merge_sharded, shard_plan

        sbody, plan = shard_plan(body, shard_size)
        resps = self._label(ray.get([a.run_dsl.remote(sbody)
                                     for a in self.actors]))
        return merge_sharded(resps, plan)

    def msearch(self, bodies: list[dict],
                shard_size: int | None = None) -> list[dict]:
        """ES ``_msearch`` across indexes: every body scatters to ALL
        indexes (all scatters before any gather), merged per body in
        request order."""
        import ray

        from astrologer_ray.state.dsl import merge_sharded, shard_plan

        plans = [shard_plan(b, shard_size) for b in bodies]
        futs = [[a.run_dsl.remote(sb) for a in self.actors]
                for sb, _ in plans]
        return [merge_sharded(self._label(ray.get(fs)), plan)
                for fs, (_sb, plan) in zip(futs, plans)]

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
