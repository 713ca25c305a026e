"""Index build pipeline: corpus parquet -> inverted index artifacts.

Ray-Data-first re-architecture of the reference's export flagship
(/root/reference/commands/export.go:40-89) PLUS the index-build half the
reference delegated to Elasticsearch. Stages (SURVEY §7 build order):

1. **SPIMI partials** — actor-pool ``map_batches`` over deterministic
   partition units; writes per-partition partial postings + docs sidecars +
   manifest (the checkpoint boundary; resume skips completed units).
2. **Dense doc_ids** — global ``sort("doc_key")`` of the docs sidecar (the
   paging-token order analog, /root/reference/es/indices.go:26-27), then a
   two-pass block-offset prefix sum assigns ``doc_id`` = global rank.
   Content never enters this sort — only key + metadata columns.
3. **Postings merge** — hash join of partial postings to (doc_id, dl) on the
   provisional ``lrow`` key, then the ONE wide term shuffle:
   ``repartition(keys=[term, chunk_id])`` where ``chunk_id = doc_id >>
   chunk_bits`` *range-salts every term* so a Zipf-head term's postings
   split into bounded doc_id-range chunks that later concatenate in order —
   no re-merge pass (SURVEY §4 skew row). Each output block encodes its
   complete (term, chunk) runs vectorised into delta+varbyte block-max rows.
4. **Dictionary** — tiny ``groupby(term)`` over chunk summaries: df, cf.
5. **Stats / lineage** — meta.json (N, avgdl, …), per-partition metrics
   parquet, _SUCCESS marker.

Artifacts under ``index_dir``:
  partials/  (stage-1 checkpoint)   docs/  postings/  dict/  stats/
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from astrologer_ray import B, K1
from astrologer_ray.functions.codec import POSTINGS_SCHEMA, encode_chunk
from astrologer_ray.stages.spimi import (
    TokenizePartials,
    completed_partitions,
    plan_partitions,
)

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("doc_key", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("dl", pa.int64()),
        ("sha256", pa.string()),
        ("lrow", pa.int64()),
    ]
)


def term_shard(terms, n_shards: int) -> np.ndarray:
    """Stable term -> shard hash (crc32; python hash() is per-process salted)."""
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) % n_shards for t in terms),
        dtype=np.int32,
        count=len(terms),
    )


def _corpus_paths(corpus) -> list[str]:
    if isinstance(corpus, (list, tuple)):
        return sorted(corpus)
    if os.path.isdir(corpus):
        return sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    return [corpus]


def _assign_doc_ids(partials_dir: str, docs_dir: str, parallelism: int) -> dict:
    """Stage 2: global doc_key sort -> dense doc_id; writes docs/.

    Two passes over the *materialized* sorted key table (content-free, the
    only full materialization in the build — documented scale tradeoff: at
    10^12 docs this table is ~100 B/row and spills via the object store;
    the wide ``content`` column was dropped in stage 1).
    """
    import ray.data as rd

    docs = rd.read_parquet(sorted(glob.glob(os.path.join(partials_dir, "docs-*.parquet"))))
    sorted_docs = docs.sort("doc_key").materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"min_key": pa.array([], pa.string()),
                             "max_key": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        keys = t.column("doc_key")
        return pa.table(
            {"min_key": [keys[0].as_py()], "max_key": [keys[-1].as_py()],
             "n": [t.num_rows]}
        )

    summaries = sorted_docs.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).take_all()
    summaries.sort(key=lambda r: r["min_key"])
    for a, b_ in zip(summaries, summaries[1:]):
        if not a["max_key"] < b_["min_key"]:
            raise ValueError(
                "duplicate doc_key across partitions — run dedup_exact on "
                f"(repo,path,commit) first: {a['max_key']!r}"
            )
    offsets = {}
    off = 0
    for s in summaries:
        offsets[s["min_key"]] = off
        off += s["n"]
    total = off

    os.makedirs(docs_dir, exist_ok=True)

    def assign_and_write(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        keys = np.asarray(t.column("doc_key"))
        if not bool(np.all(keys[1:] > keys[:-1])):
            raise ValueError("duplicate doc_key within a sorted block")
        base = offsets[keys[0]]
        doc_id = np.arange(base, base + t.num_rows, dtype=np.int64)
        out = t.add_column(0, "doc_id", pa.array(doc_id))
        out = out.select([f.name for f in DOCS_SCHEMA])
        pq.write_table(
            out.cast(DOCS_SCHEMA),
            os.path.join(docs_dir, f"docs-{base:012d}.parquet"),
            compression="zstd",
        )
        return pa.table({"first_doc_id": [base], "n": [t.num_rows]})

    written = sorted_docs.map_batches(
        assign_and_write, batch_format="pyarrow", batch_size=None
    ).take_all()
    assert sum(w["n"] for w in written) == total
    return {"n_docs": total, "n_blocks": len(written)}


def _encode_postings(
    partials_dir: str,
    docs_dir: str,
    postings_dir: str,
    avgdl: float,
    k1: float,
    b: float,
    chunk_bits: int,
    n_shards: int,
    parallelism: int,
) -> dict:
    """Stage 3: join lrow->doc_id, range-salted term shuffle, chunk encode."""
    import ray.data as rd

    triples = rd.read_parquet(sorted(glob.glob(os.path.join(partials_dir, "post-*.parquet"))))
    keymap = rd.read_parquet(
        sorted(glob.glob(os.path.join(docs_dir, "docs-*.parquet"))),
        columns=["lrow", "doc_id", "dl"],
    )
    joined = triples.join(
        keymap, join_type="inner", num_partitions=parallelism, on=("lrow",)
    )

    def add_chunk(t: pa.Table) -> pa.Table:
        cid = np.asarray(t.column("doc_id")) >> chunk_bits
        return t.append_column("chunk_id", pa.array(cid.astype(np.int64)))

    joined = joined.map_batches(add_chunk, batch_format="pyarrow")
    # the ONE wide shuffle: co-locate each complete (term, chunk) group
    shuffled = joined.repartition(parallelism, keys=["term", "chunk_id"], sort=True)

    def encode_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return POSTINGS_SCHEMA.empty_table()
        terms = np.asarray(t.column("term"), dtype=object)
        cids = np.asarray(t.column("chunk_id"))
        doc_ids = np.asarray(t.column("doc_id"))
        tfs = np.asarray(t.column("tf"))
        dls = np.asarray(t.column("dl"))
        order = np.lexsort((doc_ids, cids, terms))
        terms, cids, doc_ids, tfs, dls = (
            terms[order], cids[order], doc_ids[order], tfs[order], dls[order]
        )
        run_start = np.concatenate(
            ([0], np.flatnonzero((terms[1:] != terms[:-1]) | (cids[1:] != cids[:-1])) + 1)
        )
        run_end = np.concatenate((run_start[1:], [len(terms)]))
        rows = []
        for s, e in zip(run_start, run_end):
            row = encode_chunk(doc_ids[s:e], tfs[s:e], dls[s:e], avgdl, k1, b)
            row["term"] = str(terms[s])
            row["chunk_id"] = int(cids[s])
            row["shard"] = int(zlib.crc32(str(terms[s]).encode()) % n_shards)
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=POSTINGS_SCHEMA)

    encoded = shuffled.map_batches(encode_block, batch_format="pyarrow", batch_size=None)
    encoded.write_parquet(postings_dir)
    return {}


def build_index(
    corpus,
    index_dir: str,
    *,
    mode: str = "code",
    k1: float = K1,
    b: float = B,
    chunk_bits: int = 20,
    n_shards: int = 8,
    partition_rows: int = 50_000,
    parallelism: int | None = None,
    concurrency: int | None = None,
    resume: bool = True,
    force: bool = False,
    column_map: dict | None = None,
    key_cols: tuple[str, ...] | None = None,
) -> dict:
    """Build the full inverted index; returns the build stats dict.

    Resume semantics (reference analog: idempotent ``_id`` re-export +
    gap detection, SURVEY §2.7 D1 / §2.10): stage-1 partition units whose
    manifest exists are skipped; post-shuffle artifacts are rebuilt from the
    partials. ``force=True`` wipes ``index_dir`` first (the reference's
    ``create-index --force``, /root/reference/commands/create-index.go:22-42).
    """
    import ray
    import ray.data as rd
    from ray.data.context import DataContext, ShuffleStrategy

    # key-based repartition + hash join need the hash-shuffle strategy;
    # cap aggregator fan-out to the session size (defaults assume a large
    # cluster: 200 partitions / 64 aggregator actors)
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    ctx.default_hash_shuffle_parallelism = min(
        ctx.default_hash_shuffle_parallelism, max(2, ncpu)
    )
    ctx.max_hash_shuffle_aggregators = min(
        ctx.max_hash_shuffle_aggregators, max(2, ncpu)
    )

    if force and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    partials_dir = os.path.join(index_dir, "partials")
    docs_dir = os.path.join(index_dir, "docs")
    postings_dir = os.path.join(index_dir, "postings")
    dict_dir = os.path.join(index_dir, "dict")
    stats_dir = os.path.join(index_dir, "stats")

    paths = _corpus_paths(corpus)
    units = plan_partitions(paths, target_rows=partition_rows)
    if parallelism is None:
        parallelism = max(2, int(ray.cluster_resources().get("CPU", 4)))
    if concurrency is None:
        concurrency = max(2, parallelism // 2)

    done = completed_partitions(partials_dir) if resume else set()
    todo = [u for u in units if u["part_id"] not in done]
    if not resume:
        for d in (partials_dir, docs_dir, postings_dir, dict_dir, stats_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)

    # ---- stage 1: SPIMI partials (checkpointed, embarrassingly parallel)
    if todo:
        units_ds = rd.from_items(todo)
        units_ds.map_batches(
            TokenizePartials,
            fn_constructor_kwargs={
                "partials_dir": partials_dir,
                "mode": mode,
                "column_map": column_map,
                "key_cols": key_cols,
            },
            batch_format="pyarrow",
            batch_size=1,
            concurrency=min(concurrency, len(todo)),
            num_cpus=1,
        ).materialize()

    metrics = []
    for pid in sorted(completed_partitions(partials_dir)):
        with open(os.path.join(partials_dir, f"manifest-{pid:06d}.json")) as f:
            metrics.append(json.load(f))
    n_docs_partial = sum(m["n_docs"] for m in metrics)
    sum_dl = sum(m["sum_dl"] for m in metrics)
    n_postings = sum(m["n_postings"] for m in metrics)

    # wipe derived dirs (they are rebuilt from partials below)
    for d in (docs_dir, postings_dir, dict_dir, stats_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)

    # ---- stage 2: dense doc_ids in doc_key order
    id_stats = _assign_doc_ids(partials_dir, docs_dir, parallelism)
    n_docs = id_stats["n_docs"]
    assert n_docs == n_docs_partial, (n_docs, n_docs_partial)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0

    # ---- stage 3: postings merge + encode
    _encode_postings(
        partials_dir, docs_dir, postings_dir, avgdl, k1, b,
        chunk_bits, n_shards, parallelism,
    )

    # ---- stage 4: dictionary (df = sum of chunk posting counts)
    from ray.data.aggregate import Count, Sum

    chunks_summary = rd.read_parquet(postings_dir, columns=["term", "n", "sum_tf"])
    dictionary = chunks_summary.groupby("term").aggregate(
        Sum("n", alias_name="df"),
        Sum("sum_tf", alias_name="cf"),
        Count(alias_name="n_chunks"),
    )
    dictionary.write_parquet(dict_dir)
    n_terms = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(dict_dir, "*.parquet"))
    )

    # ---- stage 5: stats + lineage
    os.makedirs(stats_dir, exist_ok=True)
    meta = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "n_postings": n_postings,
        "n_terms": n_terms,
        "k1": k1,
        "b": b,
        "mode": mode,
        "chunk_bits": chunk_bits,
        "n_shards": n_shards,
        "n_partitions": len(units),
        "source_files": paths,
    }
    with open(os.path.join(stats_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    if metrics:
        pq.write_table(
            pa.Table.from_pylist(metrics),
            os.path.join(stats_dir, "partition_metrics.parquet"),
        )
    with open(os.path.join(index_dir, "_SUCCESS"), "w") as f:
        json.dump({"n_docs": n_docs, "n_postings": n_postings}, f)
    return meta


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats", "meta.json")) as f:
        return json.load(f)
