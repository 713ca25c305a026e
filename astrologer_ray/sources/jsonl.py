"""JSONL corpus ingestion: newline-delimited JSON shards -> corpus parquet.

Web-scale text corpora ship as JSONL shards; the index build (and every
document pipeline here) consumes the parquet `CORPUS_SCHEMA`. This module is
the deterministic, resumable bridge: one Ray task per input shard, one
parquet file per shard (same basename), skip-if-done — so a failed 100 TB
conversion re-run only touches missing outputs, and downstream unit
planning (one build unit per file) maps 1:1 onto the source shards.

Mirrors the reference's ingestion adapter role (/root/reference/main.go
command wiring): the engine owns normalization (column mapping, defaults,
derived commit ids), storage stays columnar.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from astrologer_ray.sources.corpus import CORPUS_SCHEMA

_DEFAULT_MAP = {c: c for c in ("repo", "path", "commit", "lang", "content")}


def _convert_one(in_path: str, out_path: str,
                 column_map: dict[str, str]) -> dict:
    rows: dict[str, list] = {c: [] for c in CORPUS_SCHEMA.names}
    n_bad = 0
    with open(in_path, "rb") as f:
        for ln, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                n_bad += 1
                continue
            rec = {}
            for dst in CORPUS_SCHEMA.names:
                src = column_map.get(dst)
                rec[dst] = obj.get(src) if src else None
            if rec["content"] is None or rec["path"] is None:
                n_bad += 1
                continue
            rec["repo"] = rec["repo"] or ""
            rec["lang"] = rec["lang"] or "unknown"
            if not rec["commit"]:
                # derived, deterministic id — same rule as generate_corpus
                rec["commit"] = hashlib.sha1(
                    f"{rec['repo']}/{rec['path']}@jsonl".encode()
                ).hexdigest()
            for c in CORPUS_SCHEMA.names:
                rows[c].append(str(rec[c]))
    table = pa.table(rows, schema=CORPUS_SCHEMA)
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, out_path)  # atomic: a crash never leaves a half shard
    return {"in": in_path, "out": out_path, "rows": table.num_rows,
            "skipped_rows": n_bad, "resumed": False}


def convert_jsonl_corpus(
    in_paths_or_dir,
    out_dir: str,
    column_map: dict[str, str] | None = None,
    overwrite: bool = False,
) -> list[dict]:
    """Convert JSONL shards to corpus parquet, one output file per input
    shard (``<basename>.parquet``), via one Ray task per shard.

    ``column_map`` maps corpus columns -> source JSON keys (default:
    identity). Missing ``repo``/``lang`` default; a missing ``commit`` is
    derived deterministically from (repo, path); rows without ``content``
    or ``path`` are counted and dropped. Existing outputs are skipped
    unless ``overwrite`` — the resumability contract: re-running after a
    partial failure converts only the missing shards. Returns one manifest
    row per input shard.
    """
    import ray
    import ray.data as rd

    if isinstance(in_paths_or_dir, str):
        if os.path.isdir(in_paths_or_dir):
            paths = sorted(glob.glob(os.path.join(in_paths_or_dir, "*.jsonl")))
        else:
            paths = [in_paths_or_dir]
    else:
        paths = sorted(in_paths_or_dir)
    if not paths:
        raise FileNotFoundError(f"no .jsonl shards under {in_paths_or_dir!r}")

    cmap = dict(_DEFAULT_MAP)
    if column_map:
        cmap.update(column_map)
    unknown = set(cmap) - set(CORPUS_SCHEMA.names)
    if unknown:
        raise ValueError(f"column_map keys not in corpus schema: "
                         f"{sorted(unknown)}")

    os.makedirs(out_dir, exist_ok=True)
    units, done = [], []
    for p in paths:
        base = os.path.splitext(os.path.basename(p))[0]
        out = os.path.join(out_dir, f"{base}.parquet")
        if os.path.exists(out) and not overwrite:
            done.append({"in": p, "out": out,
                         "rows": pq.read_metadata(out).num_rows,
                         "skipped_rows": 0, "resumed": True})
        else:
            units.append({"in": p, "out": out})

    if units:
        cmap_ref = ray.put(cmap)

        def convert_batch(b: pa.Table) -> pa.Table:
            m = ray.get(cmap_ref)
            recs = [_convert_one(i, o, m)
                    for i, o in zip(b["in"].to_pylist(), b["out"].to_pylist())]
            return pa.table({k: [r[k] for r in recs]
                             for k in ("in", "out", "rows", "skipped_rows",
                                       "resumed")})

        res = (rd.from_items(units, override_num_blocks=len(units))
               .map_batches(convert_batch, batch_format="pyarrow",
                            batch_size=1)
               .to_pandas())
        done.extend(res.to_dict("records"))
    return sorted(done, key=lambda r: r["out"])
