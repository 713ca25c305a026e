"""Sequence packing for LLM training-data assembly.

Documents fill token-budget bins greedily in id order — the standard
pre-training step that turns variable-length documents into fixed-budget
training sequences. The packing recurrence is inherently sequential, so a
naive implementation is a driver-side scan; here rows co-partition by
``pid = id // rows_per_part`` (bounded groups, the same contract as the
as-of join) and bins are numbered ``pid * rows_per_part + local_bin``:

- deterministic and parallelism-invariant (each partition packs alone),
- scale-safe: no global sequential scan, no driver materialization; a
  partition's group holds at most ``rows_per_part`` rows by construction,
- the per-partition restart costs at most one under-filled bin per
  partition boundary — the documented tradeoff for distributing a
  sequential fold.

Greedy semantics (matches the SQL-oracle recurrence): a doc joins the
current bin unless it would overflow ``bin_tokens``; then it starts a new
bin. A doc longer than the budget gets its own bin. Zero-token docs join
the current bin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from astrologer_ray.pipelines.textstats import _doc_tokens


def pack_group(t: pa.Table, *, bin_tokens: int, rows_per_part: int,
               id_col: str, text_col: str) -> pa.Table:
    """Pack ONE partition's rows (bounded by ``rows_per_part``)."""
    order = pa.compute.sort_indices(t.column(id_col))
    t = t.take(order)
    ids = t.column(id_col).to_numpy()
    doc_idx, _toks = _doc_tokens(
        t.column(text_col).combine_chunks()
        if isinstance(t.column(text_col), pa.ChunkedArray)
        else t.column(text_col)
    )
    n = np.bincount(doc_idx, minlength=t.num_rows).astype(np.int64)
    bins = np.zeros(t.num_rows, dtype=np.int64)
    b, cum = 0, int(n[0]) if t.num_rows else 0
    for i in range(1, t.num_rows):  # bounded: <= rows_per_part iterations
        if cum + int(n[i]) > bin_tokens:
            b, cum = b + 1, int(n[i])
        else:
            cum += int(n[i])
        bins[i] = b
    pid = int(ids[0]) // rows_per_part
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_tokens": pa.array(n, pa.int64()),
        "bin_id": pa.array(pid * rows_per_part + bins, pa.int64()),
    })


def pack_sequences(ds: Dataset, bin_tokens: int, rows_per_part: int = 100,
                   id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """(id, n_tokens, bin_id) greedy token-budget packing of a Dataset."""

    def _with_pid(t: pa.Table) -> pa.Table:
        pid = t.column(id_col).to_numpy() // rows_per_part
        return t.append_column("pid", pa.array(pid, pa.int64()))

    def _pack(t: pa.Table) -> pa.Table:
        return pack_group(
            t.drop_columns(["pid"]), bin_tokens=bin_tokens,
            rows_per_part=rows_per_part, id_col=id_col, text_col=text_col,
        )

    return (
        ds.map_batches(_with_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_pack, batch_format="pyarrow")
    )
