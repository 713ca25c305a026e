"""ES rollup-job analog: materialize a pre-aggregated bucket table once,
then serve date_histogram / terms / stats aggregations from it in
O(#buckets) instead of re-scanning the raw table per query.

The reference delegates repeated time-bucket aggregations to Elasticsearch
(es.postman_collection.json:57,96 date-histogram bodies over the same
index); ES's production answer for "the same agg every dashboard refresh
over an append-only stream" is a rollup job (`_rollup/job`): a stored
pivot of (time bucket x group terms) -> {count, sum, min, max} that later
searches hit instead of the raw documents. This module is that shape on
Ray Data:

- ``build_rollup`` runs ONE combiner-disciplined pass over the raw events
  (per-batch groupby partials -> one small hash aggregate; Ray's hash
  shuffle combines per-block before the exchange, so the wide step carries
  #buckets x #groups rows, never the fact table) and writes a deterministic
  parquet bucket table. At 100 TB the rollup output is dashboard-sized
  (days x event types), so every later query is a driver-side read.
- ``rollup_histogram`` / ``rollup_terms`` serve the two agg families the
  reference issues, straight from the materialized table, with results
  IDENTICAL to running the agg over the raw table (verified by SQL oracle
  and pytest): metric sums aggregate exact integer cents (the repo-wide
  float-determinism policy, __ray_entry__ docstring), min/max/count are
  order-independent already.

Incremental appends: re-rolling only new partitions and summing with the
existing bucket table is a merge of two bucket tables on the group key
(n/sum add, min/max fold) — ``merge_rollups`` does exactly that, so a
tail-follow ingest (pipelines/segments.py discipline) keeps the rollup
current without re-scanning history.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ray.data import Dataset

_METRICS = ("n", "sum_c", "min_c", "max_c")


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — the same expression the SQL oracle
    uses, so rollup sums hash-match DuckDB regardless of addition order."""
    return pc.cast(
        pc.floor(pc.add(pc.multiply(pc.cast(arr, pa.float64()), 100.0), 0.5)),
        pa.int64(),
    )


def rollup_dataset(
    ds: Dataset,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    interval: str = "day",
) -> Dataset:
    """The rollup pivot as a lazy Dataset: (bucket, *group_cols) ->
    n / sum_c / min_c / max_c over integer cents of ``value_col``."""
    from ray.data.aggregate import Count, Max, Min, Sum

    keys = ["bucket", *group_cols]

    def partial(t: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.floor_temporal(t[ts_col], unit=interval),
                         pa.timestamp("us"))
        c = _cents(t[value_col])
        proj = pa.table({"bucket": bucket,
                         **{g: t[g] for g in group_cols},
                         "v_c": c})
        # per-batch combiner: the exchange carries bucket-count rows per
        # block instead of the block's raw rows
        return proj.group_by(keys).aggregate(
            [("v_c", "count"), ("v_c", "sum"), ("v_c", "min"), ("v_c", "max")]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(keys).aggregate(
        Sum("v_c_count", alias_name="n"),
        Sum("v_c_sum", alias_name="sum_c"),
        Min("v_c_min", alias_name="min_c"),
        Max("v_c_max", alias_name="max_c"),
    )


def build_rollup(
    ds: Dataset,
    out_dir: str,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    interval: str = "day",
) -> str:
    """Materialize the rollup to ``out_dir`` (deterministic row order:
    sorted by bucket then group cols) and return the parquet path.

    The output is bucket-count-sized, so a single sorted file is the right
    layout (it IS the resumable unit); the input scan streams and spills
    like any Dataset pipeline.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    keys = ["bucket", *group_cols]
    # bucket-count-sized result: materializing to the driver is bounded
    blocks = ray.get(
        rollup_dataset(ds, ts_col, group_cols, value_col, interval)
        .to_arrow_refs())
    t = pa.concat_tables([b for b in blocks if b.num_rows]).combine_chunks()
    t = t.sort_by([(k, "ascending") for k in keys])
    path = os.path.join(out_dir, "rollup.parquet")
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)  # atomic publish, same as sources/jsonl.py sinks
    return path


def merge_rollups(a: pa.Table, b: pa.Table,
                  group_cols: tuple[str, ...] = ("event_type",)) -> pa.Table:
    """Fold a delta bucket table into an existing one (incremental
    rollup): n/sum add, min/max fold — associative, so any append order
    yields the same table."""
    keys = ["bucket", *group_cols]
    both = pa.concat_tables([a, b]).combine_chunks()
    out = both.group_by(keys).aggregate(
        [("n", "sum"), ("sum_c", "sum"), ("min_c", "min"), ("max_c", "max")]
    )
    out = out.rename_columns(keys + list(_METRICS))
    return out.sort_by([(k, "ascending") for k in keys])


def _load(rollup_path: str) -> pa.Table:
    return pq.read_table(rollup_path)


def rollup_histogram(
    rollup_path: str,
    lo=None,
    hi=None,
    group: str | None = None,
) -> pa.Table:
    """date_histogram (+ optional one-group filter) served from the
    rollup: bucket -> n, sum_value, min_value, max_value, avg_value.
    Bucket-table-sized work — no raw scan."""
    t = _load(rollup_path)
    mask = None
    if lo is not None:
        mask = pc.greater_equal(t["bucket"], pa.scalar(lo, pa.timestamp("us")))
    if hi is not None:
        m2 = pc.less(t["bucket"], pa.scalar(hi, pa.timestamp("us")))
        mask = m2 if mask is None else pc.and_(mask, m2)
    if group is not None:
        gcol = [c for c in t.column_names
                if c not in ("bucket", *_METRICS)][0]
        m3 = pc.equal(t[gcol], group)
        mask = m3 if mask is None else pc.and_(mask, m3)
    if mask is not None:
        t = t.filter(mask)
    agg = t.group_by("bucket").aggregate(
        [("n", "sum"), ("sum_c", "sum"), ("min_c", "min"), ("max_c", "max")]
    )
    agg = agg.rename_columns(["bucket", "n", "sum_c", "min_c", "max_c"])
    n = agg["n"].to_numpy()
    sum_c = agg["sum_c"].to_numpy()
    out = pa.table({
        "bucket": agg["bucket"],
        "n": agg["n"],
        "sum_value": pa.array(sum_c / 100.0, pa.float64()),
        "min_value": pa.array(agg["min_c"].to_numpy() / 100.0, pa.float64()),
        "max_value": pa.array(agg["max_c"].to_numpy() / 100.0, pa.float64()),
        "avg_value": pa.array(sum_c / 100.0 / n, pa.float64()),
    })
    return out.sort_by("bucket")


def rollup_terms(rollup_path: str, k: int | None = None) -> pa.Table:
    """terms agg (count + sum per group) served from the rollup."""
    t = _load(rollup_path)
    gcol = [c for c in t.column_names if c not in ("bucket", *_METRICS)][0]
    agg = t.group_by(gcol).aggregate([("n", "sum"), ("sum_c", "sum")])
    agg = agg.rename_columns([gcol, "n", "sum_c"])
    out = pa.table({
        gcol: agg[gcol],
        "n": agg["n"],
        "sum_value": pa.array(agg["sum_c"].to_numpy() / 100.0, pa.float64()),
    })
    idx = pc.sort_indices(out, sort_keys=[("n", "descending"),
                                          (gcol, "ascending")])
    out = out.take(idx)
    return out.slice(0, k) if k is not None else out
