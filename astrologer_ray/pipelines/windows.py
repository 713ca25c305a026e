"""Stream-shaped operators over an ordered, keyed event log.

Ray Data has no event-time windows or watermarks (the reference has none
either — its ``ingest`` is a strictly-ordered tail follower, SURVEY §2.10).
Stream semantics are recovered batch-side by treating the events table as a
partitioned log: partition by key, sort by ts within the partition, and run
the windowing logic per group (the guide's streaming-shaped pattern).

Ordering assumption (documented per the north-star requirement): all events
of one key fit one group and are processed in ts order inside ``map_groups``;
late data is handled the reference's way — re-run the affected range
(gap-detect + backfill), not with watermarks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def tumbling_window(
    ds: Dataset,
    key: str,
    ts_col: str,
    unit: str = "hour",
) -> Dataset:
    """Per-(key, window) event counts — fixed (tumbling) event-time windows.

    A projection + one grouped aggregate; windows never span groups so no
    per-group state is needed.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    def bucketize(t: pa.Table) -> pa.Table:
        w = pc.cast(pc.floor_temporal(t[ts_col], unit=unit), pa.timestamp("us"))
        return pa.table({key: t[key], "window": w})

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "window"])
        .aggregate(Count(alias_name="n_events"))
    )


def hopping_window(
    ds: Dataset,
    ts_col: str,
    size_s: int,
    step_s: int,
    value_col: str | None = None,
) -> Dataset:
    """Hopping (sliding) event-time windows: size ``size_s`` seconds
    advancing by ``step_s`` (``size_s`` must be a multiple — each event
    lands in exactly ``size_s/step_s`` windows). Emits per-window
    ``n_events`` (+ ``sum_value`` cents-exact when ``value_col`` given).

    Scale shape: the 1->k explosion happens INSIDE the batch (vectorized
    repeat on integer epoch-seconds) and immediately combiner-reduces to
    per-batch (window, count, sum) partials, so the exchange carries
    window partials — bounded by #windows x #blocks — never k copies of
    the event stream; the global groupby then folds partials per window
    (SURVEY §2.10 streaming-shaped surface, same discipline as the
    tumbling window but with overlap)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    if size_s % step_s:
        raise ValueError("size_s must be a multiple of step_s")
    k = size_s // step_s

    def partials(t: pa.Table) -> pa.Table:
        # integer epoch seconds: exact window arithmetic in int64; the
        # inner cast normalizes any timestamp resolution (ns/ms/s) to us
        # before the divide (the aggs.py convention)
        sec = np.asarray(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                    pa.int64())) // 1_000_000
        last = (sec // step_s) * step_s  # newest window containing t
        starts = np.repeat(last, k) - np.tile(
            np.arange(k, dtype=np.int64) * step_s, len(sec))
        cols = {"wstart": starts}
        if value_col is not None:
            v = np.asarray(pc.cast(t[value_col], pa.float64()))
            cents = np.floor(v * 100 + 0.5).astype(np.int64)
            cols["cents"] = np.repeat(cents, k)
        # in-batch combine: one partial row per distinct window
        uniq, inv = np.unique(starts, return_inverse=True)
        out = {"wstart": pa.array(uniq, pa.int64()),
               "n": pa.array(np.bincount(inv, minlength=len(uniq))
                             .astype(np.int64), pa.int64())}
        if value_col is not None:
            out["c"] = pa.array(
                np.bincount(inv, weights=cols["cents"],
                            minlength=len(uniq)).astype(np.int64),
                pa.int64())
        return pa.table(out)

    aggs = [Sum("n", alias_name="n_events")]
    if value_col is not None:
        aggs.append(Sum("c", alias_name="sum_c"))
    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("wstart").aggregate(*aggs))


def sessionize(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    bucket_span=None,
) -> Dataset:
    """Session windows: a new session starts when the key's inter-event gap
    exceeds ``gap_minutes``. Returns one row per session:
    (key, session_id [1-based per key in ts order], n_events,
    session_start, session_end).

    Two phases, both Arrow-native ``map_groups`` bodies:

    1. **local sessions** per ``(key, floor(ts / bucket_span))`` group —
       with ``bucket_span`` set (e.g. ``pd.Timedelta(days=1)``), a hot
       key's EVENTS split across bounded groups instead of one straggler
       task; ``bucket_span=None`` keeps one group per key.
    2. **boundary merge** per key over SESSION rows only: sessions from
       adjacent buckets whose inter-session gap is ``<= gap`` fuse (a
       session may chain through many buckets), then 1-based renumbering.
       Phase-2 state is one row per local session — bounded by activity
       density, not event count; it is the same reduction an exact
       streaming sessionizer performs at window close.
    """
    gap = pd.Timedelta(minutes=gap_minutes).to_timedelta64()

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = t[ts_col].combine_chunks()
        if bucket_span is None:
            b = pa.array(np.zeros(len(ts), dtype=np.int64))
        else:
            from astrologer_ray.pipelines.joins import _span_in_column_units

            span = _span_in_column_units(bucket_span, ts.type)
            iv = pc.cast(ts, pa.int64())
            q = pc.divide(iv, span)
            r = pc.subtract(iv, pc.multiply(q, span))
            b = pc.subtract(q, pc.cast(pc.less(r, 0), pa.int64()))
        return pa.table({key: t[key], "b": b, ts_col: ts})

    def local_sessions(g: pa.Table) -> pa.Table:
        g = g.sort_by([(ts_col, "ascending")])
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        brk = np.concatenate(([0], np.flatnonzero(np.diff(ts) > gap) + 1))
        ends = np.concatenate((brk[1:], [len(ts)]))
        kv = g[key].take(pa.array(np.zeros(len(brk), dtype=np.int64)))
        return pa.table({
            key: kv,
            "n_events": pa.array((ends - brk).astype(np.int64)),
            "session_start": pa.array(ts[brk]),
            "session_end": pa.array(ts[ends - 1]),
        })

    def merge_key(g: pa.Table) -> pa.Table:
        g = g.sort_by([("session_start", "ascending"),
                       ("session_end", "ascending")])
        start = g["session_start"].to_numpy(zero_copy_only=False)
        end = g["session_end"].to_numpy(zero_copy_only=False)
        n = g["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        # bucket-boundary fuse: next session joins the chain when its first
        # event is within gap of the previous chain's last event
        new = np.concatenate(([True], (start[1:] - end[:-1]) > gap))
        brk = np.flatnonzero(new)
        seg_end = np.concatenate((brk[1:], [len(start)]))
        kv = g[key].take(pa.array(np.zeros(len(brk), dtype=np.int64)))
        return pa.table({
            key: kv,
            "session_id": pa.array(np.arange(1, len(brk) + 1, dtype=np.int64)),
            "n_events": pa.array(np.add.reduceat(n, brk)),
            "session_start": pa.array(start[brk]),
            "session_end": pa.array(end[seg_end - 1]),
        })

    local = (
        ds.select_columns([key, ts_col])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "b"])
        .map_groups(local_sessions, batch_format="pyarrow")
    )
    return local.groupby(key).map_groups(merge_key, batch_format="pyarrow")
