"""Temporal joins Ray Data lacks natively, built from its own primitives.

The reference's only joins are equi/positional lookups (SURVEY §2.4); a
training-data pipeline additionally needs the *as-of* join (attach the most
recent reference row at or before each fact row's timestamp — market-data
semantics, feature lookup at event time). Ray Data has no asof operator, so
it is composed here per the build brief's custom-operator ladder (a):
``union`` of the two tagged sides → ``groupby(key, bucket)`` →
``map_groups`` with a vectorized ``searchsorted`` inside the sorted group.
The union carries ONE explicit arrow schema (each side's absent columns are
typed nulls) — Ray 2.49's JoinOperator crashes on empty one-sided
partitions, and an Arrow-native group body keeps int64 payloads exact (no
pandas float degradation anywhere).

Skew safety: with ``bucket_span`` set, rows co-partition by
``(key, floor(on / span))`` so a hot key's rows split across bounded
groups instead of landing in one straggler/OOM task. Matches that cross a
bucket boundary backwards are served by *sentinels*: the last right-side
row of every (key, bucket) — one tiny row each — is collected, reduced on
the driver (budgeted, see ``sentinel_budget``), and broadcast via
``ray.put``; a group's unmatched left rows then match the latest sentinel
from any earlier bucket, which is exactly the right row an unbounded
lookback would have found. ``bucket_span=None`` (default) keeps the
one-group-per-key layout — fine until one key's rows outgrow a task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _span_in_column_units(bucket_span, on_type: pa.DataType) -> int:
    """``bucket_span`` expressed in the ``on`` column's physical int64 unit
    (timestamp columns cast to their own epoch unit; numeric columns pass
    through)."""
    if pa.types.is_timestamp(on_type) or pa.types.is_duration(on_type):
        ns = int(pd.Timedelta(bucket_span).value)
        per = {"ns": 1, "us": 1_000, "ms": 1_000_000, "s": 1_000_000_000}
        unit = on_type.unit
        if ns % per[unit]:
            raise ValueError(
                f"bucket_span {bucket_span!r} is not a whole number of "
                f"{unit} (the {on_type} column's unit)")
        return ns // per[unit]
    return int(bucket_span)


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    on: str,
    left_cols: dict,
    right_cols: dict,
    right_key: str | None = None,
    right_on: str | None = None,
    on_type: pa.DataType = pa.timestamp("us"),
    key_type: pa.DataType = pa.int64(),
    tolerance=None,
    bucket_span=None,
    sentinel_budget: int = 5_000_000,
) -> Dataset:
    """Distributed as-of (backward) join: for every left row, attach the
    right row of the same ``key`` with the greatest ``on``-value ``<=`` the
    left row's. Ties on the right timestamp are resolved deterministically
    by the LAST row in ``(on, *right_cols)`` sort order (dict order of
    ``right_cols`` is the tie-break priority), so results are parallelism-
    and engine-invariant — the property a DuckDB ``row_number`` oracle can
    check; plain SQL ``ASOF JOIN`` leaves ties unspecified.

    ``left_cols`` / ``right_cols`` are ``{name: pyarrow type}`` payload
    column dicts (disjoint names; the key and ``on`` columns are carried
    automatically). ``tolerance`` (same type as the ``on`` difference,
    e.g. ``pd.Timedelta``) drops matches older than ``on - tolerance``.
    Left rows with no match are dropped (inner asof).

    ``bucket_span`` (e.g. ``pd.Timedelta(days=7)`` or an int for numeric
    ``on``) bounds every group to one key × one span of time — REQUIRED at
    scale whenever a single key can be hot. The sentinel side table has one
    row per non-empty (key, bucket) of the right side; the driver reduce
    refuses above ``sentinel_budget`` rows (widen the span instead).

    Output columns: ``key``, ``on``, ``left_cols``, each ``right_cols``
    prefixed ``r_``, and ``r_on`` (the matched right timestamp).
    """
    import ray

    right_key = right_key or key
    right_on = right_on or on
    assert not set(left_cols) & set(right_cols)
    lc = list(left_cols.items())
    rc = list(right_cols.items())
    union_schema = pa.schema(
        [("k", key_type), ("b", pa.int64()), ("side", pa.int8()),
         ("ts", on_type), *lc, *rc]
    )
    span = (_span_in_column_units(bucket_span, on_type)
            if bucket_span is not None else None)

    def _bucket(ts: pa.Array) -> pa.Array:
        if span is None:
            return pa.array(np.zeros(len(ts), dtype=np.int64))
        iv = pc.cast(ts, pa.int64())
        # floor division toward -inf (epoch values can predate 1970)
        q = pc.divide(iv, span)
        r = pc.subtract(iv, pc.multiply(q, span))
        return pc.subtract(q, pc.cast(pc.less(r, 0), pa.int64()))

    def tag(key_col: str, ts_col: str, cols: dict, side: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return union_schema.empty_table()
            n = t.num_rows
            ts = t[ts_col].combine_chunks().cast(on_type)
            arrs = [
                t[key_col].combine_chunks().cast(key_type),
                _bucket(ts),
                pa.array(np.full(n, side, dtype=np.int8)),
                ts,
            ]
            for name, ty in lc + rc:
                if name in cols:
                    arrs.append(t[name].combine_chunks().cast(ty))
                else:
                    arrs.append(pa.nulls(n, ty))
            return pa.Table.from_arrays(arrs, schema=union_schema)

        return fn

    lds = left.select_columns([key, on, *left_cols]).map_batches(
        tag(key, on, left_cols, 0), batch_format="pyarrow"
    )
    rds = right.select_columns([right_key, right_on, *right_cols]).map_batches(
        tag(right_key, right_on, right_cols, 1), batch_format="pyarrow"
    )

    rc_names = [c for c, _ in rc]
    sort_rt = [("ts", "ascending")] + [(c, "ascending") for c in rc_names]

    # ---- sentinel side table: last right row per (key, bucket) ----------
    carry_ref = None
    if span is not None:
        sent_cols = ["k", "b", "ts", *rc_names]

        def batch_last(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return union_schema.empty_table().select(sent_cols)
            s = t.sort_by([("k", "ascending"), ("b", "ascending"), *sort_rt])
            kk = s["k"].to_numpy(zero_copy_only=False)
            bb = s["b"].to_numpy(zero_copy_only=False)
            last = np.flatnonzero(
                np.concatenate([(kk[1:] != kk[:-1]) | (bb[1:] != bb[:-1]),
                                [True]]))
            return s.select(sent_cols).take(pa.array(last))

        parts = [
            b for b in ray.get(
                rds.map_batches(batch_last, batch_format="pyarrow")
                .to_arrow_refs())
            if b.num_rows
        ]
        if parts:
            sent = pa.concat_tables(parts)
            if sent.num_rows > sentinel_budget:
                raise ValueError(
                    f"asof_join sentinel table has {sent.num_rows} rows "
                    f"(> budget {sentinel_budget}): widen bucket_span or "
                    "raise sentinel_budget")
            sent = sent.sort_by(
                [("k", "ascending"), ("b", "ascending"), *sort_rt])
            kk = sent["k"].to_numpy(zero_copy_only=False)
            bb = sent["b"].to_numpy(zero_copy_only=False)
            last = np.flatnonzero(
                np.concatenate([(kk[1:] != kk[:-1]) | (bb[1:] != bb[:-1]),
                                [True]]))
            sent = sent.take(pa.array(last))
            carry = {}
            kk = sent["k"].to_numpy(zero_copy_only=False)
            bb = sent["b"].to_numpy(zero_copy_only=False)
            payload = {c: sent[c].to_numpy(zero_copy_only=False)
                       for c in ("ts", *rc_names)}
            starts = np.concatenate(
                ([0], np.flatnonzero(kk[1:] != kk[:-1]) + 1, [len(kk)]))
            for s0, e0 in zip(starts[:-1], starts[1:]):
                carry[kk[s0]] = (
                    bb[s0:e0],
                    {c: v[s0:e0] for c, v in payload.items()},
                )
            carry_ref = ray.put(carry)

    out_fields = [(key, key_type), (on, on_type), *lc,
                  *[(f"r_{c}", ty) for c, ty in rc],
                  (f"r_{right_on}", on_type)]
    out_schema = pa.schema(out_fields)

    def per_group(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        lt = g.take(pa.array(np.flatnonzero(side == 0)))
        rt = g.take(pa.array(np.flatnonzero(side == 1)))
        if lt.num_rows == 0:
            return out_schema.empty_table()
        rt = rt.sort_by(sort_rt)
        lt = lt.sort_by([("ts", "ascending")])
        lts = lt["ts"].to_numpy(zero_copy_only=False)
        rts = rt["ts"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        if tolerance is not None and rt.num_rows:
            mts = rts[np.clip(idx, 0, None)]
            ok &= (lts - mts) <= tolerance

        def emit(lsel: np.ndarray, rvals: dict) -> pa.Table:
            ls = lt.take(pa.array(lsel))
            arrs = [ls["k"].combine_chunks(), ls["ts"].combine_chunks()]
            for c, _ in lc:
                arrs.append(ls[c].combine_chunks())
            for c, ty in rc:
                arrs.append(pa.array(rvals[c]).cast(ty))
            arrs.append(pa.array(rvals["ts"]).cast(on_type))
            return pa.Table.from_arrays(arrs, schema=out_schema)

        pieces = []
        sel = np.flatnonzero(ok)
        if len(sel):
            m = rt.take(pa.array(idx[sel]))
            pieces.append(emit(sel, {
                "ts": m["ts"].to_numpy(zero_copy_only=False),
                **{c: m[c].to_numpy(zero_copy_only=False)
                   for c in rc_names}}))
        if carry_ref is not None:
            miss = np.flatnonzero(~ok & (idx < 0))
            if len(miss):
                kv = lt["k"][0].as_py()
                bv = int(lt["b"][0].as_py())
                ent = ray.get(carry_ref).get(kv)
                if ent is not None:
                    cb, cp = ent
                    pos = int(np.searchsorted(cb, bv, side="left")) - 1
                    if pos >= 0:
                        cts = cp["ts"][pos]
                        keep = (
                            miss if tolerance is None
                            else miss[(lts[miss] - cts) <= tolerance]
                        )
                        if len(keep):
                            nz = len(keep)
                            pieces.append(emit(keep, {
                                "ts": np.full(nz, cts),
                                **{c: np.full(nz, cp[c][pos])
                                   for c in rc_names}}))
        if not pieces:
            return out_schema.empty_table()
        return pa.concat_tables(pieces)

    return lds.union(rds).groupby(["k", "b"]).map_groups(
        per_group, batch_format="pyarrow"
    )
