"""Temporal joins Ray Data lacks natively, built from its own primitives.

The reference's only joins are equi/positional lookups (SURVEY §2.4); a
training-data pipeline additionally needs the *as-of* join (attach the most
recent reference row at or before each fact row's timestamp — market-data
semantics, feature lookup at event time). Ray Data has no asof operator, so
it is composed here per the build brief's custom-operator ladder (a):
``union`` of the two tagged sides → ``groupby(key)`` → ``map_groups`` with a
vectorized ``searchsorted`` inside the sorted group. The union carries ONE
explicit arrow schema (each side's absent columns are typed nulls) — Ray
2.49's JoinOperator crashes on empty one-sided partitions and pandas
``reindex`` would degrade int64 payloads to float64, so the arrow-schema
union is both the safe and the exact shape (same design as
``dedup._grouped_join``).

Partitioning assumption (documented per the north-star requirement): one
join key's rows — BOTH sides — fit in one group task. Keys are hash-
partitioned by the groupby, so total size only bounds the per-key group,
not the corpus; a key whose reference side alone exceeds worker memory
needs pre-aggregation to (key, ts) granularity first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


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

    Output columns: ``key``, ``on``, ``left_cols``, each ``right_cols``
    prefixed ``r_``, and ``r_on`` (the matched right timestamp).
    """
    right_key = right_key or key
    right_on = right_on or on
    assert not set(left_cols) & set(right_cols)
    lc = list(left_cols.items())
    rc = list(right_cols.items())
    union_schema = pa.schema(
        [("k", key_type), ("side", pa.int8()),
         ("ts", on_type), *lc, *rc]
    )

    def tag(key_col: str, ts_col: str, cols: dict, side: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return union_schema.empty_table()
            n = t.num_rows
            arrs = [
                t[key_col].combine_chunks().cast(key_type),
                pa.array(np.full(n, side, dtype=np.int8)),
                t[ts_col].combine_chunks().cast(on_type),
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

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        r = g[g["side"] == 1]
        # empty sides fall through: searchsorted against an empty right
        # matches nothing but keeps every column's dtype
        r = r.sort_values(["ts", *right_cols], kind="mergesort")
        l = l.sort_values("ts", kind="mergesort")
        lts = l["ts"].to_numpy()
        idx = np.searchsorted(r["ts"].to_numpy(), lts, side="right") - 1
        ok = idx >= 0
        if tolerance is not None and len(r):
            rts = r["ts"].to_numpy()[np.clip(idx, 0, None)]
            ok &= (lts - rts) <= tolerance
        l, idx = l[ok], idx[ok]
        matched = r.iloc[idx]
        def col(series: pd.Series, ty: pa.DataType) -> np.ndarray:
            # the union's null side degrades int64 to float64 in pandas;
            # inside a one-sided selection the values are all present, so
            # casting back to the declared arrow type restores exactness
            a = series.to_numpy()
            if pa.types.is_integer(ty) and a.dtype.kind == "f":
                a = a.astype(np.int64)
            return a

        out = pd.DataFrame({key: l["k"].to_numpy(), on: l["ts"].to_numpy()})
        for c, ty in lc:
            out[c] = col(l[c], ty)
        for c, ty in rc:
            out[f"r_{c}"] = col(matched[c], ty)
        out[f"r_{right_on}"] = matched["ts"].to_numpy()
        return out

    return lds.union(rds).groupby("k").map_groups(
        per_key, batch_format="pandas"
    )
