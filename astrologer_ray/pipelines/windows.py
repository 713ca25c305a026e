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


def sessionize(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> Dataset:
    """Session windows: a new session starts when the key's inter-event gap
    exceeds ``gap_minutes``. Returns one row per session:
    (key, session_id [1-based per key in ts order], n_events,
    session_start, session_end).

    ``groupby(key).map_groups`` with a pandas body — the guide's session
    windowing shape; state stays inside the sorted group.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        new_session = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        sess = new_session.cumsum()
        out = (
            g.assign(session_id=sess.astype(np.int64))
            .groupby("session_id", as_index=False)
            .agg(
                n_events=(ts_col, "size"),
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
            )
        )
        out.insert(0, key, g[key].iloc[0])
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (
        ds.select_columns([key, ts_col])
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
    )
