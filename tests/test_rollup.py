"""ES rollup-job analog (pipelines/rollup.py): build-once pre-aggregation
whose served aggs must equal running the agg over the raw table, and whose
incremental merge must be order-independent."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from astrologer_ray.pipelines.rollup import (
    build_rollup,
    merge_rollups,
    rollup_histogram,
    rollup_terms,
)


def _events(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 30 * 86400, n), unit="s")
    return pd.DataFrame({
        "ts": ts,
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })


@pytest.fixture(scope="module")
def rollup_path(ray_session, tmp_path_factory):
    import ray.data as rd

    df = _events()
    src = tmp_path_factory.mktemp("rollup") / "events.parquet"
    df.to_parquet(src, index=False)
    out = tmp_path_factory.mktemp("rollup_out")
    ds = rd.read_parquet(str(src))
    return build_rollup(ds, str(out)), df


def test_histogram_matches_raw_pandas(rollup_path):
    path, df = rollup_path
    got = rollup_histogram(path, group="b").to_pandas()
    raw = df[df.event_type == "b"].copy()
    raw["bucket"] = raw.ts.dt.floor("D")
    raw["c"] = np.floor(raw.value * 100 + 0.5).astype(np.int64)
    exp = raw.groupby("bucket").agg(
        n=("c", "size"), sum_c=("c", "sum"),
        min_c=("c", "min"), max_c=("c", "max")).reset_index()
    assert got.n.tolist() == exp.n.tolist()
    assert np.allclose(got.sum_value, exp.sum_c / 100.0)
    assert np.allclose(got.min_value, exp.min_c / 100.0)
    assert np.allclose(got.max_value, exp.max_c / 100.0)
    assert np.allclose(got.avg_value, exp.sum_c / 100.0 / exp.n)


def test_histogram_date_window(rollup_path):
    path, df = rollup_path
    lo, hi = pd.Timestamp("2024-01-10"), pd.Timestamp("2024-01-12")
    got = rollup_histogram(path, lo=lo, hi=hi).to_pandas()
    assert got.bucket.min() >= lo and got.bucket.max() < hi


def test_terms_matches_raw(rollup_path):
    path, df = rollup_path
    got = rollup_terms(path).to_pandas()
    exp = (df.assign(c=np.floor(df.value * 100 + 0.5).astype(np.int64))
           .groupby("event_type").agg(n=("c", "size"), s=("c", "sum"))
           .reset_index().sort_values(["n", "event_type"],
                                      ascending=[False, True]))
    assert got.event_type.tolist() == exp.event_type.tolist()
    assert got.n.tolist() == exp.n.tolist()
    assert np.allclose(got.sum_value, exp.s / 100.0)


def test_build_is_parallelism_invariant(ray_session, tmp_path):
    import ray.data as rd

    df = _events(seed=11)
    src = tmp_path / "ev.parquet"
    df.to_parquet(src, index=False)
    a = build_rollup(rd.read_parquet(str(src)).repartition(1),
                     str(tmp_path / "r1"))
    b = build_rollup(rd.read_parquet(str(src)).repartition(7),
                     str(tmp_path / "r7"))
    assert pq.read_table(a).equals(pq.read_table(b))


def test_merge_equals_full_build(ray_session, tmp_path):
    """Incremental path: rollup(old) ⊕ rollup(delta) == rollup(old+delta),
    in either merge order."""
    import ray.data as rd

    old, delta = _events(seed=1), _events(n=800, seed=2)
    (tmp_path / "d").mkdir()
    old.to_parquet(tmp_path / "d" / "old.parquet", index=False)
    delta.to_parquet(tmp_path / "d" / "delta.parquet", index=False)
    pd.concat([old, delta]).to_parquet(tmp_path / "full.parquet", index=False)

    p_old = build_rollup(rd.read_parquet(str(tmp_path / "d" / "old.parquet")),
                         str(tmp_path / "ro"))
    p_new = build_rollup(
        rd.read_parquet(str(tmp_path / "d" / "delta.parquet")),
        str(tmp_path / "rn"))
    p_full = build_rollup(rd.read_parquet(str(tmp_path / "full.parquet")),
                          str(tmp_path / "rf"))
    a, b, full = pq.read_table(p_old), pq.read_table(p_new), pq.read_table(p_full)
    merged = merge_rollups(a, b)
    assert merged.equals(full.select(merged.column_names))
    assert merge_rollups(b, a).equals(merged)


def test_cli_rollup_build_and_serve(ray_session, tmp_path, capsys):
    import json as _json

    from astrologer_ray.cli import main

    src = tmp_path / "events.parquet"
    _events(seed=5).to_parquet(src, index=False)
    out = str(tmp_path / "ru")
    assert main(["rollup", str(src), out]) == 0
    built = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["rollup"].endswith("rollup.parquet")
    assert main(["rollup", str(src), out, "--serve", "terms", "-k", "2"]) == 0
    rows = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 2 and rows[0]["n"] >= rows[1]["n"]
    assert main(["rollup", str(src), out, "--serve", "histogram",
                 "--filter-group", "a"]) == 0
    rows = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and all(r["n"] > 0 for r in rows)
