"""Driver-mimic: run every __ray_entry__ query against its DuckDB oracle.

Mirrors the driver's correctness gate (row-count + schema + order-insensitive
value equality) at sf0.001 so mismatches surface before the real run at 0.01.
"""

import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


SQL_KEYS = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(ray_session, duck, sf_dir, name):
    got = _canon(_to_pandas(E.queries()[name](sf_dir)))
    want = _canon(duck.sql(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"columns: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"rows: {len(got)} != {len(want)}"
    # dtype KIND must match pre-normalization intent: an int column arriving
    # as float (e.g. DuckDB HUGEINT -> float64) breaks strict value hashing
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        assert (gk == wk) or {gk, wk} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {gk} != {wk}"
        )
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a, b), (
                f"{name}.{c}: max abs diff "
                f"{np.max(np.abs(a - b)) if len(a) else 0}"
            )
        else:
            assert np.array_equal(a, b), f"{name}.{c} differs"


ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, sf_dir, name):
    res = _to_pandas(E.queries()[name](sf_dir))
    assert res is not None
    assert len(res) >= 0


def test_entry_smoke(ray_session):
    out = E.entry()
    assert len(out) > 0
    assert {"qid", "doc_id", "score"} <= set(out.columns)
