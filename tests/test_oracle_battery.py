"""Driver-gate replica: every queries() entry vs its oracle_sql() twin
at sf0.001 (row count + columns + order-insensitive values)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as E  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(set(E.queries()) & set(E.oracle_sql()))
ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql()))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, sf_dir, con):
    res = E.queries()[name](sf_dir)
    mine = _canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
    ora = _canon(con.execute(E.oracle_sql()[name]).df())
    assert list(mine.columns) == list(ora.columns)
    assert len(mine) == len(ora)
    for c in mine.columns:
        if np.issubdtype(mine[c].dtype, np.floating):
            np.testing.assert_array_equal(mine[c].to_numpy(), ora[c].to_numpy(),
                                          err_msg=f"{name}.{c}")
        else:
            pd.testing.assert_series_equal(mine[c], ora[c], check_names=False,
                                           obj=f"{name}.{c}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, sf_dir):
    res = E.queries()[name](sf_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0


def test_entry_smoke():
    res = E.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert "n_nationkey" in df.columns
