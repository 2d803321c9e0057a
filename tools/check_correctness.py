"""Local replica of the driver's correctness gate.

Runs each __ray_entry__.queries() callable and its oracle_sql() twin at
a given sf dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd


def to_pandas(obj):
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
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


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            h.update(np.ascontiguousarray(col.to_numpy()).tobytes())
        else:
            h.update(repr(col.tolist()).encode())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    sqls = E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name:24s} engine error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ROWS  {name:24s} rows={len(mine)} ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            ora = canon(con.execute(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL  {name:24s} oracle error: {ex}")
            n_fail += 1
            continue
        ok_rows = len(mine) == len(ora)
        ok_cols = list(mine.columns) == list(ora.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(ora)
        if ok_hash:
            print(f"PASS  {name:24s} rows={len(mine)} ({dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name:24s} rows={len(mine)}/{len(ora)} "
                  f"cols_ok={ok_cols} ({dt:.1f}s)")
            if ok_cols and ok_rows:
                for c in mine.columns:
                    a, b = mine[c], ora[c]
                    if np.issubdtype(a.dtype, np.floating):
                        bad = ~np.isclose(a, b, rtol=0, atol=0, equal_nan=True)
                        if bad.any():
                            i = int(np.nonzero(bad.to_numpy())[0][0])
                            print(f"      col {c}: {int(bad.sum())} diffs; "
                                  f"first at {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
                    elif not a.equals(b):
                        neq = (a != b)
                        i = int(np.nonzero(neq.to_numpy())[0][0])
                        print(f"      col {c}: {int(neq.sum())} diffs; "
                              f"first at {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
            elif not ok_cols:
                print(f"      mine cols: {list(mine.columns)}")
                print(f"      ora  cols: {list(ora.columns)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
