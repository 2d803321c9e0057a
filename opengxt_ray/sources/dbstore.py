"""Database table store backed by DuckDB — the engine's analogue of
the reference's JDBC (PostGIS) DataStore.

Reference: GT/storage/DataStoreFactory.java:113-134 builds a JDBC
DataStore from connection params and reads/writes feature tables.
This container has no network or database server; DuckDB (baked in)
is the available relational store, so the connector speaks DuckDB
files. The shape matches the reference's usage: named tables, column
projection and row predicates pushed into the store, and a buffered
transactional writer (FeatureInserter analogue — one transaction per
block batch, all-or-nothing per call).

Distribution model:
- **read**: the table is split into ``num_splits`` ranges; each range
  is read by its own Ray task holding a READ-ONLY DuckDB connection
  (DuckDB allows concurrent read-only handles). With ``split_col``
  (an indexed/sorted integer column) the splits are range predicates
  — storage-side pruning, no OFFSET scans; without it, splits fall
  back to LIMIT/OFFSET windows (documented O(offset) in the store).
- **write**: DuckDB is single-writer, so the writer streams
  ``iter_batches`` through ONE connection — one batch resident at a
  time (no dataset materialization), one transaction per call.
  WKB geometry travels as BLOB columns unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _connect(path: str, read_only: bool):
    import duckdb

    return duckdb.connect(path, read_only=read_only)


def read_db_table(path: str, table: str, *, columns=None,
                  predicate: str | None = None,
                  split_col: str | None = None,
                  num_splits: int | None = None):
    """DuckDB file table → ``ray.data.Dataset`` (parallel range reads).

    ``predicate`` is a SQL boolean expression pushed into every split's
    WHERE clause (storage-side filtering — prune at the read)."""
    import ray

    from ..core.util import default_shuffle_partitions

    if num_splits is None:
        num_splits = default_shuffle_partitions()
    cols = ", ".join(columns) if columns else "*"
    where = f"WHERE {predicate}" if predicate else ""
    con = _connect(path, read_only=True)
    try:
        if split_col is not None:
            lo, hi, n = con.execute(
                f"SELECT min({split_col}), max({split_col}), count(*) "
                f"FROM {table} {where}").fetchone()
        else:
            (n,) = con.execute(
                f"SELECT count(*) FROM {table} {where}").fetchone()
    finally:
        con.close()
    if not n:
        con = _connect(path, read_only=True)
        try:
            empty = con.execute(
                f"SELECT {cols} FROM {table} LIMIT 0").arrow()
        finally:
            con.close()
        return ray.data.from_arrow(pa.table(empty))
    num_splits = max(1, min(num_splits, int(n)))

    @ray.remote
    def _read_split(i: int) -> pa.Table:
        c = _connect(path, read_only=True)
        try:
            if split_col is not None:
                # half-open key ranges over [lo, hi] — storage prunes
                bounds = np.linspace(lo, hi + 1, num_splits + 1)
                b0, b1 = int(bounds[i]), int(bounds[i + 1])
                rng = (f"{split_col} >= {b0} AND {split_col} < {b1}")
                w = f"{where} AND {rng}" if where else f"WHERE {rng}"
                q = f"SELECT {cols} FROM {table} {w}"
            else:
                # OFFSET windows from independent connections see no
                # guaranteed row order (DuckDB scans are parallel) —
                # anchor every window to the same deterministic order
                # on the base table's rowid or the windows overlap.
                step = -(-int(n) // num_splits)
                q = (f"SELECT {cols} FROM {table} {where} "
                     f"ORDER BY rowid "
                     f"LIMIT {step} OFFSET {i * step}")
            return pa.table(c.execute(q).arrow())
        finally:
            c.close()

    refs = [_read_split.remote(i) for i in range(num_splits)]
    return ray.data.from_arrow_refs(refs)


def write_db_table(ds, path: str, table: str, *, mode: str = "create",
                   batch_size: int | None = None) -> int:
    """Stream a Dataset into a DuckDB table through the single-writer
    connection; returns rows written. ``mode``: "create" (replace) or
    "append". One transaction — all-or-nothing (FeatureInserter
    semantics, GT/storage/FeatureInserter)."""
    if mode not in ("create", "append"):
        raise ValueError("mode must be 'create' or 'append'")
    con = _connect(path, read_only=False)
    total = 0
    try:
        con.execute("BEGIN")
        first = True
        for batch in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=batch_size):
            con.register("_ogxt_batch", batch)
            if first:
                if mode == "create":
                    con.execute(f"DROP TABLE IF EXISTS {table}")
                    con.execute(f"CREATE TABLE {table} AS "
                                "SELECT * FROM _ogxt_batch")
                else:
                    con.execute(f"INSERT INTO {table} "
                                "SELECT * FROM _ogxt_batch")
                first = False
            else:
                con.execute(f"INSERT INTO {table} "
                            "SELECT * FROM _ogxt_batch")
            con.unregister("_ogxt_batch")
            total += batch.num_rows
        if first and mode == "create":
            raise ValueError("cannot CREATE a table from an empty "
                             "dataset (schema unknown to the store)")
        con.execute("COMMIT")
    except Exception:
        # COMMIT failures abort the tx store-side; a bare ROLLBACK then
        # raises "no transaction is active" and masks the real error
        try:
            con.execute("ROLLBACK")
        except Exception:
            pass
        raise
    finally:
        con.close()
    return total
