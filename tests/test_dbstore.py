"""DuckDB table store (sources/dbstore.py) — the JDBC DataStore
analogue: parallel range reads, pushdown, transactional writes, WKB
round trip."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from opengxt_ray.sources.dbstore import read_db_table, write_db_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def db_path(tmp_path):
    return str(tmp_path / "store.duckdb")


def test_write_read_roundtrip_customer(db_path):
    src = pq.read_table(f"{SF}/customer.parquet")
    ds = ray.data.from_arrow([src.slice(i, 40)
                              for i in range(0, src.num_rows, 40)])
    n = write_db_table(ds, db_path, "customer")
    assert n == src.num_rows
    back = read_db_table(db_path, "customer", num_splits=4).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    orig = src.to_pandas().sort_values("c_custkey").reset_index(drop=True)
    assert list(back.columns) == list(orig.columns)
    assert (back["c_custkey"] == orig["c_custkey"]).all()
    assert np.allclose(back["c_acctbal"], orig["c_acctbal"])


def test_projection_and_predicate_pushdown(db_path):
    src = pq.read_table(f"{SF}/customer.parquet")
    write_db_table(ray.data.from_arrow(src), db_path, "customer")
    out = read_db_table(db_path, "customer",
                        columns=["c_custkey", "c_acctbal"],
                        predicate="c_acctbal > 0",
                        num_splits=3).to_pandas()
    assert list(out.columns) == ["c_custkey", "c_acctbal"]
    assert (out["c_acctbal"] > 0).all()
    orig = src.to_pandas()
    assert len(out) == int((orig["c_acctbal"] > 0).sum())


def test_split_col_range_reads_cover_exactly(db_path):
    src = pq.read_table(f"{SF}/customer.parquet")
    write_db_table(ray.data.from_arrow(src), db_path, "customer")
    out = read_db_table(db_path, "customer", split_col="c_custkey",
                        num_splits=5).to_pandas()
    assert sorted(out["c_custkey"]) == sorted(
        src["c_custkey"].to_pylist())


def test_append_mode_and_rollback(db_path):
    src = pq.read_table(f"{SF}/region.parquet")
    write_db_table(ray.data.from_arrow(src), db_path, "region")
    write_db_table(ray.data.from_arrow(src), db_path, "region",
                   mode="append")
    out = read_db_table(db_path, "region", num_splits=2).to_pandas()
    assert len(out) == 2 * src.num_rows
    # empty-create raises and leaves the store untouched
    empty = ray.data.from_arrow(src.slice(0, 0))
    with pytest.raises(ValueError):
        write_db_table(empty, db_path, "other")
    out2 = read_db_table(db_path, "region").to_pandas()
    assert len(out2) == 2 * src.num_rows


def test_wkb_blob_roundtrip(db_path):
    from opengxt_ray.core import wkb as W

    geoms = [W.encode_point(float(i), float(-i)) for i in range(50)]
    t = pa.table({"fid": pa.array(np.arange(50)),
                  "geom": pa.array(geoms, pa.binary())})
    write_db_table(ray.data.from_arrow(t), db_path, "feats")
    back = read_db_table(db_path, "feats", split_col="fid",
                         num_splits=3).to_pandas() \
        .sort_values("fid").reset_index(drop=True)
    got = [bytes(b) for b in back["geom"]]
    assert got == geoms
    fg = W.decode(got)
    assert np.allclose(fg.coords[:, 0], np.arange(50))


def test_empty_table_read(db_path):
    src = pq.read_table(f"{SF}/region.parquet")
    write_db_table(ray.data.from_arrow(src), db_path, "region")
    out = read_db_table(db_path, "region", predicate="r_regionkey < 0")
    assert out.count() == 0
    assert "r_name" in out.schema().names


def test_offset_windows_cover_exactly_without_split_col(db_path):
    """Round-5 fix: the no-split_col path ORDER BYs rowid so parallel
    LIMIT/OFFSET windows from independent connections neither overlap
    nor drop rows — with and without a predicate."""
    src = pq.read_table(f"{SF}/customer.parquet")
    write_db_table(ray.data.from_arrow(src), db_path, "customer")
    out = read_db_table(db_path, "customer", num_splits=7).to_pandas()
    assert sorted(out["c_custkey"]) == sorted(
        src["c_custkey"].to_pylist())
    pred = read_db_table(db_path, "customer",
                         predicate="c_acctbal > 0",
                         num_splits=5).to_pandas()
    orig = src.to_pandas()
    want = sorted(orig.loc[orig["c_acctbal"] > 0, "c_custkey"])
    assert sorted(pred["c_custkey"]) == want
