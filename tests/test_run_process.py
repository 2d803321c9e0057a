"""Registry CLI (jobs/run_process.py): WPS-analogue dispatch —
param validation, @dataset/@table loading, batch-builder wrapping,
end-to-end execute + write."""

import json
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))

import run_process as rp  # noqa: E402

SF = os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_unknown_process_suggests():
    with pytest.raises(rp.ParamError, match="close matches.*TokenCount"):
        rp.run_process("tokencount", {}, None)


def test_unknown_and_missing_params_rejected():
    with pytest.raises(rp.ParamError, match="unknown param 'bogus'"):
        rp.run_process("StatisticsFeatures",
                       {"ds": f"@dataset:{SF}/lineitem.parquet",
                        "bogus": 1}, None)
    with pytest.raises(rp.ParamError, match="missing required param"):
        rp.run_process("StatisticsFeatures",
                       {"ds": f"@dataset:{SF}/lineitem.parquet"}, None)


def test_bad_dataset_path_fails_before_execution():
    with pytest.raises(rp.ParamError, match="does not exist"):
        rp.run_process("ExactDedup",
                       {"ds": "@dataset:/no/such/path.parquet"}, None)


def test_batch_builder_wrapped_in_map_batches(tmp_path):
    out = str(tmp_path / "tok")
    s = rp.run_process("TokenCount",
                       {"batch": f"@dataset:{SF}/documents.parquet",
                        "text_col": "text"}, out)
    assert s["rows"] == 500
    back = pq.read_table(out)
    assert "n_tokens" in back.column_names or any(
        "token" in c for c in back.column_names)


def test_dataset_builder_end_to_end(tmp_path):
    out = str(tmp_path / "stats")
    s = rp.run_process(
        "StatisticsFeatures",
        {"ds": f"@dataset:{SF}/lineitem.parquet",
         "value_cols": ["l_quantity", "l_extendedprice"]}, out)
    assert s["rows"] == 1
    back = pq.read_table(out).to_pylist()[0]
    # mean of l_quantity at sf0.001 is in a sane physical range
    key = [k for k in back if "mean" in k and "quantity" in k]
    assert key and 1.0 < back[key[0]] < 51.0


def test_describe_and_list_shapes():
    from opengxt_ray import registry

    e = registry.get("PointsInPolygon")
    assert e.category == "join"
    assert registry.by_category()["join"]
