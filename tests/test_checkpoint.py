"""Checkpoint/resume + metrics tests."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.state import checkpoint as ck
from opengxt_ray.state import metrics as M


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path / "ckpt")


def _ds(n=5000):
    t = pa.table({"key": pa.array(np.arange(n)),
                  "val": pa.array(np.arange(n) * 0.5)})
    return ray.data.from_arrow(t).repartition(4)


def test_checkpoint_write_and_read(tmp_root):
    manifest = ck.checkpointed_write(_ds(), tmp_root, key_col="key",
                                     num_buckets=8, stage="s1")
    df = manifest.to_pandas()
    assert len(df) == 8
    assert df["rows"].sum() == 5000
    assert not df["skipped"].any()
    assert ck.checkpoint_complete(tmp_root, 8)
    back = ck.read_checkpoint(tmp_root).to_pandas()
    assert len(back) == 5000
    assert set(back["key"]) == set(range(5000))


def test_checkpoint_resume_skips_done(tmp_root):
    ck.checkpointed_write(_ds(), tmp_root, key_col="key", num_buckets=8,
                          stage="s1")
    # simulate a partial failure: delete three buckets + manifests
    for b in (1, 4, 6):
        shutil.rmtree(os.path.join(tmp_root, f"bucket={b}"))
        os.remove(os.path.join(tmp_root, ck.MANIFEST_DIR, f"bucket-{b}.json"))
    assert ck.done_buckets(tmp_root) == {0, 2, 3, 5, 7}
    mtimes = {b: os.path.getmtime(os.path.join(tmp_root, f"bucket={b}",
                                               "part.parquet"))
              for b in (0, 2, 3, 5, 7)}
    manifest = ck.checkpointed_write(_ds(), tmp_root, key_col="key",
                                     num_buckets=8, stage="s1").to_pandas()
    # finished buckets untouched (not rewritten)
    for b, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(
            tmp_root, f"bucket={b}", "part.parquet")) == mt
    assert set(manifest[manifest["skipped"]]["bucket"]) == {0, 2, 3, 5, 7}
    assert set(manifest[~manifest["skipped"]]["bucket"]) == {1, 4, 6}
    back = ck.read_checkpoint(tmp_root).to_pandas()
    assert len(back) == 5000


def test_manifest_lineage(tmp_root):
    ck.checkpointed_write(_ds(1000), tmp_root, key_col="key", num_buckets=4,
                          stage="geocode",
                          lineage={"inputs": ["pages.parquet"], "round": 1})
    e = ck.load_manifest_entry(tmp_root, 0)
    assert e["stage"] == "geocode"
    assert e["lineage"]["inputs"] == ["pages.parquet"]
    assert e["rows"] > 0 and e["checksum"] != 0


def test_metrics_collector():
    col = M.get_collector("test_metrics")
    ray.get(col.reset.remote())
    ds = M.instrument(_ds(2000), "stage_a", col)
    assert ds.count() == 2000
    import time

    for _ in range(50):
        s = M.summary(col)
        if s.get("stage_a", {}).get("rows") == 2000:
            break
        time.sleep(0.1)
    assert s["stage_a"]["rows"] == 2000
    assert s["stage_a"]["blocks"] >= 1
