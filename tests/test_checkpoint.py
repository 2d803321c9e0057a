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


_CHILD_SCRIPT = """
import os, sys
sys.path.insert(0, __REPO__)
os.environ["OGXT_CKPT_THROTTLE_S"] = "1.0"   # before ray.init: workers inherit
import numpy as np
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=2, include_dashboard=False)
from opengxt_ray.state import checkpoint as ck

n = 5000
t = pa.table({"key": pa.array(np.arange(n)),
              "val": pa.array(np.arange(n) * 0.5)})
ds = ray.data.from_arrow(t).repartition(4)
ck.checkpointed_write(ds, sys.argv[1], key_col="key", num_buckets=8,
                      stage="s1", lineage={"inputs": ["x"]})
"""


def test_checkpoint_kill_resume_byte_identical(tmp_root, tmp_path):
    """Round-5 north-rule proof: a REAL mid-stream kill (SIGKILL of the
    whole writer process group), then resume — only the missing buckets
    recompute, and every bucket file is byte-identical to a clean
    one-shot run's."""
    import signal
    import subprocess
    import sys
    import time

    import opengxt_ray

    repo = os.path.dirname(os.path.dirname(
        os.path.abspath(opengxt_ray.__file__)))
    script = tmp_path / "child_writer.py"
    script.write_text(_CHILD_SCRIPT.replace("__REPO__", repr(repo)))
    proc = subprocess.Popen(
        [sys.executable, str(script), tmp_root],
        start_new_session=True,  # own process group: killpg takes Ray too
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            if len(ck.done_buckets(tmp_root)) >= 3:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    "writer exited before the kill window (rc=%s, %d "
                    "buckets done)" % (proc.returncode,
                                       len(ck.done_buckets(tmp_root))))
            time.sleep(0.05)
        else:
            raise AssertionError("writer never reached 3 buckets")
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    finally:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.wait()
    done_before = ck.done_buckets(tmp_root)
    assert 0 < len(done_before) < 8, "kill did not land mid-stream"
    # resume in this session: exactly the missing buckets recompute
    manifest = ck.checkpointed_write(
        _ds(), tmp_root, key_col="key", num_buckets=8, stage="s1",
        lineage={"inputs": ["x"]}).to_pandas()
    assert set(manifest[manifest["skipped"]]["bucket"]) == done_before
    recomputed = set(manifest[~manifest["skipped"]]["bucket"])
    assert recomputed == set(range(8)) - done_before
    # clean one-shot reference run → byte-identical bucket files
    ref_root = str(tmp_path / "ref")
    ck.checkpointed_write(_ds(), ref_root, key_col="key", num_buckets=8,
                          stage="s1", lineage={"inputs": ["x"]})
    for b in range(8):
        with open(os.path.join(tmp_root, f"bucket={b}",
                               "part.parquet"), "rb") as f:
            got = f.read()
        with open(os.path.join(ref_root, f"bucket={b}",
                               "part.parquet"), "rb") as f:
            ref = f.read()
        assert got == ref, f"bucket {b} differs from clean run"
    # manifest lineage carried through both writers
    for b in range(8):
        e = ck.load_manifest_entry(tmp_root, b)
        assert e["lineage"]["inputs"] == ["x"] and e["stage"] == "s1"
    back = ck.read_checkpoint(tmp_root).to_pandas()
    assert len(back) == 5000 and set(back["key"]) == set(range(5000))


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
