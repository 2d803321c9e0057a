"""Checkpoint-resumable stage boundaries with per-partition lineage.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The reference has no checkpointing (requests simply fail,
SURVEY.md §4); this is new engineering required for 100 TB runs.

Design:
- A stage boundary writes partitioned Parquet under
  ``root/bucket=<i>/part.parquet`` where ``i = hash(key) % num_buckets``
  — deterministic, content-addressed by the partition key, never one
  giant file (SURVEY.md "Resumable output").
- Each completed bucket gets an atomic manifest entry
  ``root/_manifest/bucket-<i>.json`` (tmp + rename) recording stage
  name, bucket id, row count, value checksum, and input lineage.
- Resume = re-run the same call: buckets with a manifest entry are
  skipped BEFORE the shuffle (filter pushes to the map side), so a
  crashed run re-does only missing partitions.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..core.fid import hash_ints, hash_strings

MANIFEST_DIR = "_manifest"


def _manifest_path(root: str, bucket: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"bucket-{bucket}.json")


def done_buckets(root: str) -> set[int]:
    mdir = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for f in os.listdir(mdir):
        if f.startswith("bucket-") and f.endswith(".json"):
            out.add(int(f[len("bucket-") : -len(".json")]))
    return out


def _bucket_of(batch: pa.Table, key_col: str, num_buckets: int) -> np.ndarray:
    col = batch[key_col]
    if pa.types.is_string(col.type) or pa.types.is_binary(col.type):
        h = hash_strings(col)
    else:
        h = hash_ints(col.to_numpy(zero_copy_only=False).astype(np.int64))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def checkpointed_write(ds, root: str, *, key_col: str, num_buckets: int = 64,
                       stage: str = "stage", lineage: dict | None = None):
    """Write ds to a resumable partitioned checkpoint. Returns the
    manifest as a pyarrow Table (one row per bucket written or skipped).

    Safe to call again after a crash: completed buckets are filtered
    out on the map side and not recomputed/rewritten.
    """
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    done = done_buckets(root)

    def _assign(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch, key_col, num_buckets)
        out = batch.append_column("__bucket", pa.array(b))
        if not done:
            return out
        keep = ~np.isin(b, list(done))
        return out.filter(pa.array(keep))

    assigned = ds.map_batches(_assign, batch_format="pyarrow")

    def _write_bucket(group: pa.Table) -> pa.Table:
        # fault-injection hook (kill/resume tests): slow each bucket
        # write so a test harness can kill the run mid-stream
        throttle = float(os.environ.get("OGXT_CKPT_THROTTLE_S", "0") or 0.0)
        if throttle:
            import time

            time.sleep(throttle)
        bucket = int(group["__bucket"][0].as_py())
        table = group.drop_columns(["__bucket"])
        # deterministic bucket files: within-bucket row order depends
        # on block arrival, so sort by the key column — a resumed or
        # re-run bucket is then byte-identical to a clean run's
        table = table.sort_by(key_col)
        bdir = os.path.join(root, f"bucket={bucket}")
        os.makedirs(bdir, exist_ok=True)
        # clear tmp files a killed writer may have left behind
        for stale in os.listdir(bdir):
            if stale.endswith(".tmp"):
                os.remove(os.path.join(bdir, stale))
        # atomic data write: tmp file + rename
        fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".tmp")
        os.close(fd)
        pq.write_table(table, tmp)
        final = os.path.join(bdir, "part.parquet")
        os.replace(tmp, final)
        # checksum: order-insensitive hash of the key column
        kc = table[key_col]
        if pa.types.is_string(kc.type) or pa.types.is_binary(kc.type):
            ks = hash_strings(kc)
        else:
            ks = hash_ints(kc.to_numpy(zero_copy_only=False).astype(np.int64))
        checksum = int(np.bitwise_xor.reduce(ks)) if len(ks) else 0
        entry = {
            "stage": stage, "bucket": bucket, "rows": table.num_rows,
            "bytes": os.path.getsize(final),
            "key_col": key_col, "checksum": checksum,
            "lineage": lineage or {},
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.join(root, MANIFEST_DIR))
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, _manifest_path(root, bucket))
        return pa.table({
            "bucket": pa.array([bucket], pa.int64()),
            "rows": pa.array([table.num_rows], pa.int64()),
            "skipped": pa.array([False]),
        })

    written = assigned.groupby("__bucket").map_groups(
        _write_bucket, batch_format="pyarrow").to_pandas()
    skipped = [{"bucket": b, "rows": load_manifest_entry(root, b)["rows"],
                "skipped": True} for b in sorted(done)]
    import pandas as pd

    manifest = pd.concat([written, pd.DataFrame(skipped)]) if skipped else written
    return pa.Table.from_pandas(manifest.sort_values("bucket").reset_index(
        drop=True), preserve_index=False)


def load_manifest_entry(root: str, bucket: int) -> dict:
    with open(_manifest_path(root, bucket)) as f:
        return json.load(f)


def read_checkpoint(root: str):
    """Read a completed (or partial) checkpoint back as a Dataset."""
    import ray

    return ray.data.read_parquet(root)


def checkpoint_complete(root: str, num_buckets: int) -> bool:
    return len(done_buckets(root)) >= num_buckets
