"""Per-partition lineage / row-count metrics (north_rule requirement).

A named Ray actor collects (stage, block) row counts and byte sizes as
pipelines execute; any stage can be instrumented by wrapping it with
:func:`instrument`. The driver pulls a summary at the end — the
distributed replacement for the reference's ignored ProgressListener
(GT/gridcoverage/RasterProcessingOperation.java:99).
"""

from __future__ import annotations

import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class MetricsCollector:
    def __init__(self):
        self.records: list[dict] = []

    def record(self, stage: str, rows: int, nbytes: int) -> None:
        self.records.append({"stage": stage, "rows": rows, "bytes": nbytes})

    def summary(self) -> dict:
        out: dict = {}
        for r in self.records:
            s = out.setdefault(r["stage"], {"blocks": 0, "rows": 0, "bytes": 0})
            s["blocks"] += 1
            s["rows"] += r["rows"]
            s["bytes"] += r["bytes"]
        return out

    def reset(self) -> None:
        self.records.clear()


def get_collector(name: str = "opengxt_metrics") -> "ray.actor.ActorHandle":
    try:
        return ray.get_actor(name)
    except ValueError:
        return MetricsCollector.options(name=name, lifetime="detached") \
            .remote()


def instrument(ds, stage: str, collector=None):
    """Pass-through map_batches that reports per-block rows/bytes."""
    handle = collector or get_collector()

    def _report(batch: pa.Table) -> pa.Table:
        handle.record.remote(stage, batch.num_rows, batch.nbytes)
        return batch

    return ds.map_batches(_report, batch_format="pyarrow")


def summary(collector=None) -> dict:
    handle = collector or get_collector()
    return ray.get(handle.summary.remote())
