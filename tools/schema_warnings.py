"""Map Ray's "RefBundle with a different schema" warnings to the gate
query that produced them (round-5 typed-empty sweep tool). Runs every
queries() entry at the given sf dir with a logging capture handler on
the ray.data logger and prints queries that warned."""

from __future__ import annotations

import logging
import os
import sys
import time

# this tool exists to SEE the warnings — opt out of the benign-class
# filter __ray_entry__ installs (core/util.py)
os.environ.setdefault("OGXT_KEEP_EMPTY_SCHEMA_WARNINGS", "1")


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.records: list[str] = []

    def emit(self, record):
        msg = record.getMessage()
        if "different schema" in msg:
            self.records.append(msg.split("\n")[0][:200])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    sys.path.insert(0, "/root/repo")
    import ray.data  # noqa: F401 — materialize the ray.data loggers
    import __ray_entry__ as E

    cap = _Capture()
    # ray.data loggers don't propagate to the root — attach to every
    # live logger under the ray hierarchy
    for name in list(logging.Logger.manager.loggerDict):
        if name.startswith("ray"):
            logging.getLogger(name).addHandler(cap)

    bad = {}
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        cap.records = []
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
        except Exception as ex:
            print(f"ERR   {name:24s} {type(ex).__name__}: {ex}")
            continue
        if cap.records:
            bad[name] = list(cap.records)
            print(f"WARN  {name:24s} {len(cap.records)} schema warnings "
                  f"({time.time() - t0:.1f}s)")
            for r in cap.records[:2]:
                print(f"      {r}")
        else:
            print(f"ok    {name:24s} ({time.time() - t0:.1f}s)")
    print(f"\n{len(bad)} queries with schema warnings: {sorted(bad)}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
