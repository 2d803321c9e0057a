"""Registry front-end CLI — the WPS-dispatch analogue (SURVEY.md §3.1).

The reference exposes every Process through a WPS endpoint that
unpacks typed params and dispatches by name
(GS/web/wps/*, GT/core/Params.java:36-71); this CLI is that surface
for the Ray engine: process name + typed-params JSON → validate →
build → execute → write_parquet.

Usage:
    # enumerate / inspect
    python jobs/run_process.py --list [category]
    python jobs/run_process.py PointsInPolygon --describe

    # run (dataset/table inputs use @dataset:/ @table: value syntax)
    python jobs/run_process.py PointsInPolygon \
        --params '{"points_ds": "@dataset:/root/testdata/sf0.001/pts",
                   "poly_table": "@table:/tmp/zones.parquet",
                   "poly_key": "zone_id"}' \
        --output /tmp/pip_out

Validation: when the registry entry carries Param specs they are
enforced (required/type); otherwise the builder's signature is
introspected — unknown names and missing required parameters are
rejected with a usage message, bad @dataset/@table paths fail before
Ray starts. Builders whose first parameter is a per-batch ``batch``
(pa.Table → pa.Table) are wrapped in ``map_batches`` over the
``batch`` input automatically.
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ParamError(ValueError):
    pass


_TYPE_CHECKS = {
    "str": lambda v: isinstance(v, str),
    "float": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "int": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "bool": lambda v: isinstance(v, bool),
    "list": lambda v: isinstance(v, list),
}


def _load_value(key: str, val):
    """Resolve @dataset:/@table: references; pass JSON values through."""
    if isinstance(val, str) and val.startswith("@dataset:"):
        path = val[len("@dataset:"):]
        if not os.path.exists(path):
            raise ParamError(f"param {key!r}: dataset path {path!r} "
                             "does not exist")
        import ray

        return ray.data.read_parquet(path)
    if isinstance(val, str) and val.startswith("@table:"):
        path = val[len("@table:"):]
        if not os.path.exists(path):
            raise ParamError(f"param {key!r}: table path {path!r} "
                             "does not exist")
        import pyarrow.parquet as pq

        return pq.read_table(path)
    return val


def _validate_against_spec(entry, raw: dict):
    """Enforce the registry's Param specs (when present)."""
    spec = {p.name: p for p in entry.params}
    for p in entry.params:
        if p.required and p.name not in raw:
            raise ParamError(f"missing required param {p.name!r} "
                             f"({p.type}): {p.doc or entry.name}")
    for k, v in raw.items():
        if k not in spec:
            raise ParamError(
                f"unknown param {k!r} for {entry.name}; expected one of "
                f"{sorted(spec)}")
        p = spec[k]
        if p.type in _TYPE_CHECKS and not isinstance(v, str) \
                and not _TYPE_CHECKS[p.type](v):
            raise ParamError(f"param {k!r} expects {p.type}, got "
                             f"{type(v).__name__}")
        if p.type in ("dataset", "table") and not (
                isinstance(v, str) and v.startswith(f"@{p.type}:")):
            raise ParamError(f"param {k!r} expects @{p.type}:<path>")


def _validate_against_signature(build, raw: dict):
    """Fallback validation: the builder's own signature."""
    try:
        sig = inspect.signature(build)
    except (TypeError, ValueError):
        return  # builtins without signatures: let the call validate
    names = set()
    has_varkw = False
    required = []
    for p in sig.parameters.values():
        if p.kind == inspect.Parameter.VAR_KEYWORD:
            has_varkw = True
            continue
        if p.kind == inspect.Parameter.VAR_POSITIONAL:
            continue
        names.add(p.name)
        if p.default is inspect.Parameter.empty:
            required.append(p.name)
    for k in raw:
        if k not in names and not has_varkw:
            raise ParamError(
                f"unknown param {k!r}; builder accepts {sorted(names)}")
    for k in required:
        if k not in raw:
            raise ParamError(
                f"missing required param {k!r}; builder signature is "
                f"{build.__name__}{sig}")


def run_process(name: str, raw_params: dict, output: str | None):
    from opengxt_ray import registry

    try:
        entry = registry.get(name)
    except KeyError:
        close = [n for n in registry.names()
                 if name.lower() in n.lower() or n.lower() in name.lower()]
        raise ParamError(
            f"unknown process {name!r}"
            + (f"; close matches: {close}" if close else
               "; use --list to enumerate"))
    if entry.params:
        _validate_against_spec(entry, raw_params)
    else:
        _validate_against_signature(entry.build, raw_params)
    kwargs = {k: _load_value(k, v) for k, v in raw_params.items()}
    t0 = time.perf_counter()
    # per-batch builders (batch: pa.Table -> pa.Table) map over the
    # 'batch' dataset input — the WPS "collection in, collection out"
    # convention
    try:
        first = next(iter(inspect.signature(entry.build).parameters), None)
    except (TypeError, ValueError):
        first = None
    if first == "batch":
        ds = kwargs.pop("batch")
        import functools

        fn = functools.partial(entry.build, **kwargs)
        result = ds.map_batches(fn, batch_format="pyarrow")
    else:
        result = entry.build(**kwargs)
    summary = {"process": name, "category": entry.category}
    import pandas as pd
    import pyarrow as pa

    if hasattr(result, "write_parquet"):  # ray Dataset: stream out
        if not output:
            raise ParamError("--output is required for Dataset results")
        result.write_parquet(output)
        summary["rows"] = result.count()
        summary["output"] = output
    elif isinstance(result, (pa.Table, pd.DataFrame)):
        tab = result if isinstance(result, pa.Table) \
            else pa.Table.from_pandas(result, preserve_index=False)
        summary["rows"] = tab.num_rows
        if output:
            import pyarrow.parquet as pq

            os.makedirs(output, exist_ok=True)
            pq.write_table(tab, os.path.join(output, "part-0.parquet"))
            summary["output"] = output
        else:
            summary["result"] = tab.to_pylist()[:50]
    else:
        summary["result"] = result
    summary["sec"] = round(time.perf_counter() - t0, 3)
    return summary


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Run a registered process by name (WPS analogue)")
    ap.add_argument("process", nargs="?", help="registry process name")
    ap.add_argument("--params", default="{}",
                    help="JSON object; @dataset:<path> / @table:<path> "
                         "values load parquet inputs")
    ap.add_argument("--output", default=None, help="output parquet dir")
    ap.add_argument("--list", nargs="?", const="", default=None,
                    metavar="CATEGORY", help="list processes")
    ap.add_argument("--describe", action="store_true",
                    help="print the process's params/signature")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    from opengxt_ray import registry

    if args.list is not None:
        cats = registry.by_category()
        for cat in sorted(cats):
            if args.list and cat != args.list:
                continue
            print(f"[{cat}]")
            for n in cats[cat]:
                print(f"  {n}")
        return 0
    if not args.process:
        ap.error("process name required (or --list)")
    if args.describe:
        entry = registry.get(args.process)
        info = {"name": entry.name, "category": entry.category,
                "reference": entry.reference,
                "params": [{"name": p.name, "type": p.type,
                            "required": p.required, "default": p.default,
                            "doc": p.doc} for p in entry.params]}
        try:
            info["signature"] = str(inspect.signature(entry.build))
        except (TypeError, ValueError):
            pass
        print(json.dumps(info, indent=2, default=str))
        return 0
    try:
        raw = json.loads(args.params)
        if not isinstance(raw, dict):
            raise ParamError("--params must be a JSON object")
    except json.JSONDecodeError as e:
        print(f"error: --params is not valid JSON: {e}", file=sys.stderr)
        return 2
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kw)
    try:
        summary = run_process(args.process, raw, args.output)
    except ParamError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        ray.shutdown()
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
