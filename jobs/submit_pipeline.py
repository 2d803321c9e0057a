"""Cluster job entry point — `ray job submit` target (north_rule).

Usage (on a cluster):
    ray job submit --working-dir . -- \
        python jobs/submit_pipeline.py --pipeline pip_join \
        --input /data/pages --zones /data/zones.parquet \
        --output /data/out --buckets 256

Local smoke:
    python jobs/submit_pipeline.py --pipeline flagship \
        --sf-dir /root/testdata/sf0.001 --output /tmp/flagship_out

Connects to the running cluster (`ray.init(address="auto")`) unless
RAY_ADDRESS=local; writes checkpoint-resumable bucketed parquet with
per-partition lineage manifests, and prints a one-line JSON summary
(rows, seconds, rows/sec, metrics per stage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root importable whether invoked via `ray job submit --working-dir`
# or directly as a script
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", default="flagship",
                    choices=["flagship", "pip_join", "geocode", "dedup"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--input", default=None, help="pages parquet dir")
    ap.add_argument("--zones", default=None, help="zones parquet file")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cell-res", type=int, default=7)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (cluster mode ignores)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        import os

        if os.environ.get("RAY_ADDRESS", "auto") == "local" or args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus or 8,
                     include_dashboard=False)
        else:
            ray.init(address="auto")

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opengxt_ray.sources import pages, tpch_geo
    from opengxt_ray.state import metrics as M
    from opengxt_ray.state.checkpoint import checkpointed_write

    collector = M.get_collector()
    t0 = time.time()

    if args.pipeline == "flagship":
        from opengxt_ray.pipelines.flagship import flagship

        ds = flagship(args.sf_dir)
        key = "o_orderkey"
        lineage = {"pipeline": "flagship", "sf_dir": args.sf_dir}
    elif args.pipeline == "geocode":
        src = (ray.data.read_parquet(args.input) if args.input
               else pages.pages_dataset(100_000))
        ds = src.map_batches(
            lambda b: pages.geocode_batch(b, res=args.cell_res),
            batch_format="pyarrow")
        key = "fid"
        lineage = {"pipeline": "geocode", "input": args.input or "synthetic"}
    elif args.pipeline == "pip_join":
        from opengxt_ray.ops import join as J

        src = (ray.data.read_parquet(args.input) if args.input
               else pages.pages_dataset(100_000))
        geo = src.map_batches(
            lambda b: pages.geocode_batch(b, res=args.cell_res),
            batch_format="pyarrow")
        zones = (pq.read_table(args.zones) if args.zones
                 else tpch_geo.nation_zones_table(
                     pq.read_table(f"{args.sf_dir}/nation.parquet")))
        slim = geo.drop_columns(["html", "text"])
        ds = J.broadcast_spatial_join(slim, zones, predicate="intersects",
                                      how="inner", dedup="suffix")
        key = "fid"
        lineage = {"pipeline": "pip_join", "zones": args.zones or "nation"}
    else:  # dedup
        from opengxt_ray.textops.dedup import minhash_dedup

        src = (ray.data.read_parquet(args.input) if args.input
               else ray.data.read_parquet(f"{args.sf_dir}/documents.parquet"))
        ds = minhash_dedup(src)
        key = "doc_id"
        lineage = {"pipeline": "dedup", "input": args.input or args.sf_dir}

    ds = M.instrument(ds, f"{args.pipeline}:output", collector)
    manifest = checkpointed_write(ds, args.output, key_col=key,
                                  num_buckets=args.buckets,
                                  stage=args.pipeline, lineage=lineage)
    dt = time.time() - t0
    rows = int(sum(r["rows"] for r in manifest.to_pylist()))
    print(json.dumps({
        "pipeline": args.pipeline, "rows": rows, "sec": round(dt, 2),
        "rows_per_sec": round(rows / dt) if dt > 0 else 0,
        "buckets": args.buckets, "output": args.output,
        "skipped_buckets": int(sum(1 for r in manifest.to_pylist()
                                   if r["skipped"])),
        "stage_metrics": M.summary(collector),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
