"""Flagship pipeline — the north-star slice (SURVEY.md §7.1 step 2).

pages/orders table → derive/geocode points → hex-cell assignment →
H3-partitioned PIP join against polygon zones → per-zone aggregate,
with the wide payload (text) flowing through byte-identical.

Exercises in one pipeline: parquet read with column pruning, stateless
vectorized map_batches, broadcast actor-pool join, shuffle aggregate,
and deterministic output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..index import hexgrid
from ..ops import join as J
from ..ops.pip import points_in_polygon
from ..sources import tpch_geo


def flagship(sf_dir: str = "/root/testdata/sf0.001", *, res: int = 5):
    """orders → points → cell → PIP join vs nation zones → joined rows.

    Returns the joined Dataset (o_orderkey, lon, lat, cell,
    n_nationkey, n_name, n_regionkey).
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    zones = tpch_geo.nation_zones_table(nation)
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey"])

    def _prep(batch: pa.Table) -> pa.Table:
        out = tpch_geo.add_point_geom(batch, "o_orderkey", with_wkb=False)
        cell = hexgrid.hex_cell(out["lon"].to_numpy(), out["lat"].to_numpy(), res)
        return out.append_column("cell", pa.array(cell, pa.uint64()))

    pts = orders.map_batches(_prep, batch_format="pyarrow")
    return J.broadcast_spatial_join(pts, zones, predicate="intersects",
                                    how="inner", dedup="suffix")


def flagship_zone_counts(sf_dir: str = "/root/testdata/sf0.001"):
    """Per-zone counts of the flagship join (the aggregate stage)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    zones = tpch_geo.nation_zones_table(nation)
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey"])
    pts = orders.map_batches(
        lambda b: tpch_geo.add_point_geom(b, "o_orderkey", with_wkb=False),
        batch_format="pyarrow")
    return points_in_polygon(pts, zones, poly_key="n_nationkey")
