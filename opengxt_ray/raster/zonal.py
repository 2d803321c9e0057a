"""Zonal statistics — per-zone stats of a value raster.

Reference: GT/gridcoverage/RasterZonalOperation.java:69-224 — zones are
rasterized at the value raster's resolution (zone of a cell = zone
containing its center, :104-107), then a paired scan accumulates
per-zone Count/Sum/Mean/Min/Max/Range/StdDev + ``Cell_Area`` (:119-145).

Execution (SURVEY.md §2.7 Zonal row): value tiles × broadcast zone
polygons per tile → per-tile partial visitor (count/sum/sumsq/min/max
per zone, vectorized PIP of cell centers) → ``groupby(zone)`` merge —
the visitor is partial/final-safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..core.util import default_concurrency
from ..ops.join import PolygonBundle, _refine_pairs, _resolve_bundle
from .tiles import RasterMeta


class ZonalVisitor:
    """Actor stage: zone bundle + bbox index built once per actor."""

    def __init__(self, bundle_ref, meta: RasterMeta, zone_key: str,
                 skip_nan: bool = True):
        self.bundle: PolygonBundle = _resolve_bundle(bundle_ref)
        self.index = self.bundle.build_index()
        self.meta = meta
        self.zone_key = zone_key
        self.skip_nan = skip_nan

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = self.meta
        zvals, zn, zs, zs2, zmn, zmx = {}, {}, {}, {}, {}, {}
        keys = self.bundle.attrs[self.zone_key].to_pylist()
        for tx, ty, blob in zip(batch["tx"].to_numpy(), batch["ty"].to_numpy(),
                                batch["data"]):
            h, w = meta.tile_shape(int(tx), int(ty))
            arr = np.frombuffer(blob.as_py(), dtype=np.float64).reshape(h, w)
            lr, lc = np.nonzero(np.ones_like(arr, dtype=bool))
            v = arr[lr, lc]
            gc = lc + tx * meta.tile_size
            gr = lr + ty * meta.tile_size
            x, y = meta.cell_center(gc, gr)
            if self.skip_nan:
                ok = ~np.isnan(v)
                x, y, v = x[ok], y[ok], v[ok]
            pi, gi = _refine_pairs(x, y, self.bundle, self.index, "intersects")
            for g in np.unique(gi):
                sel = pi[gi == g]
                zv = v[sel]
                k = keys[int(g)]
                zn[k] = zn.get(k, 0) + len(zv)
                zs[k] = zs.get(k, 0.0) + float(zv.sum())
                zs2[k] = zs2.get(k, 0.0) + float((zv * zv).sum())
                zmn[k] = min(zmn.get(k, np.inf), float(zv.min()))
                zmx[k] = max(zmx.get(k, -np.inf), float(zv.max()))
        ks = sorted(zn)
        return pa.table({
            self.zone_key: pa.array(ks),
            "n": pa.array([zn[k] for k in ks], pa.int64()),
            "s": pa.array([zs[k] for k in ks]),
            "s2": pa.array([zs2[k] for k in ks]),
            "mn": pa.array([zmn[k] for k in ks]),
            "mx": pa.array([zmx[k] for k in ks]),
        })


def zonal_statistics(tiles, meta: RasterMeta, zones: pa.Table, *,
                     zone_key: str, concurrency=None):
    """Per-zone Count/Sum/Mean/Min/Max/Range/StdDev/Cell_Area."""
    from ..ops.join import put_bundle

    ref = put_bundle(zones)
    partials = tiles.map_batches(
        ZonalVisitor,
        fn_constructor_args=([ref], meta, zone_key),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency(),
    )
    import ray.data.aggregate as A

    agg = partials.groupby(zone_key).aggregate(
        A.Sum("n"), A.Sum("s"), A.Sum("s2"), A.Min("mn"), A.Max("mx"))

    cell_area = meta.cell_size * meta.cell_size

    def _final(b: pa.Table) -> pa.Table:
        n = b["sum(n)"].to_numpy().astype(np.float64)
        s = b["sum(s)"].to_numpy()
        s2 = b["sum(s2)"].to_numpy()
        mean = np.where(n > 0, s / np.where(n > 0, n, 1), 0.0)
        var = np.where(n > 0, s2 / np.where(n > 0, n, 1) - mean ** 2, 0.0)
        return pa.table({
            zone_key: b[zone_key],
            "zcount": pa.array(n),
            "zsum": pa.array(s),
            "zmean": pa.array(mean),
            "zmin": b["min(mn)"],
            "zmax": b["max(mx)"],
            "zrange": pa.array(b["max(mx)"].to_numpy() - b["min(mn)"].to_numpy()),
            "zstd": pa.array(np.sqrt(np.maximum(var, 0.0))),
            "cell_area": pa.array(n * cell_area),
        })

    return agg.map_batches(_final, batch_format="pyarrow")
