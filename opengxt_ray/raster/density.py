"""Kernel / point density rasters.

Reference: GT/gridcoverage/RasterKernelDensityOperation.java —
- kernel window radius = floor(searchRadius / cellSize) integer cells
  (:211-212); 11 kernel types, Quadratic default = Silverman (1986)
  eq. 4.5: ``3·(1 − d²/r²)²`` (:262-265);
- scaleArea = (#nonzero kernel cells) · cellArea, divided by 10⁶ on
  projected CRS (km², :84-89);
- cell += weight · kernelValue / scaleArea (:181);
- defaults: searchRadius = min(extent w, h)/30 (:66-71), cellsize =
  min(w, h)/250 (RasterProcessingOperation.java:412-417).
- PointDensity: GT/gridcoverage/RasterPointDensityOperation.java —
  neighborhood sum / neighborhood area (Binary kernel / area).

Execution: the scatter is additive — each batch scatters its points'
kernel windows into per-tile partial arrays (vectorized COO build),
then one ``groupby(tile)`` merges partials. Kernel footprints spanning
tile borders are handled naturally by the COO→tile split (SURVEY.md
§2.7 Density row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .tiles import RasterMeta, partials_from_coo, reduce_tiles

KERNELS = ("binary", "cosine", "distance", "epanechnikov", "gaussian",
           "inverse_distance", "quadratic", "quartic", "triangular",
           "triweight", "tricube")


def kernel_matrix(radius_cells: int, kernel: str = "quadratic"
                  ) -> tuple[np.ndarray, int]:
    """(2r+1)² kernel weights + valid-cell count, replicating
    RasterKernelDensityOperation.getKernel(:205-293)."""
    r = radius_cells
    w = 2 * r + 1
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    dist2 = (dx * dx + dy * dy).astype(np.float64)
    r2 = float(r * r)
    dist = np.sqrt(dist2)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = dist / r if r > 0 else np.zeros_like(dist)
        if kernel == "binary":
            val = np.ones_like(dist)
        elif kernel == "cosine":
            val = (np.pi / 4.0) * np.cos(np.pi * u / 2.0)
        elif kernel == "distance":
            val = dist
        elif kernel == "epanechnikov":
            val = 3.0 * (1.0 - u * u) / 4.0
        elif kernel == "gaussian":
            val = (1.0 / np.sqrt(2 * np.pi)) * np.exp(-0.5 * u * u)
        elif kernel == "inverse_distance":
            val = np.where(dist == 0, 0.0, 1.0 / np.where(dist == 0, 1.0, dist))
        elif kernel == "quadratic":
            term = 1.0 - dist2 / r2 if r > 0 else np.zeros_like(dist2)
            val = 3.0 * term * term
        elif kernel == "quartic":
            val = (15.0 / 16.0) * (1.0 - u * u) ** 2
        elif kernel == "triangular":
            val = 1.0 - u
        elif kernel == "triweight":
            val = (35.0 / 32.0) * (1.0 - u * u) ** 3
        elif kernel == "tricube":
            t = 1.0 - np.abs(u) ** 3
            val = (70.0 / 81.0) * t * t * t
        else:
            raise ValueError(f"unknown kernel {kernel}")
    val = np.where(dist2 > r2, 0.0, np.maximum(val, 0.0))
    return val, int(np.count_nonzero(val))


def kernel_density(ds, meta: RasterMeta, *, search_radius: float,
                   kernel: str = "quadratic", weight_col: str | None = None,
                   geographic: bool = True,
                   xcol: str = "lon", ycol: str = "lat"):
    """Kernel density raster → tile Dataset (tx, ty, data float64).

    Accumulates in float64 per tile (the reference's float32 add order
    is block-order-dependent; float64 partials keep the result exact
    and deterministic — SURVEY.md §7.4 numeric-parity note).
    """
    r = int(np.floor(search_radius / meta.cell_size))
    K, valid = kernel_matrix(r, kernel)
    cell_area = meta.cell_size * meta.cell_size
    scale_area = valid * cell_area
    if not geographic:
        scale_area /= 1_000_000.0
    kw = 2 * r + 1
    krows, kcols = np.nonzero(K)
    kvals = K[krows, kcols] / scale_area
    kdr = krows - r
    kdc = kcols - r

    # TWO-STAGE scatter (round 3): stage 1 accumulates per-CELL weight
    # sums on an r-cell-padded grid (points just outside the extent
    # still contribute, like the reference's window writes); stage 2
    # smears the kernel over the NONZERO CELLS only. The density is a
    # convolution, so Σ_p w_p·K[c−cell(p)] = Σ_cells (Σw)·K — the
    # one-stage per-point COO expansion was O(points × kernel_cells)
    # (414M entries at sf0.1, dominated by the partials argsort);
    # this is O(points + nonzero_cells × kernel_cells).
    pad = RasterMeta(meta.origin_x - r * meta.cell_size,
                     meta.origin_y + r * meta.cell_size,
                     meta.cell_size, meta.width + 2 * r,
                     meta.height + 2 * r, meta.tile_size)

    def _cells(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        col, row = pad.world_to_cell(x, y)
        w = (batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight_col else np.ones(len(x)))
        return partials_from_coo(pad, row, col, w)

    wt = reduce_tiles(ds.map_batches(_cells, batch_format="pyarrow"), pad)
    return _smear_tiles(wt, pad, meta, r, kdr, kdc, kvals)


def _smear_tiles(wt, src_meta: RasterMeta, out_meta: RasterMeta,
                 offset: int, kdr, kdc, kvals):
    """Stage 2 of the density factorization: scatter kernel windows
    from the NONZERO cells of the accumulated weight tiles (src grid,
    shifted by ``offset`` cells relative to the output grid)."""
    ts = src_meta.tile_size

    def _smear(batch: pa.Table) -> pa.Table:
        txs = batch["tx"].to_numpy()
        tys = batch["ty"].to_numpy()
        rows_l, cols_l, vals_l = [], [], []
        for i in range(batch.num_rows):
            tx, ty = int(txs[i]), int(tys[i])
            h, w_ = src_meta.tile_shape(tx, ty)
            tile = np.frombuffer(batch["data"][i].as_py(),
                                 np.float64).reshape(h, w_)
            lr, lc = np.nonzero(tile)
            if len(lr) == 0:
                continue
            wv = tile[lr, lc]
            gr = lr + ty * ts - offset   # src → output grid coords
            gc = lc + tx * ts - offset
            rows_l.append((gr[:, None] + kdr[None, :]).ravel())
            cols_l.append((gc[:, None] + kdc[None, :]).ravel())
            vals_l.append((wv[:, None] * kvals[None, :]).ravel())
        if not rows_l:
            return pa.table({"tkey": pa.array([], pa.int64()),
                             "data": pa.array([], pa.binary())})
        return partials_from_coo(out_meta, np.concatenate(rows_l),
                                 np.concatenate(cols_l),
                                 np.concatenate(vals_l))

    return reduce_tiles(wt.map_batches(_smear, batch_format="pyarrow"),
                        out_meta)


def point_density(ds, meta: RasterMeta, *, search_radius: float,
                  weight_col: str | None = None,
                  xcol: str = "lon", ycol: str = "lat"):
    """PointDensity — neighborhood (binary-kernel) sum / neighborhood
    area (RasterPointDensityOperation semantics)."""
    return kernel_density(ds, meta, search_radius=search_radius,
                          kernel="binary", weight_col=weight_col,
                          xcol=xcol, ycol=ycol)


def line_density(ds, meta: RasterMeta, *, search_radius: float,
                 weight_col: str | None = None, geographic: bool = True,
                 geom_col: str = "geom"):
    """LineDensity (GT/gridcoverage/RasterLineDensityOperation.java:
    lineToRaster 1.1px additive stroke + binary neighborhood kernel,
    scaleArea/1000 on projected CRS) → tile Dataset.

    Ray-native two-stage (round 3): per feature, cells TOUCHED by the
    line are burned with the feature weight (densified traversal
    stands in for the Java2D stroke) and reduced per tile; convolution
    linearity then lets the binary kernel window scatter ONCE per
    nonzero burned cell (:func:`_smear_tiles`) instead of per
    (feature, cell) pair.
    """
    from ..core import wkb as _wkb
    from .rasterize import _covered_cells

    r = int(np.floor(search_radius / meta.cell_size))
    K, valid = kernel_matrix(r, "binary")
    scale_area = valid * meta.cell_size * meta.cell_size
    if not geographic:
        scale_area /= 1000.0
    krows, kcols = np.nonzero(K)
    kdr = krows - r
    kdc = kcols - r
    kvals = K[krows, kcols] / scale_area

    def _burn(batch: pa.Table) -> pa.Table:
        fg = _wkb.decode(batch[geom_col].to_pylist())
        bboxes = fg.bboxes()
        w = (batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight_col else np.ones(len(fg)))
        rows_l, cols_l, vals_l = [], [], []
        for i in range(len(fg)):
            rr, cc = _covered_cells(fg, i, meta, bboxes)
            # burn only in-extent cells (the reference's raster stops at
            # the grid extent; an outside burned cell must not leak
            # kernel mass back in)
            ok = ((cc >= 0) & (cc < meta.width)
                  & (rr >= 0) & (rr < meta.height))
            rr, cc = rr[ok], cc[ok]
            if len(rr) == 0:
                continue
            rows_l.append(rr)
            cols_l.append(cc)
            vals_l.append(np.full(len(rr), w[i]))
        if not rows_l:
            return pa.table({"tkey": pa.array([], pa.int64()),
                             "data": pa.array([], pa.binary())})
        return partials_from_coo(meta, np.concatenate(rows_l),
                                 np.concatenate(cols_l),
                                 np.concatenate(vals_l))

    wt = reduce_tiles(ds.map_batches(_burn, batch_format="pyarrow"), meta)
    return _smear_tiles(wt, meta, meta, 0, kdr, kdc, kvals)
