"""Raster extent/grid manipulation: clip, flip/mirror/rotate/shift,
resample.

Reference: GT/gridcoverage/RasterClipOperation, RasterCropOperation,
RasterFlipOperation (171), RasterResampleOperation, RasterShiftOperation
— per SURVEY §2.7 "MB over tiles (resample needs source-tile gather per
target tile)".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .tiles import RasterMeta, _tile_key


def _gather_dense(tiles, meta: RasterMeta,
                  max_cells: int = 128_000_000) -> np.ndarray:
    """Materialize a full dense array (small rasters / driver-side ops
    — GeoTIFF export, whole-raster rotate). Bulk ``take_all`` (one
    object-store fetch per block, not a per-row RPC loop); rasters
    past ``max_cells`` (~1 GiB float64) raise instead of silently
    flooding the driver heap — large-raster variants stay tiled."""
    if meta.width * meta.height > max_cells:
        raise ValueError(
            f"_gather_dense: raster {meta.width}x{meta.height} exceeds "
            f"max_cells={max_cells}; use the tiled variant of this op")
    out = np.full((meta.height, meta.width), np.nan)
    for row in tiles.take_all():
        tx, ty = row["tx"], row["ty"]
        h, w = meta.tile_shape(tx, ty)
        out[ty * meta.tile_size : ty * meta.tile_size + h,
            tx * meta.tile_size : tx * meta.tile_size + w] = \
            np.frombuffer(row["data"], np.float64).reshape(h, w)
    return out


def clip_by_extent(tiles, meta: RasterMeta,
                   extent: tuple[float, float, float, float]):
    """Keep only tiles intersecting the extent; NaN-out cells outside.
    Returns (tiles, same meta) — grid unchanged, values masked."""
    minx, miny, maxx, maxy = extent

    def _clip(batch: pa.Table) -> pa.Table:
        keep_idx, out = [], []
        for i, (tx, ty) in enumerate(zip(batch["tx"].to_numpy(),
                                         batch["ty"].to_numpy())):
            h, w = meta.tile_shape(int(tx), int(ty))
            cols = np.arange(tx * meta.tile_size, tx * meta.tile_size + w)
            rows = np.arange(ty * meta.tile_size, ty * meta.tile_size + h)
            cx, cy = meta.cell_center(*np.meshgrid(cols, rows))
            mask = (cx >= minx) & (cx <= maxx) & (cy >= miny) & (cy <= maxy)
            if not mask.any():
                continue
            arr = np.frombuffer(batch["data"][i].as_py(),
                                np.float64).reshape(h, w)
            keep_idx.append(i)
            out.append(np.where(mask, arr, np.nan).tobytes())
        kept = batch.take(pa.array(keep_idx)) if keep_idx else batch.slice(0, 0)
        if len(kept):
            kept = kept.set_column(kept.column_names.index("data"), "data",
                                   pa.array(out, pa.binary()))
        return kept

    return tiles.map_batches(_clip, batch_format="pyarrow")


def flip(tiles, meta: RasterMeta, *, axis: str = "vertical"):
    """Flip (vertical = upside-down) / mirror (horizontal)."""

    def _flip(batch: pa.Table) -> pa.Table:
        txs = batch["tx"].to_numpy()
        tys = batch["ty"].to_numpy()
        out_tx, out_ty, out_d = [], [], []
        for tx, ty, blob in zip(txs, tys, batch["data"]):
            h, w = meta.tile_shape(int(tx), int(ty))
            arr = np.frombuffer(blob.as_py(), np.float64).reshape(h, w)
            if axis == "vertical":
                # full flip needs consistent tile sizes; exact when
                # height % tile_size == 0 (else use dense path)
                nty = meta.tiles_y - 1 - int(ty)
                out_d.append(arr[::-1].tobytes())
                out_tx.append(int(tx))
                out_ty.append(nty)
            else:
                ntx = meta.tiles_x - 1 - int(tx)
                out_d.append(arr[:, ::-1].tobytes())
                out_tx.append(ntx)
                out_ty.append(int(ty))
        return pa.table({"tx": pa.array(out_tx, pa.int32()),
                         "ty": pa.array(out_ty, pa.int32()),
                         "data": pa.array(out_d, pa.binary())})

    return tiles.map_batches(_flip, batch_format="pyarrow")


def shift(tiles, meta: RasterMeta, *, dx: float, dy: float):
    """RasterShift — move the grid origin (metadata-only; tiles
    unchanged). Returns (tiles, new_meta)."""
    new_meta = RasterMeta(meta.origin_x + dx, meta.origin_y + dy,
                          meta.cell_size, meta.width, meta.height,
                          meta.tile_size, meta.nodata)
    return tiles, new_meta


def resample(tiles, meta: RasterMeta, *, cell_size: float,
             method: str = "nearest", parallelism: int = 8):
    """Resample to a new cell size (nearest / bilinear).

    Nearest resampling of rasters past 4M cells routes through the
    co-shuffled tile path (no dense driver broadcast — source tiles
    ship only to the output tiles they serve); bilinear stays on the
    broadcast copy (documented: it needs cross-tile neighbor pixels).
    """
    if method == "nearest" and meta.width * meta.height > _COSHUFFLE_CELLS:
        new_meta = RasterMeta(
            meta.origin_x, meta.origin_y, cell_size,
            int(np.ceil(meta.width * meta.cell_size / cell_size)),
            int(np.ceil(meta.height * meta.cell_size / cell_size)),
            meta.tile_size, meta.nodata)
        ident = lambda x, y: (x, y)  # noqa: E731 — same world frame
        return _inverse_map_resample_coshuffle(tiles, meta, new_meta,
                                               ident, ident, clip_oob=True)
    dense = _gather_dense(tiles, meta)
    ref = ray.put(dense)
    new_meta = RasterMeta(
        meta.origin_x, meta.origin_y, cell_size,
        int(np.ceil(meta.width * meta.cell_size / cell_size)),
        int(np.ceil(meta.height * meta.cell_size / cell_size)),
        meta.tile_size, meta.nodata)
    n = new_meta.tiles_x * new_meta.tiles_y

    def _gen(batch: pa.Table) -> pa.Table:
        src = ray.get(ref)
        ids = batch["id"].to_numpy()
        out_tx, out_ty, out_d = [], [], []
        for tid in ids:
            tx = int(tid % new_meta.tiles_x)
            ty = int(tid // new_meta.tiles_x)
            h, w = new_meta.tile_shape(tx, ty)
            cols = np.arange(tx * new_meta.tile_size,
                             tx * new_meta.tile_size + w)
            rows = np.arange(ty * new_meta.tile_size,
                             ty * new_meta.tile_size + h)
            x, y = new_meta.cell_center(*np.meshgrid(cols, rows))
            fc = (x - meta.origin_x) / meta.cell_size - 0.5
            fr = (meta.origin_y - y) / meta.cell_size - 0.5
            if method == "nearest":
                sc = np.clip(np.round(fc).astype(np.int64), 0, meta.width - 1)
                sr = np.clip(np.round(fr).astype(np.int64), 0, meta.height - 1)
                vals = src[sr, sc]
            else:  # bilinear
                c0 = np.clip(np.floor(fc).astype(np.int64), 0, meta.width - 1)
                r0 = np.clip(np.floor(fr).astype(np.int64), 0, meta.height - 1)
                c1 = np.clip(c0 + 1, 0, meta.width - 1)
                r1 = np.clip(r0 + 1, 0, meta.height - 1)
                wc = np.clip(fc - c0, 0, 1)
                wr = np.clip(fr - r0, 0, 1)
                vals = (src[r0, c0] * (1 - wr) * (1 - wc)
                        + src[r0, c1] * (1 - wr) * wc
                        + src[r1, c0] * wr * (1 - wc)
                        + src[r1, c1] * wr * wc)
            out_tx.append(tx)
            out_ty.append(ty)
            out_d.append(vals.astype(np.float64).tobytes())
        return pa.table({"tx": pa.array(out_tx, pa.int32()),
                         "ty": pa.array(out_ty, pa.int32()),
                         "data": pa.array(out_d, pa.binary())})

    out = ray.data.range(n, override_num_blocks=parallelism).map_batches(
        _gen, batch_format="pyarrow")
    return out, new_meta


def clip_by_circle(tiles, meta: RasterMeta, *, cx: float, cy: float,
                   radius: float, inside: bool = True):
    """RasterClip by circle — NaN-out cells whose center falls outside
    (inside=True) / inside (inside=False) the circle; tiles with no
    surviving cell are dropped (GT/gridcoverage/RasterClipOperation)."""
    r2 = radius * radius

    def _clip(batch: pa.Table) -> pa.Table:
        keep_idx, out = [], []
        for i, (tx, ty) in enumerate(zip(batch["tx"].to_numpy(),
                                         batch["ty"].to_numpy())):
            h, w = meta.tile_shape(int(tx), int(ty))
            cols = np.arange(tx * meta.tile_size, tx * meta.tile_size + w)
            rows = np.arange(ty * meta.tile_size, ty * meta.tile_size + h)
            px, py = meta.cell_center(*np.meshgrid(cols, rows))
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            mask = d2 <= r2 if inside else d2 > r2
            if not mask.any():
                continue
            arr = np.frombuffer(batch["data"][i].as_py(),
                                np.float64).reshape(h, w)
            keep_idx.append(i)
            out.append(np.where(mask, arr, np.nan).tobytes())
        kept = batch.take(pa.array(keep_idx)) if keep_idx else batch.slice(0, 0)
        if len(kept):
            kept = kept.set_column(kept.column_names.index("data"), "data",
                                   pa.array(out, pa.binary()))
        return kept

    return tiles.map_batches(_clip, batch_format="pyarrow")


def clip_by_features(tiles, meta: RasterMeta, feature_table, *,
                     geom_col: str = "geom", inside: bool = True):
    """RasterClip by polygon features — cell-center containment against
    the broadcast feature set (bbox-index candidates per tile)."""
    import ray

    from ..core import geomops, wkb as _wkb
    from ..core.gridindex import BBoxIndex

    fg = _wkb.decode(feature_table[geom_col].to_pylist())
    ref = ray.put(fg)

    def _clip(batch: pa.Table) -> pa.Table:
        fg_ = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        index = BBoxIndex(fg_.bboxes())
        keep_idx, out = [], []
        for i, (tx, ty) in enumerate(zip(batch["tx"].to_numpy(),
                                         batch["ty"].to_numpy())):
            h, w = meta.tile_shape(int(tx), int(ty))
            cols = np.arange(tx * meta.tile_size, tx * meta.tile_size + w)
            rows = np.arange(ty * meta.tile_size, ty * meta.tile_size + h)
            px, py = meta.cell_center(*np.meshgrid(cols, rows))
            tb = np.array([px.min() - meta.cell_size, py.min() - meta.cell_size,
                           px.max() + meta.cell_size, py.max() + meta.cell_size])
            cands = index.query_bbox(tb)
            mask = np.zeros(px.shape, dtype=bool)
            for g in cands:
                mask |= geomops.points_in_geom(px.ravel(), py.ravel(),
                                               fg_, int(g)).reshape(px.shape)
            if not inside:
                mask = ~mask
            if not mask.any():
                continue
            arr = np.frombuffer(batch["data"][i].as_py(),
                                np.float64).reshape(h, w)
            keep_idx.append(i)
            out.append(np.where(mask, arr, np.nan).tobytes())
        kept = batch.take(pa.array(keep_idx)) if keep_idx else batch.slice(0, 0)
        if len(kept):
            kept = kept.set_column(kept.column_names.index("data"), "data",
                                   pa.array(out, pa.binary()))
        return kept

    return tiles.map_batches(_clip, batch_format="pyarrow")


def clip_by_geometry(tiles, meta: RasterMeta, geom_wkb: bytes, *,
                     inside: bool = True):
    """RasterClip by a single geometry."""
    import pyarrow as pa_

    tab = pa_.table({"geom": pa_.array([geom_wkb], pa_.binary())})
    return clip_by_features(tiles, meta, tab, inside=inside)


def mirror(tiles, meta: RasterMeta):
    """RasterMirrorOperation — horizontal mirror."""
    return flip(tiles, meta, axis="horizontal")


def _inverse_map_resample(tiles, meta: RasterMeta, new_meta: RasterMeta,
                          inv_fn, *, method: str = "nearest",
                          parallelism: int = 8):
    """Generate the target grid by inverse-mapping each target cell
    center into the source grid (nearest / bilinear). Source raster is
    broadcast dense (driver gather — documented small/medium path, same
    convention as resample)."""
    import ray

    dense = _gather_dense(tiles, meta)
    ref = ray.put(dense)
    n = new_meta.tiles_x * new_meta.tiles_y

    def _gen(batch: pa.Table) -> pa.Table:
        src = ray.get(ref)
        ids = batch["id"].to_numpy()
        out_tx, out_ty, out_d = [], [], []
        for tid in ids:
            tx = int(tid % new_meta.tiles_x)
            ty = int(tid // new_meta.tiles_x)
            h, w = new_meta.tile_shape(tx, ty)
            cols = np.arange(tx * new_meta.tile_size,
                             tx * new_meta.tile_size + w)
            rows = np.arange(ty * new_meta.tile_size,
                             ty * new_meta.tile_size + h)
            x, y = new_meta.cell_center(*np.meshgrid(cols, rows))
            sx, sy = inv_fn(x.ravel(), y.ravel())
            fc = (sx - meta.origin_x) / meta.cell_size - 0.5
            fr = (meta.origin_y - sy) / meta.cell_size - 0.5
            inb = ((fc > -0.5) & (fc < meta.width - 0.5)
                   & (fr > -0.5) & (fr < meta.height - 0.5))
            if method == "nearest":
                sc = np.clip(np.round(fc).astype(np.int64), 0, meta.width - 1)
                sr = np.clip(np.round(fr).astype(np.int64), 0, meta.height - 1)
                vals = src[sr, sc]
            else:
                c0 = np.clip(np.floor(fc).astype(np.int64), 0, meta.width - 1)
                r0 = np.clip(np.floor(fr).astype(np.int64), 0, meta.height - 1)
                c1 = np.clip(c0 + 1, 0, meta.width - 1)
                r1 = np.clip(r0 + 1, 0, meta.height - 1)
                wc = np.clip(fc - c0, 0, 1)
                wr = np.clip(fr - r0, 0, 1)
                vals = (src[r0, c0] * (1 - wr) * (1 - wc)
                        + src[r0, c1] * (1 - wr) * wc
                        + src[r1, c0] * wr * (1 - wc)
                        + src[r1, c1] * wr * wc)
            vals = np.where(inb, vals, np.nan)
            out_tx.append(tx)
            out_ty.append(ty)
            out_d.append(vals.astype(np.float64).tobytes())
        return pa.table({"tx": pa.array(out_tx, pa.int32()),
                         "ty": pa.array(out_ty, pa.int32()),
                         "data": pa.array(out_d, pa.binary())})

    out = ray.data.range(n, override_num_blocks=parallelism).map_batches(
        _gen, batch_format="pyarrow")
    return out, new_meta


def _inverse_map_resample_coshuffle(tiles, meta: RasterMeta,
                                    new_meta: RasterMeta, inv_fn, fwd_fn,
                                    *, num_partitions: int | None = None,
                                    clip_oob: bool = False):
    """SCALE PATH for inverse-map resampling (nearest only): no driver
    gather — each SOURCE tile forward-maps its boundary to find the
    output tiles it can serve and ships itself only there; each output
    tile assembles its samples from the co-shuffled source tiles
    (missing source tiles = nodata, which also covers all-nodata tiles
    absent from the dataset). Bilinear needs cross-source-tile
    neighbor pixels and stays on the broadcast path (documented)."""
    import ray

    from ..core.util import default_shuffle_partitions

    ts = meta.tile_size
    nts = new_meta.tile_size
    nt_world = nts * new_meta.cell_size

    def _route(batch: pa.Table) -> pa.Table:
        keys, txs_o, tys_o, datas = [], [], [], []
        txs = batch["tx"].to_numpy()
        tys = batch["ty"].to_numpy()
        t = np.linspace(0.0, 1.0, 9)
        for i in range(batch.num_rows):
            tx, ty = int(txs[i]), int(tys[i])
            h, w = meta.tile_shape(tx, ty)
            x0 = meta.origin_x + tx * ts * meta.cell_size
            x1 = x0 + w * meta.cell_size
            y1 = meta.origin_y - ty * ts * meta.cell_size
            y0 = y1 - h * meta.cell_size
            bx = np.concatenate([x0 + t * (x1 - x0), np.full_like(t, x1),
                                 x1 + t * (x0 - x1), np.full_like(t, x0)])
            by = np.concatenate([np.full_like(t, y0), y0 + t * (y1 - y0),
                                 np.full_like(t, y1), y1 + t * (y0 - y1)])
            fx, fy = fwd_fn(bx, by)
            # half-output-tile safety margin for boundary curvature
            otx0 = int(np.floor((np.min(fx) - new_meta.origin_x)
                                / nt_world - 0.5))
            otx1 = int(np.floor((np.max(fx) - new_meta.origin_x)
                                / nt_world + 0.5))
            oty0 = int(np.floor((new_meta.origin_y - np.max(fy))
                                / nt_world - 0.5))
            oty1 = int(np.floor((new_meta.origin_y - np.min(fy))
                                / nt_world + 0.5))
            otx0 = max(otx0, 0)
            oty0 = max(oty0, 0)
            otx1 = min(otx1, new_meta.tiles_x - 1)
            oty1 = min(oty1, new_meta.tiles_y - 1)
            for ox in range(otx0, otx1 + 1):
                for oy in range(oty0, oty1 + 1):
                    keys.append(ox * (1 << 32) + oy)
                    txs_o.append(tx)
                    tys_o.append(ty)
                    datas.append(batch["data"][i].as_py())
        return pa.table({"okey": pa.array(keys, pa.int64()),
                         "stx": pa.array(txs_o, pa.int32()),
                         "sty": pa.array(tys_o, pa.int32()),
                         "data": pa.array(datas, pa.binary())})

    def _assemble(group: pa.Table) -> pa.Table:
        k = int(group["okey"][0].as_py())
        otx, oty = k >> 32, k & 0xFFFFFFFF
        h, w = new_meta.tile_shape(int(otx), int(oty))
        cols = np.arange(otx * nts, otx * nts + w)
        rows = np.arange(oty * nts, oty * nts + h)
        x, y = new_meta.cell_center(*np.meshgrid(cols, rows))
        sx, sy = inv_fn(x.ravel(), y.ravel())
        fc = (sx - meta.origin_x) / meta.cell_size - 0.5
        fr = (meta.origin_y - sy) / meta.cell_size - 0.5
        inb = ((fc > -0.5) & (fc < meta.width - 0.5)
               & (fr > -0.5) & (fr < meta.height - 0.5))
        sc = np.clip(np.round(fc).astype(np.int64), 0, meta.width - 1)
        sr = np.clip(np.round(fr).astype(np.int64), 0, meta.height - 1)
        vals = np.full(len(sc), np.nan)
        stx = sc // ts
        sty = sr // ts
        want = stx * (1 << 32) + sty
        g_tx = group["stx"].to_numpy()
        g_ty = group["sty"].to_numpy()
        for j in range(group.num_rows):
            sh, sw = meta.tile_shape(int(g_tx[j]), int(g_ty[j]))
            tile = np.frombuffer(group["data"][j].as_py(),
                                 np.float64).reshape(sh, sw)
            m = want == (int(g_tx[j]) * (1 << 32) + int(g_ty[j]))
            if m.any():
                vals[m] = tile[sr[m] - int(g_ty[j]) * ts,
                               sc[m] - int(g_tx[j]) * ts]
        if not clip_oob:  # resample clamps to the edge (broadcast
            vals = np.where(inb, vals, np.nan)  # parity); others NaN
        return pa.table({"tx": pa.array([int(otx)], pa.int32()),
                         "ty": pa.array([int(oty)], pa.int32()),
                         "data": pa.array([vals.astype(np.float64)
                                           .tobytes()], pa.binary())})

    out = tiles.map_batches(_route, batch_format="pyarrow").groupby(
        "okey",
        num_partitions=num_partitions or default_shuffle_partitions()
    ).map_groups(_assemble, batch_format="pyarrow")
    return out, new_meta


def rotate(tiles, meta: RasterMeta, *, angle_deg: float,
           anchor: tuple[float, float] | None = None,
           method: str = "nearest", parallelism: int = 8):
    """RasterRotateOperation — rotate around an anchor (default raster
    center); output grid = axis-aligned bbox of the rotated extent at
    the same cell size, values by inverse-mapping."""
    if anchor is None:
        anchor = (meta.origin_x + meta.width * meta.cell_size / 2.0,
                  meta.origin_y - meta.height * meta.cell_size / 2.0)
    ax, ay = anchor
    th = np.radians(angle_deg)
    c, s = np.cos(th), np.sin(th)
    corners = np.array([
        [meta.origin_x, meta.origin_y],
        [meta.origin_x + meta.width * meta.cell_size, meta.origin_y],
        [meta.origin_x, meta.origin_y - meta.height * meta.cell_size],
        [meta.origin_x + meta.width * meta.cell_size,
         meta.origin_y - meta.height * meta.cell_size],
    ])
    rx = ax + (corners[:, 0] - ax) * c - (corners[:, 1] - ay) * s
    ry = ay + (corners[:, 0] - ax) * s + (corners[:, 1] - ay) * c
    new_meta = RasterMeta(
        float(rx.min()), float(ry.max()), meta.cell_size,
        int(np.ceil((rx.max() - rx.min()) / meta.cell_size)),
        int(np.ceil((ry.max() - ry.min()) / meta.cell_size)),
        meta.tile_size, meta.nodata)

    def _inv(x, y):
        # inverse rotation of target centers into the source frame
        ix = ax + (x - ax) * c + (y - ay) * s
        iy = ay - (x - ax) * s + (y - ay) * c
        return ix, iy

    if method == "nearest" and meta.width * meta.height > _COSHUFFLE_CELLS:
        def _fwd(x, y):
            return (ax + (x - ax) * c - (y - ay) * s,
                    ay + (x - ax) * s + (y - ay) * c)

        return _inverse_map_resample_coshuffle(tiles, meta, new_meta,
                                               _inv, _fwd)
    return _inverse_map_resample(tiles, meta, new_meta, _inv,
                                 method=method, parallelism=parallelism)


_EARTH_R = 6378137.0

# nearest-resample ops switch from dense broadcast to the co-shuffled
# tile path past this many source cells (patchable for tests)
_COSHUFFLE_CELLS = 4_000_000


def reproject_raster(tiles, meta: RasterMeta, *, src: str = "EPSG:4326",
                     dst: str = "EPSG:3857", cell_size: float | None = None,
                     method: str = "nearest", parallelism: int = 8,
                     broadcast: bool | None = None):
    """RasterReprojectOperation — the web pair 4326↔3857 analytically,
    plus (round 3) any pair resolvable by the parameterized Snyder
    engine in ``core.crs`` (Korea 2000 belts/Unified CS, ETRS89/NAD83
    + synthesized WGS84 UTM zones, Lambert-93, ETRS89-LCC; same
    WGS84-compatible-datum envelope as stages.transforms
    make_reproject — full PROJ pipelines need pyproj, not in this
    container). Returns (tiles, new_meta)."""
    key = (src.upper(), dst.upper())

    def _fwd(x, y):  # 4326 → 3857
        return (np.radians(x) * _EARTH_R,
                np.log(np.tan(np.pi / 4 + np.radians(y) / 2)) * _EARTH_R)

    def _inv(x, y):  # 3857 → 4326
        return (np.degrees(x / _EARTH_R),
                np.degrees(2 * np.arctan(np.exp(y / _EARTH_R)) - np.pi / 2))

    x0, y0 = meta.origin_x, meta.origin_y - meta.height * meta.cell_size
    x1, y1 = meta.origin_x + meta.width * meta.cell_size, meta.origin_y
    if key == ("EPSG:4326", "EPSG:3857"):
        fwd, inv = _fwd, _inv
        y0, y1 = max(y0, -85.06), min(y1, 85.06)
    elif key == ("EPSG:3857", "EPSG:4326"):
        fwd, inv = _inv, _fwd
    else:
        from ..core import crs as _crs

        sdef = _crs.parse_crs(key[0])
        ddef = _crs.parse_crs(key[1])
        if sdef is None or ddef is None:
            raise ValueError(
                f"unsupported CRS pair {src} → {dst}; supported: "
                "4326↔3857 analytic + any pair in core.crs.CRS_TABLE "
                "(incl. synthesized WGS84 UTM zones)")
        fwd = lambda x, y: _crs.transform(sdef, ddef, x, y)  # noqa: E731
        inv = lambda x, y: _crs.transform(ddef, sdef, x, y)  # noqa: E731

    # target extent: forward-map the source BOUNDARY (corner-only
    # mapping under-covers curved edges of non-cylindrical projections)
    t = np.linspace(0.0, 1.0, 33)
    bx = np.concatenate([x0 + t * (x1 - x0), np.full_like(t, x1),
                         x1 + t * (x0 - x1), np.full_like(t, x0)])
    by = np.concatenate([np.full_like(t, y0), y0 + t * (y1 - y0),
                         np.full_like(t, y1), y1 + t * (y0 - y1)])
    fx, fy = fwd(bx, by)
    cx0, cx1 = float(np.min(fx)), float(np.max(fx))
    cy0, cy1 = float(np.min(fy)), float(np.max(fy))
    if cell_size is None:
        cell_size = (cx1 - cx0) / meta.width
    new_meta = RasterMeta(
        cx0, cy1, cell_size,
        int(np.ceil((cx1 - cx0) / cell_size)),
        int(np.ceil((cy1 - cy0) / cell_size)),
        meta.tile_size, meta.nodata)
    # scale path: past ~4M source cells the dense driver broadcast is
    # the wrong shape — co-shuffle source tiles to the output tiles
    # they serve instead (nearest only; bilinear needs cross-tile
    # neighbor pixels and stays on the broadcast path)
    if broadcast is None:
        broadcast = (method != "nearest"
                     or meta.width * meta.height <= _COSHUFFLE_CELLS)
    if not broadcast:
        if method != "nearest":
            raise ValueError("the co-shuffle reproject path supports "
                             "method='nearest' only")
        return _inverse_map_resample_coshuffle(
            tiles, meta, new_meta, lambda x, y: inv(x, y),
            lambda x, y: fwd(x, y))
    return _inverse_map_resample(tiles, meta, new_meta,
                                 lambda x, y: inv(x, y),
                                 method=method, parallelism=parallelism)


def high_low_points(tiles, meta: RasterMeta, *, which: str = "both"):
    """RasterHighLowPointsOperation — point(s) at the global max (H)
    and/or min (L) cells; every cell EQUAL to the extremum is emitted
    (reference collects a point list per extremum). Returns a pyarrow
    Table (type, col, row, x, y, val).

    Distributed: each tile emits only its cells at the TILE-local
    max/min (map_batches partial extrema), then a tiny driver reduce
    keeps the rows matching the global extremum — the gather is bounded
    by cells-at-tile-extrema, never the raster."""
    want = {"both": ("H", "L"), "high": ("H",), "low": ("L",)}[which]

    def _partial(batch: pa.Table) -> pa.Table:
        typs, cols, rows_, xs, ys, vals = [], [], [], [], [], []
        for i, (tx, ty) in enumerate(zip(batch["tx"].to_numpy(),
                                         batch["ty"].to_numpy())):
            tx, ty = int(tx), int(ty)
            h, w = meta.tile_shape(tx, ty)
            arr = np.frombuffer(batch["data"][i].as_py(),
                                np.float64).reshape(h, w)
            fin = np.isfinite(arr)
            if not np.isnan(meta.nodata):
                fin &= arr != meta.nodata
            if not fin.any():
                continue
            for typ, red in (("H", np.max), ("L", np.min)):
                if typ not in want:
                    continue
                v = float(red(arr[fin]))
                rr, cc = np.nonzero(fin & (arr == v))
                gr = rr + ty * meta.tile_size
                gc = cc + tx * meta.tile_size
                px, py = meta.cell_center(gc, gr)
                typs.extend([typ] * len(rr))
                cols.extend(int(c) for c in gc)
                rows_.extend(int(r) for r in gr)
                xs.extend(float(x) for x in px)
                ys.extend(float(y) for y in py)
                vals.extend([v] * len(rr))
        return pa.table({
            "type": pa.array(typs, pa.string()),
            "col": pa.array(cols, pa.int64()),
            "row": pa.array(rows_, pa.int64()),
            "x": pa.array(xs, pa.float64()),
            "y": pa.array(ys, pa.float64()),
            "val": pa.array(vals, pa.float64()),
        })

    cand = tiles.map_batches(_partial, batch_format="pyarrow").to_pandas()
    keep = np.zeros(len(cand), dtype=bool)
    for typ in want:
        m = (cand["type"] == typ).to_numpy()
        if m.any():
            v = cand["val"][m]
            best = v.max() if typ == "H" else v.min()
            keep |= m & (cand["val"] == best).to_numpy()
    out = cand[keep]
    # stable order: H rows then L rows, by (row, col) within each
    out = out.sort_values(["type", "row", "col"],
                          ascending=[True, True, True],
                          key=lambda s: s.map({"H": 0, "L": 1})
                          if s.name == "type" else s)
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def raster_fuzzy(tiles, meta: RasterMeta, *, function: str = "linear",
                 fuzzy_values=(None, None, None, None),
                 decreasing: bool = False, max_range: float = 1.0):
    """RasterFuzzyOperation — fuzzy membership per cell.

    fuzzy_values = (min, mid1, mid2, max) with mid1/mid2 optional
    (None), replicating getFuzzyValue's 2/3/4-variable branches
    (RasterFuzzyOperation.java:118-206); function ∈ {linear, sigmoidal,
    jshaped}; decreasing flips membership; result scaled by max_range.
    When min/max are None they are taken from the raster's global
    min/max (two-pass).
    """
    mn, m1, m2, mx = fuzzy_values
    if mn is None or mx is None:
        from .tiles import raster_statistics

        tiles = tiles.materialize()   # consumed twice: stats + transform
        st = raster_statistics(tiles, meta)
        mn = st["min"] if mn is None else mn
        mx = st["max"] if mx is None else mx

    def _g(dx, dw):
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.where(dw == 0, 0.0, dx / np.where(dw == 0, 1.0, dw))
            if function == "linear":
                v = u
            elif function == "sigmoidal":
                v = np.sin(u * np.pi / 2.0) ** 2
            elif function == "jshaped":
                v = 1.0 / (1.0 + (1.0 - u) ** 2)
            else:
                raise ValueError(f"unknown fuzzy function {function}")
        return np.where(dw == 0, 0.0, v)

    def _fuzzy(arr):
        out = np.zeros_like(arr)
        if m1 is not None and m2 is not None:
            out = np.where((arr >= m1) & (arr <= m2), 1.0, out)
            inc = (arr > mn) & (arr < m1)
            out = np.where(inc, _g(arr - mn, m1 - mn), out)
            dec = (arr > m2) & (arr < mx)
            # reference quirk (RasterFuzzyOperation.java:160-164):
            # dX and dW are swapped on the 4-value decreasing branch
            out = np.where(dec, 1.0 - _g(mx - m2, arr - m2), out)
        elif m1 is not None:
            out = np.where(arr == m1, 1.0, out)
            inc = (arr > mn) & (arr < m1)
            out = np.where(inc, _g(arr - mn, m1 - mn), out)
            dec = (arr > m1) & (arr < mx)
            out = np.where(dec, 1.0 - _g(arr - m1, mx - m1), out)
        else:
            if mx == mn:
                out = np.ones_like(arr)
            else:
                out = np.where(arr <= mn, 0.0,
                               np.where(arr >= mx, 1.0,
                                        _g(arr - mn, mx - mn)))
        if decreasing:
            out = 1.0 - out
        return out * max_range

    def _apply(batch: pa.Table) -> pa.Table:
        out = []
        for tx, ty, blob in zip(batch["tx"].to_numpy(),
                                batch["ty"].to_numpy(), batch["data"]):
            h, w = meta.tile_shape(int(tx), int(ty))
            arr = np.frombuffer(blob.as_py(), np.float64).reshape(h, w)
            fin = np.isfinite(arr)
            res = np.where(fin, _fuzzy(arr), np.nan)
            out.append(res.tobytes())
        return pa.table({"tx": batch["tx"], "ty": batch["ty"],
                         "data": pa.array(out, pa.binary())})

    return tiles.map_batches(_apply, batch_format="pyarrow")
