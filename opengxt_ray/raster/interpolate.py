"""Point-to-surface interpolation: IDW, TPS (thin-plate spline),
Euclidean distance raster.

Reference:
- IDW: GT/gridcoverage/RasterInterpolationIDWOperation.java +
  IDWInterpolator — value = Σ(vᵢ/dᵢᵖ)/Σ(1/dᵢᵖ) over sample points.
- TPS: GT/gridcoverage/ThinPlateSplineInterpolator.java — solve the
  r²·log r radial-basis system on the (small) sample set (driver),
  evaluate per tile.
- EuclideanDistance: GT/gridcoverage/RasterEuclideanDistanceOperation
  .java — distance-to-nearest-source per cell.

Execution: sample points are broadcast (ray.put); every tile is a
stateless vectorized evaluation — MB-actor per SURVEY §2.7.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..core.util import default_concurrency
from .tiles import RasterMeta, _tile_key


def _tile_grid(meta: RasterMeta, tx: int, ty: int):
    h, w = meta.tile_shape(tx, ty)
    cols = np.arange(tx * meta.tile_size, tx * meta.tile_size + w)
    rows = np.arange(ty * meta.tile_size, ty * meta.tile_size + h)
    cx, cy = np.meshgrid(cols, rows)
    x, y = meta.cell_center(cx, cy)
    return x.ravel(), y.ravel(), (h, w)


def _all_tiles_ds(meta: RasterMeta, parallelism: int = 8):
    n = meta.tiles_x * meta.tiles_y

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return pa.table({
            "tx": pa.array((ids % meta.tiles_x).astype(np.int32)),
            "ty": pa.array((ids // meta.tiles_x).astype(np.int32)),
        })

    return ray.data.range(n, override_num_blocks=parallelism).map_batches(
        _gen, batch_format="pyarrow")


class _TileEvaluator:
    def __init__(self, ref, meta, fn):
        from ..core.broadcast import resolve_state

        self.state = resolve_state(ref)
        self.meta = meta
        self.fn = fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for tx, ty in zip(batch["tx"].to_numpy(), batch["ty"].to_numpy()):
            x, y, (h, w) = _tile_grid(self.meta, int(tx), int(ty))
            vals = self.fn(self.state, x, y)
            out.append(vals.reshape(h, w).tobytes())
        return pa.table({"tx": batch["tx"], "ty": batch["ty"],
                         "data": pa.array(out, pa.binary())})


def idw(points_ds, meta: RasterMeta, *, value_col: str, power: float = 2.0,
        xcol: str = "lon", ycol: str = "lat", concurrency=None,
        parallelism: int = 8, max_samples: int = 200_000):
    """IDW surface — full-sample weighting per cell (reference
    semantics). Samples are the broadcast side; inputs beyond
    ``max_samples`` raise instead of silently gathering the driver
    (no-silent-caps rule) — thin the samples or raise the limit."""
    n = points_ds.count()
    if n > max_samples:
        raise ValueError(
            f"idw: {n} samples exceed max_samples={max_samples}; IDW "
            "broadcasts the full sample set (reference full-sample "
            "weighting) — thin the samples or raise max_samples")
    pdf = points_ds.select_columns([xcol, ycol, value_col]).to_pandas()
    from ..core.broadcast import put_broadcast

    ref = put_broadcast((pdf[xcol].to_numpy(), pdf[ycol].to_numpy(),
                         pdf[value_col].to_numpy().astype(np.float64),
                         power))

    def _eval(state, x, y):
        sx, sy, sv, p = state
        out = np.empty(len(x))
        CH = 4096
        for c0 in range(0, len(x), CH):
            d = np.hypot(x[c0 : c0 + CH, None] - sx[None, :],
                         y[c0 : c0 + CH, None] - sy[None, :])
            exact = d < 1e-12
            with np.errstate(divide="ignore"):
                w = 1.0 / d ** p
            w[exact] = 0.0
            num = w @ sv
            den = w.sum(axis=1)
            val = num / np.where(den == 0, 1.0, den)
            hit = exact.any(axis=1)
            if hit.any():
                idx = np.argmax(exact, axis=1)
                val = np.where(hit, sv[idx], val)
            out[c0 : c0 + CH] = val
        return out

    tiles = _all_tiles_ds(meta, parallelism)
    return tiles.map_batches(
        _TileEvaluator, fn_constructor_args=([ref], meta, _eval),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency())


def idw_fixed_radius(points_ds, meta: RasterMeta, *, value_col: str,
                     radius: float, power: float = 2.0,
                     xcol: str = "lon", ycol: str = "lat",
                     num_partitions: int | None = None):
    """IDW with the reference's FIXED search radius
    (GT/gridcoverage/IDWInterpolator.java:107-160, SearchRadiusType
    .Fixed: all samples within ``radius`` weight each cell; cells with
    no sample in range stay nodata).

    This is the engine's IDW SCALE PATH: no broadcast, no sample cap —
    each point is co-shuffled to every tile whose cells it can reach
    (bbox ± radius halo) and each tile interpolates from its local
    points only (``groupby(tile).map_groups``). Partitioning
    assumption (documented like the weights/knn halo ops): ``radius``
    should span at most a few tiles; a radius covering the whole grid
    degenerates to all-points-everywhere — use :func:`idw` then.

    The min-points radius growth of the reference's Fixed mode
    (``radius.numberOfPoints > 0``) is NOT replicated — it makes the
    radius data-dependent per cell; documented deviation.
    """
    ts_world = meta.tile_size * meta.cell_size

    def _assign(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        tx0 = np.floor((x - radius - meta.origin_x) / ts_world).astype(
            np.int64)
        tx1 = np.floor((x + radius - meta.origin_x) / ts_world).astype(
            np.int64)
        ty0 = np.floor((meta.origin_y - (y + radius)) / ts_world).astype(
            np.int64)
        ty1 = np.floor((meta.origin_y - (y - radius)) / ts_world).astype(
            np.int64)
        tx0 = np.clip(tx0, 0, meta.tiles_x - 1)
        tx1 = np.clip(tx1, 0, meta.tiles_x - 1)
        ty0 = np.clip(ty0, 0, meta.tiles_y - 1)
        ty1 = np.clip(ty1, 0, meta.tiles_y - 1)
        keys, xs, ys, vs = [], [], [], []
        for i in range(len(x)):
            gx, gy = np.meshgrid(np.arange(tx0[i], tx1[i] + 1),
                                 np.arange(ty0[i], ty1[i] + 1))
            k = gx.ravel() * np.int64(1 << 32) + gy.ravel()
            keys.append(k)
            xs.append(np.full(len(k), x[i]))
            ys.append(np.full(len(k), y[i]))
            vs.append(np.full(len(k), v[i]))
        if not keys:
            return pa.table({"tkey": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "v": pa.array([], pa.float64())})
        return pa.table({"tkey": pa.array(np.concatenate(keys)),
                         "x": pa.array(np.concatenate(xs)),
                         "y": pa.array(np.concatenate(ys)),
                         "v": pa.array(np.concatenate(vs))})

    def _tile_eval(group: pa.Table) -> pa.Table:
        k = int(group["tkey"][0].as_py())
        tx, ty = k >> 32, k & 0xFFFFFFFF
        gx, gy, (h, w) = _tile_grid(meta, int(tx), int(ty))
        sx = group["x"].to_numpy(zero_copy_only=False)
        sy = group["y"].to_numpy(zero_copy_only=False)
        sv = group["v"].to_numpy(zero_copy_only=False)
        out = np.full(len(gx), np.nan)
        CH = 4096
        for c0 in range(0, len(gx), CH):
            d = np.hypot(gx[c0:c0 + CH, None] - sx[None, :],
                         gy[c0:c0 + CH, None] - sy[None, :])
            inr = d <= radius
            exact = d < 1e-12
            with np.errstate(divide="ignore"):
                wts = np.where(inr & ~exact, 1.0 / d ** power, 0.0)
            den = wts.sum(axis=1)
            num = wts @ sv
            val = np.where(den > 0, num / np.where(den == 0, 1.0, den),
                           np.nan)
            hit = exact.any(axis=1)
            if hit.any():
                idx = np.argmax(exact, axis=1)
                val = np.where(hit, sv[idx], val)
            out[c0:c0 + CH] = val
        return pa.table({
            "tx": pa.array([int(tx)], pa.int32()),
            "ty": pa.array([int(ty)], pa.int32()),
            "data": pa.array([out.reshape(h, w).tobytes()], pa.binary()),
        })

    from ..core.util import coalesce_for_groupby, default_shuffle_partitions

    assigned = coalesce_for_groupby(
        points_ds.map_batches(_assign, batch_format="pyarrow"),
        meta.tiles_x * meta.tiles_y)
    return assigned.groupby(
        "tkey",
        num_partitions=num_partitions or default_shuffle_partitions()
    ).map_groups(_tile_eval, batch_format="pyarrow")


def tps(points_ds, meta: RasterMeta, *, value_col: str,
        xcol: str = "lon", ycol: str = "lat", smooth: float = 0.0,
        concurrency=None, parallelism: int = 8, max_samples: int = 2000):
    """Thin-plate spline surface: r²·log r RBF solved on the driver
    (small sample side), evaluated per tile. Raises past
    ``max_samples`` (no-silent-caps — the dense solve is O(n³); thin
    the samples or raise the limit explicitly)."""
    n_in = points_ds.count()
    if n_in > max_samples:
        raise ValueError(
            f"tps: {n_in} samples exceed max_samples={max_samples}; the "
            "dense RBF solve is O(n^3) — thin the samples or raise "
            "max_samples explicitly")
    pdf = points_ds.select_columns([xcol, ycol, value_col]).to_pandas()
    sx = pdf[xcol].to_numpy()
    sy = pdf[ycol].to_numpy()
    sv = pdf[value_col].to_numpy().astype(np.float64)
    n = len(sx)
    d = np.hypot(sx[:, None] - sx[None, :], sy[:, None] - sy[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        K = np.where(d > 0, d * d * np.log(d), 0.0)
    K[np.diag_indices(n)] += smooth
    P = np.column_stack([np.ones(n), sx, sy])
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = P
    A[n:, :n] = P.T
    rhs = np.concatenate([sv, np.zeros(3)])
    if n < 3:
        raise ValueError("TPS needs >= 3 non-collinear sample points")
    try:
        coef = np.linalg.solve(A, rhs)
    except np.linalg.LinAlgError:
        coef, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    from ..core.broadcast import put_broadcast

    ref = put_broadcast((sx, sy, coef))

    def _eval(state, x, y):
        sx_, sy_, c = state
        nn = len(sx_)
        out = np.empty(len(x))
        CH = 4096
        for c0 in range(0, len(x), CH):
            d = np.hypot(x[c0 : c0 + CH, None] - sx_[None, :],
                         y[c0 : c0 + CH, None] - sy_[None, :])
            with np.errstate(divide="ignore", invalid="ignore"):
                K_ = np.where(d > 0, d * d * np.log(d), 0.0)
            out[c0 : c0 + CH] = (K_ @ c[:nn] + c[nn] + c[nn + 1] * x[c0 : c0 + CH]
                                 + c[nn + 2] * y[c0 : c0 + CH])
        return out

    tiles = _all_tiles_ds(meta, parallelism)
    return tiles.map_batches(
        _TileEvaluator, fn_constructor_args=([ref], meta, _eval),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency())


def euclidean_distance(points_ds, meta: RasterMeta, *,
                       xcol: str = "lon", ycol: str = "lat",
                       concurrency=None, parallelism: int = 8,
                       max_samples: int = 2_000_000):
    """Distance-to-nearest-source raster (broadcast GridPointIndex).

    The source point set is the broadcast side (``ray.put`` once, read
    by every tile task); beyond ``max_samples`` raise instead of
    silently gathering the driver (no-silent-caps rule) — at that scale
    rasterize the sources and run a tiled distance transform instead.
    """
    from ..core.gridindex import GridPointIndex

    n = points_ds.count()
    if n > max_samples:
        raise ValueError(
            f"euclidean_distance: {n} source points exceed max_samples="
            f"{max_samples}; the source set is broadcast whole to every "
            "tile task — thin the sources or raise the limit")
    pdf = points_ds.select_columns([xcol, ycol]).to_pandas()
    from ..core.broadcast import put_broadcast

    ref = put_broadcast((pdf[xcol].to_numpy(), pdf[ycol].to_numpy()))

    def _eval(state, x, y):
        sx, sy = state
        if len(sx) <= 8192:
            d2 = np.full(len(x), np.inf)
            CH = 4096
            for c0 in range(0, len(x), CH):
                dd = ((x[c0 : c0 + CH, None] - sx[None, :]) ** 2
                      + (y[c0 : c0 + CH, None] - sy[None, :]) ** 2)
                d2[c0 : c0 + CH] = dd.min(axis=1)
            return np.sqrt(d2)
        idx = GridPointIndex(sx, sy)
        out = np.empty(len(x))
        for i in range(len(x)):
            _, dd = idx.query_knn(float(x[i]), float(y[i]), 1)
            out[i] = dd[0] if len(dd) else np.inf
        return out

    tiles = _all_tiles_ds(meta, parallelism)
    return tiles.map_batches(
        _TileEvaluator, fn_constructor_args=([ref], meta, _eval),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency())


def linear_los(tiles, meta: RasterMeta, observer, target, *,
               observer_height: float = 1.8, step: float | None = None):
    """RasterLinearLOS (GT/gridcoverage/RasterFunctionalSurface) — line
    of sight from observer to target over the surface: per-station
    (station, x, y, z, visible). A station is visible when the sight
    angle from the observer exceeds every prior terrain angle."""
    from .tiles import extract_values_to_points

    import ray as _ray

    ox, oy = observer
    tx_, ty_ = target
    length = float(np.hypot(tx_ - ox, ty_ - oy))
    if step is None:
        step = meta.cell_size
    n = max(2, int(np.ceil(length / step)) + 1)
    tt = np.linspace(0.0, 1.0, n)
    xs = ox + tt * (tx_ - ox)
    ys = oy + tt * (ty_ - oy)
    pts = _ray.data.from_arrow(pa.table({
        "station": pa.array(tt * length), "lon": pa.array(xs),
        "lat": pa.array(ys)}))
    sampled = extract_values_to_points(pts, tiles, meta, out_col="z")
    df = sampled.to_pandas().sort_values("station").reset_index(drop=True)
    z = df["z"].to_numpy()
    d = df["station"].to_numpy()
    z0 = (z[0] if np.isfinite(z[0]) else 0.0) + observer_height
    with np.errstate(divide="ignore", invalid="ignore"):
        ang = np.where(d > 0, (z - z0) / d, -np.inf)
    ang = np.where(np.isnan(ang), -np.inf, ang)
    max_prior = np.maximum.accumulate(np.concatenate([[-np.inf], ang[:-1]]))
    visible = ang >= max_prior
    visible[0] = True
    out = pa.table({
        "station": pa.array(d), "x": pa.array(df["lon"].to_numpy()),
        "y": pa.array(df["lat"].to_numpy()), "z": pa.array(z),
        "visible": pa.array(visible),
    })
    return out


def radial_los(tiles, meta: RasterMeta, observer, *, radius: float,
               n_bearings: int = 36, observer_height: float = 1.8):
    """RasterRadialLOS — linear LOS swept over bearings; returns rows
    (bearing_deg, station, x, y, z, visible)."""
    outs = []
    ox, oy = observer
    for k in range(n_bearings):
        b = 360.0 * k / n_bearings
        rad = np.radians(b)
        tgt = (ox + radius * np.sin(rad), oy + radius * np.cos(rad))
        t = linear_los(tiles, meta, observer, tgt,
                       observer_height=observer_height)
        outs.append(t.append_column(
            "bearing_deg", pa.array(np.full(t.num_rows, b))))
    return pa.concat_tables(outs)


def tin_interpolation(points_ds, meta: RasterMeta, *, value_col: str,
                      xcol: str = "lon", ycol: str = "lat",
                      concurrency=None, parallelism: int = 8,
                      max_samples: int = 50_000):
    """TIN surface (GT/gridcoverage/RasterInterpolationTINOperation.java
    ~194 LoC): Delaunay triangulation of the SAMPLE points (driver-side
    — samples are the small broadcast side, same convention as tps/idw),
    then barycentric linear interpolation per tile. Cells outside the
    convex hull are nodata (NaN).

    Linear interpolation reproduces linear fields exactly and equals
    the sample value at every sample location.
    """
    from ..ops.tessellation import delaunay_triangles

    n = points_ds.count()
    if n > max_samples:
        raise ValueError(
            f"tin_interpolation: {n} samples exceeds max_samples="
            f"{max_samples}; TIN builds the triangulation on the driver "
            "(samples are the broadcast side) — thin the samples or "
            "raise max_samples explicitly")
    pdf = points_ds.select_columns([xcol, ycol, value_col]).to_pandas()
    pts = pdf[[xcol, ycol]].to_numpy().astype(np.float64)
    vals = pdf[value_col].to_numpy().astype(np.float64)
    tris = delaunay_triangles(pts)
    tb = np.empty((len(tris), 4))
    if len(tris):
        tx_ = pts[:, 0][tris]
        ty_ = pts[:, 1][tris]
        tb[:, 0] = tx_.min(axis=1)
        tb[:, 1] = ty_.min(axis=1)
        tb[:, 2] = tx_.max(axis=1)
        tb[:, 3] = ty_.max(axis=1)
    from ..core.broadcast import put_broadcast

    ref = put_broadcast((pts, vals, tris, tb))

    def _eval(state, x, y):
        sp, sv, st, stb = state
        out = np.full(len(x), np.nan)
        if len(st) == 0:
            return out
        x0, x1 = x.min(), x.max()
        y0, y1 = y.min(), y.max()
        cand = np.nonzero((stb[:, 0] <= x1) & (stb[:, 2] >= x0)
                          & (stb[:, 1] <= y1) & (stb[:, 3] >= y0))[0]
        for ti in cand:
            a, b, c = st[ti]
            ax, ay = sp[a]
            bx, by = sp[b]
            cx, cy = sp[c]
            d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
            if abs(d) < 1e-300:
                continue
            sel = np.nonzero(np.isnan(out)
                             & (x >= stb[ti, 0]) & (x <= stb[ti, 2])
                             & (y >= stb[ti, 1]) & (y <= stb[ti, 3]))[0]
            if len(sel) == 0:
                continue
            l1 = ((by - cy) * (x[sel] - cx) + (cx - bx) * (y[sel] - cy)) / d
            l2 = ((cy - ay) * (x[sel] - cx) + (ax - cx) * (y[sel] - cy)) / d
            l3 = 1.0 - l1 - l2
            eps = -1e-12
            ins = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
            if ins.any():
                out[sel[ins]] = (l1[ins] * sv[a] + l2[ins] * sv[b]
                                 + l3[ins] * sv[c])
        return out

    tiles = _all_tiles_ds(meta, parallelism)
    return tiles.map_batches(
        _TileEvaluator, fn_constructor_args=([ref], meta, _eval),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency())
