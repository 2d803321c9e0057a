"""Deterministic geometry derivation over the driver's TPC-H-ish tables.

The correctness gate (``__ray_entry__.queries`` vs ``oracle_sql``) runs
our Ray pipelines AND plain DuckDB SQL over the same parquet tables, so
every derived coordinate here has an EXACTLY equivalent SQL expression
(same IEEE-double operation order). Geometry never appears in compared
output — only scalar columns derived from it.

Conventions:
- point from an integer key k:
    lon = ((k * 7919) % 36000) / 100.0 - 180.0 + 0.005
    lat = ((k * 104729) % 17000) / 100.0 - 85.0 + 0.005
  (offset 0.005 keeps points off all zone boundaries, so boundary-
  inclusive PIP (JTS intersects) agrees with SQL half-open floor
  assignment.)
- nation zones: nationkey n → rectangle
    col = n % 5, row = n // 5
    [ -180 + 72*col , -90 + 36*row ] … 72 × 36 degrees
  The 25 rectangles tile the world exactly; every derived point falls in
  exactly one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import wkb as _wkb

LON_SQL = "((({k}) * 7919) % 36000) / 100.0 - 180.0 + 0.005"
LAT_SQL = "((({k}) * 104729) % 17000) / 100.0 - 85.0 + 0.005"
# SQL zone assignment equivalent to PIP against the nation rectangles
ZONE_COL_SQL = "CAST(floor(({lon} + 180.0) / 72.0) AS INTEGER)"
ZONE_ROW_SQL = "CAST(floor(({lat} + 90.0) / 36.0) AS INTEGER)"
ZONE_KEY_SQL = "({row} * 5 + {col})"


def point_lonlat(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(key, dtype=np.int64)
    lon = ((k * 7919) % 36000) / 100.0 - 180.0 + 0.005
    lat = ((k * 104729) % 17000) / 100.0 - 85.0 + 0.005
    return lon, lat


def zone_key_sql(lon_sql: str, lat_sql: str) -> str:
    col = ZONE_COL_SQL.format(lon=lon_sql)
    row = ZONE_ROW_SQL.format(lat=lat_sql)
    return ZONE_KEY_SQL.format(row=row, col=col)


def nation_rect(n: int) -> tuple[float, float, float, float]:
    col = n % 5
    row = n // 5
    x0 = -180.0 + 72.0 * col
    y0 = -90.0 + 36.0 * row
    return x0, y0, x0 + 72.0, y0 + 36.0


def nation_zones_table(nation: pa.Table) -> pa.Table:
    """nation table → zone polygons (WKB rects) + attrs."""
    keys = nation["n_nationkey"].to_numpy().astype(np.int64)
    geoms = []
    for n in keys:
        x0, y0, x1, y1 = nation_rect(int(n))
        geoms.append(
            _wkb.encode_polygon(np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))
        )
    cols = {name: nation[name] for name in nation.column_names}
    cols["geom"] = pa.array(geoms, pa.binary())
    return pa.table(cols)


def nation_zones_fine(nation: pa.Table, split: int = 5) -> pa.Table:
    """Subdivide each nation rectangle into split×split subzones →
    25·split² rect polygons (zone_id = n·split² + row·split + col).
    Used to give the bench join a realistically sized polygon side."""
    keys = nation["n_nationkey"].to_numpy().astype(np.int64)
    zone_ids, geoms, nkeys = [], [], []
    for n in keys:
        x0, y0, x1, y1 = nation_rect(int(n))
        w = (x1 - x0) / split
        h = (y1 - y0) / split
        for r in range(split):
            for c in range(split):
                zone_ids.append(int(n) * split * split + r * split + c)
                nkeys.append(int(n))
                gx0, gy0 = x0 + c * w, y0 + r * h
                geoms.append(_wkb.encode_polygon(np.array(
                    [[gx0, gy0], [gx0 + w, gy0],
                     [gx0 + w, gy0 + h], [gx0, gy0 + h]])))
    return pa.table({
        "zone_id": pa.array(zone_ids, pa.int64()),
        "n_nationkey": pa.array(nkeys, pa.int32()),
        "geom": pa.array(geoms, pa.binary()),
    })


def add_point_geom(batch: pa.Table, key_col: str, *, with_wkb: bool = True) -> pa.Table:
    """map_batches stage: derive lon/lat (+ WKB point) from an int key col."""
    lon, lat = point_lonlat(batch[key_col].to_numpy())
    out = batch.append_column("lon", pa.array(lon, pa.float64()))
    out = out.append_column("lat", pa.array(lat, pa.float64()))
    if with_wkb:
        out = out.append_column("geom", _wkb.encode_points_arrow(lon, lat))
    return out
