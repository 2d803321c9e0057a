"""GeoJSON interchange — the engine's analogue of the reference's
GeoServer PPIO codecs (GS/ppio/ApplicationGeoJSONPPIO.java:34-130:
GeoJSON FeatureCollection decode/encode as the WPS wire format).

- :func:`geojson_to_table` / :func:`read_geojson` — FeatureCollection →
  Arrow table / Dataset with a WKB ``geom`` column.
- :func:`dataset_to_geojson` — Dataset → FeatureCollection dict
  (driver-side; for small results, like the PPIO responses).
- WKT encode for debugging/interchange (:func:`wkb_to_wkt`).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..core import wkb as _wkb


def _coords_to_wkb(geom: dict) -> bytes:
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return _wkb.encode_point(float(c[0]), float(c[1]))
    if t == "MultiPoint":
        return _wkb.encode_multipoint(np.asarray(c, dtype=np.float64))
    if t == "LineString":
        return _wkb.encode_linestring(np.asarray(c, dtype=np.float64))
    if t == "MultiLineString":
        return _wkb.encode_multilinestring(
            [np.asarray(l, dtype=np.float64) for l in c])
    if t == "Polygon":
        rings = [np.asarray(r, dtype=np.float64) for r in c]
        return _wkb.encode_polygon(rings[0], rings[1:])
    if t == "MultiPolygon":
        polys = []
        for poly in c:
            rings = [np.asarray(r, dtype=np.float64) for r in poly]
            polys.append((rings[0], rings[1:]))
        return _wkb.encode_multipolygon(polys)
    raise ValueError(f"unsupported GeoJSON type {t}")


def geojson_to_table(fc: "dict | str") -> pa.Table:
    """GeoJSON FeatureCollection (dict or JSON string) → Arrow table."""
    if isinstance(fc, str):
        fc = json.loads(fc)
    feats = fc["features"]
    geoms = [_coords_to_wkb(f["geometry"]) if f.get("geometry") else None
             for f in feats]
    props: dict[str, list] = {}
    keys: list[str] = []
    for f in feats:
        for k in (f.get("properties") or {}):
            if k not in props:
                props[k] = []
                keys.append(k)
    for f in feats:
        p = f.get("properties") or {}
        for k in keys:
            props[k].append(p.get(k))
    cols = {"geom": pa.array(geoms, pa.binary())}
    for k in keys:
        cols[k] = pa.array(props[k])
    return pa.table(cols)


def read_geojson(path: str):
    """Read a GeoJSON file into a Dataset (driver parse → from_arrow;
    GeoJSON is not splittable, so this is inherently single-file —
    convert to parquet for scale)."""
    import ray

    with open(path) as f:
        return ray.data.from_arrow(geojson_to_table(json.load(f)))


def _wkb_geom_to_geojson(fg: "_wkb.FlatGeoms", i: int) -> dict:
    t = fg.types[i]
    if t == _wkb.POINT:
        p = fg.geom_coords(i)
        if len(p) == 1:
            return {"type": "Point", "coordinates": [p[0, 0], p[0, 1]]}
        return {"type": "MultiPoint", "coordinates": p.tolist()}
    if t == _wkb.LINESTRING:
        rings = [r for r, _ in fg.rings(i)]
        if len(rings) == 1:
            return {"type": "LineString", "coordinates": rings[0].tolist()}
        return {"type": "MultiLineString",
                "coordinates": [r.tolist() for r in rings]}
    # polygon / multipolygon
    polys = []
    cur = None
    for r, is_shell in fg.rings(i):
        if is_shell:
            if cur:
                polys.append(cur)
            cur = [r.tolist()]
        elif cur:
            cur.append(r.tolist())
    if cur:
        polys.append(cur)
    if len(polys) == 1:
        return {"type": "Polygon", "coordinates": polys[0]}
    return {"type": "MultiPolygon", "coordinates": polys}


def dataset_to_geojson(ds, *, geom_col: str = "geom",
                       max_rows: int = 100_000) -> dict:
    """Dataset → GeoJSON FeatureCollection dict (small results only,
    mirroring the PPIO response path)."""
    tbl = None
    rows = []
    n = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        fg = _wkb.decode(batch[geom_col].to_pylist())
        attrs = batch.drop_columns([geom_col]).to_pylist()
        for i in range(len(fg)):
            rows.append({
                "type": "Feature",
                "geometry": _wkb_geom_to_geojson(fg, i),
                "properties": attrs[i],
            })
        n += len(fg)
        if n > max_rows:
            raise ValueError(f"result exceeds max_rows={max_rows}; "
                             "write_parquet instead")
    return {"type": "FeatureCollection", "features": rows}


def wkb_to_wkt(buf: bytes) -> str:
    """WKB → WKT (debug/interchange)."""
    fg = _wkb.decode([buf])
    t = fg.types[0]

    def ring_str(r):
        return ", ".join(f"{x:g} {y:g}" for x, y in r)

    if t == _wkb.POINT:
        p = fg.geom_coords(0)
        return f"POINT ({p[0, 0]:g} {p[0, 1]:g})"
    if t == _wkb.LINESTRING:
        rings = [r for r, _ in fg.rings(0)]
        if len(rings) == 1:
            return f"LINESTRING ({ring_str(rings[0])})"
        inner = ", ".join(f"({ring_str(r)})" for r in rings)
        return f"MULTILINESTRING ({inner})"
    polys = []
    cur = None
    for r, is_shell in fg.rings(0):
        if is_shell:
            if cur:
                polys.append(cur)
            cur = [r]
        elif cur:
            cur.append(r)
    if cur:
        polys.append(cur)
    if len(polys) == 1:
        inner = ", ".join(f"({ring_str(r)})" for r in polys[0])
        return f"POLYGON ({inner})"
    outer = ", ".join(
        "(" + ", ".join(f"({ring_str(r)})" for r in poly) + ")"
        for poly in polys)
    return f"MULTIPOLYGON ({outer})"


def wkt_to_wkb(text: str) -> bytes:
    """Minimal WKT parser (POINT/LINESTRING/POLYGON/MULTIPOLYGON/
    MULTILINESTRING/MULTIPOINT) → little-endian WKB — the decode side
    of the reference's WKT PPIO (GS/ppio/WKTPPIO.java)."""
    import re

    import numpy as np

    from ..core import wkb as _W

    t = text.strip()
    head = re.match(r"([A-Za-z ]+)\s*\(", t)
    if not head:
        raise ValueError(f"unparseable WKT: {text[:40]}")
    kind = head.group(1).strip().upper().replace(" ", "")
    body = t[head.end() - 1:]

    def _coords(seg):
        pts = []
        for pair in seg.split(","):
            xy = pair.split()
            pts.append((float(xy[0]), float(xy[1])))
        return np.asarray(pts)

    def _rings(seg):
        # "((...),(...))" → list of coord arrays
        return [_coords(m) for m in re.findall(r"\(([^()]+)\)", seg)]

    if kind == "POINT":
        p = _coords(body.strip("() "))
        return _W.encode_point(float(p[0, 0]), float(p[0, 1]))
    if kind == "LINESTRING":
        return _W.encode_linestring(_coords(body.strip("() ")))
    if kind == "POLYGON":
        rings = _rings(body)
        return _W.encode_polygon(rings[0], rings[1:])
    if kind == "MULTIPOINT":
        return _W.encode_multipoint(_coords(body.replace("(", " ")
                                            .replace(")", " ")))
    if kind == "MULTILINESTRING":
        return _W.encode_multilinestring(_rings(body))
    if kind == "MULTIPOLYGON":
        polys = []
        for poly_seg in re.findall(r"\(\s*\([^)]*\)(?:\s*,\s*\([^)]*\))*\s*\)",
                                   body[1:-1]):
            rings = _rings(poly_seg)
            polys.append((rings[0], rings[1:]))
        return _W.encode_multipolygon(polys)
    raise ValueError(f"unsupported WKT type {kind}")


def geometry_to_features(geom, attrs: dict | None = None) -> "pa.Table":
    """GeometryToFeaturesProcess — wrap a single geometry (WKB bytes or
    WKT string) into a one-row feature table."""
    import pyarrow as pa_

    if isinstance(geom, str):
        geom = wkt_to_wkb(geom)
    cols = {k: pa_.array([v]) for k, v in (attrs or {}).items()}
    cols["geom"] = pa_.array([geom], pa_.binary())
    return pa_.table(cols)
