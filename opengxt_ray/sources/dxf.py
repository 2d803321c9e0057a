"""DXF (AutoCAD R12 ASCII) store — minimal reader/writer.

Reference: the reference's DXF DataStore (GT/storage — JVM GeoTools
dxf plugin) reads CAD entity layers as features. This implements the
public DXF R12 group-code format (Autodesk DXF reference) for the
entity types a GIS exchange actually uses:

- POINT                      ↔ WKB point
- LINE / POLYLINE / LWPOLYLINE (open)  ↔ WKB linestring
- POLYLINE / LWPOLYLINE (closed, flag 70&1) ↔ WKB polygon (outer ring)

Documented envelope: no blocks/inserts, arcs, splines, text, or 3-D;
polygon HOLES have no DXF polyline representation — each ring travels
as its own closed polyline (standard CAD practice).

The file format is inherently a small-file CAD interchange, so the
reader returns one Arrow table (layer, geom) — wrap with
``ray.data.from_arrow`` to enter a pipeline; the writer takes a table
or Dataset and streams entity text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import wkb as _wkb


def _pairs(text: str):
    lines = text.splitlines()
    for i in range(0, len(lines) - 1, 2):
        yield lines[i].strip(), lines[i + 1].strip()


def read_dxf(path: str) -> pa.Table:
    """DXF file → Arrow table (layer:string, geom:binary WKB)."""
    with open(path, "r", errors="replace") as f:
        text = f.read()
    layers: list[str] = []
    geoms: list[bytes] = []
    in_entities = False
    ent = None        # current entity type
    layer = "0"
    x = y = None
    xs: list[float] = []
    ys: list[float] = []
    closed = False
    in_vertex = False

    def _flush():
        nonlocal ent, xs, ys, closed, x, y, in_vertex
        if ent == "POINT" and x is not None:
            layers.append(layer)
            geoms.append(_wkb.encode_point(x, y))
        elif ent == "LINE" and len(xs) == 2:
            layers.append(layer)
            geoms.append(_wkb.encode_linestring(
                np.array([[xs[0], ys[0]], [xs[1], ys[1]]])))
        elif ent in ("POLYLINE", "LWPOLYLINE") and len(xs) >= 2:
            pts = np.column_stack([xs, ys]).astype(np.float64)
            layers.append(layer)
            if closed and len(pts) >= 3:
                if not np.array_equal(pts[0], pts[-1]):
                    pts = np.vstack([pts, pts[0]])
                geoms.append(_wkb.encode_polygon(pts[:-1]))
            else:
                geoms.append(_wkb.encode_linestring(pts))
        ent = None
        xs, ys = [], []
        x = y = None
        closed = False
        in_vertex = False

    in_section_header = False
    for code, val in _pairs(text):
        if in_section_header:
            # the pair after "0 SECTION" is "2 <name>"
            in_entities = (code == "2" and val == "ENTITIES")
            in_section_header = False
            continue
        if code == "0":
            if val == "SECTION":
                in_section_header = True
                continue
            if val == "ENDSEC":
                if in_entities:
                    _flush()
                in_entities = False
                continue
            if not in_entities:
                continue
            if val == "VERTEX":
                in_vertex = True
                continue
            if val == "SEQEND":
                _flush()
                continue
            _flush()
            if val in ("POINT", "LINE", "POLYLINE", "LWPOLYLINE"):
                ent = val
        elif in_entities and ent is not None:
            if code == "8" and not in_vertex:
                layer = val
            elif code == "70" and not in_vertex:
                closed = bool(int(val) & 1)
            elif code == "10":
                if ent == "POINT":
                    x = float(val)
                else:
                    xs.append(float(val))
            elif code == "20":
                if ent == "POINT":
                    y = float(val)
                else:
                    ys.append(float(val))
            elif code == "11":
                xs.append(float(val))
            elif code == "21":
                ys.append(float(val))
    _flush()
    return pa.table({"layer": pa.array(layers, pa.string()),
                     "geom": pa.array(geoms, pa.binary())})


def write_dxf(table, path: str, *, layer_col: str | None = "layer",
              geom_col: str = "geom") -> int:
    """Arrow table / Dataset (geom WKB [+ layer]) → DXF R12 file;
    returns entities written."""
    if hasattr(table, "iter_batches"):     # ray Dataset
        batches = list(table.iter_batches(batch_format="pyarrow"))
        table = pa.concat_tables(batches) if batches else pa.table(
            {geom_col: pa.array([], pa.binary())})
    out = ["0", "SECTION", "2", "ENTITIES"]
    layers = (table[layer_col].to_pylist()
              if layer_col and layer_col in table.column_names
              else ["0"] * table.num_rows)
    n = 0
    fg = _wkb.decode(table[geom_col].to_pylist())
    for i in range(table.num_rows):
        lay = str(layers[i])
        gtype = int(fg.types[i])  # 1 point / 2 linestring / 3 polygon
        if gtype == 1:
            p = fg.geom_coords(i)[0]
            out += ["0", "POINT", "8", lay,
                    "10", repr(float(p[0])), "20", repr(float(p[1]))]
        elif gtype == 2:
            for ring, _ in fg.rings(i):  # each part its own polyline
                out += ["0", "POLYLINE", "8", lay, "66", "1", "70", "0"]
                for p in ring:
                    out += ["0", "VERTEX", "8", lay,
                            "10", repr(float(p[0])),
                            "20", repr(float(p[1]))]
                out += ["0", "SEQEND"]
        elif gtype == 3:
            for ring, _ in fg.rings(i):  # shells AND holes, each closed
                out += ["0", "POLYLINE", "8", lay, "66", "1", "70", "1"]
                for p in ring:
                    out += ["0", "VERTEX", "8", lay,
                            "10", repr(float(p[0])),
                            "20", repr(float(p[1]))]
                out += ["0", "SEQEND"]
        else:
            continue
        n += 1
    out += ["0", "ENDSEC", "0", "EOF"]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    return n
