"""DXF R12 store (sources/dxf.py): entity round trips + hand-written
group-code fixtures."""

import numpy as np
import pyarrow as pa

from opengxt_ray.core import wkb as W
from opengxt_ray.sources.dxf import read_dxf, write_dxf


def test_roundtrip_point_line_polygon(tmp_path):
    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    t = pa.table({
        "layer": pa.array(["pts", "lines", "polys"], pa.string()),
        "geom": pa.array([
            W.encode_point(1.5, -2.25),
            W.encode_linestring(np.array([[0.0, 0.0], [1.0, 1.0],
                                          [2.0, 0.5]])),
            W.encode_polygon(sq, [hole]),
        ], pa.binary()),
    })
    path = str(tmp_path / "f.dxf")
    n = write_dxf(t, path)
    assert n == 3
    back = read_dxf(path)
    # polygon with a hole → 2 closed polylines (documented envelope)
    assert back.num_rows == 4
    fg = W.decode(back["geom"].to_pylist())
    assert int(fg.types[0]) == 1
    assert np.allclose(fg.geom_coords(0)[0], [1.5, -2.25])
    assert int(fg.types[1]) == 2
    assert np.allclose(fg.geom_coords(1),
                       [[0, 0], [1, 1], [2, 0.5]])
    assert int(fg.types[2]) == 3 and int(fg.types[3]) == 3
    assert back["layer"].to_pylist() == ["pts", "lines", "polys", "polys"]
    # ring areas survive (shoelace)
    def area(c):
        x, y = c[:, 0], c[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    a = sorted(area(fg.geom_coords(i)[:-1]) for i in (2, 3))
    assert abs(a[0] - 1.0) < 1e-12 and abs(a[1] - 12.0) < 1e-12


def test_reads_handwritten_lwpolyline(tmp_path):
    """LWPOLYLINE (R13+ flavor) with inline 10/20 pairs, closed flag."""
    txt = "\n".join([
        "0", "SECTION", "2", "ENTITIES",
        "0", "LWPOLYLINE", "8", "walls", "90", "3", "70", "1",
        "10", "0.0", "20", "0.0",
        "10", "2.0", "20", "0.0",
        "10", "1.0", "20", "2.0",
        "0", "LINE", "8", "axis",
        "10", "-1.0", "20", "-1.0", "11", "5.0", "21", "5.0",
        "0", "ENDSEC", "0", "EOF", ""])
    p = tmp_path / "hand.dxf"
    p.write_text(txt)
    t = read_dxf(str(p))
    assert t.num_rows == 2
    fg = W.decode(t["geom"].to_pylist())
    assert int(fg.types[0]) == 3  # closed lwpolyline → polygon
    assert int(fg.types[1]) == 2  # LINE → 2-point linestring
    assert np.allclose(fg.geom_coords(1), [[-1, -1], [5, 5]])
    assert t["layer"].to_pylist() == ["walls", "axis"]


def test_dataset_input(tmp_path, ray_session=None):
    import ray

    t = pa.table({"geom": pa.array(
        [W.encode_point(float(i), 0.0) for i in range(10)], pa.binary())})
    path = str(tmp_path / "ds.dxf")
    n = write_dxf(ray.data.from_arrow(t), path, layer_col=None)
    assert n == 10
    back = read_dxf(path)
    assert back.num_rows == 10
    fg = W.decode(back["geom"].to_pylist())
    assert np.allclose(fg.coords[:, 0], np.arange(10))
