"""WindRose / FlowMap / PolarGrids / RingMap vs brute-force oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.core import geomops, wkb as _wkb
from opengxt_ray.ops import presentation as PR


def _points_ds(px, py, **cols):
    geoms = [_wkb.encode_point(float(x), float(y)) for x, y in zip(px, py)]
    data = {"geom": pa.array(geoms, pa.binary())}
    for k, v in cols.items():
        data[k] = pa.array(v)
    return ray.data.from_arrow(pa.table(data)).repartition(3)


def test_windrose_stats_match_bruteforce():
    rng = np.random.default_rng(42)
    n = 500
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 50, n)
    w = rng.uniform(1, 10, n)
    ds = _points_ds(px, py, w=w)
    rose, anchor = PR.windrose_map(ds, weight_col="w")
    assert rose.num_rows == 32 and anchor.num_rows == 21

    # brute force: same binning rule
    cx, cy = 50.0, 25.0
    # bounds come from the data, not [0,100]x[0,50]
    minx, miny, maxx, maxy = px.min(), py.min(), px.max(), py.max()
    cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
    deg = np.degrees(np.arctan2(py - cy, px - cx))
    uid = np.floor(((deg + 5.625) % 360.0) / 11.25).astype(int)
    for i in range(32):
        sel = w[uid == i]
        row = {c: rose[c][i].as_py() for c in rose.column_names
               if c != "geom"}
        assert row["uid"] == i
        assert row["count"] == len(sel)
        if len(sel):
            assert row["sum"] == pytest.approx(sel.sum(), rel=1e-12)
            assert row["min"] == pytest.approx(sel.min())
            assert row["max"] == pytest.approx(sel.max())
            assert row["mean"] == pytest.approx(sel.mean(), rel=1e-12)
            # population variance (StatisticsVisitor.java:226)
            var = (np.sum(sel ** 2) - sel.sum() ** 2 / len(sel)) / len(sel)
            assert row["var"] == pytest.approx(var, rel=1e-9, abs=1e-12)
            assert row["std_dev"] == pytest.approx(
                np.sqrt(max(var, 0.0)), rel=1e-9, abs=1e-12)
        else:
            assert row["sum"] == 0.0 and row["min"] == 0.0

    # wedge radii scale with (sum - min)/(max - min) * radius
    radius = np.hypot(maxx - minx, maxy - miny) / 1.98
    sums = np.array([rose["sum"][i].as_py() for i in range(32)])
    lo, hi = sums.min(), sums.max()
    fg = _wkb.decode([rose["geom"][i].as_py() for i in range(32)])
    for i in range(32):
        pts = fg.geom_coords(i)
        got_r = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy).max()
        want = (sums[i] - lo) / (hi - lo) * radius
        if want == 0:
            want = radius * 0.001
        assert got_r == pytest.approx(want, rel=1e-9)


def test_windrose_anchor_layout():
    a = PR.windrose_anchor(0.0, 0.0, 10.0)
    assert a.num_rows == 21
    dist = [a["distance"][i].as_py() for i in range(5)]
    assert dist == pytest.approx([2, 4, 6, 8, 10])
    labels = [a["direction"][i].as_py() for i in range(5, 21)]
    assert labels == PR.NORTH_16
    # direction rays end on the outer circle at 22.5 deg steps
    fg = _wkb.decode([a["geom"][i].as_py() for i in range(5, 21)])
    for i in range(16):
        end = fg.geom_coords(i)[-1]
        ang = np.radians(22.5 * i)
        assert end[0] == pytest.approx(10 * np.cos(ang), abs=1e-9)
        assert end[1] == pytest.approx(10 * np.sin(ang), abs=1e-9)


def test_flow_map_both_side_single_arrow():
    lines = [_wkb.encode_linestring(np.array([[0, 0], [10, 0]], float)),
             _wkb.encode_linestring(np.array([[0, 5], [10, 5]], float))]
    tbl = pa.table({"geom": pa.array(lines, pa.binary()),
                    "od": pa.array([1.0, 3.0])})
    ds = ray.data.from_arrow(tbl)
    out = PR.flow_map(ds, "od", max_size=2.0).to_pandas()
    assert len(out) == 2  # one both-sided arrow per line
    fg = _wkb.decode(out["geom"].tolist())
    # od=3 row: trans=1 -> head radius 2; arrow tip at 'to', barbs at
    # angle 180±10, 180±20 deg from 'to'
    i_big = int(np.argmax(out["od"].to_numpy()))
    pts = fg.geom_coords(i_big)
    to = np.array([10.0, 5.0])
    d = np.hypot(pts[:, 0] - to[0], pts[:, 1] - to[1])
    barbs = pts[(d > 1e-9) & (d < 3.0)]
    assert len(barbs) == 4
    assert np.allclose(np.hypot(barbs[:, 0] - to[0], barbs[:, 1] - to[1]),
                       2.0)
    # od=1 row: trans=0 -> degenerate head (radius 0)
    pts0 = fg.geom_coords(1 - i_big)
    assert np.hypot(pts0[:, 0] - 10, pts0[:, 1] - 0).min() < 1e-12


def test_flow_map_two_way_emits_two_arrows():
    lines = [_wkb.encode_linestring(np.array([[0, 0], [10, 0]], float))]
    tbl = pa.table({"geom": pa.array(lines, pa.binary()),
                    "od": pa.array([2.0]), "do_v": pa.array([5.0])})
    out = PR.flow_map(ray.data.from_arrow(tbl), "od", do_col="do_v",
                      max_size=1.0).to_pandas()
    assert len(out) == 2
    fg = _wkb.decode(out["geom"].tolist())
    # second arrow is reversed: starts at (10,0), head at (0,0)
    p1 = fg.geom_coords(1)
    assert p1[0] == pytest.approx([10, 0])


def test_polar_grids_from_geometry():
    t = PR.polar_grid_cells(0.0, 0.0, [1.0, 2.0], sides=8,
                            radial_type="polar", outside_only=True)
    assert t.num_rows == 16
    assert t["azimuth"][0].as_py() == "NE"  # 22.5 deg start sector
    fg = _wkb.decode([t["geom"][i].as_py() for i in range(16)])
    # inner cells are wedges (contain centre), outer are annular bands
    n_gon_factor = 0.5 * 24 * 8 * np.sin(2 * np.pi / (24 * 8))
    # wedge area = 1/8 of the r=1 (24*8)-gon
    a0 = abs(geomops.ring_area(fg.geom_coords(0)))
    assert a0 == pytest.approx(n_gon_factor / 8, rel=1e-3)
    # band area = 1/8 of (r2 n-gon - r1 n-gon)
    a1 = abs(geomops.ring_area(fg.geom_coords(1)))
    assert a1 == pytest.approx((4 - 1) * n_gon_factor / 8, rel=1e-3)
    # base radial type starts at 0 deg
    tb = PR.polar_grid_cells(0.0, 0.0, [1.0], sides=8, radial_type="base")
    assert tb["azimuth"][0].as_py() == "NEE"


def test_polar_grids_from_features_copies_attrs():
    ds = _points_ds([0.0, 100.0], [0.0, 0.0], name=["a", "b"])
    out = PR.polar_grids(ds, [1.0, 2.0], sides=4).to_pandas()
    assert len(out) == 2 * 4 * 2
    assert set(out["name"]) == {"a", "b"}
    assert "azimuth" not in out.columns  # only for 8 sides
    # each centre's cells stay near it
    fg = _wkb.decode(out["geom"].tolist())
    for i in range(len(out)):
        cxs = fg.geom_coords(i)[:, 0]
        assert (abs(cxs) < 3).all() if out["name"][i] == "a" \
            else (abs(cxs - 100) < 3).all()


def test_ring_map_greedy_assignment():
    # 4 features on a square; value fields v1, v2
    px = [0.0, 10.0, 10.0, 0.0]
    py = [0.0, 0.0, 10.0, 10.0]
    tbl = pa.table({
        "geom": pa.array([_wkb.encode_point(x, y) for x, y in zip(px, py)],
                         pa.binary()),
        "name": pa.array(["sw", "se", "ne", "nw"]),
        "v1": pa.array([1.0, 2.0, 3.0, 4.0]),
        "v2": pa.array([10.0, 20.0, 30.0, 40.0])})
    rings, anchors = PR.ring_map(tbl, ["v1", "v2"])
    assert rings.num_rows == 4 * 2
    assert anchors.num_rows == 4
    # every feature assigned exactly once
    assert sorted(set(anchors["name"].to_pylist())) == ["ne", "nw", "se",
                                                        "sw"]
    # ring_num alternates 1,2 and ring_val carries v1 then v2
    names = rings["name"].to_pylist()
    nums = rings["ring_num"].to_pylist()
    vals = rings["ring_val"].to_pylist()
    by_name = {"sw": (1.0, 10.0), "se": (2.0, 20.0), "ne": (3.0, 30.0),
               "nw": (4.0, 40.0)}
    for j in range(0, 8, 2):
        assert nums[j] == 1 and nums[j + 1] == 2
        v1, v2 = by_name[names[j]]
        assert vals[j] == v1 and vals[j + 1] == v2
    # first side spans [0,90) deg: nearest feature to its innermost
    # cell centroid is "ne" (cell sits outside radius toward 45 deg)
    assert anchors["name"][0].as_py() == "ne"


def test_ring_map_cap_raises():
    n = 10
    tbl = pa.table({
        "geom": pa.array([_wkb.encode_point(float(i), 0.0)
                          for i in range(n)], pa.binary()),
        "v": pa.array([float(i) for i in range(n)])})
    with pytest.raises(ValueError, match="max_features"):
        PR.ring_map(tbl, ["v"], max_features=5)


def test_multi_windrose_sector_stats():
    rng = np.random.default_rng(9)
    n = 400
    # two centers far apart; points clustered around each
    ctr = pa.table({"geom": pa.array(
        [_wkb.encode_point(0.0, 0.0), _wkb.encode_point(1000.0, 0.0)],
        pa.binary())})
    px = np.concatenate([rng.uniform(-40, 40, n), 1000 + rng.uniform(-40, 40, n)])
    py = np.concatenate([rng.uniform(-40, 40, n), rng.uniform(-40, 40, n)])
    w = rng.uniform(1, 5, 2 * n)
    ds = _points_ds(px, py, w=w)
    R, CNT = 50.0, 8
    counting, rose, anchor = PR.multi_windrose(
        [ds], ["w"], ctr, R, rose_count=CNT)
    assert counting.num_rows == 2 * CNT
    assert anchor.num_rows == 2 * 21

    # brute force oracle for center 0
    step, half = 360.0 / CNT, 180.0 / CNT
    d0 = np.hypot(px, py)
    in0 = d0 <= R
    deg = np.degrees(np.arctan2(py[in0], px[in0]))
    sec = np.floor(((deg - half) % 360.0) / step).astype(int)
    w0 = w[in0]
    rs = rose.to_pandas()
    r0 = rs[rs["c"] == 0]
    # global maxVal across both centers
    d1 = np.hypot(px - 1000, py)
    in1 = d1 <= R
    deg1 = np.degrees(np.arctan2(py[in1], (px - 1000)[in1]))
    sec1 = np.floor(((deg1 - half) % 360.0) / step).astype(int)
    sums = ([w0[sec == s].sum() for s in range(CNT)] +
            [w[in1][sec1 == s].sum() for s in range(CNT)])
    max_val = max(sums)
    for s in range(CNT):
        sel = w0[sec == s]
        if len(sel) == 0:
            continue
        # find the row whose val matches
        match = r0[np.isclose(r0["val"].to_numpy(), sel.sum())]
        assert len(match) >= 1
        m = match.iloc[0]
        assert m["mean"] == pytest.approx(sel.mean())
        assert m["mdn"] == pytest.approx(float(np.median(sel)))
        assert m["stdev"] == pytest.approx(
            float(np.sqrt(np.mean((sel - sel.mean()) ** 2))))
        # single input: band outer radius = sum/maxVal * R
        fgc = _wkb.decode([m["geom"]])
        pts = fgc.geom_coords(0)
        assert np.hypot(pts[:, 0], pts[:, 1]).max() == pytest.approx(
            sel.sum() / max_val * R, rel=1e-9)


def test_registry_has_presentation_ops():
    from opengxt_ray import registry
    for name in ["WindRoseMap", "MultiWindRoseMap", "FlowMap",
                 "PolarGridsFromFeatures", "PolarGridsFromGeometry",
                 "RingMap"]:
        assert registry.get(name).build is not None


def test_multi_windrose_two_inputs_stack_bands():
    """Two input collections stack radially per sector: band widths
    proportional to each input's share of the sector sum, total radius
    = sum/maxVal * search_radius (MultiWindRoseOperation.java:330-80)."""
    rng = np.random.default_rng(77)
    n = 300
    ctr = pa.table({"geom": pa.array([_wkb.encode_point(0.0, 0.0)],
                                     pa.binary())})
    ds1 = _points_ds(rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
                     w=rng.uniform(1, 5, n))
    ds2 = _points_ds(rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
                     w=rng.uniform(1, 5, n))
    R, CNT = 50.0, 4
    _c, rose, _a = PR.multi_windrose([ds1, ds2], ["w", "w"], ctr, R,
                                     rose_count=CNT)
    rs = rose.to_pandas()
    assert set(rs["rose_tg"]) == {"input0", "input1"}
    # per sector: input0 band from 0, input1 band stacked outside it;
    # outer radius of the stack = sum/maxVal * R
    fg = _wkb.decode(rs["geom"].tolist())
    radii = []
    for i in range(len(rs)):
        pts = fg.geom_coords(i)
        d = np.hypot(pts[:, 0], pts[:, 1])
        radii.append((d.min(), d.max()))
    rs["r_in"] = [r[0] for r in radii]
    rs["r_out"] = [r[1] for r in radii]
    # group rows into sectors by matching stacked pairs: for each
    # input1 row there is an input0 row whose outer == its inner
    i0 = rs[rs["rose_tg"] == "input0"].sort_values("r_out")
    i1 = rs[rs["rose_tg"] == "input1"].sort_values("r_in")
    assert len(i0) == len(i1) == CNT
    # pair bands by shared boundary radius; input0 starts at 0
    sector_sums = []
    for _, row1 in i1.iterrows():
        match = i0[np.isclose(i0["r_out"], row1["r_in"], rtol=1e-9)]
        assert len(match) == 1
        row0 = match.iloc[0]
        assert row0["r_in"] == pytest.approx(0.0, abs=1e-9)
        assert row1["r_out"] > row1["r_in"] > 0
        sector_sums.append((row0["val"] + row1["val"], row1["r_out"]))
    # stack outer radius = sector_sum / max_sector_sum * R
    smax = max(s for s, _ in sector_sums)
    for s, rout in sector_sums:
        assert rout == pytest.approx(s / smax * R, rel=1e-9)
