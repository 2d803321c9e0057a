"""North-star per-row invariant: the `text` column survives the full
flagship path byte-identical per url (BASELINE.json input_hint)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from opengxt_ray.index import hexgrid
from opengxt_ray.ops import join as J
from opengxt_ray.sources import pages, tpch_geo


@pytest.fixture(scope="module")
def pages_ds():
    return pages.pages_dataset(3000, parallelism=4).materialize()


def test_pages_deterministic(pages_ds):
    a = pages_ds.to_pandas().sort_values("url").reset_index(drop=True)
    b = pages.pages_dataset(3000, parallelism=2).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert (a.url == b.url).all()
    assert (a.text == b.text).all()
    assert (a.html == b.html).all()


def test_geocode_hot_cell_skew(pages_ds):
    geo = pages_ds.map_batches(
        lambda b: pages.geocode_batch(b, res=6), batch_format="pyarrow")
    df = geo.to_pandas()
    counts = df.groupby("cell").size().sort_values(ascending=False)
    # the deliberately hot cluster dominates
    assert counts.iloc[0] > len(df) * 0.1
    # deterministic geocode
    geo2 = pages_ds.map_batches(
        lambda b: pages.geocode_batch(b, res=6), batch_format="pyarrow")
    df2 = geo2.to_pandas()
    m = df.sort_values("url").reset_index(drop=True)
    m2 = df2.sort_values("url").reset_index(drop=True)
    np.testing.assert_array_equal(m.lon.to_numpy(), m2.lon.to_numpy())


def test_text_byte_identical_through_join(pages_ds):
    """Full pipeline: geocode → slim co-partition PIP join → re-attach
    payload by fid → text bytes identical per url."""
    geo = pages_ds.map_batches(
        lambda b: pages.geocode_batch(b, res=3), batch_format="pyarrow"
    ).materialize()
    # world-spanning zones
    import pyarrow.parquet as pq

    nation = pq.read_table("/root/testdata/sf0.001/nation.parquet")
    zones = tpch_geo.nation_zones_table(nation)
    zds = ray.data.from_arrow(zones)
    # slim join (html/text NOT in the shuffle)
    slim = J.cell_copartition_join(
        geo, zds, res=3,
        point_cols=["fid", "lon", "lat", "cell"],
        right_cols=["n_nationkey"])
    # re-attach the wide payload by fid
    out = J.slim_join_reattach(slim, geo, key="fid",
                               payload_cols=["url", "text", "html"],
                               num_partitions=4)
    df = out.to_pandas()
    src = pages_ds.to_pandas()[["url", "text", "html"]]
    assert len(df) == len(src)  # every page lands in exactly one zone
    merged = df.merge(src, on="url", suffixes=("_out", "_src"))
    assert len(merged) == len(df)
    assert (merged.text_out == merged.text_src).all()
    assert (merged.html_out == merged.html_src).all()
    # byte-identical, not just string-equal
    for a, b in zip(merged.text_out.head(50), merged.text_src.head(50)):
        assert a.encode() == b.encode()


def test_raster_geometry_ops():
    from opengxt_ray.raster import RasterMeta, points_to_raster
    from opengxt_ray.raster.geometry import clip_by_extent, flip, resample

    meta = RasterMeta(0.0, 8.0, 1.0, 8, 8, tile_size=4)
    rs = np.random.RandomState(0)
    t = pa.table({"lon": pa.array(rs.uniform(0, 8, 500)),
                  "lat": pa.array(rs.uniform(0, 8, 500))})
    tiles = points_to_raster(ray.data.from_arrow(t), meta).materialize()

    def dense(tt, m):
        out = np.zeros((m.height, m.width))
        for row in tt.iter_rows():
            h, w = m.tile_shape(row["tx"], row["ty"])
            out[row["ty"] * m.tile_size : row["ty"] * m.tile_size + h,
                row["tx"] * m.tile_size : row["tx"] * m.tile_size + w] = \
                np.frombuffer(row["data"], np.float64).reshape(h, w)
        return out

    base = dense(tiles, meta)
    flipped = dense(flip(tiles, meta, axis="vertical"), meta)
    np.testing.assert_array_equal(flipped, base[::-1])
    mirrored = dense(flip(tiles, meta, axis="horizontal"), meta)
    np.testing.assert_array_equal(mirrored, base[:, ::-1])
    clipped = clip_by_extent(tiles, meta, (0, 0, 4, 4))
    dc = dense(clipped, meta)
    assert np.nansum(dc) == base[4:, :4].sum()  # lower-left quarter (rows top-down)
    rt, rm = resample(tiles, meta, cell_size=0.5, method="nearest")
    dr = dense(rt, rm)
    assert dr.shape == (16, 16)
    np.testing.assert_array_equal(dr[::2, ::2], base)


def test_join_deterministic_across_parallelism():
    """North-star determinism: identical sorted join output regardless
    of block structure/arrival order."""
    import pyarrow.parquet as pq

    from opengxt_ray.ops import join as J

    nation = pq.read_table("/root/testdata/sf0.001/nation.parquet")
    zones = tpch_geo.nation_zones_table(nation)
    outs = []
    for blocks in (2, 7):
        cust = ray.data.read_parquet("/root/testdata/sf0.001/customer.parquet",
                                     columns=["c_custkey"],
                                     override_num_blocks=blocks)
        pts = cust.map_batches(
            lambda b: tpch_geo.add_point_geom(b, "c_custkey", with_wkb=False),
            batch_format="pyarrow")
        df = J.broadcast_spatial_join(
            pts, zones, predicate="intersects", how="inner",
            right_cols=["n_nationkey"]).to_pandas()
        outs.append(df.sort_values("c_custkey").reset_index(drop=True))
    assert (outs[0]["c_custkey"] == outs[1]["c_custkey"]).all()
    assert (outs[0]["n_nationkey"] == outs[1]["n_nationkey"]).all()


def test_html_extraction_reproduces_text_column():
    """north_rule invariant, closed end-to-end: extracting text from
    the pages' html column reproduces the text column BYTE-IDENTICALLY
    for every row."""
    import pyarrow.compute as pc
    import ray

    from opengxt_ray.sources import pages
    from opengxt_ray.textops.htmlops import html_to_text

    ds = pages.pages_dataset(2000, parallelism=4)
    out = html_to_text(ds, concurrency=2)

    def _check(b):
        import pyarrow as pa

        eq = pc.equal(b["text"], b["text_extracted"])
        return pa.table({"ok": pa.array([bool(pc.all(eq).as_py())]),
                         "n": pa.array([b.num_rows])})

    res = out.map_batches(_check, batch_format="pyarrow").to_pandas()
    assert res["n"].sum() == 2000
    assert res["ok"].all()


def test_html_extraction_real_markup():
    from opengxt_ray.textops.htmlops import extract_text

    assert extract_text(
        "<div><h1>Title</h1><script>var x=1;</script>"
        "<p>a &amp; b</p></div>") == "Title a & b"
    assert extract_text(
        "<style>.x{}</style><p> spaced   out </p>"
        "<noscript>no</noscript>tail") == "spaced out tail"
    assert extract_text("<p>&#65;&#x42;c</p>") == "ABc"
    assert extract_text(b"<html><body><p>bytes in</p></body></html>") \
        == "bytes in"


def test_html_extract_drops_payload_by_default():
    """Round-5 nit: the wide html payload must NOT survive into the
    stage output (SURVEY §7.4 — wide binary stays out of shuffles);
    drop_payload=False keeps it for callers that need the bytes."""
    from opengxt_ray.sources import pages
    from opengxt_ray.textops.htmlops import html_to_text

    ds = pages.pages_dataset(200, parallelism=2)
    out = html_to_text(ds, concurrency=2)
    assert "html" not in out.schema().names
    assert "text_extracted" in out.schema().names
    kept = html_to_text(ds, concurrency=2, drop_payload=False)
    assert "html" in kept.schema().names
