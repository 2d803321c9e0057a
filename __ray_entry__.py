"""Driver contract for the opengxt_ray engine.

``entry()`` — flagship pipeline on /root/testdata/sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2);
each takes ``sf_dir`` and returns a Dataset / DataFrame / Table.
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names,
float expressions written to match the engine's IEEE operation order
exactly — see opengxt_ray/sources/tpch_geo.py).

Ray is initialised by the driver BEFORE importing this module; nothing
here calls ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from opengxt_ray.core.util import install_empty_bundle_warning_filter

# benign empty-bundle log noise only — real schema mismatches still
# warn (see the helper's docstring; OGXT_KEEP_EMPTY_SCHEMA_WARNINGS=1
# reveals everything)
install_empty_bundle_warning_filter()

# ---------------------------------------------------------------------------
# shared derivation SQL fragments (must mirror opengxt_ray.sources.tpch_geo)
# ---------------------------------------------------------------------------

def _lon(k: str) -> str:
    return f"((({k}) * 7919) % 36000) / 100.0 - 180.0 + 0.005"


def _lat(k: str) -> str:
    return f"((({k}) * 104729) % 17000) / 100.0 - 85.0 + 0.005"


def _zone(k: str) -> str:
    lon, lat = _lon(k), _lat(k)
    return (f"(CAST(floor(({lat} + 90.0) / 36.0) AS INTEGER) * 5 "
            f"+ CAST(floor(({lon} + 180.0) / 72.0) AS INTEGER))")


def _read_pts(sf_dir: str, table: str, key: str, columns=None):
    import ray

    from opengxt_ray.sources import tpch_geo

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                               columns=columns or [key])
    return ds.map_batches(
        lambda b: tpch_geo.add_point_geom(b, key, with_wkb=False),
        batch_format="pyarrow")


def _zones(sf_dir: str):
    import pyarrow.parquet as pq

    from opengxt_ray.sources import tpch_geo

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    return tpch_geo.nation_zones_table(nation)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_pip_join_rows(sf_dir: str):
    from opengxt_ray.ops import join as J

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    out = J.broadcast_spatial_join(pts, _zones(sf_dir), predicate="intersects",
                                   how="inner", dedup="suffix")
    return out.map_batches(lambda b: b.select(["c_custkey", "n_nationkey"]),
                           batch_format="pyarrow")


def _q_copart_pip_join_rows(sf_dir: str):
    import ray

    from opengxt_ray.index import hexgrid
    from opengxt_ray.ops import join as J

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    pts = pts.map_batches(
        lambda b: b.append_column("cell", pa.array(
            hexgrid.hex_cell(b["lon"].to_numpy(), b["lat"].to_numpy(), 3),
            pa.uint64())),
        batch_format="pyarrow")
    zds = ray.data.from_arrow(_zones(sf_dir))
    out = J.cell_copartition_join(pts, zds, res=3,
                                  point_cols=["c_custkey", "lon", "lat", "cell"],
                                  right_cols=["n_nationkey"])
    return out.map_batches(lambda b: b.select(["c_custkey", "n_nationkey"]),
                           batch_format="pyarrow")


def _q_pip_join_count(sf_dir: str):
    from opengxt_ray.ops.pip import points_in_polygon

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    out = points_in_polygon(pts, _zones(sf_dir), poly_key="n_nationkey")
    return out.map_batches(
        lambda b: b.select(["n_nationkey", "n_name", "n_regionkey", "val"]),
        batch_format="pyarrow")


def _q_nearest_join(sf_dir: str):
    import pyarrow.parquet as pq

    from opengxt_ray.ops.near import knn_links
    from opengxt_ray.sources import tpch_geo

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    skey = supp["s_suppkey"].to_numpy()
    sx, sy = tpch_geo.point_lonlat(skey)
    pts = _read_pts(sf_dir, "customer", "c_custkey")
    links = knn_links(pts, skey, sx, sy, k=1, id_col="c_custkey",
                      nbr_id_col="s_suppkey")
    return links.map_batches(lambda b: b.select(["c_custkey", "s_suppkey"]),
                             batch_format="pyarrow")


def _q_knn_join(sf_dir: str):
    import pyarrow.parquet as pq

    from opengxt_ray.ops.near import knn_links
    from opengxt_ray.sources import tpch_geo

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    skey = supp["s_suppkey"].to_numpy()
    sx, sy = tpch_geo.point_lonlat(skey)
    pts = _read_pts(sf_dir, "customer", "c_custkey")
    links = knn_links(pts, skey, sx, sy, k=3, id_col="c_custkey",
                      nbr_id_col="s_suppkey")
    return links.map_batches(
        lambda b: b.select(["c_custkey", "s_suppkey", "rank"]).set_column(
            2, "rank", b["rank"].cast(pa.int64())),
        batch_format="pyarrow")


def _q_near_dist(sf_dir: str):
    import pyarrow.parquet as pq

    from opengxt_ray.ops.near import knn_links
    from opengxt_ray.sources import tpch_geo

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    skey = supp["s_suppkey"].to_numpy()
    sx, sy = tpch_geo.point_lonlat(skey)
    pts = _read_pts(sf_dir, "customer", "c_custkey")
    links = knn_links(pts, skey, sx, sy, k=1, id_col="c_custkey",
                      nbr_id_col="s_suppkey", emit_dist_sq=True)
    return links.map_batches(
        lambda b: b.select(["c_custkey", "s_suppkey", "dist_sq"]),
        batch_format="pyarrow")


def _q_rect_binning(sf_dir: str):
    from opengxt_ray.ops.binning import rect_binning

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    out = rect_binning(pts, width=10.0, height=10.0, origin=(-180.0, -90.0))
    return out.map_batches(
        lambda b: pa.table({"col": b["col"], "row": b["row"],
                            "val": b["val"]}),
        batch_format="pyarrow")


def _q_hex_binning(sf_dir: str):
    from opengxt_ray.ops.binning import hex_binning

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    out = hex_binning(pts, size=5.0, origin=(0.0, 0.0))
    return out.map_batches(
        lambda b: pa.table({"q": b["q"], "r": b["r"], "val": b["val"]}),
        batch_format="pyarrow")


def _q_dissolve_stats(sf_dir: str):
    import ray

    from opengxt_ray.ops.aggregate import data_statistics

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_mktsegment", "c_acctbal"])
    out = data_statistics(ds, ["c_acctbal"], group_by="c_mktsegment",
                          funcs=("count", "sum", "mean"), round_digits=6,
                          ngroups_hint=5)  # TPC-H has 5 market segments
    return out


def _q_data_statistics(sf_dir: str):
    import ray

    from opengxt_ray.ops.aggregate import data_statistics

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_quantity"])
    return data_statistics(ds, ["l_quantity"],
                           funcs=("count", "sum", "mean", "min", "max",
                                  "range", "std", "var"))


def _q_collect_events(sf_dir: str):
    from opengxt_ray.ops.aggregate import collect_events

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    out = collect_events(pts, tolerance=0.5)
    return out.map_batches(
        lambda b: pa.table({"qx": b["qx"], "qy": b["qy"],
                            "icount": b["icount"].cast(pa.int64())}),
        batch_format="pyarrow")


def _q_exact_dedup(sf_dir: str):
    import ray

    from opengxt_ray.textops.dedup import exact_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = exact_dedup(ds)
    return out.map_batches(
        lambda b: pa.table({"keep_id": b["min(doc_id)"]}),
        batch_format="pyarrow")


def _q_token_count(sf_dir: str):
    import ray

    from opengxt_ray.textops.quality import token_count_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_tokens"]), batch_format="pyarrow")


def _q_quality_len(sf_dir: str):
    import ray

    from opengxt_ray.textops.quality import quality_score_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(quality_score_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_chars", "n_words"]),
        batch_format="pyarrow")


def _q_gi_star(sf_dir: str):
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops import hotspot

    pts = _read_pts(sf_dir, "customer", "c_custkey",
                    columns=["c_custkey", "c_acctbal"])
    out = hotspot.local_gi_star(pts, "c_acctbal", id_col="c_custkey",
                                band=15.0, round_digits=None)

    def _final(b: pa.Table) -> pa.Table:
        z = b["GiZScore"].to_numpy()
        hot = np.where(z >= 1.96, 1, np.where(z <= -1.96, -1, 0)).astype(np.int32)
        return pa.table({
            "c_custkey": b["id"],
            "nn": b["nn"],
            "hot": pa.array(hot),
            "gi_z4": pa.array(format_round(z, 4)),
        })

    return out.map_batches(_final, batch_format="pyarrow")


def _q_global_moran(sf_dir: str):
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops import hotspot

    pts = _read_pts(sf_dir, "customer", "c_custkey",
                    columns=["c_custkey", "c_acctbal"])
    res = hotspot.global_morans_i(pts, "c_acctbal", id_col="c_custkey",
                                  band=20.0)
    return pa.table({
        "moran_i6": [format_round(res["observed"], 6)],
        "z6": [format_round(res["z"], 4)],
    })


def _q_global_geary_g(sf_dir: str):
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops import hotspot

    pts = _read_pts(sf_dir, "customer", "c_custkey",
                    columns=["c_custkey", "c_acctbal"])
    gc = hotspot.global_gearys_c(pts, "c_acctbal", id_col="c_custkey",
                                 band=20.0)
    gg = hotspot.global_g(pts, "c_acctbal", id_col="c_custkey", band=20.0)
    ls = hotspot.global_lees_s(pts, "c_acctbal", id_col="c_custkey",
                               band=20.0)
    return pa.table({
        "geary6": [format_round(gc["observed"], 6)],
        "gstat8": [format_round(gg["observed"], 8)],
        "lees_s6": [format_round(ls["observed"], 6)],
    })


def _q_mean_center(sf_dir: str):
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.distribution import mean_center, standard_distance

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    mc = mean_center(pts)
    sd = standard_distance(pts)
    return pa.table({
        "cx6": [format_round(mc["cx"], 6)],
        "cy6": [format_round(mc["cy"], 6)],
        "sd6": [format_round(sd["std_dist"], 6)],
    })


def _q_attribute_join(sf_dir: str):
    import ray

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda b: pa.table({"o_custkey": b["c_custkey"],
                            "c_mktsegment": b["c_mktsegment"]}),
        batch_format="pyarrow")
    out = orders.join(cust, join_type="inner", num_partitions=8,
                      on=("o_custkey",))
    return out.map_batches(lambda b: b.select(["o_orderkey", "c_mktsegment"]),
                           batch_format="pyarrow")


def _q_events_window(sf_dir: str):
    import ray

    from opengxt_ray.core.ssutils import format_round

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def _hour(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = pc.floor_temporal(b["ts"], unit="hour")
        return pa.table({"hour": h, "event_type": b["event_type"],
                         "value": b["value"]})

    hourly = ds.map_batches(_hour, batch_format="pyarrow")
    import ray.data.aggregate as A

    agg = hourly.groupby(["hour", "event_type"]).aggregate(
        A.Count(), A.Sum("value"))
    return agg.map_batches(
        lambda b: pa.table({
            "hour": b["hour"], "event_type": b["event_type"],
            "cnt": b["count()"],
            "sval6": pa.array(format_round(
                b["sum(value)"].to_numpy(zero_copy_only=False), 6)),
        }),
        batch_format="pyarrow")


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq
    import ray

    from opengxt_ray.vector.ann import brute_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qtab = emb.slice(0, 5)
    qids = qtab["vec_id"].to_numpy()
    qm = np.stack(qtab["embedding"].to_numpy(zero_copy_only=False))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = brute_topk(ds, qids, qm, k=10)
    return out.map_batches(
        lambda b: pa.table({"query_id": b["query_id"], "vec_id": b["vec_id"],
                            "rank": b["rank"].cast(pa.int64())}),
        batch_format="pyarrow")


def _q_minhash_dedup(sf_dir: str):
    """MinHash near-dup clusters, exact-verified at Jaccard ≥ 0.5 —
    SQL-oracled via brute-force shingle Jaccard + recursive-CTE
    connected components (the corpus' true near-dup pairs all sit at
    J ≥ 0.9, where 128-perm/16-band LSH recall is ≈ 1)."""
    import ray

    from opengxt_ray.textops.dedup import minhash_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return minhash_dedup(ds, verify_threshold=0.5)


def _q_minhash_pairs(sf_dir: str):
    """LSH candidates + exact shingle-Jaccard verify ≥ 0.5 →
    (a, b, jacc6). Brute-force pair SQL oracle."""
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.textops.dedup import minhash_verified_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = minhash_verified_pairs(ds, threshold=0.5)
    return out.map_batches(
        lambda b: pa.table({
            "a": b["a"], "b": b["b"],
            "jacc6": pa.array(format_round(b["jacc"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_simhash(sf_dir: str):
    """64-bit SimHash fingerprints — SQL-oracled: FNV-1a replicated in
    DuckDB via list_reduce over codepoints, bit votes as 64 aggregate
    expressions (see _simhash_sql). Fingerprint emitted as VARCHAR on
    both sides (uint64 doesn't survive the int64 canonicalization)."""
    import ray

    from opengxt_ray.textops.dedup import simhash_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(simhash_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "simhash_str": pa.array(
                [str(v) for v in b["simhash"].to_pylist()], pa.string()),
        }),
        batch_format="pyarrow")


def _q_lang_id(sf_dir: str):
    import ray

    from opengxt_ray.textops.quality import LanguageId

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(LanguageId, batch_format="pyarrow",
                         concurrency=(1, 4))
    return out.map_batches(lambda b: b.select(["doc_id", "lang_pred"]),
                           batch_format="pyarrow")


def _q_kmeans(sf_dir: str):
    """K-means, ONE Lloyd iteration from the deterministic
    farthest-point init — single-step Lloyd is SQL-expressible
    (recursive-CTE init, argmin assign, group-mean update), so the gate
    hash-checks the full distributed machinery (init sample, partial
    sums, center update, final assign); convergence over many
    iterations is pytest-covered (serial-Lloyd oracle)."""
    from opengxt_ray.ops.cluster import kmeans_assign

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    out = kmeans_assign(pts, 8, max_iter=1)
    return out.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"],
                            "cluster": b["cluster"].cast(pa.int64())}),
        batch_format="pyarrow")


def _q_standardized_scores(sf_dir: str):
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.regression import standardized_scores

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_linenumber",
                                        "l_quantity"])
    out = standardized_scores(ds, "l_quantity")
    return out.map_batches(
        lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"].cast(pa.int64()),
            "z6": pa.array(format_round(b["z_l_quantity"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_ols(sf_dir: str):
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.regression import ols

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_quantity"])
    fit = ols(ds, "l_extendedprice", ["l_quantity"])
    return pa.table({
        "slope4": [format_round(fit["coef"]["l_quantity"], 4)],
        "intercept4": [format_round(fit["intercept"], 4)],
        "r2_6": [format_round(fit["r2"], 6)],
    })


def _q_pearson(sf_dir: str):
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.regression import pearson

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"])
    r = pearson(ds, ["l_quantity", "l_extendedprice", "l_discount"])
    return pa.table({
        "r_qty_price6": [format_round(r[("l_quantity", "l_extendedprice")], 6)],
        "r_qty_disc6": [format_round(r[("l_quantity", "l_discount")], 6)],
    })


_KD_RADIUS = 3
_KD_META = None


def _kd_meta():
    global _KD_META
    if _KD_META is None:
        from opengxt_ray.raster import RasterMeta

        _KD_META = RasterMeta(origin_x=-180.0, origin_y=90.0, cell_size=1.0,
                              width=360, height=180, tile_size=64)
    return _KD_META


def _q_kernel_density(sf_dir: str):
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.raster import kernel_density, raster_to_points

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    tiles = kernel_density(pts, _kd_meta(), search_radius=3.0,
                           kernel="quadratic")
    cells = raster_to_points(tiles, _kd_meta(), drop_zero=True)
    return cells.map_batches(
        lambda b: pa.table({
            "col": b["col"], "row": b["row"],
            "kd6": pa.array(format_round(b["val"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_zonal_stats(sf_dir: str):
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.raster import points_to_raster, zonal_statistics

    from opengxt_ray.raster.algebra import raster_set_null

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    tiles = points_to_raster(pts, _kd_meta(), assign="count")
    # empty cells → nodata so the zonal visitor sees exactly the
    # occupied cells (the SQL oracle can only enumerate those)
    tiles = raster_set_null(tiles, lambda a: a == 0)
    res = zonal_statistics(tiles, _kd_meta(), _zones(sf_dir),
                           zone_key="n_nationkey")
    return res.map_batches(
        lambda b: pa.table({
            "n_nationkey": b["n_nationkey"],
            "zsum6": pa.array(format_round(b["zsum"].to_numpy(), 6)),
            "zmax6": pa.array(format_round(b["zmax"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_kernel_density_quartic(sf_dir: str):
    """Second kernel family through the gate (quartic/biweight)."""
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.raster import kernel_density, raster_to_points

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    tiles = kernel_density(pts, _kd_meta(), search_radius=3.0,
                           kernel="quartic")
    cells = raster_to_points(tiles, _kd_meta(), drop_zero=True)
    return cells.map_batches(
        lambda b: pa.table({
            "col": b["col"], "row": b["row"],
            "kd6": pa.array(format_round(b["val"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_ivf_topk(sf_dir: str):
    import pyarrow.parquet as pq
    import ray

    from opengxt_ray.vector.ann import ivf_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qtab = emb.slice(0, 5)
    qids = qtab["vec_id"].to_numpy()
    qm = np.stack(qtab["embedding"].to_numpy(zero_copy_only=False))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # FULL probe (nprobe = nlist): exercises the whole IVF machinery
    # (centroid training, bucket assignment, probe routing, per-bucket
    # partial top-k, global merge) while being exactly equal to brute
    # force — so the brute-force SQL oracle applies. Partial-probe
    # recall is pytest-covered (tests/test_dedup_oracle.py).
    out = ivf_topk(ds, qids, qm, k=10, nlist=16, nprobe=16)
    return out.map_batches(
        lambda b: pa.table({"query_id": b["query_id"], "vec_id": b["vec_id"],
                            "rank": b["rank"].cast(pa.int64())}),
        batch_format="pyarrow")


def _q_spatial_clump(sf_dir: str):
    """SpatialClump single-linkage components, SQL-oracled via
    brute-force radius pairs + recursive-CTE transitive closure.
    Engine side runs the full pointer-jumping connected-components
    engine (no round cap), so correctness no longer depends on
    component depth; radius 1.5 just keeps the DuckDB recursive-CTE
    closure affordable at sf0.01."""
    from opengxt_ray.ops.cluster import distance_clusters

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    return distance_clusters(pts, radius=1.5, id_col="c_custkey")


def _q_cell_assignment(sf_dir: str):
    """Per-row H3-style hex cell assignment (the engine's partition
    key) — row-level 'tile assignment' parity vs SQL cube-rounding."""
    from opengxt_ray.index import hexgrid

    res = 5
    pts = _read_pts(sf_dir, "customer", "c_custkey")

    def _cells(b: pa.Table) -> pa.Table:
        cells = hexgrid.hex_cell(b["lon"].to_numpy(), b["lat"].to_numpy(), res)
        q = ((cells >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(
            np.int64) - (1 << 28)
        r = (cells & np.uint64((1 << 29) - 1)).astype(np.int64) - (1 << 28)
        return pa.table({"c_custkey": b["c_custkey"],
                         "q": pa.array(q), "r": pa.array(r)})

    return pts.map_batches(_cells, batch_format="pyarrow")


def _q_pii_redact(sf_dir: str):
    """PII redaction (email/IPv4/phone masking, Dolma/ROOTS-style) —
    RE2 on both sides, so the SQL oracle applies the IDENTICAL pattern
    strings with regexp_replace(..., 'g')."""
    import ray

    from opengxt_ray.textops.urlops import redact_pii

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])

    def _mk(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy()
        txt = [f"user{int(x)}@mail{int(x) % 7}.example.com pinged "
               f"10.{int(x) % 256}.0.{(int(x) * 3) % 256} then called "
               f"+1-55{int(x) % 10} 123 4{int(x) % 10}67 ok"
               for x in k]
        return pa.table({"c_custkey": b["c_custkey"],
                         "text": pa.array(txt, pa.string())})

    out = redact_pii(ds.map_batches(_mk, batch_format="pyarrow"))
    return out.map_batches(
        lambda b: b.select(["c_custkey", "text"]), batch_format="pyarrow")


def _q_html_extract(sf_dir: str):
    """HTML→text extraction (stdlib parser: tag removal, script/style
    subtree drop, entity decoding, whitespace collapse) over templated
    markup built from customer rows — the SQL oracle constructs the
    expected text directly from the same template variables."""
    import ray

    from opengxt_ray.textops.htmlops import html_to_text

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])

    def _mk(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy()
        htmls = [(f"<html><body><h1>Customer {int(x)}</h1>"
                  f"<script>var x = {int(x)};</script>"
                  f"<p>balance &amp;   status: {int(x) % 100}</p>"
                  f"</body></html>").encode()
                 for x in k]
        return pa.table({"c_custkey": b["c_custkey"],
                         "html": pa.array(htmls, pa.binary())})

    # concurrency=None → default_concurrency() = CPUs−2: a pool sized
    # to ALL session CPUs starves the upstream read tasks and deadlocks
    # ≤4-CPU sessions (repo actor-pool-budget lore)
    out = html_to_text(ds.map_batches(_mk, batch_format="pyarrow"))
    return out.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"],
                            "text": b["text_extracted"]}),
        batch_format="pyarrow")


def _q_warc_roundtrip(sf_dir: str):
    """WARC ingest (round 5): documents → per-record-gzip .warc.gz
    shards (Common-Crawl layout, deterministic) → parallel
    ``warc_dataset`` read (one streaming task per shard, HTTP strip) →
    (url, n_bytes). The oracle computes the same url/byte-length
    directly from the documents table, so the gate proves the
    container round-trips bytes exactly through the Ray read path."""
    import hashlib
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from opengxt_ray.sources import warc as W

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tag = hashlib.md5(f"{sf_dir}|{docs.num_rows}".encode()).hexdigest()[:10]
    cache = f"/tmp/ogxt_warc_{tag}"
    nshards = 4
    paths = [os.path.join(cache, f"shard-{s}.warc.gz")
             for s in range(nshards)]
    if not all(os.path.exists(p) for p in paths):
        os.makedirs(cache, exist_ok=True)
        ids = docs["doc_id"].to_numpy()
        texts = docs["text"].to_pylist()
        for s in range(nshards):
            recs = [{"url": f"https://docs.example/{int(i)}",
                     "payload": t.encode("utf-8"),
                     "content_type": "text/plain"}
                    for i, t in zip(ids, texts) if int(i) % nshards == s]
            W.write_warc(paths[s] + ".tmp", recs, gzip_per_record=True)
            os.replace(paths[s] + ".tmp", paths[s])
    ds = W.warc_dataset(paths, columns=["url", "payload"])
    return ds.map_batches(
        lambda b: pa.table({
            "url": b["url"],
            "n_bytes": pc.cast(pc.binary_length(b["payload"]),
                               pa.int64())}),
        batch_format="pyarrow")


def _q_duplicate_windows(sf_dir: str):
    """Exact cross-document duplicate spans (20-word windows, Lee et
    al. 2022 windowed formulation): per-doc duplicated-window counts,
    hash-exact vs a string_split window self-join oracle."""
    import ray
    import ray.data.aggregate as A

    from opengxt_ray.textops.dedup import duplicate_window_hits

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    hits = duplicate_window_hits(ds, window=20)
    out = hits.groupby("doc_id").aggregate(A.Count())
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "n_dup_win": b["count()"].cast(pa.int64())}),
        batch_format="pyarrow")


def _q_gopher_repetition(sf_dir: str):
    """Gopher-style repetition signals (unique-word fraction, top
    adjacent-bigram share) — round-4 training-data quality op,
    hash-exact vs a string_split/lead SQL oracle."""
    import ray

    from opengxt_ray.textops.quality import repetition_signals

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return repetition_signals(ds)


_URL_GATE_SUFFIXES = ("example.com", "co.uk", "com.au", "co.jp",
                      "org.uk", "example.org")


def _url_parse_sql() -> str:
    """url_parse oracle: rebuilds the same mixed-suffix URLs and
    re-parses them with DuckDB RE2 + the SAME embedded suffix table
    (imported, so the two sides cannot drift)."""
    from opengxt_ray.textops.urlops import SECOND_LEVEL_SUFFIXES

    suf_case = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_URL_GATE_SUFFIXES))
    in_list = ", ".join(f"'{s}'" for s in SECOND_LEVEL_SUFFIXES)
    return rf"""
        WITH u AS (
            SELECT c_custkey,
                   'https://www' || (c_custkey % 3)
                   || '.host' || (c_custkey % 97) || '.'
                   || CASE (c_custkey % 6) {suf_case} END
                   || '/p/' || c_custkey
                   || CASE WHEN c_custkey % 3 = 0
                           THEN '?q=1' ELSE '' END
                   || CASE WHEN c_custkey % 5 = 0
                            AND c_custkey % 3 <> 0
                           THEN '/' ELSE '' END AS url
            FROM customer
        ),
        parsed AS (
            SELECT c_custkey, url,
                   regexp_replace(regexp_replace(regexp_replace(
                       lower(url), '^[a-z][a-z0-9+.-]*://', ''),
                       '[/?#].*$', ''), ':[0-9]+$', '') AS host,
                   regexp_replace(regexp_replace(
                       regexp_replace(lower(url),
                                      '^[a-z][a-z0-9+.-]*://', ''),
                       '^[^/?#]*', ''), '[?#].*$', '') AS path_only
            FROM u
        ),
        seg AS (
            SELECT c_custkey, url, host,
                   regexp_replace(host, '^.*\.([^.]+\.[^.]+)$',
                                  '\1') AS last2,
                   regexp_replace(host,
                                  '^.*\.([^.]+\.[^.]+\.[^.]+)$',
                                  '\1') AS last3,
                   regexp_replace(regexp_replace(path_only,
                                  '/+$', ''), '^/+', '') AS s
            FROM parsed
        )
        SELECT c_custkey, host,
               CASE WHEN last2 IN ({in_list}) THEN last3
                    ELSE last2 END AS domain,
               CASE WHEN length(s) = 0 THEN 0
                    ELSE length(s) - length(replace(s, '/', '')) + 1
               END AS path_depth,
               CAST(url LIKE '%?%' AS BIGINT) AS has_query
        FROM seg
    """


def _q_url_parse(sf_dir: str):
    """Round-4 webtext URL parsing (host/domain/path-depth/query flag,
    vectorized RE2 kernels) over deterministically synthesized page
    URLs with MIXED public suffixes (round 5: registrable-domain
    extraction consults the embedded PSL subset, so co.uk-style hosts
    resolve to three labels) — the SQL oracle re-parses the same
    strings with DuckDB's RE2 regexp functions and the same suffix
    table."""
    import ray

    from opengxt_ray.textops.urlops import parse_urls

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])

    def _mk(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy()
        urls = [f"https://www{int(x) % 3}.host{int(x) % 97}"
                f".{_URL_GATE_SUFFIXES[int(x) % 6]}/p/{int(x)}"
                + ("?q=1" if int(x) % 3 == 0 else "")
                + ("/" if int(x) % 5 == 0 and int(x) % 3 != 0 else "")
                for x in k]
        return pa.table({"c_custkey": b["c_custkey"],
                         "url": pa.array(urls, pa.string())})

    out = parse_urls(ds.map_batches(_mk, batch_format="pyarrow"))
    return out.map_batches(
        lambda b: pa.table({
            "c_custkey": b["c_custkey"],
            "host": b["host"], "domain": b["domain"],
            "path_depth": b["path_depth"],
            "has_query": b["has_query"].cast(pa.int64()),
        }), batch_format="pyarrow")


def _q_hot_cells(sf_dir: str):
    """Round-4 skew pre-pass gate: per-cell counts filtered to HOT
    cells inside the Dataset (the driver materializes only rows above
    threshold — ops/join.py hot_cell_salts) + ceil salt counts.
    Integer-exact SQL oracle (GROUP BY cell HAVING count > thr)."""
    import pandas as pd

    from opengxt_ray.index import hexgrid
    from opengxt_ray.ops import join as J

    res, thr, target = 2, 4, 2
    pts = _read_pts(sf_dir, "customer", "c_custkey")

    def _cells(b: pa.Table) -> pa.Table:
        cells = hexgrid.hex_cell(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                 res)
        return pa.table({"cell": pa.array(cells, pa.uint64())})

    cds = pts.map_batches(_cells, batch_format="pyarrow")
    salts = J.hot_cell_salts(cds, hot_threshold=thr,
                             target_group_rows=target)
    cells = np.array(sorted(salts), dtype=np.uint64)
    q = ((cells >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(
        np.int64) - (1 << 28)
    r = (cells & np.uint64((1 << 29) - 1)).astype(np.int64) - (1 << 28)
    return pd.DataFrame({
        "q": q, "r": r,
        "nsplit": np.array([salts[int(c)] for c in cells], np.int64)})


def _q_intersect_area(sf_dir: str):
    """Geometry-emitting Intersect overlay: 3°×2° rects around customer
    points × nation zones → per-piece intersection AREA (SQL-exact for
    axis-aligned rects)."""
    import ray

    from opengxt_ray.core import wkb as _wkb
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.overlay import intersect_features
    from opengxt_ray.sources import tpch_geo
    from opengxt_ray.stages.transforms import calculate_area

    def _rects(batch: pa.Table) -> pa.Table:
        lon, lat = tpch_geo.point_lonlat(batch["c_custkey"].to_numpy())
        geoms = [
            _wkb.encode_polygon(np.array(
                [[x - 1.5, y - 1.0], [x + 1.5, y - 1.0],
                 [x + 1.5, y + 1.0], [x - 1.5, y + 1.0]]))
            for x, y in zip(lon, lat)
        ]
        return pa.table({"c_custkey": batch["c_custkey"],
                         "geom": pa.array(geoms, pa.binary())})

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"]).map_batches(
        _rects, batch_format="pyarrow")
    inter = intersect_features(ds, _zones(sf_dir),
                               right_cols=["n_nationkey"])
    out = inter.map_batches(
        lambda b: calculate_area(b, out_col="__a"), batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table({
            "c_custkey": b["c_custkey"],
            "n_nationkey": b["n_nationkey"],
            "area6": pa.array(format_round(b["__a"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_union_area(sf_dir: str):
    """2-layer Union overlay (UnionProcess): A = distinct inset 0.5°
    cells derived from customer points, B = nation zones with the top
    band dropped (n_nationkey < 20) so all three legs are non-trivially
    exercised — A∩B cells, A−B cells (dropped band), B−A zone
    remainders (zone minus its covered cells). Areas SQL-exact."""
    import pyarrow.parquet as pq
    import ray

    from opengxt_ray.core import wkb as _wkb
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.overlay import union_features
    from opengxt_ray.sources import tpch_geo
    from opengxt_ray.stages.transforms import calculate_area

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    lon, lat = tpch_geo.point_lonlat(cust["c_custkey"].to_numpy())
    cq = np.unique(np.stack([np.floor(lon / 0.5).astype(np.int64),
                             np.floor(lat / 0.5).astype(np.int64)], axis=1),
                   axis=0)
    geoms = [_wkb.encode_polygon(np.array(
        [[qx * 0.5 + 0.005, qy * 0.5 + 0.005],
         [qx * 0.5 + 0.495, qy * 0.5 + 0.005],
         [qx * 0.5 + 0.495, qy * 0.5 + 0.495],
         [qx * 0.5 + 0.005, qy * 0.5 + 0.495]]))
        for qx, qy in cq]
    a_table = pa.table({"qx": pa.array(cq[:, 0]), "qy": pa.array(cq[:, 1]),
                        "geom": pa.array(geoms, pa.binary())})
    import pyarrow.compute as pc

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    zones = tpch_geo.nation_zones_table(nation)
    keep = pc.less(pc.cast(zones["n_nationkey"], pa.int64()), 20)
    zones = zones.filter(keep).select(["n_nationkey", "geom"])
    zones = zones.set_column(0, "n_nationkey",
                             zones["n_nationkey"].cast(pa.int64()))
    # split A into blocks — a single-table from_arrow is ONE block and
    # serializes the overlay actor pool
    a_blocks = [a_table.slice(i, 1024)
                for i in range(0, a_table.num_rows, 1024)]
    out = union_features(ray.data.from_arrow(a_blocks), zones, a_table,
                         ray.data.from_arrow(zones),
                         right_cols=["n_nationkey"])
    out = out.map_batches(lambda b: calculate_area(b, out_col="__a"),
                          batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table({
            "qx": b["qx"], "qy": b["qy"],
            "n_nationkey": b["n_nationkey"],
            "area6": pa.array(format_round(b["__a"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_rasterize_roundtrip(sf_dir: str):
    """Vector→raster→vector round trip: nation zones burned into a
    0.7° grid (cell-center coverage), vectorized back per value; the
    per-zone polygon area must equal (covered-cell count × cell²),
    which SQL computes independently by center-in-zone floor
    arithmetic."""
    import ray

    import pyarrow.parquet as pq

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.raster.rasterize import rasterize_features
    from opengxt_ray.raster.tiles import RasterMeta
    from opengxt_ray.raster.vectorize import raster_to_polygon
    from opengxt_ray.sources import tpch_geo
    from opengxt_ray.stages.transforms import calculate_area

    meta = RasterMeta(-180.0, 90.0, 0.7,
                      int(np.ceil(360.0 / 0.7)), int(np.ceil(180.0 / 0.7)),
                      tile_size=64)
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    zones = tpch_geo.nation_zones_table(nation).select(
        ["n_nationkey", "geom"])
    zones = zones.set_column(0, "n_nationkey",
                             zones["n_nationkey"].cast(pa.float64()))
    tiles = rasterize_features(ray.data.from_arrow(zones), meta,
                               value_col="n_nationkey", assign="max")
    polys = raster_to_polygon(tiles, meta)
    out = polys.map_batches(lambda b: calculate_area(b, out_col="__a"),
                            batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table({
            "n_nationkey": b["value"].cast(pa.int64()),
            "area6": pa.array(format_round(b["__a"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_line_density(sf_dir: str):
    """LineDensity over horizontal 4° segments anchored at supplier
    points — cells touched by a horizontal segment are a contiguous
    run in one row, so the burned raster (and the binary-kernel window
    sum) is SQL-enumerable."""
    import ray

    from opengxt_ray.core import wkb as _wkb
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.raster import raster_to_points
    from opengxt_ray.raster.density import line_density
    from opengxt_ray.sources import tpch_geo

    def _segs(batch: pa.Table) -> pa.Table:
        lon, lat = tpch_geo.point_lonlat(batch["s_suppkey"].to_numpy())
        geoms = [
            _wkb.encode_linestring(np.array([[x, y], [x + 4.0, y]]))
            for x, y in zip(lon, lat)
        ]
        return pa.table({"s_suppkey": batch["s_suppkey"],
                         "geom": pa.array(geoms, pa.binary())})

    ds = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey"]).map_batches(
        _segs, batch_format="pyarrow")
    tiles = line_density(ds, _kd_meta(), search_radius=3.0)
    cells = raster_to_points(tiles, _kd_meta(), drop_zero=True)
    return cells.map_batches(
        lambda b: pa.table({
            "col": b["col"], "row": b["row"],
            "ld6": pa.array(format_round(b["val"].to_numpy(), 6)),
        }),
        batch_format="pyarrow")


def _q_circular_binning(sf_dir: str):
    """CircularBinning over customer points (radius 5° circles on a
    10°-spaced grid; corner gaps drop points) — SQL-exact floor-cell +
    in-circle arithmetic."""
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.binning import circular_binning

    pts = _read_pts(sf_dir, "customer", "c_custkey",
                    columns=["c_custkey", "c_acctbal"])
    out = circular_binning(pts, (-180.0, -90.0, 180.0, 90.0), radius=5.0,
                           weight_col="c_acctbal")
    return out.map_batches(
        lambda b: pa.table({
            "cell_id": b["cell_id"],
            "cx": b["cx"], "cy": b["cy"],
            "val6": pa.array(format_round(b["val"].to_numpy(), 6)),
            "cnt": b["count"].cast(pa.int64()),
        }),
        batch_format="pyarrow")


def _q_token_count_bpe(sf_dir: str):
    """BPE-ish (word/punct regex) token counting — the second tokenizer
    mode; SQL oracle via regexp_extract_all."""
    import ray

    from opengxt_ray.textops.quality import token_count_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda b: token_count_batch(b, mode="bpe"), batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_tokens"]), batch_format="pyarrow")


def _q_point_statistics(sf_dir: str):
    from opengxt_ray.ops.pip import point_statistics

    pts = _read_pts(sf_dir, "customer", "c_custkey",
                    columns=["c_custkey", "c_acctbal"])
    out = point_statistics(pts, _zones(sf_dir), poly_key="n_nationkey",
                           spec="Count.c_acctbal, Sum.c_acctbal, "
                                "Min.c_acctbal, Max.c_acctbal",
                           round_digits=6)
    import pyarrow.compute as pc

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_nationkey": b["n_nationkey"],
            "cnt": pc.coalesce(b["count_c_acctbal"].combine_chunks(),
                               pa.scalar(0.0)),
            "s6": b["sum_c_acctbal"],
            "mn6": b["min_c_acctbal"],
            "mx6": b["max_c_acctbal"],
        })

    return out.map_batches(_final, batch_format="pyarrow")


def _q_near_radius(sf_dir: str):
    import pyarrow.parquet as pq

    from opengxt_ray.ops.near import knn_links
    from opengxt_ray.sources import tpch_geo

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    skey = supp["s_suppkey"].to_numpy()
    sx, sy = tpch_geo.point_lonlat(skey)
    pts = _read_pts(sf_dir, "customer", "c_custkey")
    links = knn_links(pts, skey, sx, sy, k=1, id_col="c_custkey",
                      nbr_id_col="s_suppkey", max_radius=8.0,
                      emit_dist_sq=True)
    return links.map_batches(
        lambda b: b.select(["c_custkey", "s_suppkey", "dist_sq"]),
        batch_format="pyarrow")


def _q_neighbor_count(sf_dir: str):
    from opengxt_ray.ops.near import neighbor_count

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    out = neighbor_count(pts, radius=10.0, id_col="c_custkey")
    return out.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"],
                            "nbr_count": b["nbr_count"]}),
        batch_format="pyarrow")


def _q_sde(sf_dir: str):
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.distribution import standard_deviational_ellipse

    pts = _read_pts(sf_dir, "customer", "c_custkey")
    r = standard_deviational_ellipse(pts)
    return pa.table({
        "sx6": [format_round(r["sigma_x"], 6)],
        "sy6": [format_round(r["sigma_y"], 6)],
    })


def _q_funnel(sf_dir: str):
    import ray

    from opengxt_ray.ops.histogram import funnel

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    return funnel(ds, ["signup", "view", "purchase"])


def _q_quantile_breaks(sf_dir: str):
    import ray

    from opengxt_ray.ops.classify import quantile_breaks

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice"])
    breaks = quantile_breaks(ds, "l_extendedprice", 5)
    return pa.table({
        "q": pa.array(np.arange(6, dtype=np.int64)),
        "brk": pa.array(breaks, pa.float64()),
    })


def _q_histogram(sf_dir: str):
    import ray

    from opengxt_ray.ops.histogram import histogram

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_quantity"])
    t = histogram(ds, "l_quantity", [0.0, 10.0, 20.0, 30.0, 40.0, 50.0])
    return t.select(["bin", "lower", "upper", "count"])


def _q_sessionize(sf_dir: str):
    import ray

    from opengxt_ray.ops.histogram import session_stats

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    out = session_stats(ds, gap_minutes=30.0)
    return out.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "session_idx": b["session_idx"].cast(pa.int64()),
            "n_events": b["n_events"],
            "duration_sec": b["duration_sec"],
        }),
        batch_format="pyarrow")


def _q_points_to_line(sf_dir: str):
    """PointsToLine — customer points grouped into 40 tracks
    (c_custkey % 40), chained in c_custkey order; gate compares per-line
    vertex count, endpoints (exact doubles) and length (round 6 — the
    sum is order-dependent)."""
    import ray

    from opengxt_ray.core import wkb as _W
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.lineops import points_to_line
    from opengxt_ray.sources import tpch_geo

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])
    ds = ds.map_batches(
        lambda b: tpch_geo.add_point_geom(b, "c_custkey").append_column(
            "line_id", pa.array(
                (b["c_custkey"].to_numpy(zero_copy_only=False)
                 .astype(np.int64)) % 40)),
        batch_format="pyarrow")
    lines = points_to_line(ds, line_field="line_id", sort_field="c_custkey")

    def _summ(b: pa.Table) -> pa.Table:
        fg = _W.decode(b["geom"].to_pylist())
        n = np.empty(len(fg), np.int64)
        ends = np.empty((len(fg), 4), np.float64)
        for i in range(len(fg)):
            c = fg.geom_coords(i)
            n[i] = len(c)
            ends[i] = (c[0, 0], c[0, 1], c[-1, 0], c[-1, 1])
        return pa.table({
            "line_id": b["line_id"],
            "n_vertices": pa.array(n),
            "x_first": pa.array(ends[:, 0]),
            "y_first": pa.array(ends[:, 1]),
            "x_last": pa.array(ends[:, 2]),
            "y_last": pa.array(ends[:, 3]),
            "length6": pa.array(format_round(
                b["length"].to_numpy(zero_copy_only=False), 6)),
        })

    return lines.map_batches(_summ, batch_format="pyarrow")


def _q_buffer_statistics(sf_dir: str):
    """BufferStatistics — 32-gon buffers (r=5°) around supplier points,
    per-buffer count/sum/mean of customer acctbal. SQL oracle replicates
    the n-gon vertices bitwise (same cos/sin doubles) and tests convex
    containment by half-planes."""
    import pyarrow.parquet as pq

    from opengxt_ray.ops.pip import buffer_statistics
    from opengxt_ray.sources import tpch_geo
    from opengxt_ray.core import wkb as _W

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    skey = supp["s_suppkey"].to_numpy()
    sx, sy = tpch_geo.point_lonlat(skey)
    supp_t = pa.table({
        "s_suppkey": supp["s_suppkey"],
        "geom": pa.array([_W.encode_point(float(a), float(b))
                          for a, b in zip(sx, sy)], pa.binary())})
    pts = _read_pts(sf_dir, "customer", "c_custkey",
                    columns=["c_custkey", "c_acctbal"])
    out = buffer_statistics(
        pts, supp_t, poly_key="s_suppkey",
        spec="Count.c_acctbal,Sum.c_acctbal,Avg.c_acctbal",
        distance=5.0, round_digits=6)
    return out.map_batches(
        lambda b: b.select(["s_suppkey", "count_c_acctbal",
                            "sum_c_acctbal", "mean_c_acctbal"]),
        batch_format="pyarrow")


def _q_union_polygon(sf_dir: str):
    """Single-layer UnionPolygon over jittered axis-aligned boxes
    derived from supplier keys. The per-key jitter makes every edge
    coordinate distinct, so no collinear-overlap degeneracies arise and
    the pairwise-GH fold is float-exact; the SQL oracle computes the
    same union area by scanline (x-strips x merged y-intervals).
    Rounded at 3 dp on both sides — the two float paths (shoelace over
    GH boundary vs strip sums) differ at ~1e-10 relative."""
    import pyarrow.parquet as pq
    import ray

    from opengxt_ray.core import geomops, wkb as _W
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.unionpoly import union_polygon

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    k = supp["s_suppkey"].to_numpy().astype(np.int64)
    k = k[k <= 200]  # bound the O(m^2) fold at larger sf (same in SQL)
    kd = k.astype(np.float64)
    x0 = (k * 37 % 89).astype(np.float64) + kd * 0.0001
    y0 = (k * 53 % 83).astype(np.float64) + kd * 0.0002
    x1 = x0 + ((5 + k % 11).astype(np.float64) + kd * 0.00013)
    y1 = y0 + ((5 + k % 13).astype(np.float64) + kd * 0.00017)
    geoms = [_W.encode_polygon(np.array(
        [[a, b], [c, b], [c, d], [a, d]], np.float64))
        for a, b, c, d in zip(x0, y0, x1, y1)]
    ds = ray.data.from_arrow(
        pa.table({"geom": pa.array(geoms, pa.binary())})).repartition(4)
    out = union_polygon(ds)

    def _area(b: pa.Table) -> pa.Table:
        fg = _W.decode(b["geom"].to_pylist())
        return pa.table({"a": pa.array(geomops.areas(fg), pa.float64())})

    tot = out.map_batches(_area, batch_format="pyarrow").sum("a")
    return pa.table({"union_area": pa.array(
        [float(format_round(tot, 3))], pa.float64())})


def _q_windrose(sf_dir: str):
    """WindRoseMap sector statistics over geocoded customers weighted
    by c_acctbal (geometry column dropped for the compare; float
    aggregates rounded to 6 dp on both sides per the repo rule)."""
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.presentation import windrose_map
    from opengxt_ray.sources import tpch_geo

    pts = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]).map_batches(
        lambda b: tpch_geo.add_point_geom(b, "c_custkey", with_wkb=True),
        batch_format="pyarrow")
    rose, _anchor = windrose_map(pts, weight_col="c_acctbal")

    def _r6(col):
        return pa.array([float(format_round(float(v), 6))
                         for v in col.to_pylist()], pa.float64())

    return pa.table({
        "uid": rose["uid"],
        "cnt": rose["count"].cast(pa.int64()),
        "s6": _r6(rose["sum"]),
        "mn6": _r6(rose["min"]),
        "mx6": _r6(rose["max"]),
        "mean6": _r6(rose["mean"]),
        "std6": _r6(rose["std_dev"]),
    })


def _q_ngram_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard over the deterministic consecutive-id
    pair set (a, a+1) — exercises attach_pair_texts + the jaccard
    kernel with a fully brute-force SQL oracle (same shingle-rule
    parity envelope as minhash_pairs: lowercased single-spaced ASCII,
    ≥3 words per doc)."""
    import pyarrow.compute as pc
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.textops.quality import ngram_jaccard_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n = ds.count()
    pairs = ds.map_batches(
        lambda b: pa.table({
            "a": b["doc_id"],
            "b": pc.add(b["doc_id"], 1),
        }).filter(pc.less(pa.chunked_array([b["doc_id"]]), n - 1)),
        batch_format="pyarrow")
    out = ngram_jaccard_pairs(ds, pairs)
    return out.map_batches(
        lambda b: pa.table({
            "a": b["a"], "b": b["b"],
            "jacc6": pa.array(format_round(b["jaccard"].to_numpy(), 6)),
        }), batch_format="pyarrow")


def _q_embedding_neardup(sf_dir: str):
    """Embedding cosine near-dup with nbits=0 — a single LSH bucket =
    exact brute force, so the all-pairs SQL oracle applies (same
    full-probe pattern as the ivf_topk gate). Pairs-only output: the
    0.4 threshold sits in a ≥1e-4 gap of the sf0.01 cosine
    distribution, so float32-vs-float64 accumulation order cannot flip
    membership."""
    import ray

    from opengxt_ray.textops.dedup import embedding_neardup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = embedding_neardup(ds, threshold=0.4, nbits=0)
    return out.map_batches(lambda b: b.select(["a", "b"]),
                           batch_format="pyarrow")


def _q_fingerprint(sf_dir: str):
    """Winnowing fingerprints (MOSS scheme: rolling 25-char base-257
    hash mod 2^64, min per 16-window, distinct per doc) — bit-exact
    SQL oracle (envelope: ASCII text, where unicode(ch) == the UTF-8
    byte the engine hashes)."""
    import ray

    from opengxt_ray.textops.quality import fingerprint_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: fingerprint_batch(b, k=25, window=16),
        batch_format="pyarrow")


def _winnow_sql(k: int = 25, window: int = 16) -> str:
    """Winnowing oracle: base-257 rolling hash with exact 2^64
    wraparound (byte × precomputed 257^j mod 2^64 terms summed in
    HUGEINT, reduced once), sliding-window list_min, DISTINCT."""
    pw = [pow(257, k - 1 - j, 1 << 64) for j in range(k)]
    terms = " + ".join(
        f"CAST(bytes[i+{j}] AS HUGEINT) * {pw[j]}" for j in range(k))
    return f"""
        WITH b AS (SELECT doc_id,
                          [unicode(text[i])
                           for i in range(1, len(text) + 1)] AS bytes
                   FROM documents),
        h AS (SELECT doc_id,
                     [CAST(({terms}) % 18446744073709551616 AS UBIGINT)
                      for i in range(1, len(bytes) - {k - 2})] AS hs
              FROM b WHERE len(bytes) >= {k}),
        w AS (SELECT doc_id,
                     CASE WHEN len(hs) <= {window} THEN [list_min(hs)]
                     ELSE [list_min(hs[i:i+{window - 1}])
                           for i in range(1, len(hs) - {window - 2})]
                     END AS mins
              FROM h)
        SELECT DISTINCT doc_id, unnest(mins) AS fingerprint FROM w
    """


def _q_multi_windrose(sf_dir: str):
    """MultiWindRose per-center sector stats (3 fixed centers from
    supplier keys 1-3, radius 60, 8 sectors) over geocoded customers
    weighted by c_acctbal — rose attrs only (geometry checked in
    pytest); stats rounded to 6 dp both sides."""
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.presentation import multi_windrose
    from opengxt_ray.sources import tpch_geo

    from opengxt_ray.core import wkb as _W

    cx, cy = tpch_geo.point_lonlat(np.array([1, 2, 3], np.int64))
    centers = pa.table({"geom": pa.array(
        [_W.encode_point(float(x), float(y))
         for x, y in zip(cx, cy)], pa.binary())})
    pts = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]).map_batches(
        lambda b: tpch_geo.add_point_geom(b, "c_custkey", with_wkb=True),
        batch_format="pyarrow")
    _cnt, rose, _anchor = multi_windrose([pts], ["c_acctbal"], centers,
                                         60.0, rose_count=8)

    def _r6(col):
        return pa.array([float(format_round(float(v), 6))
                         for v in col.to_pylist()], pa.float64())

    return pa.table({
        "c": rose["c"].cast(pa.int64()),
        "cnt": rose["cnt"].cast(pa.int64()),
        "val6": _r6(rose["val"]), "mn6": _r6(rose["min"]),
        "mx6": _r6(rose["max"]), "mean6": _r6(rose["mean"]),
        "mdn6": _r6(rose["mdn"]), "stdev6": _r6(rose["stdev"]),
    })


def _q_polar_grids(sf_dir: str):
    """PolarGridsFromFeatures attrs (8 sides × 2 radii per supplier
    centroid): angle/radius/azimuth + copied key — geometry checked in
    pytest."""
    import ray

    from opengxt_ray.ops.presentation import polar_grids
    from opengxt_ray.sources import tpch_geo

    pts = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]).map_batches(
        lambda b: tpch_geo.add_point_geom(b, "s_suppkey", with_wkb=True),
        batch_format="pyarrow")
    out = polar_grids(pts, [10.0, 20.0], sides=8)
    return out.map_batches(
        lambda b: b.select(["s_suppkey", "angle", "radius", "azimuth"]),
        batch_format="pyarrow")


def _q_flow_map(sf_dir: str):
    """FlowMap head radius recovered from the arrow geometry (barb
    distance to the head) vs the min-max normalization in SQL."""
    import ray

    from opengxt_ray.core import wkb as _W
    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.ops.presentation import flow_map
    from opengxt_ray.sources import tpch_geo

    def _lines(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy()
        x0, y0 = tpch_geo.point_lonlat(k)
        x1, y1 = tpch_geo.point_lonlat(k + 1)
        geoms = [_W.encode_linestring(np.array([[x0[i], y0[i]],
                                                [x1[i], y1[i]]]))
                 for i in range(len(k))]
        return pa.table({"c_custkey": b["c_custkey"],
                         "od": b["c_acctbal"],
                         "geom": pa.array(geoms, pa.binary())})

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]).map_batches(
        _lines, batch_format="pyarrow")
    out = flow_map(ds, "od", max_size=5.0)

    def _radius(b: pa.Table) -> pa.Table:
        fg = _W.decode(b["geom"].to_pylist())
        k = b["c_custkey"].to_numpy()
        tx, ty = tpch_geo.point_lonlat(k + 1)  # arrow head = line end
        r = np.zeros(len(fg))
        for i in range(len(fg)):
            pts = fg.geom_coords(i)
            d = np.hypot(pts[:, 0] - tx[i], pts[:, 1] - ty[i])
            pos = d[d > 0]
            # barbs sit at exactly the head radius (≤ max_size); a
            # trans=0 arrow collapses them onto the head, leaving only
            # the far 'from' vertex
            if len(pos) and pos.min() <= 5.0:
                r[i] = pos.min()
        return pa.table({"c_custkey": pa.array(k),
                         "r6": pa.array(format_round(r, 6))})

    return out.map_batches(_radius, batch_format="pyarrow")


def _q_idw_fixed(sf_dir: str):
    """Fixed-radius IDW (halo co-shuffle scale path) of c_acctbal over
    geocoded customers on the 1-degree grid, radius 5, power 2 — the
    cell IDW Σ(v/d²)/Σ(1/d²) is SQL-expressible cell-by-cell. Engine
    hypot vs SQL sqrt differ ~1 ulp; values rounded to 6 dp."""
    import ray

    from opengxt_ray.core.ssutils import format_round
    from opengxt_ray.raster import raster_to_points
    from opengxt_ray.raster.interpolate import idw_fixed_radius

    pts = _read_pts(sf_dir, "customer", "c_custkey",
                    columns=["c_custkey", "c_acctbal"])
    tiles = idw_fixed_radius(pts, _kd_meta(), value_col="c_acctbal",
                             radius=5.0, power=2.0)
    cells = raster_to_points(tiles, _kd_meta(), drop_nodata=True)
    return cells.map_batches(
        lambda b: pa.table({
            "col": b["col"], "row": b["row"],
            "idw6": pa.array(format_round(b["val"].to_numpy(), 6)),
        }), batch_format="pyarrow")


def _q_table_sample(sf_dir: str):
    """Deterministic 10% hash sample of orders by o_orderkey (bit-exact
    multiplicative-hash oracle in DuckDB)."""
    import ray

    from opengxt_ray.ops.sample import deterministic_sample

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey"])
    out = deterministic_sample(ds, "o_orderkey", rate_bp=1000, salt=7)
    return out.map_batches(
        lambda b: b.select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline at sf0.001 (driver smoke check)."""
    from opengxt_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def _q_charlm_score(sf_dir: str):
    """Corpus char-bigram LM fluency score (round 5) — the
    integer-exact formulation of the CCNet perplexity filter: pass 1
    builds the vocabulary-bounded corpus bigram-frequency table
    (count shuffle only), pass 2 broadcasts it and scores every doc
    with searchsorted+reduceat. All-int64 output hash-matches the
    DuckDB list-comprehension bigram oracle exactly."""
    import ray

    from opengxt_ray.textops.charlm import charlm_score

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return charlm_score(ds)


def _q_crawl_delta(sf_dir: str):
    """Incremental crawl dedup (round 5): even-id docs are 'this
    month's crawl', odd-id docs the prior snapshot; the content key is
    the normalized bag-of-words (real collisions across the halves).
    Bloom prefilter keeps definite-novel rows out of the shuffle; the
    bucket-grouped exact anti-join confirms, so the result is exact
    and the NOT EXISTS oracle applies."""
    import pyarrow.compute as pc
    import ray

    from opengxt_ray.textops.dedup import (incremental_dedup,
                                           word_bag_key_batch)

    def _half(par):
        def f(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(b["doc_id"], 1), par)
            return word_bag_key_batch(b.filter(m))
        return f

    def rd():
        return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])

    new = rd().map_batches(_half(0), batch_format="pyarrow")
    old = rd().map_batches(_half(1), batch_format="pyarrow")
    return incremental_dedup(new, old, key_col="bag_key")


def _q_cohort_retention(sf_dir: str):
    """Cohort retention matrix (round 5): users cohorted by first
    active day, distinct active users per (cohort, day-offset) —
    all-integer epoch days, slim (user, day) shuffles only."""
    import ray

    from opengxt_ray.ops.histogram import cohort_retention

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    out = cohort_retention(ds)
    return out.map_batches(
        lambda b: pa.table({"cohort_day": b["cohort_day"],
                            "offs": b["offs"],
                            "n_users": b["count()"]}),
        batch_format="pyarrow")


def _q_domain_cap(sf_dir: str):
    """Per-key document cap (round 5, FineWeb-style crawl balancing):
    keep the 10 smallest doc_ids per source — slim (key, id) shuffle,
    bucket-grouped vectorized ranking, SQL row_number oracle."""
    import ray

    from opengxt_ray.textops.dedup import cap_per_key

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    return cap_per_key(ds, key_col="source", id_col="doc_id", n=10)


def _q_inverted_index(sf_dir: str):
    """Inverted index build (round 5): term → (n_docs, ascending
    posting list) — slim distinct (term, doc) shuffle, bucket-grouped
    vectorized assembly, SQL list-aggregation oracle."""
    import ray

    from opengxt_ray.textops.terms import inverted_index

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return inverted_index(ds)


def _q_text_normalize(sf_dir: str):
    """Unicode canonicalization (round 5): NFC (combining acute folds
    into the precomposed char), casefold, whitespace squash — the
    pass before any dedup key. Both sides build the IDENTICAL raw
    string (combining mark, tab, doubled spaces) from customer keys;
    DuckDB mirrors with nfc_normalize/lower/regexp_replace."""
    import ray

    from opengxt_ray.textops.normalize import normalize_texts

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])

    def _mk(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy()
        txt = [f"CAFÉ  TesT\tNr {int(x)}  END " for x in k]
        return pa.table({"c_custkey": b["c_custkey"],
                         "text": pa.array(txt, pa.string())})

    out = normalize_texts(ds.map_batches(_mk, batch_format="pyarrow"),
                          out_col="norm")
    return out.map_batches(
        lambda b: b.select(["c_custkey", "norm"]),
        batch_format="pyarrow")


def _q_top_terms(sf_dir: str):
    """Corpus top-50 terms (round 5): vocabulary-bounded count shuffle,
    deterministic (cnt DESC, term ASC) selection both sides."""
    import ray

    from opengxt_ray.textops.terms import top_terms

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return top_terms(ds, k=50)


def _q_doc_keywords(sf_dir: str):
    """Per-doc top-3 keywords (round 5): integer-exact tf·idf ordering
    (tf DESC, corpus-df ASC, term ASC) — broadcast df table +
    lexsort/reduceat extraction, hash-exact vs the SQL window oracle."""
    import ray

    from opengxt_ray.textops.terms import doc_keywords

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return doc_keywords(ds, k=3)


def _q_corpus_curation(sf_dir: str):
    """End-to-end corpus curation (round 5) — the FineWeb/Gopher-shaped
    composite: per-doc word count + type-token ratio + corpus char-LM
    fluency, then INTEGER-exact keep rules (cross-multiplied ratios, no
    float compares): mean bigram frequency ≥ 1750, TTR ≥ 0.4, length ≥
    100 bigrams. One metrics pass (word stats ride through the charlm
    scorer via keep_cols), one vectorized filter — the whole funnel a
    training-data pipeline runs before dedup."""
    import pyarrow.compute as pc
    import ray

    from opengxt_ray.textops.charlm import charlm_score

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def _wordstats(b: pa.Table) -> pa.Table:
        nw, nu = [], []
        for t in b["text"].to_pylist():
            ws = (t or "").split(" ")
            nw.append(len(ws))
            nu.append(len(set(ws)))
        return b.append_column(
            "n_words", pa.array(nw, pa.int64())).append_column(
            "n_uniq", pa.array(nu, pa.int64()))

    scored = charlm_score(ds.map_batches(_wordstats,
                                         batch_format="pyarrow"),
                          keep_cols=("n_words", "n_uniq"))

    def _keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(b["sum_freq"],
                             pc.multiply(b["n_bigrams"], 1750)),
            pc.greater_equal(pc.multiply(b["n_uniq"], 10),
                             pc.multiply(b["n_words"], 4))),
            pc.greater_equal(b["n_bigrams"], 100))
        out = b.filter(m)
        return out.select(["doc_id", "n_words", "n_uniq",
                           "n_bigrams", "sum_freq"])

    return scored.map_batches(_keep, batch_format="pyarrow")


def _q_robots_filter(sf_dir: str):
    """RFC 9309 robots.txt filter (round 5): deterministic crawl paths
    from customer keys, a parsed multi-group robots.txt (plain-prefix
    rules so the LIKE oracle is exact), longest-match/Allow-tie
    annotation with keep_denied for auditing."""
    import ray

    from opengxt_ray.textops.urlops import robots_filter

    robots_txt = (
        "User-agent: archiver\nDisallow: /archive/\n\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/pub/\n"
        "Disallow: /cgi-bin/\n"
        "Allow: /static/\n"
        "Disallow: /static/img/\n")
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])

    def _mk(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy()
        tmpl = ["/", "/index.html", "/private/data/", "/private/pub/",
                "/cgi-bin/run/", "/static/img/"]
        paths = []
        for x in k:
            t = tmpl[int(x) % 6]
            if int(x) % 6 == 0:
                paths.append("/")
            elif int(x) % 6 == 1:
                paths.append("/index.html")
            elif int(x) % 6 == 3:
                paths.append(t + str(int(x)) + ".html")
            elif int(x) % 6 == 5:
                paths.append(t + str(int(x)) + ".png")
            else:
                paths.append(t + str(int(x)))
        return pa.table({"c_custkey": b["c_custkey"],
                         "path": pa.array(paths, pa.string())})

    out = robots_filter(ds.map_batches(_mk, batch_format="pyarrow"),
                        robots_txt, keep_denied=True)
    return out.map_batches(
        lambda b: b.select(["c_custkey", "path", "allowed", "match_len"]),
        batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pip_join_rows": _q_pip_join_rows,
        "copart_pip_join_rows": _q_copart_pip_join_rows,
        "pip_join_count": _q_pip_join_count,
        "nearest_join": _q_nearest_join,
        "knn_join": _q_knn_join,
        "near_dist": _q_near_dist,
        "rect_binning": _q_rect_binning,
        "hex_binning": _q_hex_binning,
        "dissolve_stats": _q_dissolve_stats,
        "data_statistics": _q_data_statistics,
        "collect_events": _q_collect_events,
        "exact_dedup": _q_exact_dedup,
        "token_count": _q_token_count,
        "quality_len": _q_quality_len,
        "kernel_density": _q_kernel_density,
        "zonal_stats": _q_zonal_stats,
        "gi_star": _q_gi_star,
        "global_moran": _q_global_moran,
        "global_geary_g": _q_global_geary_g,
        "mean_center": _q_mean_center,
        "attribute_join": _q_attribute_join,
        "events_window": _q_events_window,
        "cell_assignment": _q_cell_assignment,
        "kernel_density_quartic": _q_kernel_density_quartic,
        "spatial_clump": _q_spatial_clump,
        "circular_binning": _q_circular_binning,
        "token_count_bpe": _q_token_count_bpe,
        "intersect_area": _q_intersect_area,
        "union_area": _q_union_area,
        "rasterize_roundtrip": _q_rasterize_roundtrip,
        "line_density": _q_line_density,
        "point_statistics": _q_point_statistics,
        "near_radius": _q_near_radius,
        "neighbor_count": _q_neighbor_count,
        "sde": _q_sde,
        "quantile_breaks": _q_quantile_breaks,
        "histogram": _q_histogram,
        "sessionize": _q_sessionize,
        "funnel": _q_funnel,
        "ann_topk": _q_ann_topk,
        "standardized_scores": _q_standardized_scores,
        "ols": _q_ols,
        "pearson": _q_pearson,
        "minhash_dedup": _q_minhash_dedup,
        "minhash_pairs": _q_minhash_pairs,
        "lang_id": _q_lang_id,
        "simhash": _q_simhash,
        "ivf_topk": _q_ivf_topk,
        "points_to_line": _q_points_to_line,
        "buffer_statistics": _q_buffer_statistics,
        "union_polygon": _q_union_polygon,
        "kmeans": _q_kmeans,
        "windrose": _q_windrose,
        "ngram_jaccard": _q_ngram_jaccard,
        "embedding_neardup": _q_embedding_neardup,
        "fingerprint": _q_fingerprint,
        "multi_windrose": _q_multi_windrose,
        "polar_grids": _q_polar_grids,
        "flow_map": _q_flow_map,
        "idw_fixed": _q_idw_fixed,
        "table_sample": _q_table_sample,
        "hot_cells": _q_hot_cells,
        "url_parse": _q_url_parse,
        "gopher_repetition": _q_gopher_repetition,
        "duplicate_windows": _q_duplicate_windows,
        "html_extract": _q_html_extract,
        "warc_roundtrip": _q_warc_roundtrip,
        "pii_redact": _q_pii_redact,
        "charlm_score": _q_charlm_score,
        "crawl_delta": _q_crawl_delta,
        "robots_filter": _q_robots_filter,
        "corpus_curation": _q_corpus_curation,
        "top_terms": _q_top_terms,
        "doc_keywords": _q_doc_keywords,
        "text_normalize": _q_text_normalize,
        "domain_cap": _q_domain_cap,
        "cohort_retention": _q_cohort_retention,
        "inverted_index": _q_inverted_index,
    }




def _simhash_sql() -> str:
    """SimHash oracle: FNV-1a (exact 64-bit wraparound arithmetic via
    HUGEINT mod 2^64) folded over each 2-word shingle's codepoints with
    list_reduce, then per-doc ±1 bit votes as 64 aggregates and the
    sign bits packed back into the fingerprint.

    PARITY ENVELOPE (not a universal identity): the engine hashes the
    shingle's UTF-8 BYTES while this oracle hashes Unicode CODEPOINTS —
    equal only for ASCII text; and the engine tokenizes on any
    whitespace run vs the SQL's single-space split. Both hold on the
    all-ASCII single-spaced documents.parquet corpus (TESTDATA.md)."""
    votes = ", ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64))
    pack = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS HUGEINT) ELSE 0 END"
        for b in range(64))
    return f"""
        WITH sh AS (
            SELECT doc_id,
                   unnest([ws[i] || ' ' || ws[i+1]
                           for i in range(1, len(ws))]) AS s
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                  FROM documents)
        ),
        hashed AS (
            SELECT doc_id, list_reduce(
                list_prepend(CAST(14695981039346656037 AS HUGEINT),
                             [CAST(unicode(ch) AS HUGEINT)
                              for ch in list_filter(
                                  string_split_regex(s, ''),
                                  x -> x <> '')]),
                (acc, ch) -> (xor(acc, ch) * 1099511628211)
                             % 18446744073709551616) AS h
            FROM sh
        ),
        votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
        SELECT doc_id, CAST({pack} AS VARCHAR) AS simhash_str FROM votes
    """


def _lang_id_sql() -> str:
    """Generate the marker-count + first-max-argmax SQL replica of
    textops.quality.LanguageId (non-overlapping substring counts via
    replace-length arithmetic; dict-order tie-break = the classifier's
    strict-greater update; zero score -> 'und' — the CJK script
    fallback never fires on ASCII corpora)."""
    from opengxt_ray.textops.quality import _LANG_MARKERS

    def esc(m):
        return m.replace("'", "''")

    scores = []
    for lang, marks in _LANG_MARKERS.items():
        terms = " + ".join(
            f"(length(p) - length(replace(p, '{esc(m)}', '')))"
            f" / length('{esc(m)}')"
            for m in marks)
        scores.append(f"({terms}) AS s_{lang}")
    langs = list(_LANG_MARKERS)
    gm = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = "CASE WHEN " + gm + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {gm} THEN '{l}'" for l in langs) + " END"
    return f"""
        WITH padded AS (
            SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents
        ),
        sc AS (SELECT doc_id, {", ".join(scores)} FROM padded)
        SELECT doc_id, {case} AS lang_pred FROM sc
    """

def oracle_sql() -> dict[str, str]:
    lon_c, lat_c = _lon("c_custkey"), _lat("c_custkey")
    lon_s, lat_s = _lon("s_suppkey"), _lat("s_suppkey")
    zone_c = _zone("c_custkey")
    pip_rows = (f"SELECT c_custkey, CAST({zone_c} AS INTEGER) AS n_nationkey "
                f"FROM customer")
    knn_base = f"""
        SELECT c.c_custkey, s.s_suppkey,
               (({lon_c}) - ({lon_s})) * (({lon_c}) - ({lon_s}))
             + (({lat_c}) - ({lat_s})) * (({lat_c}) - ({lat_s})) AS dist_sq,
               row_number() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY (({lon_c}) - ({lon_s})) * (({lon_c}) - ({lon_s}))
                          + (({lat_c}) - ({lat_s})) * (({lat_c}) - ({lat_s})),
                         s.s_suppkey) AS rn
        FROM customer c, supplier s
    """
    gi_sql = f"""
        WITH pts AS (
            SELECT c_custkey, {lon_c} AS x, {lat_c} AS y, c_acctbal AS v
            FROM customer
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(v) AS s1, SUM(v*v) AS s2
            FROM pts
        ),
        nb AS (
            SELECT a.c_custkey,
                   SUM(b.v) AS ls,
                   CAST(COUNT(*) AS DOUBLE) AS ws,
                   CAST(COUNT(*) AS DOUBLE) AS w2,
                   COUNT(*) AS nn
            FROM pts a JOIN pts b
              ON (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) <= 225.0
            GROUP BY a.c_custkey
        )
        SELECT c_custkey, nn,
               CASE WHEN z >= 1.96 THEN 1 WHEN z <= -1.96 THEN -1 ELSE 0
               END AS hot,
               round(z, 4) AS gi_z4
        FROM (
            SELECT nb.c_custkey AS c_custkey, nb.nn AS nn,
                   (ls - ws * (s1/n))
                   / (sqrt(s2/n - (s1/n)*(s1/n))
                      * sqrt((n * w2 - ws * ws) / (n - 1.0))) AS z
            FROM nb, mom
        ) t
    """
    moran_sql = f"""
        WITH pts AS (
            SELECT c_custkey, {lon_c} AS x, {lat_c} AS y, c_acctbal AS v
            FROM customer
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(v)/COUNT(*) AS mu FROM pts
        ),
        pairs AS (
            SELECT a.c_custkey AS ia, (a.v - mom.mu) AS zi, (b.v - mom.mu) AS zj
            FROM pts a, pts b, mom
            WHERE a.c_custkey <> b.c_custkey
              AND (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) <= 400.0
        ),
        rs AS (
            SELECT ia, COUNT(*) AS rowsum, SUM(zi * zj) AS zw FROM pairs GROUP BY ia
        ),
        gl AS (
            SELECT SUM(rowsum) AS W, SUM(zw) AS zijw,
                   SUM(4.0 * rowsum) AS s1x,
                   SUM((2.0 * rowsum) * (2.0 * rowsum)) AS s2
            FROM rs
        ),
        zz AS (
            SELECT SUM((v - mom.mu)*(v - mom.mu)) / mom.n AS z2,
                   SUM((v-mom.mu)*(v-mom.mu)*(v-mom.mu)*(v-mom.mu)) / mom.n AS z4,
                   ANY_VALUE(mom.n) AS n
            FROM pts, mom GROUP BY mom.n
        )
        SELECT round(zijw / (z2 * W), 6) AS moran_i6,
               round((zijw / (z2 * W) - (-1.0/(n-1.0)))
                     / sqrt(
                        (n * ((n*n - 3*n + 3) * (0.5*s1x) - n * s2 + 3.0 * W * W))
                        / ((n-1.0)*(n-2.0)*(n-3.0)*W*W)
                        - ((z4/(z2*z2)) * ((n*n - n) * (0.5*s1x) - 2.0*n*s2 + 6.0*W*W))
                        / ((n-1.0)*(n-2.0)*(n-3.0)*W*W)
                        - (1.0/((n-1.0)*(n-1.0)))
                     ), 4) AS z6
        FROM gl, zz
    """
    geary_g_sql = f"""
        WITH pts AS (
            SELECT c_custkey, {lon_c} AS x, {lat_c} AS y, c_acctbal AS v
            FROM customer
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(v) AS s1,
                   SUM(v*v) AS s2, SUM(v)/COUNT(*) AS mu
            FROM pts
        ),
        nb AS (
            SELECT a.c_custkey,
                   CAST(COUNT(*) AS DOUBLE) AS ws,
                   SUM((a.v - b.v)*(a.v - b.v)) AS cij,
                   SUM(a.v * b.v) AS vivj,
                   SUM(b.v - mom.mu) AS zw
            FROM pts a JOIN pts b
              ON a.c_custkey <> b.c_custkey
             AND (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) <= 400.0,
             mom
            GROUP BY a.c_custkey
        ),
        gl AS (
            SELECT SUM(ws) AS W, SUM(cij) AS cijsum, SUM(vivj) AS npsum,
                   SUM(ws * ws) AS ws2, SUM(zw * zw) AS zw2
            FROM nb
        )
        SELECT round(cijsum
                     / (2.0 * ((s2 - 2.0*mu*s1 + n*mu*mu) / (n - 1.0)) * W),
                     6) AS geary6,
               round(npsum / (s1 * s1 - s2), 8) AS gstat8,
               round((n / ws2)
                     * (zw2 / (s2 - 2.0*mu*s1 + n*mu*mu)), 6) AS lees_s6
        FROM gl, mom
    """
    return {
        "pip_join_rows": pip_rows,
        "global_geary_g": geary_g_sql,
        "copart_pip_join_rows": pip_rows,
        "pip_join_count": f"""
            SELECT n.n_nationkey, n.n_name, n.n_regionkey,
                   CAST(COALESCE(z.cnt, 0) AS DOUBLE) AS val
            FROM nation n LEFT JOIN (
                SELECT {zone_c} AS zone, COUNT(*) AS cnt
                FROM customer GROUP BY 1
            ) z ON z.zone = n.n_nationkey
        """,
        "nearest_join": (f"SELECT c_custkey, s_suppkey FROM ({knn_base}) t "
                         f"WHERE rn = 1"),
        "knn_join": (f"SELECT c_custkey, s_suppkey, rn AS rank "
                     f"FROM ({knn_base}) t WHERE rn <= 3"),
        "near_dist": (f"SELECT c_custkey, s_suppkey, dist_sq "
                      f"FROM ({knn_base}) t WHERE rn = 1"),
        "rect_binning": f"""
            SELECT CAST(floor((({lon_c}) - (-180.0)) / 10.0) AS BIGINT) AS col,
                   CAST(floor((({lat_c}) - (-90.0)) / 10.0) AS BIGINT) AS row,
                   CAST(COUNT(*) AS DOUBLE) AS val
            FROM customer GROUP BY 1, 2
        """,
        "hex_binning": f"""
            WITH frac AS (
                SELECT (sqrt(3.0)/3.0 * ({lon_c}) - ({lat_c})/3.0) / 5.0 AS qf,
                       (2.0/3.0 * ({lat_c})) / 5.0 AS rf
                FROM customer
            ),
            rounded AS (
                SELECT qf, rf, -qf - rf AS sf,
                       round(qf, 0) AS q0, round(rf, 0) AS r0,
                       round(-qf - rf, 0) AS s0
                FROM frac
            ),
            fixed AS (
                SELECT
                  CASE WHEN abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf)
                       THEN -r0 - s0 ELSE q0 END AS q,
                  CASE WHEN NOT (abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf))
                        AND abs(r0-rf) > abs(s0-sf)
                       THEN -(CASE WHEN abs(q0-qf) > abs(r0-rf)
                                    AND abs(q0-qf) > abs(s0-sf)
                                   THEN -r0 - s0 ELSE q0 END) - s0
                       ELSE r0 END AS r
                FROM rounded
            )
            SELECT CAST(q AS BIGINT) AS q, CAST(r AS BIGINT) AS r,
                   CAST(COUNT(*) AS DOUBLE) AS val
            FROM fixed GROUP BY 1, 2
        """,
        "dissolve_stats": """
            SELECT c_mktsegment,
                   CAST(COUNT(c_acctbal) AS DOUBLE) AS count_c_acctbal,
                   round(SUM(c_acctbal), 6) AS sum_c_acctbal,
                   round(SUM(c_acctbal) / COUNT(c_acctbal), 6) AS mean_c_acctbal
            FROM customer GROUP BY c_mktsegment
        """,
        "data_statistics": """
            WITH s AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(l_quantity) AS s1,
                       SUM(l_quantity * l_quantity) AS s2,
                       MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
                FROM lineitem
            )
            SELECT n AS count_l_quantity, s1 AS sum_l_quantity,
                   s1 / n AS mean_l_quantity, mn AS min_l_quantity,
                   mx AS max_l_quantity, mx - mn AS range_l_quantity,
                   sqrt((s2 - (s1 * s1) / n) / n) AS std_l_quantity,
                   (s2 - (s1 * s1) / n) / n AS var_l_quantity
            FROM s
        """,
        "collect_events": f"""
            SELECT CAST(floor(({lon_c}) / 0.5) AS BIGINT) AS qx,
                   CAST(floor(({lat_c}) / 0.5) AS BIGINT) AS qy,
                   COUNT(*) AS icount
            FROM customer GROUP BY 1, 2
        """,
        "exact_dedup": "SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY text",
        # brute-force k=3 word-shingle Jaccard; IEEE op order
        # i/(ca+cb-i) as textops.dedup._verify_pairs. PARITY ENVELOPE:
        # engine splits on any whitespace run (str.split()), the SQL on
        # single spaces keeping empties, and docs with < k words or
        # empty text vanish only from the SQL side — equivalent ONLY on
        # single-spaced corpora with ≥ k words per doc (documents.parquet
        # is; see TESTDATA.md), NOT a universal identity.
        "minhash_pairs": """
            WITH sh AS (SELECT DISTINCT doc_id,
                               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                       for i in range(1, len(ws) - 1)]) AS s
                        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                              FROM documents)),
            sz AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                      GROUP BY 1, 2)
            SELECT a, b, round(CAST(i AS DOUBLE) / (sa.c + sb.c - i), 6) AS jacc6
            FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            WHERE CAST(i AS DOUBLE) / (sa.c + sb.c - i) >= 0.5
        """,
        # connected components of the true J≥0.5 graph via recursive
        # transitive closure; rep = component min doc_id
        "minhash_dedup": """
            WITH RECURSIVE
            sh AS (SELECT DISTINCT doc_id,
                          unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                  for i in range(1, len(ws) - 1)]) AS s
                   FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                         FROM documents)),
            sz AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                      GROUP BY 1, 2),
            ed AS (SELECT a, b FROM inter
                   JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
                   WHERE CAST(i AS DOUBLE) / (sa.c + sb.c - i) >= 0.5),
            edges AS (SELECT a AS u, b AS v FROM ed
                      UNION ALL SELECT b AS u, a AS v FROM ed),
            reach(node, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
            )
            SELECT node AS doc_id, MIN(r) AS rep_id FROM reach GROUP BY node
        """,
        "token_count": r"""
            SELECT doc_id,
                   CAST(length(list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "quality_len": r"""
            SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '')) AS BIGINT) AS n_words
            FROM documents
        """,
        "kernel_density": f"""
            WITH pts AS (
                SELECT CAST(floor((({lon_c}) + 180.0) / 1.0) AS BIGINT) AS col,
                       CAST(floor((90.0 - ({lat_c})) / 1.0) AS BIGINT) AS row
                FROM customer
            ),
            offs AS (
                SELECT dx.r AS dx, dy.r AS dy,
                       ((3.0 * (1.0 - (dx.r*dx.r + dy.r*dy.r) / 9.0))
                        * (1.0 - (dx.r*dx.r + dy.r*dy.r) / 9.0)) / 25.0 AS kv
                FROM (SELECT unnest(range(-3, 4)) AS r) dx,
                     (SELECT unnest(range(-3, 4)) AS r) dy
                WHERE dx.r*dx.r + dy.r*dy.r < 9
            )
            SELECT p.col + o.dx AS col, p.row + o.dy AS row,
                   round(SUM(o.kv), 6) AS kd6
            FROM pts p, offs o
            WHERE p.col + o.dx BETWEEN 0 AND 359
              AND p.row + o.dy BETWEEN 0 AND 179
            GROUP BY 1, 2
        """,
        "line_density": f"""
            WITH segs AS (
                SELECT CAST(floor((({lon_s}) + 180.0) / 1.0) AS BIGINT) AS c0,
                       CAST(floor((({lon_s}) + 4.0 + 180.0) / 1.0) AS BIGINT) AS c1,
                       CAST(floor((90.0 - ({lat_s})) / 1.0) AS BIGINT) AS row
                FROM supplier
            ),
            burn AS (
                SELECT s.c0 + t.i AS col, s.row
                FROM segs s, range(0, 5) t(i)
                WHERE s.c0 + t.i BETWEEN 0 AND 359
                  AND s.row BETWEEN 0 AND 179
            ),
            offs AS (
                SELECT dx.r AS dx, dy.r AS dy, 1.0 / 29.0 AS kv
                FROM (SELECT unnest(range(-3, 4)) AS r) dx,
                     (SELECT unnest(range(-3, 4)) AS r) dy
                WHERE dx.r*dx.r + dy.r*dy.r <= 9
            )
            SELECT b.col + o.dx AS col, b.row + o.dy AS row,
                   round(SUM(o.kv), 6) AS ld6
            FROM burn b, offs o
            WHERE b.col + o.dx BETWEEN 0 AND 359
              AND b.row + o.dy BETWEEN 0 AND 179
            GROUP BY 1, 2
        """,
        "zonal_stats": f"""
            WITH cells AS (
                SELECT CAST(floor((({lon_c}) + 180.0) / 1.0) AS BIGINT) AS col,
                       CAST(floor((90.0 - ({lat_c})) / 1.0) AS BIGINT) AS row,
                       CAST(COUNT(*) AS DOUBLE) AS v
                FROM customer GROUP BY 1, 2
            ),
            zoned AS (
                SELECT (CAST(floor(((90.0 - (row + 0.5) * 1.0) + 90.0) / 36.0)
                             AS INTEGER) * 5
                      + CAST(floor(((-180.0 + (col + 0.5) * 1.0) + 180.0) / 72.0)
                             AS INTEGER)) AS z, v
                FROM cells
            )
            SELECT CAST(z AS INTEGER) AS n_nationkey,
                   round(SUM(v), 6) AS zsum6,
                   round(MAX(v), 6) AS zmax6
            FROM zoned GROUP BY z
        """,
        "gi_star": gi_sql,
        "global_moran": moran_sql,
        "mean_center": f"""
            SELECT round(SUM({lon_c}) / COUNT(*), 6) AS cx6,
                   round(SUM({lat_c}) / COUNT(*), 6) AS cy6,
                   round(sqrt(
                       (SUM(({lon_c}) * ({lon_c})) / COUNT(*)
                        - (SUM({lon_c}) / COUNT(*)) * (SUM({lon_c}) / COUNT(*)))
                     + (SUM(({lat_c}) * ({lat_c})) / COUNT(*)
                        - (SUM({lat_c}) / COUNT(*)) * (SUM({lat_c}) / COUNT(*)))
                   ), 6) AS sd6
            FROM customer
        """,
        "attribute_join": """
            SELECT o.o_orderkey, c.c_mktsegment
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "events_window": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS cnt, round(SUM(value), 6) AS sval6
            FROM events GROUP BY 1, 2
        """,
        "kernel_density_quartic": f"""
            WITH pts AS (
                SELECT CAST(floor((({lon_c}) + 180.0) / 1.0) AS BIGINT) AS col,
                       CAST(floor((90.0 - ({lat_c})) / 1.0) AS BIGINT) AS row
                FROM customer
            ),
            offs AS (
                SELECT dx.r AS dx, dy.r AS dy,
                       ((15.0 / 16.0)
                        * ((1.0 - (sqrt(CAST(dx.r*dx.r + dy.r*dy.r AS DOUBLE))
                                   / 3.0)
                              * (sqrt(CAST(dx.r*dx.r + dy.r*dy.r AS DOUBLE))
                                 / 3.0))
                           * (1.0 - (sqrt(CAST(dx.r*dx.r + dy.r*dy.r
                                               AS DOUBLE)) / 3.0)
                              * (sqrt(CAST(dx.r*dx.r + dy.r*dy.r AS DOUBLE))
                                 / 3.0)))) / 25.0 AS kv
                FROM (SELECT unnest(range(-3, 4)) AS r) dx,
                     (SELECT unnest(range(-3, 4)) AS r) dy
                WHERE dx.r*dx.r + dy.r*dy.r < 9
            )
            SELECT p.col + o.dx AS col, p.row + o.dy AS row,
                   round(SUM(o.kv), 6) AS kd6
            FROM pts p, offs o
            WHERE p.col + o.dx BETWEEN 0 AND 359
              AND p.row + o.dy BETWEEN 0 AND 179
            GROUP BY 1, 2
        """,
        "cell_assignment": f"""
            WITH frac AS (
                SELECT c_custkey,
                       (sqrt(3.0)/3.0 * ({lon_c}) - ({lat_c})/3.0)
                       / 1.40625 AS qf,
                       (2.0/3.0 * ({lat_c})) / 1.40625 AS rf
                FROM customer
            ),
            rounded AS (
                SELECT c_custkey, qf, rf, -qf - rf AS sf,
                       round(qf, 0) AS q0, round(rf, 0) AS r0,
                       round(-qf - rf, 0) AS s0
                FROM frac
            )
            SELECT c_custkey,
                   CAST(CASE WHEN abs(q0-qf) > abs(r0-rf)
                              AND abs(q0-qf) > abs(s0-sf)
                        THEN -r0 - s0 ELSE q0 END AS BIGINT) AS q,
                   CAST(CASE WHEN NOT (abs(q0-qf) > abs(r0-rf)
                                       AND abs(q0-qf) > abs(s0-sf))
                              AND abs(r0-rf) > abs(s0-sf)
                        THEN -(CASE WHEN abs(q0-qf) > abs(r0-rf)
                                     AND abs(q0-qf) > abs(s0-sf)
                                    THEN -r0 - s0 ELSE q0 END) - s0
                        ELSE r0 END AS BIGINT) AS r
            FROM rounded
        """,
        "pii_redact": r"""
            WITH t AS (
                SELECT c_custkey,
                       'user' || c_custkey || '@mail' || (c_custkey % 7)
                       || '.example.com pinged 10.' || (c_custkey % 256)
                       || '.0.' || ((c_custkey * 3) % 256)
                       || ' then called +1-55' || (c_custkey % 10)
                       || ' 123 4' || (c_custkey % 10) || '67 ok' AS text
                FROM customer
            )
            SELECT c_custkey,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                       '\+?\d{1,3}[-. ]\(?\d{2,4}\)?[-. ]\d{3,4}[-. ]\d{3,4}\b',
                       '<PHONE>', 'g') AS text
            FROM t
        """,
        "html_extract": """
            SELECT c_custkey,
                   'Customer ' || c_custkey
                   || ' balance & status: ' || (c_custkey % 100)
                       AS text
            FROM customer
        """,
        "warc_roundtrip": """
            SELECT 'https://docs.example/' || CAST(doc_id AS VARCHAR)
                       AS url,
                   CAST(strlen(text) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "duplicate_windows": """
            WITH words AS (
                SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents
            ),
            wins AS (
                SELECT doc_id, i, array_to_string(ws[i:i+19], ' ') AS win
                FROM words, LATERAL (
                    SELECT unnest(generate_series(1, len(ws) - 19)) AS i)
            ),
            dup AS (
                SELECT win FROM wins
                GROUP BY win HAVING count(DISTINCT doc_id) > 1
            )
            SELECT doc_id, count(*) AS n_dup_win
            FROM wins WHERE win IN (SELECT win FROM dup)
            GROUP BY doc_id
        """,
        "gopher_repetition": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS i
                FROM documents
            ),
            big AS (
                SELECT doc_id, w,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY i)
                           AS nw
                FROM w
            ),
            bc AS (
                SELECT doc_id, count(*) AS c FROM big
                WHERE nw IS NOT NULL GROUP BY doc_id, w, nw
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_words,
                       count(DISTINCT w) AS uniq
                FROM w GROUP BY doc_id
            )
            SELECT a.doc_id, a.n_words,
                   round(a.uniq / CAST(a.n_words AS DOUBLE), 6)
                       AS uniq_frac6,
                   round(COALESCE(m.mc, 0)
                         / CAST(CASE WHEN a.n_words > 1
                                THEN a.n_words - 1 ELSE 1 END AS DOUBLE),
                         6) AS top_bigram_frac6
            FROM agg a LEFT JOIN (SELECT doc_id, max(c) AS mc FROM bc
                                  GROUP BY doc_id) m USING (doc_id)
        """,
        "url_parse": _url_parse_sql(),
        "hot_cells": f"""
            WITH frac AS (
                SELECT (sqrt(3.0)/3.0 * ({lon_c}) - ({lat_c})/3.0)
                       / 11.25 AS qf,
                       (2.0/3.0 * ({lat_c})) / 11.25 AS rf
                FROM customer
            ),
            rounded AS (
                SELECT qf, rf, -qf - rf AS sf,
                       round(qf, 0) AS q0, round(rf, 0) AS r0,
                       round(-qf - rf, 0) AS s0
                FROM frac
            ),
            cells AS (
                SELECT CAST(CASE WHEN abs(q0-qf) > abs(r0-rf)
                                  AND abs(q0-qf) > abs(s0-sf)
                            THEN -r0 - s0 ELSE q0 END AS BIGINT) AS q,
                       CAST(CASE WHEN NOT (abs(q0-qf) > abs(r0-rf)
                                           AND abs(q0-qf) > abs(s0-sf))
                                  AND abs(r0-rf) > abs(s0-sf)
                            THEN -(CASE WHEN abs(q0-qf) > abs(r0-rf)
                                         AND abs(q0-qf) > abs(s0-sf)
                                        THEN -r0 - s0 ELSE q0 END) - s0
                            ELSE r0 END AS BIGINT) AS r
                FROM rounded
            )
            SELECT q, r,
                   CAST(ceil(count(*) / 2.0) AS BIGINT) AS nsplit
            FROM cells GROUP BY q, r HAVING count(*) > 4
        """,
        "lang_id": _lang_id_sql(),
        "simhash": _simhash_sql(),
        "token_count_bpe": r"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '\w+|[^\w\s]'))
                        AS BIGINT) AS n_tokens
            FROM documents
        """,
        "circular_binning": f"""
            WITH pts AS (
                SELECT {lon_c} AS x, {lat_c} AS y, c_acctbal FROM customer
            ),
            assigned AS (
                SELECT CAST(floor((x + 180.0) / 10.0) AS BIGINT) AS col,
                       CAST(floor((y + 90.0) / 10.0) AS BIGINT) AS "row",
                       x, y, c_acctbal
                FROM pts
            ),
            cells AS (
                SELECT col, "row",
                       -180.0 + (col + 0.5) * 10.0 AS cx,
                       -90.0 + ("row" + 0.5) * 10.0 AS cy,
                       x, y, c_acctbal
                FROM assigned
            )
            SELECT "row" * 2147483648 + col AS cell_id,
                   MIN(cx) AS cx, MIN(cy) AS cy,
                   round(SUM(c_acctbal), 6) AS val6,
                   COUNT(*) AS cnt
            FROM cells
            WHERE (x - cx) * (x - cx) + (y - cy) * (y - cy) <= 25.0
            GROUP BY 1
        """,
        "spatial_clump": f"""
            WITH RECURSIVE
            pts AS (SELECT c_custkey AS id, {lon_c} AS x, {lat_c} AS y
                    FROM customer),
            ed AS (SELECT a.id AS u, b.id AS v FROM pts a JOIN pts b
                   ON a.id <> b.id
                  AND (a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y) <= 2.25),
            reach(node, r) AS (
                SELECT id, id FROM pts
                UNION
                SELECT e.u, reach.r FROM ed e JOIN reach ON reach.node = e.v
            )
            SELECT node AS c_custkey, MIN(r) AS cluster
            FROM reach GROUP BY node
        """,
        "intersect_area": f"""
            WITH pts AS (
                SELECT c_custkey, {lon_c} AS x, {lat_c} AS y FROM customer
            ),
            zones AS (
                SELECT n_nationkey,
                       -180.0 + 72.0 * (n_nationkey % 5) AS zx0,
                       -90.0 + 36.0 * (n_nationkey // 5) AS zy0
                FROM nation
            )
            SELECT p.c_custkey, z.n_nationkey,
                   round(
                     (LEAST(p.x + 1.5, z.zx0 + 72.0)
                      - GREATEST(p.x - 1.5, z.zx0))
                   * (LEAST(p.y + 1.0, z.zy0 + 36.0)
                      - GREATEST(p.y - 1.0, z.zy0)), 6) AS area6
            FROM pts p JOIN zones z
              ON LEAST(p.x + 1.5, z.zx0 + 72.0)
                 > GREATEST(p.x - 1.5, z.zx0)
             AND LEAST(p.y + 1.0, z.zy0 + 36.0)
                 > GREATEST(p.y - 1.0, z.zy0)
        """,
        "union_area": f"""
            WITH pts AS (
                SELECT {lon_c} AS x, {lat_c} AS y FROM customer
            ),
            cells AS (
                SELECT DISTINCT CAST(floor(x / 0.5) AS BIGINT) AS qx,
                                CAST(floor(y / 0.5) AS BIGINT) AS qy
                FROM pts
            ),
            zones AS (
                SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                       -180.0 + 72.0 * (n_nationkey % 5) AS zx0,
                       -90.0 + 36.0 * (n_nationkey // 5) AS zy0
                FROM nation WHERE n_nationkey < 20
            ),
            cz AS (
                SELECT c.qx, c.qy, z.n_nationkey FROM cells c
                LEFT JOIN zones z
                  ON c.qx * 0.5 + 0.005 >= z.zx0
                 AND c.qx * 0.5 + 0.495 <= z.zx0 + 72.0
                 AND c.qy * 0.5 + 0.005 >= z.zy0
                 AND c.qy * 0.5 + 0.495 <= z.zy0 + 36.0
            )
            SELECT qx, qy, n_nationkey,
                   round((0.495 - 0.005) * (0.495 - 0.005), 6) AS area6
            FROM cz
            UNION ALL
            SELECT NULL AS qx, NULL AS qy, z.n_nationkey,
                   round(72.0 * 36.0 - COALESCE(k.cnt, 0)
                         * ((0.495 - 0.005) * (0.495 - 0.005)), 6) AS area6
            FROM zones z LEFT JOIN (
                SELECT n_nationkey, count(*) AS cnt FROM cz
                WHERE n_nationkey IS NOT NULL GROUP BY 1
            ) k USING (n_nationkey)
        """,
        "rasterize_roundtrip": """
            WITH cols AS (SELECT CAST(c AS BIGINT) AS c FROM range(0, 515) t(c)),
            rws AS (SELECT CAST(r AS BIGINT) AS r FROM range(0, 258) t(r)),
            centers AS (SELECT -180.0 + (c + 0.5) * 0.7 AS x,
                               90.0 - (r + 0.5) * 0.7 AS y
                        FROM cols, rws),
            zones AS (SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                             -180.0 + 72.0 * (n_nationkey % 5) AS zx0,
                             -90.0 + 36.0 * (n_nationkey // 5) AS zy0
                      FROM nation),
            cnt AS (SELECT z.n_nationkey, count(*) AS c FROM centers p
                    JOIN zones z
                      ON p.x >= z.zx0 AND p.x < z.zx0 + 72.0
                     AND p.y >= z.zy0 AND p.y < z.zy0 + 36.0
                    GROUP BY 1)
            SELECT n_nationkey, round(c * (0.7 * 0.7), 6) AS area6 FROM cnt
        """,
        "point_statistics": f"""
            SELECT n.n_nationkey,
                   CAST(COALESCE(z.c, 0) AS DOUBLE) AS cnt,
                   round(z.s, 6) AS s6, round(z.mn, 6) AS mn6,
                   round(z.mx, 6) AS mx6
            FROM nation n LEFT JOIN (
                SELECT {zone_c} AS zone, COUNT(c_acctbal) AS c,
                       SUM(c_acctbal) AS s, MIN(c_acctbal) AS mn,
                       MAX(c_acctbal) AS mx
                FROM customer GROUP BY 1
            ) z ON z.zone = n.n_nationkey
        """,
        "near_radius": (f"SELECT c_custkey, s_suppkey, dist_sq "
                        f"FROM ({knn_base}) t WHERE rn = 1 "
                        f"AND dist_sq <= 64.0"),
        "neighbor_count": f"""
            SELECT c.c_custkey, CAST(COALESCE(z.cnt, 0) AS BIGINT) AS nbr_count
            FROM customer c LEFT JOIN (
                SELECT a.c_custkey AS k, COUNT(*) AS cnt
                FROM customer a JOIN customer b
                  ON a.c_custkey <> b.c_custkey
                 AND (({lon_c.replace('c_custkey', 'a.c_custkey')})
                      - ({lon_c.replace('c_custkey', 'b.c_custkey')}))
                     * (({lon_c.replace('c_custkey', 'a.c_custkey')})
                        - ({lon_c.replace('c_custkey', 'b.c_custkey')}))
                   + (({lat_c.replace('c_custkey', 'a.c_custkey')})
                      - ({lat_c.replace('c_custkey', 'b.c_custkey')}))
                     * (({lat_c.replace('c_custkey', 'a.c_custkey')})
                        - ({lat_c.replace('c_custkey', 'b.c_custkey')}))
                   <= 100.0
                GROUP BY 1
            ) z ON z.k = c.c_custkey
        """,
        "sde": f"""
            WITH m AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       SUM({lon_c}) AS sx, SUM({lat_c}) AS sy,
                       SUM(({lon_c}) * ({lon_c})) AS sxx,
                       SUM(({lat_c}) * ({lat_c})) AS syy,
                       SUM(({lon_c}) * ({lat_c})) AS sxy
                FROM customer
            ),
            v AS (
                SELECT sxx / n - (sx / n) * (sx / n) AS a,
                       syy / n - (sy / n) * (sy / n) AS b,
                       sxy / n - (sx / n) * (sy / n) AS c
                FROM m
            )
            SELECT round(sqrt((a + b + sqrt((a - b) * (a - b) + 4.0 * c * c))
                              / 2.0), 6) AS sx6,
                   round(sqrt((a + b - sqrt((a - b) * (a - b) + 4.0 * c * c))
                              / 2.0), 6) AS sy6
            FROM v
        """,
        "quantile_breaks": """
            WITH s AS (
                SELECT l_extendedprice AS v,
                       row_number() OVER (ORDER BY l_extendedprice) AS rn,
                       COUNT(*) OVER () AS n
                FROM lineitem
            ),
            qs AS (SELECT unnest(range(0, 6)) AS q)
            SELECT qs.q AS q, s.v AS brk
            FROM qs JOIN s
              ON s.rn = CASE WHEN qs.q = 0 THEN 1
                        ELSE LEAST(CAST(ceil(s.n * qs.q / 5.0) AS BIGINT), s.n)
                        END
        """,
        "histogram": """
            WITH bins AS (SELECT unnest(range(0, 5)) AS bin),
            cnt AS (
                SELECT CASE WHEN l_quantity = 50.0 THEN 4
                            ELSE CAST(floor(l_quantity / 10.0) AS INTEGER)
                       END AS bin, COUNT(*) AS c
                FROM lineitem GROUP BY 1
            )
            SELECT CAST(b.bin AS INTEGER) AS bin,
                   CAST(b.bin AS DOUBLE) * 10.0 AS lower,
                   (CAST(b.bin AS DOUBLE) + 1.0) * 10.0 AS upper,
                   COALESCE(c.c, 0) AS count
            FROM bins b LEFT JOIN cnt c ON b.bin = c.bin
        """,
        "sessionize": """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL THEN 0
                            WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                 > 1800000000 THEN 1
                            ELSE 0 END AS newsess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
                SELECT user_id, ts,
                       SUM(newsess) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING)
                       AS session_idx
                FROM marked
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   COUNT(*) AS n_events,
                   (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1000000.0
                   AS duration_sec
            FROM sess GROUP BY user_id, session_idx
        """,
        "funnel": """
            WITH s1 AS (
                SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id
            ),
            s2 AS (
                SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t1
                GROUP BY e.user_id
            ),
            s3 AS (
                SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
                GROUP BY e.user_id
            ),
            steps(step_idx, step) AS (
                VALUES (0, 'signup'), (1, 'view'), (2, 'purchase')
            )
            SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
                   CAST(CASE step_idx
                        WHEN 0 THEN (SELECT COUNT(*) FROM s1)
                        WHEN 1 THEN (SELECT COUNT(*) FROM s2)
                        ELSE (SELECT COUNT(*) FROM s3) END AS BIGINT) AS users
            FROM steps
        """,
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                ORDER BY vec_id LIMIT 5
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding, q.qe) AS score,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(e.embedding, q.qe)
                                    DESC, e.vec_id) AS rank
                FROM embeddings e, q
            )
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank
            FROM scored WHERE rank <= 10
        """,
        "ivf_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                ORDER BY vec_id LIMIT 5
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding, q.qe) AS score,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(e.embedding, q.qe)
                                    DESC, e.vec_id) AS rank
                FROM embeddings e, q
            )
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank
            FROM scored WHERE rank <= 10
        """,
        "buffer_statistics": f"""
            WITH sup AS (
                SELECT s_suppkey, {lon_s} AS sx, {lat_s} AS sy FROM supplier
            ),
            cust AS (
                SELECT c_custkey, c_acctbal, {lon_c} AS px, {lat_c} AS py
                FROM customer
            ),
            verts AS (
                SELECT s_suppkey, sx, sy, t.k,
                       sx + 5.0 * cos(t.k * (2 * pi() / 32)) AS vx,
                       sy + 5.0 * sin(t.k * (2 * pi() / 32)) AS vy
                FROM sup, range(32) t(k)
            ),
            edges AS (
                SELECT a.s_suppkey, a.sx, a.sy,
                       a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
                FROM verts a JOIN verts b
                  ON a.s_suppkey = b.s_suppkey AND b.k = (a.k + 1) % 32
            ),
            inside AS (
                SELECT c.c_custkey, c.c_acctbal, e.s_suppkey
                FROM cust c JOIN edges e
                  ON abs(c.px - e.sx) <= 5.0 AND abs(c.py - e.sy) <= 5.0
                GROUP BY c.c_custkey, c.c_acctbal, e.s_suppkey
                HAVING min((e.x2 - e.x1) * (c.py - e.y1)
                           - (e.y2 - e.y1) * (c.px - e.x1)) >= 0
            ),
            agg AS (
                SELECT s_suppkey,
                       CAST(COUNT(*) AS DOUBLE) AS count_c_acctbal,
                       round(SUM(c_acctbal), 6) AS sum_c_acctbal,
                       round(SUM(c_acctbal) / COUNT(*), 6) AS mean_c_acctbal
                FROM inside GROUP BY s_suppkey
            )
            SELECT s.s_suppkey, a.count_c_acctbal, a.sum_c_acctbal,
                   a.mean_c_acctbal
            FROM sup s LEFT JOIN agg a ON s.s_suppkey = a.s_suppkey
        """,
        "union_polygon": """
            WITH boxes AS (
                SELECT CAST((s_suppkey * 37) % 89 AS DOUBLE)
                         + CAST(s_suppkey AS DOUBLE) * 0.0001 AS x0,
                       CAST((s_suppkey * 53) % 83 AS DOUBLE)
                         + CAST(s_suppkey AS DOUBLE) * 0.0002 AS y0,
                       (CAST((s_suppkey * 37) % 89 AS DOUBLE)
                         + CAST(s_suppkey AS DOUBLE) * 0.0001)
                         + (CAST(5 + (s_suppkey % 11) AS DOUBLE)
                            + CAST(s_suppkey AS DOUBLE) * 0.00013) AS x1,
                       (CAST((s_suppkey * 53) % 83 AS DOUBLE)
                         + CAST(s_suppkey AS DOUBLE) * 0.0002)
                         + (CAST(5 + (s_suppkey % 13) AS DOUBLE)
                            + CAST(s_suppkey AS DOUBLE) * 0.00017) AS y1
                FROM supplier WHERE s_suppkey <= 200
            ),
            xs AS (
                SELECT DISTINCT v FROM (
                    SELECT x0 AS v FROM boxes
                    UNION SELECT x1 AS v FROM boxes)
            ),
            strips AS (
                SELECT v AS xa, lead(v) OVER (ORDER BY v) AS xb FROM xs
            ),
            cov AS (
                SELECT s.xa, s.xb, b.y0, b.y1
                FROM strips s JOIN boxes b
                  ON b.x0 <= s.xa AND b.x1 >= s.xb
                WHERE s.xb IS NOT NULL
            ),
            m AS (
                SELECT xa, xb, y0, y1,
                       max(y1) OVER (PARTITION BY xa ORDER BY y0, y1
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS pm
                FROM cov
            )
            SELECT round(SUM((xb - xa) *
                         GREATEST(y1 - GREATEST(y0, COALESCE(pm, y0)), 0)),
                         3) AS union_area
            FROM m
        """,
        "kmeans": f"""
            WITH RECURSIVE pts AS (
                SELECT c_custkey, {lon_c} AS x, {lat_c} AS y,
                       row_number() OVER (ORDER BY {lon_c}, {lat_c}) AS rn
                FROM customer
            ),
            init(i, cs) AS (
                SELECT 1, [{{'x': x, 'y': y}}] FROM pts WHERE rn = 1
                UNION ALL
                SELECT i + 1, list_append(cs, (
                    SELECT {{'x': p.x, 'y': p.y}} FROM pts p
                    ORDER BY list_min([
                        sqrt((p.x - c.x) * (p.x - c.x)
                             + (p.y - c.y) * (p.y - c.y)) for c in cs])
                        DESC, p.rn ASC
                    LIMIT 1))
                FROM init WHERE i < 8
            ),
            cents0 AS (
                SELECT t.i AS j, s.cs[t.i + 1].x AS cx, s.cs[t.i + 1].y AS cy
                FROM (SELECT cs FROM init WHERE i = 8) s, range(8) t(i)
            ),
            a0 AS (
                SELECT p.c_custkey, p.x, p.y,
                       (SELECT c.j FROM cents0 c
                        ORDER BY sqrt((p.x - c.cx) * (p.x - c.cx)
                                      + (p.y - c.cy) * (p.y - c.cy)) ASC,
                                 c.j ASC
                        LIMIT 1) AS j
                FROM pts p
            ),
            cents1 AS (
                SELECT c.j,
                       COALESCE(SUM(a.x) / NULLIF(COUNT(a.x), 0), c.cx) AS cx,
                       COALESCE(SUM(a.y) / NULLIF(COUNT(a.y), 0), c.cy) AS cy
                FROM cents0 c LEFT JOIN a0 a ON a.j = c.j
                GROUP BY c.j, c.cx, c.cy
            )
            SELECT p.c_custkey,
                   CAST((SELECT c.j FROM cents1 c
                         ORDER BY sqrt((p.x - c.cx) * (p.x - c.cx)
                                       + (p.y - c.cy) * (p.y - c.cy)) ASC,
                                  c.j ASC
                         LIMIT 1) AS BIGINT) AS cluster
            FROM pts p
        """,
        "points_to_line": f"""
            WITH pts AS (
                SELECT c_custkey, CAST(c_custkey % 40 AS BIGINT) AS line_id,
                       {lon_c} AS x, {lat_c} AS y
                FROM customer
            ),
            lagged AS (
                SELECT *, lag(x) OVER w AS px, lag(y) OVER w AS py
                FROM pts WINDOW w AS (PARTITION BY line_id ORDER BY c_custkey)
            ),
            dedup AS (
                SELECT * FROM lagged
                WHERE px IS NULL OR x <> px OR y <> py
            ),
            seg AS (
                SELECT line_id, x, y, c_custkey,
                       lag(x) OVER w2 AS qx, lag(y) OVER w2 AS qy
                FROM dedup
                WINDOW w2 AS (PARTITION BY line_id ORDER BY c_custkey)
            )
            SELECT line_id,
                   CAST(COUNT(*) AS BIGINT) AS n_vertices,
                   arg_min(x, c_custkey) AS x_first,
                   arg_min(y, c_custkey) AS y_first,
                   arg_max(x, c_custkey) AS x_last,
                   arg_max(y, c_custkey) AS y_last,
                   round(SUM(CASE WHEN qx IS NULL THEN 0.0
                             ELSE sqrt((x - qx) * (x - qx)
                                       + (y - qy) * (y - qy)) END),
                         6) AS length6
            FROM seg GROUP BY line_id HAVING COUNT(*) > 1
        """,
        "standardized_scores": """
            WITH m AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(l_quantity) AS s1,
                       SUM(l_quantity * l_quantity) AS s2
                FROM lineitem
            )
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   round((l_quantity - s1 / n)
                         / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS z6
            FROM lineitem, m
        """,
        "ols": """
            WITH m AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
                       SUM(l_quantity * l_quantity) AS sxx,
                       SUM(l_quantity * l_extendedprice) AS sxy,
                       SUM(l_extendedprice * l_extendedprice) AS syy
                FROM lineitem
            )
            SELECT round((sxy - sx * sy / n) / (sxx - sx * sx / n), 4) AS slope4,
                   round(sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n))
                         * (sx / n), 4) AS intercept4,
                   round(
                     ((sxy - sx*sy/n) * (sxy - sx*sy/n))
                     / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS r2_6
            FROM m
        """,
        "pearson": """
            WITH m AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       SUM(l_quantity) AS sq, SUM(l_extendedprice) AS sp,
                       SUM(l_discount) AS sd,
                       SUM(l_quantity*l_quantity) AS sqq,
                       SUM(l_extendedprice*l_extendedprice) AS spp,
                       SUM(l_discount*l_discount) AS sdd,
                       SUM(l_quantity*l_extendedprice) AS sqp,
                       SUM(l_quantity*l_discount) AS sqd
                FROM lineitem
            )
            SELECT round((sqp/n - (sq/n)*(sp/n))
                         / sqrt((sqq/n - (sq/n)*(sq/n))
                                * (spp/n - (sp/n)*(sp/n))), 6) AS r_qty_price6,
                   round((sqd/n - (sq/n)*(sd/n))
                         / sqrt((sqq/n - (sq/n)*(sq/n))
                                * (sdd/n - (sd/n)*(sd/n))), 6) AS r_qty_disc6
            FROM m
        """,
        # 32 windrose sectors by centroid angle from the bounds centre
        # (half-open [i*11.25 - 5.625, ...) bins — the engine's rule;
        # the reference's intersects filter double-counts boundary
        # features, and derived points sit off sector borders).
        "windrose": f"""
            WITH pts AS (
                SELECT {lon_c} AS x, {lat_c} AS y, c_acctbal AS w
                FROM customer
            ),
            b AS (
                SELECT (MIN(x) + MAX(x)) / 2 AS cx,
                       (MIN(y) + MAX(y)) / 2 AS cy
                FROM pts
            ),
            sec AS (
                SELECT CAST(floor(((((degrees(atan2(p.y - b.cy, p.x - b.cx))
                                      + 5.625) % 360) + 360) % 360)
                                  / 11.25) AS BIGINT) AS uid, p.w
                FROM pts p, b
            ),
            agg AS (
                SELECT uid, COUNT(*) AS c, SUM(w) AS s, SUM(w * w) AS s2,
                       MIN(w) AS mn, MAX(w) AS mx
                FROM sec GROUP BY 1
            )
            SELECT CAST(g.uid AS BIGINT) AS uid,
                   CAST(COALESCE(a.c, 0) AS BIGINT) AS cnt,
                   round(COALESCE(a.s, 0), 6) AS s6,
                   round(COALESCE(a.mn, 0), 6) AS mn6,
                   round(COALESCE(a.mx, 0), 6) AS mx6,
                   round(COALESCE(a.s / a.c, 0), 6) AS mean6,
                   round(COALESCE(sqrt(greatest(
                       (a.s2 - a.s * a.s / a.c) / a.c, 0)), 0), 6) AS std6
            FROM range(0, 32) g(uid) LEFT JOIN agg a ON a.uid = g.uid
        """,
        # brute word-3-gram Jaccard over the (a, a+1) pair set; same
        # shingle-rule envelope as minhash_pairs (lowercased
        # single-spaced ASCII, ≥3 words per doc)
        "ngram_jaccard": """
            WITH sh AS (SELECT DISTINCT doc_id,
                               unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                       for i in range(1, len(ws) - 1)]) AS s
                        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
                              FROM documents)),
            sz AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
            pr AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents
                   WHERE doc_id + 1 <= (SELECT MAX(doc_id) FROM documents)),
            inter AS (SELECT p.a, p.b, count(*) AS i
                      FROM pr p JOIN sh x ON x.doc_id = p.a
                                JOIN sh y ON y.doc_id = p.b AND y.s = x.s
                      GROUP BY 1, 2)
            SELECT p.a, p.b,
                   round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                         / (sa.c + sb.c - COALESCE(i.i, 0)), 6) AS jacc6
            FROM pr p JOIN sz sa ON sa.doc_id = p.a
                      JOIN sz sb ON sb.doc_id = p.b
            LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
        """,
        # exact brute-force cosine pairs (engine runs nbits=0 = one
        # bucket); threshold sits in a ≥1e-4 cosine gap at sf0.01
        "embedding_neardup": """
            SELECT x.vec_id AS a, y.vec_id AS b
            FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
            WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.4
        """,
        "fingerprint": _winnow_sql(25, 16),
        # fixed-radius IDW per 1° cell: Σ(v/d²)/Σ(1/d²) over d ≤ 5
        # (range join bounds the candidate pairs; engine hypot vs SQL
        # sqrt differ ~1 ulp — inside the 6-dp rounding)
        "idw_fixed": f"""
            WITH pts AS (
                SELECT {lon_c} AS x, {lat_c} AS y, c_acctbal AS v
                FROM customer
            ),
            cells AS (
                SELECT c.i AS col, r.i AS row,
                       -180.0 + (c.i + 0.5) * 1.0 AS cx,
                       90.0 - (r.i + 0.5) * 1.0 AS cy
                FROM range(0, 360) c(i), range(0, 180) r(i)
            ),
            j AS (
                SELECT col, row,
                       sqrt((p.x - cx) * (p.x - cx)
                            + (p.y - cy) * (p.y - cy)) AS d, p.v
                FROM cells JOIN pts p
                  ON p.x BETWEEN cx - 5.0 AND cx + 5.0
                 AND p.y BETWEEN cy - 5.0 AND cy + 5.0
            )
            SELECT CAST(col AS BIGINT) AS col, CAST(row AS BIGINT) AS row,
                   round(SUM(v / (d * d)) / SUM(1.0 / (d * d)), 6) AS idw6
            FROM j WHERE d <= 5.0 AND d >= 1e-12
            GROUP BY 1, 2
        """,
        # Knuth multiplicative hash sample, high-32-bits mod 10000 —
        # exact HUGEINT wraparound replication of ops/sample.py
        "table_sample": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE CAST((CAST(((CAST(o_orderkey AS HUGEINT) + 7)
                              * 11400714819323198485)
                             % 18446744073709551616 AS UBIGINT)
                        // 4294967296) % 10000 AS BIGINT) < 1000
        """,
        # MultiWindRose rose attrs: centers = geocoded supplier keys
        # 1-3, radius 60, 8 sectors (half-step offset binning like the
        # engine); engine rose rows have no sector column, so the
        # compare is the (c, stats) multiset. Population stdev via a
        # two-pass avg((w-m)^2) matching np.mean((v-mean)**2).
        "multi_windrose": f"""
            WITH pts AS (
                SELECT {_lon('c_custkey')} AS x, {_lat('c_custkey')} AS y,
                       c_acctbal AS w
                FROM customer
            ),
            ctr AS (
                SELECT k - 1 AS c, {_lon('k')} AS cx, {_lat('k')} AS cy
                FROM range(1, 4) t(k)
            ),
            assigned AS (
                SELECT ctr.c,
                       CAST(floor(((((degrees(atan2(p.y - ctr.cy,
                                                    p.x - ctr.cx))
                                      - 22.5) % 360) + 360) % 360)
                                  / 45.0) AS BIGINT) AS s,
                       p.w
                FROM pts p JOIN ctr
                  ON (p.x - ctr.cx) * (p.x - ctr.cx)
                     + (p.y - ctr.cy) * (p.y - ctr.cy) <= 3600.0
            ),
            m AS (
                SELECT c, s, COUNT(*) AS cnt, SUM(w) AS sm, MIN(w) AS mn,
                       MAX(w) AS mx, AVG(w) AS mean, MEDIAN(w) AS mdn
                FROM assigned GROUP BY 1, 2
            ),
            v AS (
                SELECT a.c, a.s,
                       AVG((a.w - m.mean) * (a.w - m.mean)) AS msd
                FROM assigned a JOIN m ON m.c = a.c AND m.s = a.s
                GROUP BY 1, 2
            )
            SELECT m.c, m.cnt, round(m.sm, 6) AS val6,
                   round(m.mn, 6) AS mn6, round(m.mx, 6) AS mx6,
                   round(m.mean, 6) AS mean6, round(m.mdn, 6) AS mdn6,
                   round(sqrt(v.msd), 6) AS stdev6
            FROM m JOIN v ON v.c = m.c AND v.s = m.s
            WHERE m.sm <> 0
        """,
        "polar_grids": """
            SELECT s.s_suppkey, 22.5 + t.i * 45.0 AS angle, r.radius,
                   CASE
                     WHEN 22.5 + t.i * 45.0 >= 337.5 THEN 'E'
                     WHEN 22.5 + t.i * 45.0 >= 292.5 THEN 'SE'
                     WHEN 22.5 + t.i * 45.0 >= 247.5 THEN 'S'
                     WHEN 22.5 + t.i * 45.0 >= 202.5 THEN 'SW'
                     WHEN 22.5 + t.i * 45.0 >= 157.5 THEN 'W'
                     WHEN 22.5 + t.i * 45.0 >= 112.5 THEN 'NW'
                     WHEN 22.5 + t.i * 45.0 >= 67.5 THEN 'N'
                     ELSE 'NE'
                   END AS azimuth
            FROM supplier s, range(0, 8) t(i),
                 (SELECT unnest([10.0, 20.0]) AS radius) r
        """,
        # head radius = min-max-normalized od × max_size (5.0),
        # recovered engine-side from barb distances (±1 ulp hypot)
        "flow_map": """
            WITH m AS (SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
                       FROM customer)
            SELECT c_custkey,
                   round((c_acctbal - lo) / (hi - lo) * 5.0, 6) AS r6
            FROM customer, m
        """,
        "charlm_score": """
            WITH bg AS (
                SELECT doc_id,
                       unnest([substr(text, i, 2)
                               for i in range(1, length(text))]) AS bigram
                FROM documents WHERE length(text) >= 2
            ),
            cnts AS (
                SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
                FROM bg GROUP BY bigram
            ),
            sums AS (
                SELECT bg.doc_id, CAST(sum(c.cnt) AS BIGINT) AS sum_freq
                FROM bg JOIN cnts c USING (bigram) GROUP BY bg.doc_id
            )
            SELECT d.doc_id,
                   CAST(greatest(length(d.text) - 1, 0) AS BIGINT)
                       AS n_bigrams,
                   CAST(coalesce(s.sum_freq, 0) AS BIGINT) AS sum_freq
            FROM documents d LEFT JOIN sums s USING (doc_id)
        """,
        "crawl_delta": """
            WITH d AS (
                SELECT doc_id,
                       array_to_string(list_sort(list_distinct(
                           string_split(text, ' '))), ' ') AS k
                FROM documents
            )
            SELECT n.doc_id FROM d n
            WHERE n.doc_id % 2 = 0
              AND NOT EXISTS (SELECT 1 FROM d o
                              WHERE o.doc_id % 2 = 1 AND o.k = n.k)
        """,
        "robots_filter": """
            WITH u AS (
                SELECT c_custkey,
                       CASE c_custkey % 6
                           WHEN 0 THEN '/'
                           WHEN 1 THEN '/index.html'
                           WHEN 2 THEN '/private/data/'
                               || CAST(c_custkey AS VARCHAR)
                           WHEN 3 THEN '/private/pub/'
                               || CAST(c_custkey AS VARCHAR) || '.html'
                           WHEN 4 THEN '/cgi-bin/run/'
                               || CAST(c_custkey AS VARCHAR)
                           ELSE '/static/img/'
                               || CAST(c_custkey AS VARCHAR) || '.png'
                       END AS path
                FROM customer
            ),
            r(rule, allow) AS (VALUES
                ('/private/', FALSE), ('/private/pub/', TRUE),
                ('/cgi-bin/', FALSE), ('/static/', TRUE),
                ('/static/img/', FALSE)
            ),
            m AS (
                SELECT u.c_custkey, r.rule, r.allow,
                       row_number() OVER (
                           PARTITION BY u.c_custkey
                           ORDER BY length(r.rule) DESC, r.allow DESC)
                           AS rn
                FROM u JOIN r ON u.path LIKE r.rule || '%'
            )
            SELECT u.c_custkey, u.path,
                   coalesce(m.allow, TRUE) AS allowed,
                   CAST(coalesce(length(m.rule), 0) AS BIGINT)
                       AS match_len
            FROM u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
                USING (c_custkey)
        """,
        "corpus_curation": """
            WITH bg AS (
                SELECT doc_id,
                       unnest([substr(text, i, 2)
                               for i in range(1, length(text))]) AS bigram
                FROM documents WHERE length(text) >= 2
            ),
            cnts AS (
                SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
                FROM bg GROUP BY bigram
            ),
            s AS (
                SELECT bg.doc_id,
                       CAST(sum(c.cnt) AS BIGINT) AS sum_freq,
                       CAST(count(*) AS BIGINT) AS n_bigrams
                FROM bg JOIN cnts c USING (bigram) GROUP BY bg.doc_id
            ),
            w AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_words,
                       CAST(len(list_distinct(string_split(text, ' ')))
                           AS BIGINT) AS n_uniq
                FROM documents
            )
            SELECT s.doc_id, w.n_words, w.n_uniq, s.n_bigrams,
                   s.sum_freq
            FROM s JOIN w USING (doc_id)
            WHERE s.sum_freq >= s.n_bigrams * 1750
              AND w.n_uniq * 10 >= w.n_words * 4
              AND s.n_bigrams >= 100
        """,
        "top_terms": """
            WITH w AS (
                SELECT unnest(string_split(text, ' ')) AS term
                FROM documents
            )
            SELECT term, CAST(count(*) AS BIGINT) AS cnt
            FROM w GROUP BY term
            ORDER BY cnt DESC, term LIMIT 50
        """,
        "doc_keywords": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM w GROUP BY doc_id, term
            ),
            df AS (
                SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT)
                    AS df
                FROM w GROUP BY term
            ),
            r AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC)
                           AS rn
                FROM tf JOIN df USING (term)
            )
            SELECT doc_id, term, tf, df FROM r WHERE rn <= 3
        """,
        "text_normalize": r"""
            SELECT c_custkey,
                   trim(regexp_replace(lower(nfc_normalize(
                       'CAFE' || chr(769) || '  TesT' || chr(9)
                       || 'Nr ' || c_custkey || '  END ')),
                       '\s+', ' ', 'g')) AS norm
            FROM customer
        """,
        "domain_cap": """
            SELECT source, doc_id FROM (
                SELECT source, doc_id,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn <= 10
        """,
        "cohort_retention": """
            WITH d AS (
                SELECT user_id,
                       CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                           AS day
                FROM events
            ),
            c AS (
                SELECT user_id, min(day) AS cohort_day
                FROM d GROUP BY user_id
            ),
            x AS (
                SELECT DISTINCT d.user_id, c.cohort_day,
                       d.day - c.cohort_day AS offs
                FROM d JOIN c USING (user_id)
            )
            SELECT cohort_day, offs, CAST(count(*) AS BIGINT)
                       AS n_users
            FROM x GROUP BY cohort_day, offs
        """,
        "inverted_index": """
            WITH w AS (
                SELECT DISTINCT doc_id,
                       unnest(string_split(text, ' ')) AS term
                FROM documents
            )
            SELECT term,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   array_to_string(list_sort(list(doc_id)), ',')
                       AS postings
            FROM w GROUP BY term
        """,
    }
