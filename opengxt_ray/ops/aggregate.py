"""Aggregation operators: Dissolve, DataStatistics, CollectEvents, dedup.

Reference semantics:
- Dissolve: GT/operations/DissolveOperation.java:69-220 — group by a
  field, union geometries per group, summary stats per group.
- DataStatistics: GT/operations/DataStatisticsOperation.java +
  GT/core/StatisticsVisitor.java:150-553 — per-column count/sum/mean/
  min/max/range/std/var/CoV with POPULATION variance
  ``(Σx² − (Σx)²/n)/n`` (StatisticsVisitor.java:226).
- CollectEvents: GT/operations/CollectEventsOperation.java:49-97 —
  snap-dedup points within tolerance, append ``icount`` multiplicity.
- DeleteDuplicates: GT/operations/DeleteDuplicateFeaturesOperation.java
  :52-90 — drop rows with exactly-equal geometry (keep first).

Ray execution: partial aggregation inside ``map_batches`` (one partial
row per block per group) followed by a small ``groupby`` over partials —
the all-to-all shuffle only moves pre-aggregated rows (SURVEY.md §7.3
"push aggregation partial").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core import fid as _fid
from ..core import geomops, wkb as _wkb

SUMMARY_FUNCS = ("count", "sum", "mean", "min", "max", "range", "std", "var", "cov")


# ---------------------------------------------------------------------------
# Partial-aggregate machinery (combiner before the shuffle)
# ---------------------------------------------------------------------------

def _partial_stats_batch(batch: pa.Table, key: str | None,
                         value_cols: list[str]) -> pa.Table:
    """One partial row per (key,) per batch: n, sum, sumsq, min, max."""
    cols: dict = {}
    if key is not None:
        import pandas as pd

        keys = batch[key].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys, sort=True)
    else:
        codes = np.zeros(len(batch), dtype=np.int64)
        uniq = np.array([0])
        cols["__k"] = pa.array([0])
    if key is not None:
        cols[key] = pa.array(uniq)
    ng = len(uniq)
    for c in value_cols:
        v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(v)
        n = np.bincount(codes[valid], minlength=ng)
        s = np.bincount(codes[valid], weights=v[valid], minlength=ng)
        s2 = np.bincount(codes[valid], weights=(v * v)[valid], minlength=ng)
        mn = np.full(ng, np.inf)
        mx = np.full(ng, -np.inf)
        np.minimum.at(mn, codes[valid], v[valid])
        np.maximum.at(mx, codes[valid], v[valid])
        cols[f"__n_{c}"] = pa.array(n.astype(np.int64))
        cols[f"__s_{c}"] = pa.array(s)
        cols[f"__s2_{c}"] = pa.array(s2)
        cols[f"__mn_{c}"] = pa.array(mn)
        cols[f"__mx_{c}"] = pa.array(mx)
    return pa.table(cols)


def _finalize_stats(group: pa.Table, key: str | None, value_cols, funcs,
                    round_digits: int | None) -> pa.Table:
    from ..core.ssutils import format_round

    out: dict = {}
    if key is not None:
        out[key] = [group[key][0].as_py()]
    for c in value_cols:
        n = int(pc.sum(group[f"__n_{c}"]).as_py() or 0)
        s = float(pc.sum(group[f"__s_{c}"]).as_py() or 0.0)
        s2 = float(pc.sum(group[f"__s2_{c}"]).as_py() or 0.0)
        mn = float(pc.min(group[f"__mn_{c}"]).as_py())
        mx = float(pc.max(group[f"__mx_{c}"]).as_py())
        mean = s / n if n else 0.0
        var = (s2 - (s * s) / n) / n if n else 0.0
        std = float(np.sqrt(max(var, 0.0)))
        vals = {
            "count": float(n), "sum": s, "mean": mean, "min": mn, "max": mx,
            "range": mx - mn, "std": std, "var": var,
            "cov": (std / mean) if (n and mean != 0) else 0.0,
        }
        for f in funcs:
            v = vals[f]
            if round_digits is not None and f != "count":
                v = format_round(v, round_digits)
            out[f"{f}_{c}"] = [v]
    return pa.table(out)


def data_statistics(ds, value_cols: list[str], *, group_by: str | None = None,
                    funcs=SUMMARY_FUNCS, round_digits: int | None = None,
                    ngroups_hint: int | None = None):
    """DataStatisticsOperation — per-column descriptive stats, optional
    grouping. Partial per block → tiny groupby → finalize.

    ``ngroups_hint``: expected distinct-group count; sizes the
    pre-groupby coalesce so the sort shuffle emits no schema-less
    empty reduce partitions (ungrouped runs always coalesce to 1 —
    the key is a constant). With NO hint, grouped runs are NOT
    coalesced: repartitioning a tiny partial table UP to the CPU-count
    target creates the very schema-less empties the coalesce exists to
    avoid, and they poison downstream hash-shuffle joins (round-5
    buffer_statistics regression)."""
    partials = ds.map_batches(
        lambda b: _partial_stats_batch(b, group_by, value_cols),
        batch_format="pyarrow",
    )
    from ..core.util import coalesce_for_groupby, default_shuffle_partitions

    keycol = group_by if group_by is not None else "__k"
    if group_by is None:
        partials = coalesce_for_groupby(partials, 1)
    elif ngroups_hint is not None:
        partials = coalesce_for_groupby(partials, ngroups_hint)
    return partials.groupby(
        keycol, num_partitions=default_shuffle_partitions()).map_groups(
        lambda g: _finalize_stats(g, group_by, value_cols, funcs, round_digits),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Dissolve
# ---------------------------------------------------------------------------

def dissolve(ds, dissolve_field: str, *, value_cols: list[str] = (),
             funcs=("sum", "mean"), union_geom: bool = False,
             geom_col: str = "geom", round_digits: int | None = None):
    """DissolveOperation — group by field; stats per group; optionally a
    unioned geometry per group.

    Geometry union is EXACT for tessellating members (shared-edge
    cancellation, :func:`geomops.union_tessellation` — fishnet/hex/
    admin dissolves); non-tiling overlapping members fall back to the
    convex hull of vertices (documented approximation; exact general
    boolean union needs GEOS).
    """
    if not union_geom:
        return data_statistics(ds, list(value_cols), group_by=dissolve_field,
                               funcs=funcs, round_digits=round_digits)

    def _fold_union(fg) -> list:
        """Pairwise Greiner–Hormann union fold for OVERLAPPING members
        (shells only; holes of intermediate unions preserved via ring
        classification at the end)."""
        from ..core.polyclip import polygon_union

        shells: list = []
        for i in range(len(fg)):
            for r, is_shell in fg.rings(i):
                if not is_shell or len(r) < 4:
                    continue
                cur = r[:-1]
                merged = True
                while merged:
                    merged = False
                    for j, other in enumerate(shells):
                        bb_o = (other[:, 0].min(), other[:, 1].min(),
                                other[:, 0].max(), other[:, 1].max())
                        bb_c = (cur[:, 0].min(), cur[:, 1].min(),
                                cur[:, 0].max(), cur[:, 1].max())
                        if (bb_c[0] > bb_o[2] or bb_c[2] < bb_o[0]
                                or bb_c[1] > bb_o[3] or bb_c[3] < bb_o[1]):
                            continue
                        u = polygon_union(cur, other)
                        if len(u) == 1:  # actually merged into one shell
                            shells.pop(j)
                            cur = u[0][:-1]
                            merged = True
                            break
                shells.append(cur)
        return shells

    def _members_overlap(fg) -> bool:
        """True if any two member polygons overlap in the interior
        (edge crossings or containment) — tessellation cancellation is
        only valid for edge-sharing, non-overlapping members."""
        bb = fg.bboxes()
        n = len(fg)
        for i in range(n):
            for j in range(i + 1, n):
                if (bb[i, 0] >= bb[j, 2] or bb[i, 2] <= bb[j, 0]
                        or bb[i, 1] >= bb[j, 3] or bb[i, 3] <= bb[j, 1]):
                    continue
                pi = fg.geom_coords(i)
                pj = fg.geom_coords(j)
                if geomops.points_in_geom(pj[:1, 0], pj[:1, 1], fg, i)[0]:
                    # shared-corner vertices sit on the boundary; require
                    # strict interior: test the centroid too
                    cx, cy = pj[:, 0].mean(), pj[:, 1].mean()
                    if geomops.points_in_geom(np.asarray([cx]),
                                              np.asarray([cy]), fg, i)[0]:
                        return True
                for ri, _s1 in fg.rings(i):
                    for rj, _s2 in fg.rings(j):
                        xs, _, _, _ = geomops.segment_intersections(
                            ri[:-1], ri[1:], rj[:-1], rj[1:])
                        # shared-edge tessellations touch at endpoints;
                        # interior crossings indicate overlap — filter
                        # endpoint-only touches by midpoint test
                        if len(xs) > 0:
                            cxm = (pi[:, 0].mean() + pj[:, 0].mean()) / 2
                            cym = (pi[:, 1].mean() + pj[:, 1].mean()) / 2
                            if (geomops.points_in_geom(
                                    np.asarray([cxm]), np.asarray([cym]),
                                    fg, i)[0]
                                    and geomops.points_in_geom(
                                        np.asarray([cxm]), np.asarray([cym]),
                                        fg, j)[0]):
                                return True
        return False

    def _group_union(group: pa.Table) -> pa.Table:
        fg = _wkb.decode(group[geom_col].to_pylist())
        if len(fg) > 1 and _members_overlap(fg):
            shells = _fold_union(fg)
            rings = [np.vstack([sh, sh[:1]]) for sh in shells]
        else:
            rings = geomops.union_tessellation(fg)
        if rings:
            pos = [r for r in rings if geomops.ring_area(r) > 0]
            neg = [r for r in rings if geomops.ring_area(r) < 0]
            shells = [(r, []) for r in pos]
            for hole in neg:  # attach each hole to its containing shell
                for sr, hl in shells:
                    sfg = _wkb.decode([_wkb.encode_polygon(sr)])
                    if geomops.points_in_geom(hole[:1, 0], hole[:1, 1],
                                              sfg, 0)[0]:
                        hl.append(hole)
                        break
            if shells:
                geom = (_wkb.encode_polygon(shells[0][0], shells[0][1])
                        if len(shells) == 1
                        else _wkb.encode_multipolygon(shells))
            else:
                geom = _wkb.encode_polygon(geomops.convex_hull(fg.coords))
        else:
            geom = _wkb.encode_polygon(geomops.convex_hull(fg.coords))
        out = {dissolve_field: [group[dissolve_field][0].as_py()],
               geom_col: [geom]}
        for c in value_cols:
            v = group[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for f in funcs:
                if f == "sum":
                    out[f"{f}_{c}"] = [float(np.nansum(v))]
                elif f == "mean":
                    out[f"{f}_{c}"] = [float(np.nanmean(v))]
                elif f == "count":
                    out[f"{f}_{c}"] = [float(np.sum(~np.isnan(v)))]
                elif f == "min":
                    out[f"{f}_{c}"] = [float(np.nanmin(v))]
                elif f == "max":
                    out[f"{f}_{c}"] = [float(np.nanmax(v))]
        return pa.table(out)

    return ds.groupby(dissolve_field).map_groups(_group_union,
                                                 batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CollectEvents / DeleteDuplicates / geometry dedup
# ---------------------------------------------------------------------------

def collect_events(ds, *, tolerance: float = 0.1,
                   xcol: str = "lon", ycol: str = "lat"):
    """CollectEventsOperation — snap points to a tolerance grid, count
    multiplicity per snapped location (``icount``).

    Exact dedup via hash-partitioned groupby on the quantized coordinate
    key (SURVEY.md §2.4: "exact dedup via groupby(quantized-coord key)").
    Emits one row per distinct snapped location: qx, qy, icount.
    """

    def _quantize(batch: pa.Table) -> pa.Table:
        x = batch[xcol].to_numpy()
        y = batch[ycol].to_numpy()
        qx = np.floor(x / tolerance).astype(np.int64)
        qy = np.floor(y / tolerance).astype(np.int64)
        return pa.table({
            "qkey": pa.array(qx * np.int64(1 << 32) + qy),
            "qx": pa.array(qx), "qy": pa.array(qy),
        })

    from ..core.util import default_shuffle_partitions

    q = ds.map_batches(_quantize, batch_format="pyarrow")
    agg = q.groupby("qkey",
                    num_partitions=default_shuffle_partitions()).aggregate(
        # first qx/qy are identical within a group
        __import__("ray").data.aggregate.Min("qx"),
        __import__("ray").data.aggregate.Min("qy"),
        __import__("ray").data.aggregate.Count(),
    )
    return agg.map_batches(
        lambda b: pa.table({
            "qx": b["min(qx)"], "qy": b["min(qy)"],
            "icount": b["count()"],
        }),
        batch_format="pyarrow",
    )


def delete_duplicates(ds, *, key_cols: list[str], keep_col: str,
                      num_partitions: int | None = None):
    """Exact dedup: keep the row with MIN(keep_col) per key — the
    deterministic analogue of the reference's keep-first
    (GT/operations/DeleteDuplicateFeaturesOperation.java:52-90; first-by-
    iteration-order is nondeterministic under parallel blocks, so we key
    on the smallest id).

    For geometry dedup pass a WKB-hash column as the key (see
    :func:`add_geom_hash`).
    """
    import ray

    gb = ds.groupby(key_cols[0] if len(key_cols) == 1 else key_cols,
                    num_partitions=num_partitions)
    return gb.aggregate(ray.data.aggregate.Min(keep_col))


def add_geom_hash(batch: pa.Table, geom_col: str = "geom",
                  out_col: str = "geom_hash") -> pa.Table:
    """Append an FNV-1a hash of the WKB geometry bytes."""
    h = _fid.hash_strings(batch[geom_col])
    return batch.append_column(out_col, pa.array(h, pa.uint64()))


def singlepart_to_multipart(ds, *, group_col: str, geom_col: str = "geom"):
    """SinglepartToMultipart (GT SinglepartToMultipartProcess) — merge
    each group's geometries into one multi-geometry row (first row's
    attrs kept). groupby(group_col) + per-group encode."""
    from ..core import wkb as _W

    def _merge(group: pa.Table) -> pa.Table:
        fg = _W.decode(group[geom_col].to_pylist())
        pts, lines, polys = [], [], []
        for i in range(len(fg)):
            t = fg.types[i]
            if t == _W.POINT:
                pts.extend(fg.geom_coords(i))
            elif t == _W.LINESTRING:
                lines.extend(r for r, _ in fg.rings(i))
            else:
                cur = None
                for r, is_shell in fg.rings(i):
                    if is_shell:
                        if cur:
                            polys.append(cur)
                        cur = (r, [])
                    elif cur:
                        cur[1].append(r)
                if cur:
                    polys.append(cur)
        if polys:
            geom = _W.encode_multipolygon(polys)
        elif lines:
            geom = _W.encode_multilinestring(lines)
        elif pts:
            geom = _W.encode_multipoint(np.asarray(pts))
        else:
            return group.slice(0, 0)
        out = group.slice(0, 1)
        gi = out.column_names.index(geom_col)
        return out.set_column(gi, geom_col,
                              pa.array([geom], pa.binary()))

    from ..core.util import default_shuffle_partitions

    return ds.groupby(group_col,
                      num_partitions=default_shuffle_partitions()) \
        .map_groups(_merge, batch_format="pyarrow")


def collect_features(ds) -> pa.Table:
    """CollectFeatures — materialize the (small) stream into one
    in-memory feature table (the reference's ListFeatureCollection
    collector). Driver-side by definition; big data should stay a
    Dataset."""
    import pandas  # noqa: F401  (to_pandas path)

    df = ds.to_pandas()
    return pa.Table.from_pandas(df, preserve_index=False)


def count_features(ds) -> int:
    """CountFeaturesProcess — `Dataset.count()` (streaming row count)."""
    return ds.count()
