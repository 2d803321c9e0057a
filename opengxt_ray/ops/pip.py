"""Points-in-polygon aggregation and PointStatistics.

Reference semantics:
- PointsInPolygon: GT/operations/PointsInPolygonOperation.java:59-123 —
  per polygon, count of intersecting points or weighted sum (weight
  expression per point, :90-107); output = polygon rows + ``val``.
- PointStatistics: GT/operations/PointStatisticsOperation.java:101-127 —
  per polygon, multiple summary fields parsed from a
  ``"Sum.val, Avg.income"`` spec (GT/core/SummaryFieldBuilder.java:47-172,
  functions in GT/enumeration/StaticsType.java).
- BufferStatistics: GT/BufferStatisticsProcess.java:87-124 — buffer the
  input geometries, then PointStatistics within the buffers.

Execution: broadcast PIP join (actor pool) emitting only the polygon
key → per-batch partial aggregation → tiny groupby → hash-join the
polygon attributes back. The wide point payload never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from . import join as J
from .aggregate import data_statistics

# reference StaticsType spellings → our funcs
_SPEC_MAP = {
    "sum": "sum", "avg": "mean", "average": "mean", "mean": "mean",
    "min": "min", "minimum": "min", "max": "max", "maximum": "max",
    "range": "range", "std": "std", "stddev": "std", "var": "var",
    "variance": "var", "count": "count", "cov": "cov",
}


def parse_summary_spec(spec: str) -> list[tuple[str, str]]:
    """``"Sum.val, Avg.income"`` → [("sum", "val"), ("mean", "income")]
    (GT/core/SummaryFieldBuilder.java:47-172)."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        func, _, field = part.partition(".")
        f = _SPEC_MAP.get(func.strip().lower())
        if f is None:
            raise ValueError(f"unknown summary function {func!r}")
        out.append((f, field.strip()))
    return out


def points_in_polygon(points_ds, poly_table: pa.Table, *,
                      poly_key: str, weight_col: str | None = None,
                      val_col: str = "val", num_partitions: int | None = None):
    """Per-polygon count (or weighted sum) of intersecting points.

    Returns a Dataset of all polygon rows (geom dropped) + ``val``
    (0.0 for polygons containing no points, matching the reference's
    left-complete output).
    """
    joined = J.broadcast_spatial_join(
        points_ds, poly_table, predicate="intersects", how="inner",
        dedup="suffix", right_cols=[poly_key],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        keys = batch[poly_key].to_numpy(zero_copy_only=False)
        if weight_col is None:
            w = np.ones(len(batch))
        else:
            w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        import pandas as pd

        codes, uniq = pd.factorize(keys, sort=True)
        s = np.bincount(codes, weights=w, minlength=len(uniq))
        return pa.table({poly_key: pa.array(uniq), "__w": pa.array(s)})

    partial = joined.map_batches(_partial, batch_format="pyarrow")
    agg = partial.groupby(poly_key).aggregate(ray.data.aggregate.Sum("__w"))
    key_type = poly_table.schema.field(poly_key).type
    agg = agg.map_batches(
        lambda b: pa.table({poly_key: b[poly_key].cast(key_type),
                            val_col: b["sum(__w)"]}),
        batch_format="pyarrow",
    )
    from ..core.util import default_join_partitions

    polys = ray.data.from_arrow(poly_table.drop_columns(["geom"]))
    out = polys.join(agg, join_type="left_outer",
                     num_partitions=num_partitions
                     or default_join_partitions(), on=(poly_key,))
    return out.map_batches(
        lambda b: b.set_column(
            b.column_names.index(val_col), val_col,
            b[val_col].combine_chunks().fill_null(0.0)),
        batch_format="pyarrow",
    )


def point_statistics(points_ds, poly_table: pa.Table, *, poly_key: str,
                     spec: str, round_digits: int | None = None,
                     num_partitions: int | None = None):
    """Per-polygon multi-field summary stats of intersecting points.

    Output: polygon attrs (geom dropped) + one ``{func}_{field}`` column
    per spec entry; polygons with no points get nulls (reference emits
    0/NULL depending on function — we keep null and let callers
    fill).
    """
    entries = parse_summary_spec(spec)
    fields = sorted({f for _, f in entries})
    funcs = sorted({fn for fn, _ in entries})
    joined = J.broadcast_spatial_join(
        points_ds, poly_table, predicate="intersects", how="inner",
        dedup="suffix", right_cols=[poly_key],
    )
    stats = data_statistics(joined, fields, group_by=poly_key, funcs=funcs,
                            round_digits=round_digits,
                            ngroups_hint=poly_table.num_rows)
    want = [poly_key] + [f"{fn}_{fld}" for fn, fld in entries]
    key_type = poly_table.schema.field(poly_key).type
    stats = stats.map_batches(
        lambda b: b.select(want).set_column(
            0, poly_key, b[poly_key].cast(key_type)),
        batch_format="pyarrow")
    from ..core.util import default_join_partitions

    polys = ray.data.from_arrow(poly_table.drop_columns(["geom"]))
    return polys.join(stats, join_type="left_outer",
                      num_partitions=num_partitions
                      or default_join_partitions(), on=(poly_key,))


def buffer_statistics(points_ds, poly_table: pa.Table, *, poly_key: str,
                      spec: str, distance: float = 0.0,
                      quadrant_segs: int = 8,
                      round_digits: int | None = None,
                      num_partitions: int | None = None):
    """BufferStatistics (GT/BufferStatisticsProcess.java:87-124) —
    buffer the input features by ``distance`` (n-gon circles for
    points, JTS-default 8 segs/quadrant), then per-buffer summary
    statistics of the intersecting points (the reference routes this
    through PointStatisticsOperation.setBufferDistance). distance=0 is
    allowed only for polygon inputs (reference :109-117); prepend
    ``Count.<field>`` to the spec for the reference's countField."""
    from ..core import wkb as _wkb
    from ..stages.transforms import make_buffer

    if distance:
        buffered = make_buffer(distance, quadrant_segs=quadrant_segs)(
            poly_table)
    else:
        fg = _wkb.decode(poly_table["geom"].to_pylist())
        if not all(t == 3 for t in fg.types):
            raise ValueError(
                "buffer_statistics: distance=0 requires polygon inputs "
                "(GT/BufferStatisticsProcess.java:109-117)")
        buffered = poly_table
    return point_statistics(points_ds, buffered, poly_key=poly_key,
                            spec=spec, round_digits=round_digits,
                            num_partitions=num_partitions)
