"""TextfileToPoint — CSV/TSV → point features.

Reference: GT/operations/TextfileToPointOperation.java:111-175 +
GT/operations/TextColumn.java:54-120 — user column specs (name, type ∈
{String, Short, Integer, Long, Float, Double, Boolean, Date, X, Y}),
delimiter, header flag, CRS.

Ray mapping: ``ray.data.read_csv`` (Arrow CSV, distributed) + a
stateless map_batches building the WKB point column from the X/Y
columns. Column typing happens at the Arrow read via convert options.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray

from ..core import wkb as _wkb

_TYPE_MAP = {
    "string": pa.string(), "short": pa.int16(), "integer": pa.int32(),
    "long": pa.int64(), "float": pa.float32(), "double": pa.float64(),
    "boolean": pa.bool_(), "date": pa.timestamp("us"),
    "x": pa.float64(), "y": pa.float64(),
}


def textfile_to_points(path: str, columns: list[tuple[str, str]], *,
                       delimiter: str = ",", header: bool = True,
                       crs: str = "EPSG:4326"):
    """Read a delimited text file into a point Dataset.

    columns: ordered (name, type) pairs; exactly one 'x' and one 'y'
    type column (reference TextColumn semantics). Appends lon/lat and a
    WKB ``geom`` column; CRS recorded in the dataset schema metadata by
    the write path.
    """
    xcols = [n for n, t in columns if t.lower() == "x"]
    ycols = [n for n, t in columns if t.lower() == "y"]
    if len(xcols) != 1 or len(ycols) != 1:
        raise ValueError("exactly one X and one Y column required")
    names = [n for n, _ in columns]
    types = {n: _TYPE_MAP[t.lower()] for n, t in columns}
    read_opts = pacsv.ReadOptions(column_names=None if header else names)
    parse_opts = pacsv.ParseOptions(delimiter=delimiter)
    convert_opts = pacsv.ConvertOptions(column_types=types)
    ds = ray.data.read_csv(path, read_options=read_opts,
                           parse_options=parse_opts,
                           convert_options=convert_opts)
    xn, yn = xcols[0], ycols[0]

    def _build(batch: pa.Table) -> pa.Table:
        x = batch[xn].to_numpy()
        y = batch[yn].to_numpy()
        out = batch
        if xn != "lon":
            out = out.append_column("lon", pa.array(x))
        if yn != "lat":
            out = out.append_column("lat", pa.array(y))
        return out.append_column(
            "geom", pa.array(list(_wkb.encode_points(x, y)), pa.binary()))

    return ds.map_batches(_build, batch_format="pyarrow")
