"""Common-Crawl-style pages table: deterministic synthesizer + geocoder.

Input contract (BASELINE.json `input_hint`): Parquet of
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

The synthesizer is fully deterministic (pure hash functions of the row
index — no RNG state), so any shard can be regenerated independently at
any scale: `ray.data.range(n)` → `map_batches(synth_pages_batch)`.
A configurable fraction of urls geocode into one hot cluster to exercise
skew splitting (FIXTURES.md §1 "at least one deliberately hot cell").

Geocoding is a deterministic hash of the url host into clustered
lon/lat — stands in for a real geocoder model; the engine-side plumbing
(stateless vectorized `map_batches`, appends lon/lat/geom/cell/fid) is
the real thing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import fid as _fid
from ..core import wkb as _wkb
from ..index import hexgrid

_LANGS = ["en", "ko", "de", "fr", "ja", "es", "pt", "zh", "ru", "it"]
_WORDS = (
    "data spatial join cell index raster vector stream batch shuffle "
    "cluster point polygon grid tile hot spot density kernel zonal "
    "web page crawl text token language quality duplicate hash"
).split()

N_CLUSTERS = 64
HOT_CLUSTER = 7          # cluster id receiving the skew mass
HOT_FRACTION = 0.25      # fraction of hosts remapped into the hot cluster
BASE_TS = np.datetime64("2025-06-01T00:00:00", "us")


def _cluster_centers() -> np.ndarray:
    """(N_CLUSTERS, 2) deterministic lon/lat cluster centers."""
    ids = np.arange(N_CLUSTERS, dtype=np.uint64)
    h1 = _fid.hash_ints(ids)
    h2 = _fid.hash_ints(ids + np.uint64(10_000))
    lon = (h1 % np.uint64(340_000)).astype(np.float64) / 1000.0 - 170.0
    lat = (h2 % np.uint64(140_000)).astype(np.float64) / 1000.0 - 70.0
    return np.column_stack([lon, lat])


_CENTERS = _cluster_centers()


def synth_pages_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: ``id:int64`` (from ray.data.range) → pages rows."""
    ids = batch["id"].to_numpy()
    n = len(ids)
    host = ids % 997
    path = ids // 997
    urls = [f"https://host{h}.example/p{p}" for h, p in zip(host, path)]
    h = _fid.hash_ints(ids.astype(np.uint64))
    langs = [_LANGS[int(v % 10)] for v in h % np.uint64(10)]
    nw = (h % np.uint64(40)).astype(np.int64) + 5
    texts = []
    for i in range(n):
        k = int(h[i])
        words = [_WORDS[(k >> (j % 13) * 3 + j) % len(_WORDS)] for j in range(int(nw[i]))]
        texts.append(" ".join(words) + f" #{ids[i]}")
    htmls = [f"<html><body><p>{t}</p></body></html>".encode() for t in texts]
    ts = BASE_TS + (ids % 86_400_000).astype("timedelta64[us]") * 1000
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def geocode_arrays(urls: "pa.Array | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Deterministic url → (lon, lat). Clustered; HOT_FRACTION of hosts
    collapse into cluster HOT_CLUSTER to create a hot cell."""
    h = _fid.hash_strings(urls)
    cluster = (h % np.uint64(N_CLUSTERS)).astype(np.int64)
    hot = (h % np.uint64(1000)).astype(np.float64) / 1000.0 < HOT_FRACTION
    cluster = np.where(hot, HOT_CLUSTER, cluster)
    centers = _CENTERS[cluster]
    # deterministic offset ~ cluster radius 0.5 deg (hot cluster tighter)
    h2 = _fid.hash_ints(h)
    h3 = _fid.hash_ints(h2)
    radius = np.where(cluster == HOT_CLUSTER, 0.05, 0.5)
    dx = ((h2 % np.uint64(2_000_001)).astype(np.float64) / 1e6 - 1.0) * radius
    dy = ((h3 % np.uint64(2_000_001)).astype(np.float64) / 1e6 - 1.0) * radius
    return centers[:, 0] + dx, centers[:, 1] + dy


def geocode_batch(batch: pa.Table, *, res: int = 7,
                  with_geom: bool = True) -> pa.Table:
    """Stateless geocode stage: append lon, lat, (geom), cell, fid.

    cell = hex cell id at `res` — the engine's partition key
    (north_rule: H3-style encode of every row).
    """
    urls = batch["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    lon, lat = geocode_arrays(urls)
    cell = hexgrid.hex_cell(lon, lat, res)
    out = batch.append_column("lon", pa.array(lon, pa.float64()))
    out = out.append_column("lat", pa.array(lat, pa.float64()))
    if with_geom:
        out = out.append_column("geom", _wkb.encode_points_arrow(lon, lat))
    out = out.append_column("cell", pa.array(cell, pa.uint64()))
    out = out.append_column("fid", _fid.make_fids(urls, "page"))
    return out


def pages_dataset(n: int, *, parallelism: int = -1):
    """Build a pages Dataset of n rows (lazy, shard-parallel)."""
    import ray

    ds = ray.data.range(n, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(synth_pages_batch, batch_format="pyarrow")


def write_pages_parquet(path: str, n: int, parallelism: int = 16) -> None:
    """Materialize a deterministic pages table to partitioned Parquet."""
    pages_dataset(n, parallelism=parallelism).write_parquet(path)
