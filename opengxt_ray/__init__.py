"""opengxt_ray — a Ray-Data-native spatial-analysis / data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of mangosystem/opengxt (GeoTools process-spatialstatistics),
re-expressed as idiomatic Ray Data pipelines:

- vector tables are ``ray.data.Dataset``s whose blocks are Arrow tables
  with a WKB ``geom`` binary column (CRS in schema metadata),
- per-record operators are zero-copy ``map_batches`` stages with pure
  numpy/pyarrow kernels (no shapely/JTS dependency — the geometry math
  lives in :mod:`opengxt_ray.core.geomops`),
- spatial joins co-partition both sides on a hierarchical cell key
  (H3-style hex grid, S2-style quad fallback — :mod:`opengxt_ray.index`)
  and refine per cell with broadcast numpy indexes in actor pools,
- rasters are tile tables (one Arrow row per tile) processed with
  ``map_batches`` + halo exchange.

Reference semantics are cited per-module as ``GT/<path>:<lines>`` against
the read-only snapshot at /root/reference (see SURVEY.md §2).
"""

__version__ = "0.1.0"
