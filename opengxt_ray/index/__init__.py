"""Hierarchical spatial cell indexes — the engine's partition keys.

Two deterministic, pure-numpy cell systems (no h3/s2 C libraries in the
environment):

- :mod:`hexgrid` — "H3-style": pointy-top hexagonal grid over lon/lat
  with aperture-2 resolution ladder, axial-coordinate cell ids packed in
  uint64, k-ring neighborhoods, polygon covering. Primary partition key
  for spatial joins / hotspot neighbor shuffles (north_rule: "encodes
  every row into H3 cells").
- :mod:`quadgrid` — "S2-style" fallback: Morton/Z-order quadtree cells
  over lon/lat, hierarchical parent/child by bit shifts.

Both produce uint64 ids stable across processes/nodes (pure integer
math, no hashing of floats).
"""

from .hexgrid import (  # noqa: F401
    hex_cell,
    hex_center,
    hex_boundary,
    hex_ring,
    hex_disk,
    hex_size,
    cover_bbox as hex_cover_bbox,
)
from .quadgrid import quad_cell, quad_center, quad_neighbors  # noqa: F401
