"""Deterministic feature-id assignment.

The reference synthesizes FIDs as ``typeName.N`` from a per-iterator
counter (GT/transformation/GXTSimpleFeatureCollection.java:59-61,
IntersectFeatureCollection.java:285 ``counter++``) — order-dependent and
unreproducible under parallel block execution. Our FIDs are derived from
row content (hash of a key column, e.g. ``url``), so outputs are
row-for-row comparable regardless of block arrival order
(SURVEY.md §7.4 "Deterministic row-for-row outputs").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash_strings(arr: "pa.Array | list[str]") -> np.ndarray:
    """Deterministic 64-bit FNV-1a hash of a string/binary column.

    Vectorized over byte columns via a packed-prefix scheme: exact
    FNV-1a on the UTF-8 bytes, computed with numpy on the Arrow buffers.
    """
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.string()) if pa.types.is_large_string(arr.type) else arr.cast(pa.binary())
    arr = arr.cast(pa.binary()) if pa.types.is_string(arr.type) else arr
    n = len(arr)
    out = np.empty(n, dtype=np.uint64)
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=n + 1,
                            offset=arr.offset * 4)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    # per-row FNV loop over bytes, but vectorized across rows byte-position-wise
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    starts = offsets[:-1].astype(np.int64)
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            active = lens > i
            if not active.any():
                break
            idx = starts[active] + i
            b = data[idx].astype(np.uint64)
            h[active] = (h[active] ^ b) * _FNV_PRIME
    return h


def hash_ints(arr) -> np.ndarray:
    """Deterministic 64-bit mix of an integer column (splitmix64)."""
    z = np.asarray(arr, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def make_fids(key_column, prefix: str = "f") -> pa.Array:
    """String FIDs ``{prefix}.{hash}`` derived from a key column."""
    if isinstance(key_column, (pa.Array, pa.ChunkedArray)) and (
        pa.types.is_string(key_column.type) or pa.types.is_binary(key_column.type)
        or pa.types.is_large_string(key_column.type)
    ):
        h = hash_strings(key_column)
    else:
        vals = key_column.to_numpy(zero_copy_only=False) if isinstance(
            key_column, (pa.Array, pa.ChunkedArray)) else np.asarray(key_column)
        h = hash_ints(vals)
    return pc.binary_join_element_wise(
        pa.array([prefix] * len(h)), pa.array([str(v) for v in h]), "."
    )
