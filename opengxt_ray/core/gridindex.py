"""Numpy spatial indexes — the engine's STRtree replacement.

The reference builds a JTS STRtree over the whole join side per run
(GT/operations/SpatialJoinOperation.java:120,185-198). Here the
equivalent state is a numpy uniform-grid bucket index, built ONCE per
actor (`__init__`) from a broadcast object-store ref and queried per
batch — zero-copy sharing across the actor pool via Plasma.

Two structures:

- :class:`GridPointIndex` — points bucketed on a uniform grid; supports
  radius queries, k-NN via expanding ring search (the distributed
  analogue of STRtree.nearestNeighbour), and cell joins.
- :class:`BBoxIndex` — geometry bboxes bucketed on a grid; candidate
  retrieval for PIP / intersects refinement.
"""

from __future__ import annotations

import numpy as np


class GridPointIndex:
    """Uniform-grid bucket index over 2-D points.

    Build: O(n log n) (argsort). Query: expanding square ring of cells.
    ``cell`` defaults to ~sqrt(extent-area / n) so buckets hold O(1)
    points on uniform data.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, cell: float | None = None):
        self.x = np.ascontiguousarray(x, dtype=np.float64)
        self.y = np.ascontiguousarray(y, dtype=np.float64)
        n = len(self.x)
        self.n = n
        if n == 0:
            self.cell = cell or 1.0
            self.keys = np.empty(0, dtype=np.int64)
            self.order = np.empty(0, dtype=np.int64)
            self.minx = self.miny = 0.0
            return
        self.minx = float(self.x.min())
        self.miny = float(self.y.min())
        w = float(self.x.max()) - self.minx
        h = float(self.y.max()) - self.miny
        if cell is None:
            area = max(w * h, 1e-12)
            cell = max(np.sqrt(area / max(n, 1)), 1e-9)
        self.cell = float(cell)
        ix = ((self.x - self.minx) / self.cell).astype(np.int64)
        iy = ((self.y - self.miny) / self.cell).astype(np.int64)
        self.keys_raw = ix * np.int64(1 << 31) + iy
        self.order = np.argsort(self.keys_raw, kind="stable")
        self.keys = self.keys_raw[self.order]

    def _bucket(self, ix: int, iy: int) -> np.ndarray:
        """Indices (original order) of points in grid bucket (ix, iy)."""
        k = np.int64(ix) * np.int64(1 << 31) + np.int64(iy)
        lo = np.searchsorted(self.keys, k, side="left")
        hi = np.searchsorted(self.keys, k, side="right")
        return self.order[lo:hi]

    def _cells_in_window(self, ix0, ix1, iy0, iy1) -> np.ndarray:
        out = []
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                b = self._bucket(ix, iy)
                if len(b):
                    out.append(b)
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(out)

    def query_radius(self, qx: float, qy: float, radius: float) -> np.ndarray:
        """Indices of points within `radius` of (qx, qy)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        ix0 = int(np.floor((qx - radius - self.minx) / self.cell))
        ix1 = int(np.floor((qx + radius - self.minx) / self.cell))
        iy0 = int(np.floor((qy - radius - self.miny) / self.cell))
        iy1 = int(np.floor((qy + radius - self.miny) / self.cell))
        cand = self._cells_in_window(ix0, ix1, iy0, iy1)
        if len(cand) == 0:
            return cand
        d = np.hypot(self.x[cand] - qx, self.y[cand] - qy)
        return cand[d <= radius]

    def query_knn(
        self, qx: float, qy: float, k: int = 1,
        max_radius: float = np.inf, exclude: int = -1,
    ) -> tuple[np.ndarray, np.ndarray]:
        """k nearest neighbors of one point via expanding ring search.

        Returns (indices, distances) sorted ascending; fewer than k if
        the index is small or max_radius cuts off. The unlimited-radius
        case (reference default searchRadius=0 ⇒ global NN,
        GT/SpatialJoinProcessFactory.java:90-93) terminates because each
        ring expansion doubles the reach until the index extent is
        covered (SURVEY.md §7.4's ring-growing fallback).
        """
        if self.n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        cix = int(np.floor((qx - self.minx) / self.cell))
        ciy = int(np.floor((qy - self.miny) / self.cell))
        r = 0
        best_idx = np.empty(0, dtype=np.int64)
        best_d = np.empty(0)
        max_rings = 1 + int(
            max(self.x.max() - self.minx, self.y.max() - self.miny) / self.cell
        )
        while True:
            if r == 0:
                cand = self._bucket(cix, ciy)
            else:
                out = []
                for ix in range(cix - r, cix + r + 1):
                    for iy in (ciy - r, ciy + r):
                        b = self._bucket(ix, iy)
                        if len(b):
                            out.append(b)
                for iy in range(ciy - r + 1, ciy + r):
                    for ix in (cix - r, cix + r):
                        b = self._bucket(ix, iy)
                        if len(b):
                            out.append(b)
                cand = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
            if len(cand):
                if exclude >= 0:
                    cand = cand[cand != exclude]
                d = np.hypot(self.x[cand] - qx, self.y[cand] - qy)
                alli = np.concatenate([best_idx, cand])
                alld = np.concatenate([best_d, d])
                o = np.argsort(alld, kind="stable")[: max(k, 1)]
                best_idx, best_d = alli[o], alld[o]
            # ring r guarantees correctness once k found within r*cell
            safe = r * self.cell
            if len(best_idx) >= k and best_d[min(k, len(best_d)) - 1] <= safe:
                break
            if r > max_rings or (r * self.cell) > max_radius * 2 + self.cell:
                break
            r += 1
        if np.isfinite(max_radius):
            keep = best_d <= max_radius
            best_idx, best_d = best_idx[keep], best_d[keep]
        return best_idx[:k], best_d[:k]

    def query_knn_batch(self, qx: np.ndarray, qy: np.ndarray, k: int = 1,
                        max_radius: float = np.inf):
        """k-NN for a batch of query points.

        Returns (idx (N,k) int64 with -1 padding, dist (N,k) with inf).
        """
        n = len(qx)
        idx = np.full((n, k), -1, dtype=np.int64)
        dist = np.full((n, k), np.inf)
        for i in range(n):
            ii, dd = self.query_knn(float(qx[i]), float(qy[i]), k, max_radius)
            m = len(ii)
            idx[i, :m] = ii
            dist[i, :m] = dd
        return idx, dist


class BBoxIndex:
    """Grid-bucketed bbox index for geometry candidate retrieval."""

    def __init__(self, bboxes: np.ndarray, cell: float | None = None):
        self.bboxes = np.asarray(bboxes, dtype=np.float64)
        n = len(self.bboxes)
        self.n = n
        if n == 0:
            self.cell = cell or 1.0
            self.buckets: dict = {}
            return
        if cell is None:
            w = np.maximum(self.bboxes[:, 2] - self.bboxes[:, 0], 1e-12)
            h = np.maximum(self.bboxes[:, 3] - self.bboxes[:, 1], 1e-12)
            cell = float(max(np.median(w), np.median(h)) * 2.0)
        self.cell = float(cell)
        self.buckets = {}
        for i in range(n):
            b = self.bboxes[i]
            if not np.isfinite(b).all():
                continue
            ix0 = int(np.floor(b[0] / self.cell))
            ix1 = int(np.floor(b[2] / self.cell))
            iy0 = int(np.floor(b[1] / self.cell))
            iy1 = int(np.floor(b[3] / self.cell))
            for ix in range(ix0, ix1 + 1):
                for iy in range(iy0, iy1 + 1):
                    self.buckets.setdefault((ix, iy), []).append(i)

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """For each point → candidate geometry indices (bbox contains).

        Returns (point_idx, geom_idx) pair arrays — the candidate join
        pairs for refinement. Small geometry sets (≤256) use one
        vectorized (N × G) containment matrix; larger sets use the
        bucketed path.
        """
        if self.n == 0 or len(px) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        if self.n <= 64:
            bb = self.bboxes
            out_pi, out_gi = [], []
            CH = max(1, (1 << 23) // max(self.n, 1))  # ≤8M bools per chunk
            for c0 in range(0, len(px), CH):
                pxs = px[c0 : c0 + CH, None]
                pys = py[c0 : c0 + CH, None]
                m = ((bb[None, :, 0] <= pxs) & (pxs <= bb[None, :, 2])
                     & (bb[None, :, 1] <= pys) & (pys <= bb[None, :, 3]))
                pi, gi = np.nonzero(m)
                out_pi.append(pi.astype(np.int64) + c0)
                out_gi.append(gi.astype(np.int64))
            return np.concatenate(out_pi), np.concatenate(out_gi)
        # bucketed, vectorized per occupied bucket: each bucket tests its
        # points against only its few candidate geoms — O(N·c̄), not O(N·G)
        cix = np.floor(px / self.cell).astype(np.int64)
        ciy = np.floor(py / self.cell).astype(np.int64)
        pi_out, gi_out = [], []
        order = np.lexsort((ciy, cix))
        sx, sy = cix[order], ciy[order]
        boundary = np.nonzero((np.diff(sx) != 0) | (np.diff(sy) != 0))[0] + 1
        starts = np.concatenate([[0], boundary])
        ends = np.concatenate([boundary, [len(order)]])
        for s, e in zip(starts, ends):
            cands = self.buckets.get((int(sx[s]), int(sy[s])))
            if not cands:
                continue
            pts = order[s:e]
            cand = np.asarray(cands, dtype=np.int64)
            bb = self.bboxes[cand]
            pxs = px[pts][:, None]
            pys = py[pts][:, None]
            m = ((bb[None, :, 0] <= pxs) & (pxs <= bb[None, :, 2])
                 & (bb[None, :, 1] <= pys) & (pys <= bb[None, :, 3]))
            ii, jj = np.nonzero(m)
            if len(ii):
                pi_out.append(pts[ii])
                gi_out.append(cand[jj])
        if not pi_out:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(pi_out), np.concatenate(gi_out)

    def query_bbox(self, b: np.ndarray) -> np.ndarray:
        """Geometry indices whose bbox intersects bbox b=[minx,miny,maxx,maxy]."""
        if self.n == 0:
            return np.empty(0, np.int64)
        ix0 = int(np.floor(b[0] / self.cell))
        ix1 = int(np.floor(b[2] / self.cell))
        iy0 = int(np.floor(b[1] / self.cell))
        iy1 = int(np.floor(b[3] / self.cell))
        cand: set = set()
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                cand.update(self.buckets.get((ix, iy), ()))
        if not cand:
            return np.empty(0, np.int64)
        cand_arr = np.fromiter(cand, dtype=np.int64)
        bb = self.bboxes[cand_arr]
        m = (
            (bb[:, 0] <= b[2]) & (bb[:, 2] >= b[0])
            & (bb[:, 1] <= b[3]) & (bb[:, 3] >= b[1])
        )
        return cand_arr[m]
