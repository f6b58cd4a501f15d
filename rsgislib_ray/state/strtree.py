"""Bulk-packed STR R-tree in plain numpy arrays.

The reference builds an ``rtree`` index over a layer once and queries
it per bbox (/root/reference/python/rsgislib/vectorgeoms/__init__.py:3198-3239)
and geopandas' sjoin does the same internally
(vectorattrs/__init__.py:1229-1307). Neither library exists here, so
this is a from-scratch Sort-Tile-Recursive packed tree:

- arrays only (pickles cheaply → broadcast once with ``ray.put`` and
  rebuilt-free inside each actor's ``__init__``),
- multi-point queries are frontier-expansion over whole levels
  (np.repeat + vectorized bbox tests) — no per-point Python recursion,
  so a 100k-point batch is a handful of numpy ops.
"""

from __future__ import annotations

import numpy as np

_LEAF_CAP = 16


def _str_order(bounds: np.ndarray, cap: int) -> np.ndarray:
    """Sort-Tile-Recursive ordering: slice by x-center, sort slices by
    y-center. Returns a permutation of ``arange(len(bounds))``."""
    n = len(bounds)
    cx = (bounds[:, 0] + bounds[:, 1]) * 0.5
    cy = (bounds[:, 2] + bounds[:, 3]) * 0.5
    n_nodes = -(-n // cap)
    n_slices = int(np.ceil(np.sqrt(n_nodes)))
    slice_sz = n_slices * cap
    by_x = np.argsort(cx, kind="stable")
    order = np.empty(n, dtype=np.int64)
    for s in range(0, n, slice_sz):
        chunk = by_x[s : s + slice_sz]
        order[s : s + len(chunk)] = chunk[np.argsort(cy[chunk], kind="stable")]
    return order


class CellBucketIndex:
    """Flat grid-bucket index over item bboxes — the fast path for
    point-in-bbox candidate generation on dense layers.

    Each item is duplicated into every grid cell its bbox touches;
    entries are sorted by cell key, so a point query is one
    ``searchsorted`` + vectorized run expansion (no tree descent).
    Memory = O(sum of per-item cell covers); the constructor picks the
    cell size from the median item extent so duplication stays ~100x
    bounded while false candidates stay within ~20% of true matches.
    STRtree (below) remains for bbox-vs-bbox queries and sparse layers.
    """

    def __init__(
        self,
        bounds: np.ndarray,
        level: int | None = None,
        frame: tuple[float, float, float, float] | None = None,  # x0,y0,w,h
    ):
        bounds = np.ascontiguousarray(bounds, dtype=np.float64)
        self.n_items = len(bounds)
        if frame is None:
            # Frame = union of item bboxes: any point outside it is
            # outside EVERY item bbox, so dropping out-of-frame query
            # points is exact (no candidate loss).
            if self.n_items:
                x0 = float(bounds[:, 0].min())
                y0 = float(bounds[:, 2].min())
                width = max(float(bounds[:, 1].max()) - x0, 1e-9)
                height = max(float(bounds[:, 3].max()) - y0, 1e-9)
            else:
                x0 = y0 = 0.0
                width = height = 1.0
            frame = (x0, y0, width, height)
        x0, y0, width, height = frame
        self.x0, self.y0 = x0, y0
        if self.n_items == 0:
            self.level = level if level is not None else 0
            n = 1 << self.level
            self.n_side = n
            self.cw = width / n
            self.ch = height / n
            self.sorted_key = np.empty(0, dtype=np.int64)
            self.item_of = np.empty(0, dtype=np.int64)
            return
        if level is None:
            med_w = float(np.median(bounds[:, 1] - bounds[:, 0]))
            med_h = float(np.median(bounds[:, 3] - bounds[:, 2]))
            med = max(min(med_w, med_h), 1e-9)
            target = max(med / 8.0, width / 4096.0)
            level = int(np.clip(np.floor(np.log2(width / target)), 0, 12))
        self.level = level
        n = 1 << level
        self.n_side = n
        self.cw = width / n
        self.ch = height / n
        c0 = np.clip(np.floor((bounds[:, 0] - x0) / self.cw), 0, n - 1).astype(
            np.int64
        )
        c1 = np.clip(np.floor((bounds[:, 1] - x0) / self.cw), 0, n - 1).astype(
            np.int64
        )
        r0 = np.clip(np.floor((bounds[:, 2] - y0) / self.ch), 0, n - 1).astype(
            np.int64
        )
        r1 = np.clip(np.floor((bounds[:, 3] - y0) / self.ch), 0, n - 1).astype(
            np.int64
        )
        w = c1 - c0 + 1
        h = r1 - r0 + 1
        counts = w * h
        total = int(counts.sum())
        item = np.repeat(np.arange(self.n_items, dtype=np.int64), counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ww = w[item]
        col = c0[item] + within % ww
        row = r0[item] + within // ww
        key = row * n + col
        order = np.argsort(key, kind="stable")
        self.sorted_key = key[order]
        self.item_of = item[order]

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, item_idx) candidate pairs: all items whose bbox
        cover-cell contains the point's cell (superset of true bbox
        containment; caller refines)."""
        if self.n_items == 0 or len(px) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        n = self.n_side
        col = np.floor((np.asarray(px) - self.x0) / self.cw)
        row = np.floor((np.asarray(py) - self.y0) / self.ch)
        ok = (col >= 0) & (col < n) & (row >= 0) & (row < n)
        pts = np.flatnonzero(ok)
        key = (row[pts] * n + col[pts]).astype(np.int64)
        lo = np.searchsorted(self.sorted_key, key, side="left")
        hi = np.searchsorted(self.sorted_key, key, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        q = np.repeat(pts, cnt)
        base = np.repeat(lo, cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        return q, self.item_of[base + within]


class STRtree:
    """Static packed R-tree over item bboxes.

    Parameters: ``bounds`` is (N, 4) float64 ``[xmin, xmax, ymin, ymax]``.
    ``query_points`` / ``query_bboxes`` return candidate (query, item)
    index pairs; the caller refines (e.g. exact PIP via
    :func:`rsgislib_ray.functions.geom.pip_pairs`).
    """

    def __init__(self, bounds: np.ndarray, node_capacity: int = _LEAF_CAP):
        bounds = np.ascontiguousarray(bounds, dtype=np.float64)
        if bounds.ndim != 2 or bounds.shape[1] != 4:
            raise ValueError("bounds must be (N, 4) [xmin, xmax, ymin, ymax]")
        self.cap = node_capacity
        self.n_items = len(bounds)
        if self.n_items == 0:
            self.item_order = np.empty(0, dtype=np.int64)
            self.levels: list[tuple[np.ndarray, np.ndarray]] = []
            return
        order = _str_order(bounds, self.cap)
        self.item_order = order  # leaf-packed item ordering
        cur = bounds[order]
        # levels[0] groups packed items; levels[i] groups levels[i-1] nodes.
        self.levels = []
        while True:
            n = len(cur)
            n_nodes = -(-n // self.cap)
            offsets = np.minimum(
                np.arange(n_nodes + 1, dtype=np.int64) * self.cap, n
            )
            nb = np.empty((n_nodes, 4), dtype=np.float64)
            nb[:, 0] = np.minimum.reduceat(cur[:, 0], offsets[:-1])
            nb[:, 1] = np.maximum.reduceat(cur[:, 1], offsets[:-1])
            nb[:, 2] = np.minimum.reduceat(cur[:, 2], offsets[:-1])
            nb[:, 3] = np.maximum.reduceat(cur[:, 3], offsets[:-1])
            self.levels.append((cur, offsets))
            if n_nodes == 1:
                self.root = nb[0]
                break
            if len(self.levels) > 1:
                # upper levels are packed in natural (already spatial) order
                pass
            cur = nb

    @staticmethod
    def _expand(pairs_q: np.ndarray, pairs_n: np.ndarray, offsets: np.ndarray):
        starts = offsets[pairs_n]
        counts = offsets[pairs_n + 1] - starts
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        q = np.repeat(pairs_q, counts)
        base = np.repeat(starts, counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        return q, base + within

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """All (point_idx, item_idx) pairs where the item bbox contains
        the point (closed bounds)."""
        if self.n_items == 0 or len(px) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        q = np.flatnonzero(
            (px >= self.root[0])
            & (px <= self.root[1])
            & (py >= self.root[2])
            & (py <= self.root[3])
        )
        n = np.zeros(len(q), dtype=np.int64)  # everyone starts at root node 0
        for child_bounds, offsets in reversed(self.levels):
            q, c = self._expand(q, n, offsets)
            if len(q) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            b = child_bounds[c]
            keep = (
                (px[q] >= b[:, 0])
                & (px[q] <= b[:, 1])
                & (py[q] >= b[:, 2])
                & (py[q] <= b[:, 3])
            )
            q, n = q[keep], c[keep]
        return q, self.item_order[n]

    def query_bboxes(self, qb: np.ndarray):
        """All (query_idx, item_idx) pairs whose bboxes intersect.
        ``qb`` is (Q, 4) [xmin, xmax, ymin, ymax], closed-bounds
        intersection test (mirrors geometrytools.do_bboxes_intersect,
        /root/reference/python/rsgislib/tools/geometrytools.py:87)."""
        if self.n_items == 0 or len(qb) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        qb = np.asarray(qb, dtype=np.float64)
        hit_root = (
            (qb[:, 1] >= self.root[0])
            & (qb[:, 0] <= self.root[1])
            & (qb[:, 3] >= self.root[2])
            & (qb[:, 2] <= self.root[3])
        )
        q = np.flatnonzero(hit_root)
        n = np.zeros(len(q), dtype=np.int64)
        for child_bounds, offsets in reversed(self.levels):
            q, c = self._expand(q, n, offsets)
            if len(q) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            b = child_bounds[c]
            keep = (
                (qb[q, 1] >= b[:, 0])
                & (qb[q, 0] <= b[:, 1])
                & (qb[q, 3] >= b[:, 2])
                & (qb[q, 2] <= b[:, 3])
            )
            q, n = q[keep], c[keep]
        return q, self.item_order[n]
