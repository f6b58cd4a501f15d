"""Grid tiling — replicates the reference's tile layout exactly.

The reference builds tile grids with
``rsgislib.tools.geometrytools.get_bbox_grid``
(/root/reference/python/rsgislib/tools/geometrytools.py:478-538):
row-major from the bbox's ymin upward, ``floor(extent/size)`` full
tiles per axis, a remainder COLUMN appended after each row when the
x-residual > 1e-6, and a remainder ROW appended on top when the
y-residual > 1e-6 (each remainder row again ends with its remainder
corner tile). Tile-assignment equality against that layout is part of
the north rule, so :class:`TileSpec.assign` reproduces the list index
of the covering bbox for any point, treating tiles as half-open
[xmin, xmax) x [ymin, ymax) and points outside the bbox as -1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

_RESIDUAL_EPS = 0.000001  # geometrytools.py:509,512 residual threshold


def bbox_grid(
    bbox: tuple[float, float, float, float], x_size: float, y_size: float
) -> list[tuple[float, float, float, float]]:
    """List of tile bboxes (xMin, xMax, yMin, yMax) in the reference's
    order (geometrytools.py:493-538): bottom-up row-major, remainder
    column per row, remainder row last."""
    xmin, xmax, ymin, ymax = bbox
    width = xmax - xmin
    height = ymax - ymin
    n_x = math.floor(width / x_size)
    n_y = math.floor(height / y_size)
    x_rem = width - n_x * x_size
    if x_rem < _RESIDUAL_EPS:
        x_rem = 0.0
    y_rem = height - n_y * y_size
    if y_rem < _RESIDUAL_EPS:
        y_rem = 0.0

    boxes: list[tuple[float, float, float, float]] = []
    c_min_y = ymin
    c_max_y = c_min_y + y_size
    for _ny in range(n_y):
        c_min_x = xmin
        c_max_x = c_min_x + x_size
        for _nx in range(n_x):
            boxes.append((c_min_x, c_max_x, c_min_y, c_max_y))
            c_min_x = c_max_x
            c_max_x = c_max_x + x_size
        if x_rem > 0:
            boxes.append((c_min_x, c_min_x + x_rem, c_min_y, c_max_y))
        c_min_y = c_max_y
        c_max_y = c_max_y + y_size
    if y_rem > 0:
        c_max_y = c_min_y + y_rem
        c_min_x = xmin
        c_max_x = c_min_x + x_size
        for _nx in range(n_x):
            boxes.append((c_min_x, c_max_x, c_min_y, c_max_y))
            c_min_x = c_max_x
            c_max_x = c_max_x + x_size
        if x_rem > 0:
            boxes.append((c_min_x, c_min_x + x_rem, c_min_y, c_max_y))
    return boxes


@dataclass(frozen=True)
class TileSpec:
    """Closed-form tile assignment equal to ``bbox_grid`` list indexes.

    ``n_cols = n_x + (1 if x_rem else 0)`` and the list is row-major
    bottom-up, so ``tile_id = row * n_cols + col`` with
    ``col = floor((x - xmin)/x_size)`` (the remainder column naturally
    gets ``col == n_x`` because its width < x_size). Points outside
    [xmin, xmax) x [ymin, ymax) -> -1.
    """

    bbox: tuple[float, float, float, float]
    x_size: float
    y_size: float
    n_x: int = field(init=False)
    n_y: int = field(init=False)
    x_rem: float = field(init=False)
    y_rem: float = field(init=False)
    n_cols: int = field(init=False)
    n_rows: int = field(init=False)

    def __post_init__(self) -> None:
        xmin, xmax, ymin, ymax = self.bbox
        width = xmax - xmin
        height = ymax - ymin
        n_x = math.floor(width / self.x_size)
        n_y = math.floor(height / self.y_size)
        x_rem = width - n_x * self.x_size
        y_rem = height - n_y * self.y_size
        object.__setattr__(self, "n_x", n_x)
        object.__setattr__(self, "n_y", n_y)
        object.__setattr__(self, "x_rem", 0.0 if x_rem < _RESIDUAL_EPS else x_rem)
        object.__setattr__(self, "y_rem", 0.0 if y_rem < _RESIDUAL_EPS else y_rem)
        object.__setattr__(self, "n_cols", n_x + (1 if self.x_rem > 0 else 0))
        object.__setattr__(self, "n_rows", n_y + (1 if self.y_rem > 0 else 0))

    @property
    def n_tiles(self) -> int:
        return self.n_cols * self.n_rows

    def tiles(self) -> list[tuple[float, float, float, float]]:
        return bbox_grid(self.bbox, self.x_size, self.y_size)

    def assign(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized point -> tile_id (int64; -1 outside the bbox)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        xmin, xmax, ymin, ymax = self.bbox
        col = np.floor((x - xmin) / self.x_size)
        row = np.floor((y - ymin) / self.y_size)
        inside = (x >= xmin) & (x < xmax) & (y >= ymin) & (y < ymax)
        # Clamp: a point in the remainder strip already floors into
        # col == n_x / row == n_y; values beyond n_cols-1 can only
        # happen for out-of-bbox points which `inside` masks out.
        col = np.clip(col, 0, self.n_cols - 1).astype(np.int64)
        row = np.clip(row, 0, self.n_rows - 1).astype(np.int64)
        tid = row * np.int64(self.n_cols) + col
        return np.where(inside, tid, np.int64(-1))

    def tile_bounds(self, tile_id: np.ndarray) -> tuple[np.ndarray, ...]:
        """tile_id -> (xmin, xmax, ymin, ymax); matches bbox_grid values
        up to float accumulation (bbox_grid accumulates by repeated
        addition; this uses multiplication — differences < 1e-9 at sane
        tile counts, and the ASSIGNMENT is what must match exactly)."""
        tid = np.asarray(tile_id, dtype=np.int64)
        row, col = np.divmod(tid, self.n_cols)
        bxmin, bxmax, bymin, bymax = self.bbox
        xmin = bxmin + col * self.x_size
        ymin = bymin + row * self.y_size
        xmax = np.where(
            (self.x_rem > 0) & (col == self.n_x), xmin + self.x_rem, xmin + self.x_size
        )
        ymax = np.where(
            (self.y_rem > 0) & (row == self.n_y), ymin + self.y_rem, ymin + self.y_size
        )
        return xmin, np.minimum(xmax, bxmax), ymin, np.minimum(ymax, bymax)


# ---------------------------------------------------------------------------
# Hexagonal grids (create_hex_grid_bbox / _polys,
# /root/reference/python/rsgislib/vectorutils/createvectors.py:1237,1346)
# ---------------------------------------------------------------------------

_SQRT3 = np.sqrt(3.0)


def hex_centers(
    bbox: tuple[float, float, float, float], size: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pointy-top hex grid covering the bbox: returns (hex_id, cx, cy).
    ``size`` is the center-to-vertex radius; ids are row-major
    ``r * 100000 + q`` axial keys offset to stay positive."""
    xmin, xmax, ymin, ymax = bbox
    w = _SQRT3 * size          # horizontal center spacing
    h = 1.5 * size             # vertical center spacing
    r0 = int(np.floor(ymin / h)) - 1
    r1 = int(np.ceil(ymax / h)) + 1
    rows = np.arange(r0, r1 + 1)
    ids, cxs, cys = [], [], []
    for r in rows:
        cy = r * h
        xoff = (r % 2) * (w / 2.0)
        q0 = int(np.floor((xmin - xoff) / w)) - 1
        q1 = int(np.ceil((xmax - xoff) / w)) + 1
        qs = np.arange(q0, q1 + 1)
        cx = qs * w + xoff
        keep = (cx >= xmin - w) & (cx <= xmax + w) & (cy >= ymin - h) & (cy <= ymax + h)
        ids.append((r + 50000) * np.int64(100000) + (qs[keep] + 50000))
        cxs.append(cx[keep])
        cys.append(np.full(keep.sum(), cy))
    return (
        np.concatenate(ids),
        np.concatenate(cxs),
        np.concatenate(cys),
    )


def assign_hex(
    x: np.ndarray, y: np.ndarray, size: float
) -> np.ndarray:
    """Point -> pointy-top hex id via axial-coordinate cube rounding
    (equivalent to nearest hex center; tested against the brute
    nearest-center oracle). Matches the id scheme of :func:`hex_centers`."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # axial coords for pointy-top hexes with the offset row layout used
    # by hex_centers: recover (row, col) of the nearest center directly
    h = 1.5 * size
    w = _SQRT3 * size
    # candidate rows: floor and ceil of y/h
    r_lo = np.floor(y / h).astype(np.int64)
    best_d = np.full(len(x), np.inf)
    best_id = np.zeros(len(x), dtype=np.int64)
    for dr in (0, 1):
        r = r_lo + dr
        cy = r * h
        xoff = (r % 2) * (w / 2.0)
        for dq in (0, 1):
            q = np.floor((x - xoff) / w).astype(np.int64) + dq
            cx = q * w + xoff
            d = (x - cx) ** 2 + (y - cy) ** 2
            better = d < best_d
            best_d = np.where(better, d, best_d)
            hex_id = (r + 50000) * np.int64(100000) + (q + 50000)
            best_id = np.where(better, hex_id, best_id)
    return best_id


def hex_polygons(
    bbox: tuple[float, float, float, float], size: float
) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """Materialize the pointy-top hex POLYGON vertices for every hex of
    :func:`hex_centers` (create_hex_grid emits polygon features,
    /root/reference/python/rsgislib/vectorutils/createvectors.py:1237,
    1346 — centers alone were the v1 contract). Returns flat arrays
    (hex_id, vertex_id 0..5, vx, vy); vertex k sits at angle
    pi/6 + k*pi/3 from the center (pointy-top)."""
    ids, cxs, cys = hex_centers(bbox, size)
    n = len(ids)
    k = np.arange(6, dtype=np.int64)
    ang = np.pi / 6 + k * (np.pi / 3)
    vx = (cxs[:, None] + size * np.cos(ang)[None, :]).ravel()
    vy = (cys[:, None] + size * np.sin(ang)[None, :]).ravel()
    return (
        np.repeat(ids, 6),
        np.tile(k, n),
        vx,
        vy,
    )
