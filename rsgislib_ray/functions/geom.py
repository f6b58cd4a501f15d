"""Vectorized planar geometry kernels (numpy, no GDAL/shapely).

The reference delegates point-in-polygon work to GDAL rasterization
(/root/reference/python/rsgislib/zonalstats/__init__.py:421-430) and to
geopandas/rtree (vectorattrs/__init__.py:1229-1307). Here geometry is
numpy over Arrow buffers: rings are flat ``[x1, y1, x2, y2, ...]``
float64 arrays (closure implicit — the edge last->first is always
included), polygon sets are (ring_xy, ring_offsets) in the classic
Arrow list layout.

PIP uses even-odd ray crossing with the half-open edge rule
(``(y1 > y) != (y2 > y)``), which makes point sets partition cleanly
across polygons sharing an edge; boundary points are assigned
deterministically, not duplicated.
"""

from __future__ import annotations

import numpy as np


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    xs = ring[0::2]
    ys = ring[1::2]
    return float(xs.min()), float(xs.max()), float(ys.min()), float(ys.max())


def rings_bbox(
    ring_xy: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized envelopes for a polygon set in Arrow list layout.

    ``offsets`` are COORD-PAIR offsets (len = n_polys + 1) into
    ``ring_xy`` viewed as (n_pairs, 2). Mirrors
    vectorattrs.pop_bbox_cols (/root/reference/.../vectorattrs/__init__.py:278).
    """
    pts = ring_xy.reshape(-1, 2)
    xs, ys = pts[:, 0], pts[:, 1]
    xmin = np.minimum.reduceat(xs, offsets[:-1])
    xmax = np.maximum.reduceat(xs, offsets[:-1])
    ymin = np.minimum.reduceat(ys, offsets[:-1])
    ymax = np.maximum.reduceat(ys, offsets[:-1])
    return xmin, xmax, ymin, ymax


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray-crossing PIP of many points against ONE ring.

    Vectorized over points x edges; rings in this engine are small
    (tens of vertices) so the (P, E) broadcast is cheap. Returns bool.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = ring[0::2]
    ys = ring[1::2]
    # Drop an explicit closing vertex so the implicit closure edge
    # isn't counted twice.
    if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs = xs[:-1]
        ys = ys[:-1]
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    p_y = py[:, None]
    p_x = px[:, None]
    crosses = (y1[None, :] > p_y) != (y2[None, :] > p_y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x1[None, :] + (p_y - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[
            None, :
        ]
    hits = crosses & (p_x < x_at)
    return hits.sum(axis=1) % 2 == 1


def pip_pairs(
    px: np.ndarray,
    py: np.ndarray,
    ring_xy: np.ndarray,
    ring_offsets: np.ndarray,
    pair_pt: np.ndarray,
    pair_poly: np.ndarray,
) -> np.ndarray:
    """PIP refinement over candidate (point, polygon) pairs.

    Groups the pairs by polygon and runs :func:`points_in_ring` once per
    distinct polygon with all its candidate points — the refine step
    after an STRtree/cell candidate pass. Returns bool per pair.
    """
    out = np.zeros(len(pair_pt), dtype=bool)
    if len(pair_pt) == 0:
        return out
    order = np.argsort(pair_poly, kind="stable")
    sp = pair_poly[order]
    bounds = np.flatnonzero(np.diff(sp)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(sp)]])
    for s, e in zip(starts, ends):
        poly = int(sp[s])
        idx = order[s:e]
        ring = ring_xy[2 * ring_offsets[poly] : 2 * ring_offsets[poly + 1]]
        out[idx] = points_in_ring(px[pair_pt[idx]], py[pair_pt[idx]], ring)
    return out


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = counter-clockwise). Mirrors the
    scalar geometry helpers (vectorattrs/__init__.py:1873)."""
    xs = ring[0::2]
    ys = ring[1::2]
    return 0.5 * float(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))


def ring_perimeter(ring: np.ndarray) -> float:
    xs = ring[0::2]
    ys = ring[1::2]
    if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    dx = np.roll(xs, -1) - xs
    dy = np.roll(ys, -1) - ys
    return float(np.sum(np.hypot(dx, dy)))


def ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted polygon centroid (falls back to vertex mean for
    degenerate zero-area rings)."""
    xs = ring[0::2]
    ys = ring[1::2]
    if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    cross = xs * y2 - x2 * ys
    a = cross.sum() / 2.0
    if a == 0.0:
        return float(xs.mean()), float(ys.mean())
    cx = float(((xs + x2) * cross).sum() / (6.0 * a))
    cy = float(((ys + y2) * cross).sum() / (6.0 * a))
    return cx, cy


def rect_ring(xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    """Axis-aligned rectangle as a CCW ring (test/fixture helper)."""
    return np.asarray(
        [xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax], dtype=np.float64
    )


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman clipping: ``subject`` (any simple ring)
    clipped against a CONVEX CCW ``clip`` ring. Both are flat
    [x1, y1, ...] arrays; returns the clipped ring (possibly empty).
    This is the polygon-clipping core of the overlay family
    (/root/reference/python/rsgislib/vectorgeoms/__init__.py:1292
    geopandas overlay); rect zones are convex, so zone-vs-anything
    intersection is exact."""
    sx = list(subject[0::2])
    sy = list(subject[1::2])
    if len(sx) > 1 and sx[0] == sx[-1] and sy[0] == sy[-1]:
        sx, sy = sx[:-1], sy[:-1]
    cx = clip[0::2]
    cy = clip[1::2]
    if len(cx) > 1 and cx[0] == cx[-1] and cy[0] == cy[-1]:
        cx, cy = cx[:-1], cy[:-1]
    n = len(cx)
    for i in range(n):
        ex1, ey1 = cx[i], cy[i]
        ex2, ey2 = cx[(i + 1) % n], cy[(i + 1) % n]
        if not sx:
            break
        nx_, ny_ = [], []
        m = len(sx)
        for j in range(m):
            px1, py1 = sx[j], sy[j]
            px2, py2 = sx[(j + 1) % m], sy[(j + 1) % m]
            in1 = (ex2 - ex1) * (py1 - ey1) - (ey2 - ey1) * (px1 - ex1) >= 0
            in2 = (ex2 - ex1) * (py2 - ey1) - (ey2 - ey1) * (px2 - ex1) >= 0
            if in1:
                nx_.append(px1)
                ny_.append(py1)
            if in1 != in2:
                # solve cross(e2-e1, p1 + t (p2-p1) - e1) = 0
                den = (ex2 - ex1) * (py2 - py1) - (ey2 - ey1) * (px2 - px1)
                if den != 0:
                    num = (ex2 - ex1) * (py1 - ey1) - (ey2 - ey1) * (px1 - ex1)
                    t = -num / den
                    nx_.append(px1 + t * (px2 - px1))
                    ny_.append(py1 + t * (py2 - py1))
        sx, sy = nx_, ny_
    out = np.empty(2 * len(sx))
    out[0::2] = sx
    out[1::2] = sy
    return out
