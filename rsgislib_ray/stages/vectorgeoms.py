"""Polygon-hole operators and layer-level geometry predicates
(reference ``vectorgeoms/__init__.py``):

- ``get_poly_hole_area``  vectorgeoms/__init__.py:2165
- ``delete_polygon_holes``  vectorgeoms/__init__.py:2041
- ``calc_poly_centroids``  vectorgeoms/__init__.py:1221 (OGR
  ``Centroid()`` == area-weighted outer-minus-holes combination)
- ``rm_polys_area``  vectorgeoms/__init__.py:3416 (geopandas ``.area``
  = outer minus holes; ``less_than`` selects the KEPT mask)
- ``shiftxy_vec_lyr``  vectorgeoms/__init__.py:3157
- ``vec_intersects/touches/overlaps/within/contains_vec``
  vectorgeoms/__init__.py:2670,2946,2737,2804,2875 — ANY-pair layer
  booleans, computed here THROUGH distributed exact pair counting
  (count > 0 == the reference's first-hit break)
- ``vec_crosses_vec``  vectorgeoms/__init__.py:3014 — for two polygon
  layers OGC Crosses is identically false, so the meaningful surface
  is line x polygon; implemented via float Liang-Barsky with the
  expression shapes mirrored by the SQL oracle (exact-int inputs ->
  IEEE-identical divisions both sides)

Data model: polygons are long-form RECT rings — rows
``(fid, ring_id, x0, y0, x1, y1)`` with ``ring_id = 0`` the outer ring
and ``ring_id > 0`` interior holes.  Areas/centroids run through the
generic shoelace kernels in :mod:`rsgislib_ray.functions.geom` over
the 4-corner rings (for axis rects the shoelace float result is
EXACTLY ``(x1-x0)*(y1-y0)`` when every coordinate is an exact binary
fraction — products stay exact in double — which is what the SQL
oracle states in closed form).

Scale: hole ops are zero-shuffle per-row maps (rings of one fid are
kept in one row group by construction; the per-fid combines use
bounded exact partials).  Predicate counting broadcasts the smaller
layer's bounds once (``ray.put`` + per-process cached STRtree) and
streams the big layer through ``map_batches`` — one count row per
batch reaches the driver.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = [
    "rect_ring_xy",
    "hole_areas",
    "delete_polygon_holes",
    "polys_with_area",
    "rm_polys_area",
    "shiftxy",
    "poly_centroids",
    "rect_layer_predicates",
    "line_rect_crosses",
]


def rect_ring_xy(x0, y0, x1, y1) -> np.ndarray:
    """CCW 4-corner ring array [x0,y0, x1,y0, x1,y1, x0,y1]."""
    return np.array([x0, y0, x1, y0, x1, y1, x0, y1], dtype=np.float64)


def _ring_areas_batch(batch: pa.Table) -> np.ndarray:
    """Shoelace area per row of a long-form rect-ring table — the
    :func:`rsgislib_ray.functions.geom.ring_area` summation unrolled
    and vectorized over the 4-corner CCW ring (bit-equal to the scalar
    kernel; asserted in tests).  With binary-fraction coords every
    product and partial sum is exact, so the result equals
    ``(x1-x0)*(y1-y0)`` exactly — the closed form the SQL oracles
    state."""
    x0 = batch["x0"].to_numpy()
    y0 = batch["y0"].to_numpy()
    x1 = batch["x1"].to_numpy()
    y1 = batch["y1"].to_numpy()
    s = (
        (x0 * y0 - x1 * y0)
        + (x1 * y1 - x1 * y0)
        + (x1 * y1 - x0 * y1)
        + (x0 * y0 - x0 * y1)
    )
    return np.abs(0.5 * s)


def hole_areas(rings: ray.data.Dataset) -> ray.data.Dataset:
    """``get_poly_hole_area`` (vectorgeoms:2165): the area of every
    interior ring (OGR builds a polygon from each hole ring and takes
    ``.Area()`` — positive regardless of orientation)."""

    def f(batch: pa.Table) -> pa.Table:
        a = _ring_areas_batch(batch)
        t = pa.table(
            {
                "fid": batch["fid"],
                "ring_id": batch["ring_id"],
                "hole_area": pa.array(a, pa.float64()),
            }
        )
        keep = batch["ring_id"].to_numpy() > 0
        return t.filter(pa.array(keep))

    return rings.map_batches(f, batch_format="pyarrow")


def delete_polygon_holes(
    rings: ray.data.Dataset, area_thres: Optional[float] = None
) -> ray.data.Dataset:
    """``delete_polygon_holes`` (vectorgeoms:2041): keep the outer ring
    always; holes are dropped entirely when ``area_thres`` is None,
    otherwise a hole survives only if its area is STRICTLY greater
    than the threshold (the reference's ``tmp_poly.Area() >
    area_thres``)."""

    def f(batch: pa.Table) -> pa.Table:
        rid = batch["ring_id"].to_numpy()
        if area_thres is None:
            keep = rid == 0
        else:
            a = _ring_areas_batch(batch)
            keep = (rid == 0) | (a > area_thres)
        return batch.filter(pa.array(keep))

    return rings.map_batches(f, batch_format="pyarrow")


def polys_with_area(rings: ray.data.Dataset) -> ray.data.Dataset:
    """Per-polygon area = outer minus holes (geopandas ``.area``
    semantics used by ``rm_polys_area``).  Per-batch grouped combine:
    rings of one fid live in the same generated row span, and every
    per-ring area here is an exact double (binary-fraction rect
    coords), so the signed sum is order-independent."""

    def f(batch: pa.Table) -> pa.Table:
        a = _ring_areas_batch(batch)
        rid = batch["ring_id"].to_numpy()
        fid = batch["fid"].to_numpy()
        signed = np.where(rid == 0, a, -a)
        # group-by fid within the batch (fids are contiguous)
        uf, inv = np.unique(fid, return_inverse=True)
        tot = np.zeros(len(uf), dtype=np.float64)
        np.add.at(tot, inv, signed)
        return pa.table(
            {"fid": pa.array(uf, pa.int64()),
             "area": pa.array(tot, pa.float64())}
        )

    return rings.map_batches(f, batch_format="pyarrow")


def rm_polys_area(
    rings: ray.data.Dataset, area_thres: float, less_than: bool = True
) -> ray.data.Dataset:
    """``rm_polys_area`` (vectorgeoms:3416): KEEP polygons whose
    holes-subtracted area is ``< area_thres`` (``less_than=True``) or
    ``> area_thres`` (both strict, as in the reference masks)."""
    areas = polys_with_area(rings)

    def f(batch: pa.Table) -> pa.Table:
        a = batch["area"].to_numpy()
        keep = a < area_thres if less_than else a > area_thres
        return batch.filter(pa.array(keep))

    return areas.map_batches(f, batch_format="pyarrow")


def shiftxy(
    rings: ray.data.Dataset, x_shift: float, y_shift: float
) -> ray.data.Dataset:
    """``shiftxy_vec_lyr`` (vectorgeoms:3157): translate every
    coordinate."""

    def f(batch: pa.Table) -> pa.Table:
        out = {
            "fid": batch["fid"],
            "ring_id": batch["ring_id"],
            "x0": pa.array(batch["x0"].to_numpy() + x_shift),
            "y0": pa.array(batch["y0"].to_numpy() + y_shift),
            "x1": pa.array(batch["x1"].to_numpy() + x_shift),
            "y1": pa.array(batch["y1"].to_numpy() + y_shift),
        }
        return pa.table(out)

    return rings.map_batches(f, batch_format="pyarrow")


def poly_centroids(rings: ray.data.Dataset) -> ray.data.Dataset:
    """``calc_poly_centroids`` (vectorgeoms:1221): OGR ``Centroid()``
    of a polygon with holes is the signed-area-weighted combination of
    the ring centroids — for rect rings centroid_i = bbox midpoint and
    the combine is ``sum(signed_A*c) / sum(signed_A)`` with one float
    division per axis (all partials exact doubles here)."""

    def f(batch: pa.Table) -> pa.Table:
        a = _ring_areas_batch(batch)
        rid = batch["ring_id"].to_numpy()
        fid = batch["fid"].to_numpy()
        x0 = batch["x0"].to_numpy()
        y0 = batch["y0"].to_numpy()
        x1 = batch["x1"].to_numpy()
        y1 = batch["y1"].to_numpy()
        signed = np.where(rid == 0, a, -a)
        cx = (x0 + x1) / 2.0
        cy = (y0 + y1) / 2.0
        uf, inv = np.unique(fid, return_inverse=True)
        wa = np.zeros(len(uf))
        wx = np.zeros(len(uf))
        wy = np.zeros(len(uf))
        np.add.at(wa, inv, signed)
        np.add.at(wx, inv, signed * cx)
        np.add.at(wy, inv, signed * cy)
        return pa.table(
            {
                "fid": pa.array(uf, pa.int64()),
                "cx": pa.array(wx / wa, pa.float64()),
                "cy": pa.array(wy / wa, pa.float64()),
            }
        )

    return rings.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# layer-level predicates (ANY-pair booleans through exact pair counts)
# ---------------------------------------------------------------------------

def rect_layer_predicates(
    base: ray.data.Dataset, comp_bounds: np.ndarray
) -> pa.Table:
    """Exact pair counts for the rect DE-9IM predicates between a
    streaming base rect layer (cols x0,y0,x1,y1) and a broadcast comp
    bounds array (n,4: x0,x1,y0,y1) — vec_intersects/touches/overlaps/
    within/contains_vec (vectorgeoms:2670,2946,2737,2804,2875).  The
    reference's first-hit break == our ``count > 0``.

    Physical plan: comp bounds ``ray.put`` once, per-process cached
    STRtree, closed-bbox candidate query per batch (touches needs the
    closed test, which :meth:`STRtree.query_bboxes` provides), one
    6-int partial row per batch to the driver."""
    from rsgislib_ray.state.strtree import STRtree

    comp_ref = ray.put(np.ascontiguousarray(comp_bounds, dtype=np.float64))

    def partial(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        cb, tree = cached(comp_ref, lambda b: (b, STRtree(b)))
        bx0 = batch["x0"].to_numpy()
        by0 = batch["y0"].to_numpy()
        bx1 = batch["x1"].to_numpy()
        by1 = batch["y1"].to_numpy()
        qb = np.column_stack([bx0, bx1, by0, by1])
        qi, ci = tree.query_bboxes(qb)
        ax0, ay0, ax1, ay1 = bx0[qi], by0[qi], bx1[qi], by1[qi]
        cx0, cx1, cy0, cy1 = cb[ci, 0], cb[ci, 1], cb[ci, 2], cb[ci, 3]
        inter = (ax0 <= cx1) & (cx0 <= ax1) & (ay0 <= cy1) & (cy0 <= ay1)
        interiors = (ax0 < cx1) & (cx0 < ax1) & (ay0 < cy1) & (cy0 < ay1)
        touches = inter & ~interiors
        within = (ax0 >= cx0) & (ax1 <= cx1) & (ay0 >= cy0) & (ay1 <= cy1)
        contains = (cx0 >= ax0) & (cx1 <= ax1) & (cy0 >= ay0) & (cy1 <= ay1)
        overlaps = interiors & ~within & ~contains
        return pa.table(
            {
                "n_intersects": pa.array([int(inter.sum())], pa.int64()),
                "n_touches": pa.array([int(touches.sum())], pa.int64()),
                "n_overlaps": pa.array([int(overlaps.sum())], pa.int64()),
                "n_within": pa.array([int(within.sum())], pa.int64()),
                "n_contains": pa.array([int(contains.sum())], pa.int64()),
            }
        )

    parts = base.map_batches(partial, batch_format="pyarrow").to_pandas()
    sums = parts.sum()
    cols = ["n_intersects", "n_touches", "n_overlaps", "n_within",
            "n_contains"]
    out = {c: pa.array([int(sums[c])], pa.int64()) for c in cols}
    for c in cols:
        out[c.replace("n_", "any_")] = pa.array([bool(sums[c] > 0)])
    return pa.table(out)


def line_rect_crosses(
    lines: ray.data.Dataset, rect_bounds: np.ndarray
) -> pa.Table:
    """``vec_crosses_vec`` (vectorgeoms:3014) for a LINE base layer
    against a polygon (rect) comp layer — OGC Crosses(line, poly):
    the line's interior meets the rect's interior AND the line is not
    entirely inside the closed rect.

    Liang-Barsky in FLOAT with the exact expression shapes the SQL
    oracle replays: t-bounds ``(r - p) / d`` (inputs are exact ints so
    both engines produce the identical IEEE quotient), entry/exit
    ``t0 = max(tx0, ty0, 0)``, ``t1 = min(tx1, ty1, 1)``, interior
    test via the clip MIDPOINT strictly inside (a degenerate
    boundary-graze has an empty open clip and fails it).  Requires
    dx > 0 and dy > 0 (fixture contract; avoids the div-by-zero
    branch DuckDB would NULL out — documented limitation)."""
    from rsgislib_ray.state.strtree import STRtree

    rect_ref = ray.put(np.ascontiguousarray(rect_bounds, dtype=np.float64))

    def partial(batch: pa.Table) -> pa.Table:
        from rsgislib_ray.state.broadcast import cached

        rb, tree = cached(rect_ref, lambda b: (b, STRtree(b)))
        px = batch["px"].to_numpy()
        py = batch["py"].to_numpy()
        qx = batch["qx"].to_numpy()
        qy = batch["qy"].to_numpy()
        qb = np.column_stack(
            [np.minimum(px, qx), np.maximum(px, qx),
             np.minimum(py, qy), np.maximum(py, qy)]
        )
        qi, ci = tree.query_bboxes(qb)
        p_x, p_y = px[qi], py[qi]
        dx, dy = qx[qi] - p_x, qy[qi] - p_y
        rx0, rx1, ry0, ry1 = rb[ci, 0], rb[ci, 1], rb[ci, 2], rb[ci, 3]
        tx0 = (rx0 - p_x) / dx
        tx1 = (rx1 - p_x) / dx
        ty0 = (ry0 - p_y) / dy
        ty1 = (ry1 - p_y) / dy
        t0 = np.maximum(np.maximum(tx0, ty0), 0.0)
        t1 = np.minimum(np.minimum(tx1, ty1), 1.0)
        tm = (t0 + t1) / 2.0
        mx = p_x + tm * dx
        my = p_y + tm * dy
        interior = (
            (t1 > t0)
            & (mx > rx0) & (mx < rx1) & (my > ry0) & (my < ry1)
        )
        crosses = interior & ((t0 > 0.0) | (t1 < 1.0))
        return pa.table({"n_crosses": pa.array([int(crosses.sum())],
                                               pa.int64())})

    parts = lines.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n_crosses"].sum())
    return pa.table(
        {"n_crosses": pa.array([n], pa.int64()),
         "any_crosses": pa.array([n > 0])}
    )
