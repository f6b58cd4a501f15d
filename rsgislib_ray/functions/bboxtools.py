"""Vectorized bbox utilities (reference ``tools/geometrytools.py``).
BBoxes use the reference's (xMin, xMax, yMin, yMax) layout, passed here
as four parallel numpy arrays.  All helpers are pure elementwise
float math whose expression shapes the SQL oracles replay verbatim
(fixtures use binary-fraction coords so FLOOR/CEIL of the exact
quotients agree bitwise).

Reference surface:
- ``do_bboxes_intersect``  tools/geometrytools.py:87 (STRICT >)
- ``does_bbox_contain``  :112
- ``calc_bbox_area``  :137
- ``bbox_equal``  :151
- ``bbox_intersection``  :174 (caller guarantees intersection)
- ``buffer_bbox``  :231
- ``find_bbox_union``  :250 (pairwise min/max)
- ``unwrap_wgs84_bbox``  :280
- ``find_common_extent_on_grid``  :301
- ``find_extent_on_grid``  :360
- ``find_extent_on_whole_num_grid``  :416
- ``get_bbox_centre_pt``  :570
- ``pt_in_bbox``  :650 (closed)
- ``find_point_on_whole_num_grid``  :670
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bboxes_intersect",
    "bbox_contains",
    "bbox_area",
    "bbox_equal",
    "bbox_intersection",
    "buffer_bbox",
    "bbox_union_pair",
    "bbox_centre",
    "pt_in_bbox",
    "find_extent_on_grid",
    "find_extent_on_whole_num_grid",
    "find_common_extent_on_grid",
    "find_point_on_whole_num_grid",
    "unwrap_wgs84_bbox",
]


def bboxes_intersect(a, b):
    """STRICT intersection test (geometrytools:87 uses ``>``, so
    edge-touching bboxes do NOT intersect — unlike the closed STRtree
    test)."""
    return (a[1] > b[0]) & (b[1] > a[0]) & (a[3] > b[2]) & (b[3] > a[2])


def bbox_contains(a, b):
    return (a[0] <= b[0]) & (a[1] >= b[1]) & (a[2] <= b[2]) & (a[3] >= b[3])


def bbox_area(a):
    return (a[1] - a[0]) * (a[3] - a[2])


def bbox_equal(a, b):
    return (a[0] == b[0]) & (a[1] == b[1]) & (a[2] == b[2]) & (a[3] == b[3])


def bbox_intersection(a, b):
    """Overlap bbox (geometrytools:174); caller guarantees the pair
    intersects (the reference raises otherwise)."""
    return (
        np.maximum(a[0], b[0]),
        np.minimum(a[1], b[1]),
        np.maximum(a[2], b[2]),
        np.minimum(a[3], b[3]),
    )


def buffer_bbox(a, buf):
    return (a[0] - buf, a[1] + buf, a[2] - buf, a[3] + buf)


def bbox_union_pair(a, b):
    return (
        np.minimum(a[0], b[0]),
        np.maximum(a[1], b[1]),
        np.minimum(a[2], b[2]),
        np.maximum(a[3], b[3]),
    )


def bbox_centre(a):
    """get_bbox_centre_pt (geometrytools:570):
    min + (max - min)/2 per axis."""
    return (a[0] + (a[1] - a[0]) / 2.0, a[2] + (a[3] - a[2]) / 2.0)


def pt_in_bbox(px, py, a):
    """Closed containment (geometrytools:650)."""
    return (px >= a[0]) & (px <= a[1]) & (py >= a[2]) & (py <= a[3])


def find_extent_on_grid(a, grid, full_contain):
    """geometrytools:360 — anchor xMin to floor(xMin) + whole grid
    cells, yMax to ceil(yMax) - whole cells, then extend (ceil) or
    shrink (floor) the counts to cover xMax / yMin."""
    x_min, x_max, y_min, y_max = a
    x_min_floor = np.floor(x_min)
    y_max_ceil = np.ceil(y_max)
    nx = np.floor((x_min - x_min_floor) / grid)
    ny = np.floor((y_max_ceil - y_max) / grid)
    x_min_out = x_min_floor + nx * grid
    y_max_out = y_max_ceil - ny * grid
    diff_x = x_max - x_min_out
    diff_y = np.abs(y_max_out - y_min)
    n_px = np.where(full_contain, np.ceil(diff_x / grid),
                    np.floor(diff_x / grid))
    n_py = np.where(full_contain, np.ceil(diff_y / grid),
                    np.floor(diff_y / grid))
    return (x_min_out, x_min_out + n_px * grid,
            y_max_out - n_py * grid, y_max_out)


def find_extent_on_whole_num_grid(a, grid, full_contain):
    """geometrytools:416 (round_vals=None path)."""
    x_min, x_max, y_min, y_max = a
    x_min_out = np.floor(x_min / grid) * grid
    y_min_out = np.floor(y_min / grid) * grid
    diff_x = x_max - x_min_out
    diff_y = np.abs(y_max - y_min_out)
    n_px = np.where(full_contain, np.ceil(diff_x / grid),
                    np.floor(diff_x / grid))
    n_py = np.where(full_contain, np.ceil(diff_y / grid),
                    np.floor(diff_y / grid))
    return (x_min_out, x_min_out + n_px * grid,
            y_min_out, y_min_out + n_py * grid)


def find_common_extent_on_grid(base, grid, other, full_contain):
    """geometrytools:301 — clip base to other, moving each edge by a
    whole number of grid cells (floor keeps the intersection fully
    contained; ceil keeps the output inside the intersection)."""
    bx0, bx1, by0, by1 = base
    ox0, ox1, oy0, oy1 = other

    def steps(d):
        return np.where(full_contain, np.floor(d / grid),
                        np.ceil(d / grid)) * grid

    x0 = np.where(ox0 > bx0, bx0 + steps(ox0 - bx0), bx0)
    x1 = np.where(ox1 < bx1, bx1 - steps(bx1 - ox1), bx1)
    y0 = np.where(oy0 > by0, by0 + steps(np.abs(oy0 - by0)), by0)
    y1 = np.where(oy1 < by1, by1 - steps(np.abs(by1 - oy1)), by1)
    return (x0, x1, y0, y1)


def find_point_on_whole_num_grid(px, py, a, x_res, y_res):
    """geometrytools:670 — snap a point (inside ``a``; the reference
    raises otherwise) onto the grid anchored at (xMin, yMax): ceil
    whole cells right of xMin / below yMax."""
    n_x = np.ceil((px - a[0]) / x_res)
    n_y = np.ceil((a[3] - py) / y_res)
    return a[0] + n_x * x_res, a[3] - n_y * y_res


def unwrap_wgs84_bbox(a):
    """geometrytools:280 — a bbox with xMax < xMin wraps the ±180
    boundary and splits into (-180, xMax, ...) + (xMin, 180, ...).
    Returns (part_id, x0, x1, y0, y1) long-form arrays (part_id 0 =
    the original / western part, 1 = the eastern part of a wrapped
    bbox)."""
    x0, x1, y0, y1 = a
    wrapped = x1 < x0
    n = len(x0)
    reps = np.where(wrapped, 2, 1)
    idx = np.repeat(np.arange(n), reps)
    part = np.arange(len(idx)) - np.repeat(
        np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
    )
    w = wrapped[idx]
    out_x0 = np.where(w & (part == 0), -180.0, x0[idx])
    out_x1 = np.where(w & (part == 1), 180.0, x1[idx])
    return idx, part, out_x0, out_x1, y0[idx], y1[idx]


def get_bbox_wkt_poly(bbox) -> str:
    """WKT polygon string from a bbox (tools/geometrytools.py:701).

    The ring starts at the BOTTOM-LEFT corner and runs
    counter-clockwise (BL BR TR TL BL) — the opposite corner order to
    the GeoJSON builder below; coordinates are Python str(float)."""
    return (
        f"POLYGON (({bbox[0]} {bbox[2]}, "
        f"{bbox[1]} {bbox[2]}, "
        f"{bbox[1]} {bbox[3]}, "
        f"{bbox[0]} {bbox[3]}, "
        f"{bbox[0]} {bbox[2]}))"
    )


def get_bbox_geojson_poly(bbox) -> dict:
    """GeoJSON polygon dict from a bbox (tools/geometrytools.py:546).

    The ring starts at the TOP-LEFT corner and runs clockwise
    (TL TR BR BL TL) — reversed orientation vs the WKT builder, a
    reference quirk both this function and the oracle pin."""
    bbox_poly = dict()
    bbox_poly["coordinates"] = list()
    bbox_poly["coordinates"].append([])
    bbox_poly["coordinates"][0].append([bbox[0], bbox[3]])  # TL
    bbox_poly["coordinates"][0].append([bbox[1], bbox[3]])  # TR
    bbox_poly["coordinates"][0].append([bbox[1], bbox[2]])  # BR
    bbox_poly["coordinates"][0].append([bbox[0], bbox[2]])  # BL
    bbox_poly["coordinates"][0].append([bbox[0], bbox[3]])  # TL
    bbox_poly["type"] = "Polygon"
    return bbox_poly
