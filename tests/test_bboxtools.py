"""functions/bboxtools.py vs direct transcriptions of the reference
scalar helpers (tools/geometrytools.py:87-670)."""

import math

import numpy as np

from rsgislib_ray.functions import bboxtools as bt


# --- direct transcriptions ------------------------------------------------

def _ref_find_extent_on_grid(e, grid, full_contain):
    xMin, xMax, yMin, yMax = e
    xMin_floor = int(math.floor(xMin))
    yMax_ceil = int(math.ceil(yMax))
    n_x = math.floor((xMin - xMin_floor) / grid)
    n_y = math.floor((yMax_ceil - yMax) / grid)
    xMinOut = xMin_floor + n_x * grid
    yMaxOut = yMax_ceil - n_y * grid
    diffX = xMax - xMinOut
    diffY = abs(yMaxOut - yMin)
    if full_contain:
        nX, nY = math.ceil(diffX / grid), math.ceil(diffY / grid)
    else:
        nX, nY = math.floor(diffX / grid), math.floor(diffY / grid)
    return (xMinOut, xMinOut + nX * grid, yMaxOut - nY * grid, yMaxOut)


def _ref_find_extent_whole(e, grid, full_contain):
    xMin, xMax, yMin, yMax = e
    xMinOut = math.floor(xMin / grid) * grid
    yMinOut = math.floor(yMin / grid) * grid
    diffX = xMax - xMinOut
    diffY = abs(yMax - yMinOut)
    if full_contain:
        nX, nY = math.ceil(diffX / grid), math.ceil(diffY / grid)
    else:
        nX, nY = math.floor(diffX / grid), math.floor(diffY / grid)
    return (xMinOut, xMinOut + nX * grid, yMinOut, yMinOut + nY * grid)


def _ref_common_extent(base, grid, other, full_contain):
    x0, x1, y0, y1 = base
    if other[0] > x0:
        d = (math.floor if full_contain else math.ceil)(
            (other[0] - x0) / grid) * grid
        x0 = x0 + d
    if other[1] < x1:
        d = (math.floor if full_contain else math.ceil)(
            (x1 - other[1]) / grid) * grid
        x1 = x1 - d
    if other[2] > y0:
        d = (math.floor if full_contain else math.ceil)(
            abs(other[2] - y0) / grid) * grid
        y0 = y0 + d
    if other[3] < y1:
        d = (math.floor if full_contain else math.ceil)(
            abs(y1 - other[3]) / grid) * grid
        y1 = y1 - d
    return (x0, x1, y0, y1)


def _rand_bboxes(rng, n):
    x0 = rng.integers(0, 80, n) + rng.integers(0, 4, n) * 0.25
    y0 = rng.integers(0, 80, n) + rng.integers(0, 4, n) * 0.25
    w = rng.integers(1, 10, n) + rng.integers(0, 4, n) * 0.25
    h = rng.integers(1, 10, n) + rng.integers(0, 4, n) * 0.25
    return (x0.astype(float), (x0 + w).astype(float),
            y0.astype(float), (y0 + h).astype(float))


def test_grid_helpers_match_reference_transcription():
    rng = np.random.default_rng(11)
    n = 300
    a = _rand_bboxes(rng, n)
    b = _rand_bboxes(rng, n)
    fc = rng.integers(0, 2, n).astype(bool)
    g = bt.find_extent_on_grid(a, 0.5, fc)
    w = bt.find_extent_on_whole_num_grid(a, 2.0, fc)
    e = bt.find_common_extent_on_grid(a, 0.5, b, fc)
    for i in range(n):
        ai = tuple(c[i] for c in a)
        bi = tuple(c[i] for c in b)
        assert tuple(c[i] for c in g) == _ref_find_extent_on_grid(
            ai, 0.5, bool(fc[i]))
        assert tuple(c[i] for c in w) == _ref_find_extent_whole(
            ai, 2.0, bool(fc[i]))
        assert tuple(c[i] for c in e) == _ref_common_extent(
            ai, 0.5, bi, bool(fc[i]))


def test_predicates_and_unwrap():
    a = (np.array([0.0, 0.0]), np.array([10.0, 10.0]),
         np.array([0.0, 0.0]), np.array([10.0, 10.0]))
    # edge-touching bbox does NOT intersect (strict >)
    b = (np.array([10.0, 5.0]), np.array([20.0, 15.0]),
         np.array([0.0, 0.0]), np.array([10.0, 10.0]))
    assert list(bt.bboxes_intersect(a, b)) == [False, True]
    ix = bt.bbox_intersection(a, b)
    assert ix[0][1] == 5.0 and ix[1][1] == 10.0
    # point on the edge IS in (closed)
    assert bool(bt.pt_in_bbox(np.array([10.0]), np.array([0.0]),
                              tuple(c[:1] for c in a))[0])
    # unwrap: xMax < xMin splits
    idx, part, x0, x1, y0, y1 = bt.unwrap_wgs84_bbox(
        (np.array([170.0, -30.0]), np.array([-170.0, 30.0]),
         np.array([0.0, 0.0]), np.array([5.0, 5.0])))
    assert list(idx) == [0, 0, 1] and list(part) == [0, 1, 0]
    assert (x0[0], x1[0]) == (-180.0, -170.0)
    assert (x0[1], x1[1]) == (170.0, 180.0)
    assert (x0[2], x1[2]) == (-30.0, 30.0)


def test_snap_point():
    a = (np.array([2.25]), np.array([9.0]), np.array([1.0]),
         np.array([8.75]))
    px, py = np.array([5.1]), np.array([4.2])
    sx, sy = bt.find_point_on_whole_num_grid(px, py, a, 0.5, 0.5)
    assert sx[0] == 2.25 + math.ceil((5.1 - 2.25) / 0.5) * 0.5
    assert sy[0] == 8.75 - math.ceil((8.75 - 4.2) / 0.5) * 0.5
