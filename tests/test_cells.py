"""Unit tests for the quadkey cell index (pure numpy, no Ray)."""

import numpy as np
import pytest

from rsgislib_ray.functions import cells as C


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    for level in (0, 1, 5, 12, 26):
        n = 1 << level
        col = rng.integers(0, n, 200)
        row = rng.integers(0, n, 200)
        cid = C.encode_rowcol(col, row, level)
        assert np.all(C.decode_level(cid) == level)
        c2, r2 = C.decode_rowcol(cid)
        np.testing.assert_array_equal(c2, col)
        np.testing.assert_array_equal(r2, row)


def test_cells_from_xy_matches_floor_formula():
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 100, 1000)
    y = rng.uniform(0, 100, 1000)
    level = 10
    cid = C.cells_from_xy(x, y, level)
    cw = 100.0 / (1 << level)
    col, row = C.decode_rowcol(cid)
    np.testing.assert_array_equal(col, np.floor(x / cw).astype(np.int64))
    np.testing.assert_array_equal(row, np.floor(y / cw).astype(np.int64))


def test_out_of_frame_and_origin():
    cid = C.cells_from_xy(
        np.array([-0.001, 0.0, 99.999, 100.0, 150.0]),
        np.array([50.0, 0.0, 50.0, 50.0, 50.0]),
        8,
    )
    assert cid[0] == C.OUT_OF_FRAME
    assert cid[1] >= 0  # origin is inside (half-open frame)
    assert cid[2] >= 0
    assert cid[3] == C.OUT_OF_FRAME  # x == width -> outside
    assert cid[4] == C.OUT_OF_FRAME


def test_parent_child():
    cid = C.cells_from_xy(np.array([33.3]), np.array([66.6]), 12)
    p = C.parent(cid)
    assert C.decode_level(p)[0] == 11
    kids = C.children(int(p[0]))
    assert int(cid[0]) in kids.tolist()
    # parent bounds contain child bounds
    pxmin, pxmax, pymin, pymax = C.cell_bounds(p)
    cxmin, cxmax, cymin, cymax = C.cell_bounds(cid)
    assert pxmin[0] <= cxmin[0] and pxmax[0] >= cxmax[0]
    assert pymin[0] <= cymin[0] and pymax[0] >= cymax[0]


def test_cell_bounds_contain_point():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 100, 500)
    y = rng.uniform(0, 100, 500)
    cid = C.cells_from_xy(x, y, 9)
    xmin, xmax, ymin, ymax = C.cell_bounds(cid)
    assert np.all((x >= xmin) & (x < xmax) & (y >= ymin) & (y < ymax))


def test_neighbors_interior_and_corner():
    level = 5
    mid = C.encode_rowcol(np.array([10]), np.array([10]), level)
    nb = C.neighbors(mid)
    assert nb.shape == (1, 8)
    assert np.all(nb >= 0)
    cols, rows = C.decode_rowcol(nb[0])
    assert sorted(zip(cols, rows)) == sorted(
        (10 + dc, 10 + dr)
        for dc in (-1, 0, 1)
        for dr in (-1, 0, 1)
        if (dc, dr) != (0, 0)
    )
    corner = C.encode_rowcol(np.array([0]), np.array([0]), level)
    nbc = C.neighbors(corner)[0]
    assert (nbc >= 0).sum() == 3  # corner has 3 valid neighbors


def test_ring_cells():
    level = 6
    c = C.encode_rowcol(np.array([8]), np.array([8]), level)[0]
    assert C.ring_cells(int(c), 0).tolist() == [int(c)]
    r1 = C.ring_cells(int(c), 1)
    assert len(r1) == 8
    r2 = C.ring_cells(int(c), 2)
    assert len(r2) == 16
    # at the corner rings are clipped
    c0 = C.encode_rowcol(np.array([0]), np.array([0]), level)[0]
    assert len(C.ring_cells(int(c0), 1)) == 3


def test_covering_cells_bbox():
    level = 4  # 16x16 cells of 6.25
    got = C.covering_cells_bbox(10.0, 20.0, 10.0, 20.0, level)
    cols, rows = C.decode_rowcol(got)
    assert set(cols.tolist()) == {1, 2, 3}
    assert set(rows.tolist()) == {1, 2, 3}
    assert len(got) == 9
    # degenerate bbox outside the frame
    assert len(C.covering_cells_bbox(200, 210, 0, 1, level)) == 0
