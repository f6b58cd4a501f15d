"""Clump / connected components vs a single-process BFS oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.stages.polygonize import clump, components_summary


def _bfs_oracle(grid: np.ndarray, eight_conn: bool) -> np.ndarray:
    """Label = min pixel_id per component, flood fill."""
    h, w = grid.shape
    labels = np.full((h, w), -1, dtype=np.int64)
    shifts = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if eight_conn:
        shifts += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    for r in range(h):
        for c in range(w):
            if labels[r, c] != -1:
                continue
            stack = [(r, c)]
            comp = []
            labels[r, c] = -2
            while stack:
                rr, cc = stack.pop()
                comp.append((rr, cc))
                for dr, dc in shifts:
                    r2, c2 = rr + dr, cc + dc
                    if (
                        0 <= r2 < h
                        and 0 <= c2 < w
                        and labels[r2, c2] == -1
                        and grid[r2, c2] == grid[rr, cc]
                    ):
                        labels[r2, c2] = -2
                        stack.append((r2, c2))
            lab = min(rr * w + cc for rr, cc in comp)
            for rr, cc in comp:
                labels[rr, cc] = lab
    return labels


def _grid_to_ds(grid: np.ndarray) -> ray.data.Dataset:
    h, w = grid.shape
    pid = np.arange(h * w, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "pixel_id": pid,
                "row": pid // w,
                "col": pid % w,
                "value": grid.ravel().astype(np.int64),
            }
        )
    ).repartition(6)


@pytest.mark.parametrize("eight_conn", [False, True])
def test_clump_matches_bfs(ray_session, eight_conn):
    rng = np.random.default_rng(42)
    grid = rng.integers(0, 3, (60, 80))
    want = _bfs_oracle(grid, eight_conn)
    # small tile size forces many cross-tile merges
    got = (
        clump(_grid_to_ds(grid), tile_size=16, eight_conn=eight_conn)
        .to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        got["comp_label"].to_numpy(), want.ravel()
    )


def test_clump_snake_across_tiles(ray_session):
    # a one-pixel-wide snake crossing many tile borders
    grid = np.zeros((40, 40), dtype=np.int64)
    for c in range(40):
        grid[20, c] = 7
    for r in range(40):
        grid[r, 39] = 7
    want = _bfs_oracle(grid, False)
    got = (
        clump(_grid_to_ds(grid), tile_size=8)
        .to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["comp_label"].to_numpy(), want.ravel())


def test_components_summary(ray_session):
    grid = np.zeros((10, 10), dtype=np.int64)
    grid[0:3, 0:3] = 5  # 9-pixel block
    clumped = clump(_grid_to_ds(grid), tile_size=4)
    summ = components_summary(clumped).to_pandas()
    blk = summ[summ["value"] == 5]
    assert len(blk) == 1
    assert blk.iloc[0]["n_pixels"] == 9
    assert blk.iloc[0]["centroid_row"] == 1.0
    assert blk.iloc[0]["min_col"] == 0 and blk.iloc[0]["max_col"] == 2
    assert summ["n_pixels"].sum() == 100


def test_component_rings_rectangle_and_L(ray_session):
    from rsgislib_ray.stages.polygonize import component_rings
    from rsgislib_ray.functions.geom import ring_area, points_in_ring

    grid = np.zeros((8, 8), dtype=np.int64)
    grid[1:4, 2:6] = 5        # 3x4 rectangle
    grid[5:7, 0:2] = 9        # 2x2 block
    grid[5, 2] = 9            # L-extension (8-conn not needed: touching edge)
    clumped = clump(_grid_to_ds(grid), tile_size=4)
    rings = component_rings(clumped).to_pandas()
    rect = rings[rings["value"] == 5].iloc[0]
    assert rect["n_pixels"] == 12
    ring = np.asarray(rect["ring_xy"], dtype=float)
    assert abs(ring_area(ring)) == 12.0  # area equals pixel count
    # every member pixel center lies inside the traced ring
    rr, cc = np.nonzero(grid == 5)
    assert points_in_ring(cc + 0.5, rr + 0.5, ring).all()
    # background centers outside
    assert not points_in_ring(np.array([0.5]), np.array([0.5]), ring).any()
    lshape = rings[rings["value"] == 9].iloc[0]
    lring = np.asarray(lshape["ring_xy"], dtype=float)
    assert abs(ring_area(lring)) == lshape["n_pixels"]


def test_component_rings_donut_hole(ray_session):
    """A 4x4 square with a 2x2 hole must emit an outer ring (area 16)
    AND an interior ring (area -4); signed areas sum to n_pixels
    (regression: outer-rings-only v1 contract dropped holes)."""
    from rsgislib_ray.stages.polygonize import component_rings
    from rsgislib_ray.functions.geom import points_in_ring

    grid = np.zeros((8, 8), dtype=np.int64)
    grid[2:6, 2:6] = 5
    grid[3:5, 3:5] = 0  # punch the hole (background value)
    clumped = clump(_grid_to_ds(grid), tile_size=4)
    rings = component_rings(clumped).to_pandas()
    donut = rings[rings["value"] == 5]
    assert len(donut) == 2
    outer = donut[~donut["is_hole"]].iloc[0]
    hole = donut[donut["is_hole"]].iloc[0]
    assert outer["ring_id"] == 0 and outer["area"] == 16.0
    assert hole["area"] == -4.0
    assert donut["area"].sum() == donut["n_pixels"].iloc[0] == 12
    # hole center is inside the outer ring but inside the hole ring too
    oring = np.asarray(outer["ring_xy"], dtype=float)
    hring = np.asarray(hole["ring_xy"], dtype=float)
    assert points_in_ring(np.array([4.0]), np.array([4.0]), oring).all()
    assert points_in_ring(np.array([4.0]), np.array([4.0]), hring).all()
    # a pixel of the ring body: inside outer, outside hole
    assert points_in_ring(np.array([2.5]), np.array([2.5]), oring).all()
    assert not points_in_ring(np.array([2.5]), np.array([2.5]), hring).any()


def test_component_rings_8conn_pinch(ray_session):
    """Two squares touching at a corner form ONE 8-conn component; the
    left-turn rule must yield two valid non-crossing CCW rings whose
    areas sum to n_pixels."""
    from rsgislib_ray.stages.polygonize import component_rings

    grid = np.zeros((6, 6), dtype=np.int64)
    grid[1:3, 1:3] = 4
    grid[3:5, 3:5] = 4
    clumped = clump(_grid_to_ds(grid), tile_size=4, eight_conn=True)
    rings = component_rings(clumped).to_pandas()
    comp = rings[rings["value"] == 4]
    assert comp["comp_label"].nunique() == 1  # one 8-conn component
    assert len(comp) == 2 and not comp["is_hole"].any()
    assert sorted(comp["area"]) == [4.0, 4.0]
    assert comp["area"].sum() == comp["n_pixels"].iloc[0]


def test_clump_10x_raster(ray_session):
    """VERDICT round-2 'done' criterion: distributed clump correct at
    10x the round-1 fixture size (160k pixels, many cross-tile
    merges)."""
    rng = np.random.default_rng(7)
    grid = rng.integers(0, 3, (400, 400))
    want = _bfs_oracle(grid, False)
    got = (
        clump(_grid_to_ds(grid), tile_size=64)
        .to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["comp_label"].to_numpy(), want.ravel())
