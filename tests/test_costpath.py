"""cost_distance / least_cost_path vs a heapq Dijkstra oracle."""

import heapq

import numpy as np
import pyarrow as pa
import pytest


def _raster(n=48, seed=2):
    rng = np.random.default_rng(seed)
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    cost = rng.integers(1, 20, n * n).astype(np.int64)
    # a cheap corridor that snakes between bands to force >1 outer
    # iteration of the band exchange
    grid = cost.reshape(n, n)
    grid[5, :] = 1
    grid[:, n - 3] = 1
    grid[n - 5, :] = 1
    grid[:, 2] = 1
    return pa.table(
        {"pixel_id": pid, "row": row, "col": col, "cost": grid.ravel()}
    )


def _dijkstra(cost2d, start):
    h, w = cost2d.shape
    dist = np.full((h, w), np.iinfo(np.int64).max, dtype=np.int64)
    sr, sc = divmod(start, w)
    dist[sr, sc] = cost2d[sr, sc]
    pq = [(int(cost2d[sr, sc]), sr, sc)]
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for nr, nc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
            if 0 <= nr < h and 0 <= nc < w:
                nd = d + int(cost2d[nr, nc])
                if nd < dist[nr, nc]:
                    dist[nr, nc] = nd
                    heapq.heappush(pq, (nd, nr, nc))
    return dist


@pytest.mark.parametrize("row_band", [8, 48])
def test_cost_distance_matches_dijkstra(ray_session, row_band):
    import ray

    from rsgislib_ray.stages.costpath import cost_distance

    n = 48
    tbl = _raster(n)
    ds, _, _ = cost_distance(
        ray.data.from_arrow(tbl).repartition(6),
        start_pixel=0,
        width=n,
        row_band=row_band,
    )
    got = ds.to_pandas().sort_values("pixel_id")["cost_dist"].to_numpy()
    want = _dijkstra(
        tbl["cost"].to_numpy().reshape(n, n), 0
    ).ravel()
    assert (got == want).all()


def test_least_cost_path_valid(ray_session):
    import ray

    from rsgislib_ray.stages.costpath import least_cost_path

    n = 48
    tbl = _raster(n)
    stop = n * n - 1
    path = least_cost_path(
        ray.data.from_arrow(tbl).repartition(4), 0, stop, n, row_band=8
    ).to_pandas()
    cost = tbl["cost"].to_numpy().reshape(n, n)
    want = _dijkstra(cost, 0)
    # ends anchored
    assert path["pixel_id"].iloc[0] == 0
    assert path["pixel_id"].iloc[-1] == stop
    # optimal total cost
    assert path["cost_dist"].iloc[-1] == want[n - 1, n - 1]
    # contiguous 4-connected steps with correct incremental costs
    pids = path["pixel_id"].to_numpy()
    r, c = np.divmod(pids, n)
    assert (np.abs(np.diff(r)) + np.abs(np.diff(c)) == 1).all()
    d = path["cost_dist"].to_numpy()
    assert (np.diff(d) == cost[r[1:], c[1:]]).all()


def test_cost_distance_absent_leading_rows(ray_session):
    """A band whose leading rows are entirely absent anchors at its
    REAL first row (r0 = row.min()), not band*row_band: pixel ids are
    unshifted, the start-cost lookup is right even when the start sits
    below the gap, and a row gap between bands is impassable."""
    import ray

    from rsgislib_ray.stages.costpath import cost_distance

    n = 32
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    cost = ((pid % 7) + 1).astype(np.int64)
    keep = (row < 8) | (row >= 12)  # band 1 (rows 8..15) loses 8..11
    tbl = pa.table(
        {
            "pixel_id": pid[keep],
            "row": row[keep],
            "col": col[keep],
            "cost": cost[keep],
        }
    )
    ds, _, _ = cost_distance(
        ray.data.from_arrow(tbl).repartition(5),
        start_pixel=0,
        width=n,
        row_band=8,
    )
    got = ds.to_pandas().sort_values("pixel_id")
    # pixel ids are exactly the surviving ids — no shift
    assert (got["pixel_id"].to_numpy() == pid[keep]).all()
    d = dict(zip(got["pixel_id"], got["cost_dist"]))
    # top block matches Dijkstra on its own 8-row grid
    top = _dijkstra(cost[row < 8].reshape(8, n), 0)
    for r in range(8):
        for c in range(0, n, 5):
            assert d[r * n + c] == top[r, c]
    # everything below the gap is unreachable
    assert all(d[p] >= 2**62 for p in pid[row >= 12][:: n // 2])

    # start BELOW the gap: start-cost must come from the right cell
    start = 20 * n + 3
    ds2, _, _ = cost_distance(
        ray.data.from_arrow(tbl).repartition(5),
        start_pixel=start,
        width=n,
        row_band=8,
    )
    got2 = ds2.to_pandas().sort_values("pixel_id")
    d2 = dict(zip(got2["pixel_id"], got2["cost_dist"]))
    assert d2[start] == cost[start]
    # top block is unreachable from below the gap
    assert all(d2[p] >= 2**62 for p in pid[row < 8][:: n // 2])


def test_cost_distance_large_maze(ray_session):
    """256x256 raster with concentric cheap corridors (16 bands) —
    converges and matches Dijkstra."""
    import ray

    from rsgislib_ray.stages.costpath import cost_distance

    n = 256
    rng = np.random.default_rng(7)
    cost = rng.integers(5, 60, (n, n)).astype(np.int64)
    # cheap ring corridors force repeated band re-entry
    for k in range(8, n // 2, 24):
        cost[k, k : n - k] = 1
        cost[n - k - 1, k : n - k] = 1
        cost[k : n - k, k] = 1
        cost[k : n - k, n - k - 1] = 1
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    tbl = pa.table(
        {"pixel_id": pid, "row": row, "col": col, "cost": cost.ravel()}
    )
    ds, _, _ = cost_distance(
        ray.data.from_arrow(tbl).repartition(16),
        start_pixel=0,
        width=n,
        row_band=16,
    )
    got = ds.to_pandas().sort_values("pixel_id")["cost_dist"].to_numpy()
    want = _dijkstra(cost, 0).ravel()
    assert (got == want).all()


def test_least_cost_path_out_of_grid_stop(ray_session):
    """ADVICE r3: a stop pixel in a wholly-absent trailing row is
    unreachable (ValueError), not an IndexError."""
    import ray

    from rsgislib_ray.stages.costpath import least_cost_path

    n = 8
    tbl = _raster(n)
    # keep only the first 4 rows: trailing rows wholly absent
    keep = tbl["pixel_id"].to_numpy() < 4 * n
    sub = tbl.filter(pa.array(keep))
    with pytest.raises(ValueError, match="unreachable"):
        least_cost_path(
            ray.data.from_arrow(sub), 0, n * n - 1, n, row_band=4
        )
    with pytest.raises(ValueError, match="outside"):
        least_cost_path(
            ray.data.from_arrow(sub), n * n - 1, 0, n, row_band=4
        )
