"""Focal-filter family vs brute-force window oracles, across tile
sizes and partitionings (halo correctness at tile boundaries)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _raster(n=40, seed=3, sparse=False):
    rng = np.random.default_rng(seed)
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    val = rng.integers(0, 9, n * n).astype(np.int64)
    if sparse:  # drop ~20% of pixels to exercise present-only windows
        keep = rng.random(n * n) > 0.2
        pid, row, col, val = pid[keep], row[keep], col[keep], val[keep]
    return pa.table({"pixel_id": pid, "row": row, "col": col, "value": val})


def _window_vals(tbl, r, c, n):
    d = {(rr, cc): v for rr, cc, v in zip(tbl["row"].to_numpy(),
                                          tbl["col"].to_numpy(),
                                          tbl["value"].to_numpy())}
    out = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            v = d.get((r + dr, c + dc))
            if v is not None:
                out.append(int(v))
    return np.array(out, dtype=np.int64)


@pytest.mark.parametrize("tile_size,sparse", [(8, False), (16, True)])
def test_focal_stats_vs_brute(ray_session, tile_size, sparse):
    from rsgislib_ray.stages.raster import focal_stats

    n = 24
    tbl = _raster(n, sparse=sparse)
    got = (
        focal_stats(
            ray.data.from_arrow(tbl).repartition(5), tile_size=tile_size
        )
        .to_pandas()
        .set_index("pixel_id")
        .sort_index()
    )
    assert len(got) == tbl.num_rows
    d = {(r, c): v for r, c, v in zip(tbl["row"].to_numpy(),
                                      tbl["col"].to_numpy(),
                                      tbl["value"].to_numpy())}
    rng = np.random.default_rng(1)
    sample = rng.choice(tbl["pixel_id"].to_numpy(), 60, replace=False)
    rowm = dict(zip(tbl["pixel_id"].to_numpy(),
                    zip(tbl["row"].to_numpy(), tbl["col"].to_numpy())))
    for p in sample:
        r, c = rowm[int(p)]
        w = _window_vals(tbl, int(r), int(c), n)
        g = got.loc[int(p)]
        assert g["f_min"] == w.min() and g["f_max"] == w.max()
        assert g["f_total"] == w.sum()
        assert g["f_median"] == np.median(w)
        nw = len(w)
        mean = w.sum() / nw
        var = max((w * w).sum() / nw - mean * mean, 0.0)
        assert g["f_stddev"] == np.sqrt(var)
        ctr = d[(int(r), int(c))]
        assert g["f_total_diff"] == nw * ctr - w.sum()
        assert g["f_total_diff_abs"] == np.abs(ctr - w).sum()
        # mode tie -> lowest value
        vals, cnts = np.unique(w, return_counts=True)
        assert g["f_mode"] == vals[np.argmax(cnts)]


def test_focal_convolve_partition_independent(ray_session):
    from rsgislib_ray.stages.raster import focal_convolve

    n = 32
    tbl = _raster(n, seed=9)
    K = {"lap": np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.int64)}
    outs = []
    for parts, ts in ((3, 8), (7, 16)):
        outs.append(
            focal_convolve(
                ray.data.from_arrow(tbl).repartition(parts), K, tile_size=ts
            )
            .to_pandas()
            .sort_values("pixel_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # brute check on interior pixels (zero-fill borders)
    grid = np.zeros((n, n), np.int64)
    grid[tbl["row"].to_numpy(), tbl["col"].to_numpy()] = tbl[
        "value"
    ].to_numpy()
    lap = (
        np.roll(grid, 1, 0) + np.roll(grid, -1, 0)
        + np.roll(grid, 1, 1) + np.roll(grid, -1, 1) - 4 * grid
    )
    g = outs[0].set_index("pixel_id")["lap"]
    for r in range(1, n - 1, 5):
        for c in range(1, n - 1, 5):
            assert g[r * n + c] == lap[r, c]


def test_focal_tile_coord_guard(ray_session):
    from rsgislib_ray.stages.raster import focal_stats

    bad = pa.table(
        {
            "pixel_id": np.array([0], np.int64),
            "row": np.array([-2], np.int64),
            "col": np.array([0], np.int64),
            "value": np.array([1], np.int64),
        }
    )
    with pytest.raises(Exception, match="tile coords"):
        focal_stats(ray.data.from_arrow(bad), tile_size=8).materialize()


def test_focal_stats_float_raster_raises(ray_session):
    """ADVICE r3: float-valued rasters violate the exact int64 moment
    contract (mode domain, min/max/total casts) and must raise, not
    silently truncate."""
    from rsgislib_ray.stages.raster import focal_stats

    bad = pa.table(
        {
            "pixel_id": np.arange(4, dtype=np.int64),
            "row": np.array([0, 0, 1, 1], np.int64),
            "col": np.array([0, 1, 0, 1], np.int64),
            "value": np.array([1.0, 2.5, 3.0, 4.0]),
        }
    )
    with pytest.raises(Exception, match="integer-valued"):
        focal_stats(ray.data.from_arrow(bad), tile_size=8).materialize()


def test_gauss_deriv_kernel_structure():
    """angle=0 pins sin=0/cos=1 exactly even in float32: the 1st-deriv
    kernel reduces to gy = -2y*g (antisymmetric in y, zero centre row),
    the 2nd-deriv to gyy (symmetric in both axes)."""
    from rsgislib_ray.pipelines.queries import _gauss_deriv_kernel

    g1 = _gauss_deriv_kernel(5, 1.0, 1.0, 0.0, order=1)
    assert np.all(g1[2, :] == 0)                      # y = 0 row
    assert np.allclose(g1, -g1[::-1, :], atol=0)      # antisymmetric in y
    assert np.allclose(g1, g1[:, ::-1], atol=0)       # symmetric in x
    g2 = _gauss_deriv_kernel(5, 1.0, 1.0, 0.0, order=2)
    assert np.allclose(g2, g2[::-1, :], atol=0)
    assert np.allclose(g2, g2[:, ::-1], atol=0)
    assert g2[2, 2] < 0                               # centre is -2c*g/2pi


def test_prewitt_xy_is_mean_of_gradients(ray_session):
    """RSGISPrewittFilter xy mode sums (v*fx + v*fy)/2 per element ==
    conv(fx+fy)/2 — check the emitted double equals the mean of the two
    integer gradient outputs."""
    from rsgislib_ray.pipelines.queries import q_focal_convolve_bank

    df = q_focal_convolve_bank("/root/testdata/sf0.001").to_pandas()
    assert np.array_equal(
        df["prewitt_xy"].to_numpy(),
        (df["prewitt_x"].to_numpy() + df["prewitt_y"].to_numpy()) / 2.0,
    )
