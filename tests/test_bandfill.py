"""Band-stack gap utilities (stages/bandfill.py) — parity of the
pinned quantile re-implementation with numpy's nanpercentile, the
reference branch semantics of polyfill, and closeness of the
normal-equation fit to numpy.polyfit."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.stages.bandfill import (
    _np_linear_quantile,
    mask_outlier_values,
    polyfill_values,
)


def _wide(pix, Y, m=None):
    cols = {"pix": pix.astype(np.int64)}
    if m is not None:
        cols["m"] = m.astype(np.int64)
    for b in range(Y.shape[1]):
        cols[f"y{b}"] = Y[:, b]
    return ray.data.from_arrow(pa.table(cols))


def test_linear_quantile_matches_numpy_nanpercentile(ray_session):
    rng = np.random.RandomState(7)
    V = rng.randint(0, 1000, size=(400, 11)).astype(np.float64)
    drop = rng.rand(400, 11) < 0.25
    drop[:, 0] = False                       # keep >= 1 finite
    V[drop] = np.nan
    srt = np.sort(V, axis=1)
    n_f = np.isfinite(V).sum(axis=1).astype(np.int64)
    for q in (5.0, 10.0, 37.0, 50.0, 90.0, 95.0):
        got = _np_linear_quantile(srt, n_f, q / 100.0)
        want = np.nanpercentile(V, q, axis=1)
        assert np.array_equal(got, want), f"q={q}"


def test_mask_outliers_reference_semantics(ray_session):
    # 1 pixel, 10 ints: 10th/90th pct of 0..90 step 10
    Y = np.array([[0, 10, 20, 30, 40, 50, 60, 70, 80, 900]],
                 dtype=np.float64)
    out = mask_outlier_values(
        _wide(np.array([1]), Y), [f"y{b}" for b in range(10)],
        lower=10.0, upper=90.0,
    ).take_all()[0]
    lo, hi = np.nanpercentile(Y[0], [10.0, 90.0])
    for b in range(10):
        v = Y[0, b]
        if v < lo or v > hi:
            assert out[f"out_y{b}"] is None
        else:
            assert out[f"out_y{b}"] == v


def test_mask_outliers_invalid_rows_nodata(ray_session):
    Y = np.arange(18, dtype=np.float64).reshape(2, 9)
    m = np.array([1, 0])
    rows = mask_outlier_values(
        _wide(np.array([0, 1]), Y, m), [f"y{b}" for b in range(9)],
        mask_col="m",
    ).sort("pix").take_all()
    assert all(rows[1][f"out_y{b}"] == -99.0 for b in range(9))


def test_polyfill_branches_and_polyfit_closeness(ray_session):
    x = [1, 2, 4, 5, 7, 9, 11, 12, 14]
    rng = np.random.RandomState(3)
    coefs = rng.randint(-3, 4, size=(50, 4))
    xs = np.asarray(x, dtype=np.float64)
    Y = (
        coefs[:, 0:1] + coefs[:, 1:2] * xs + coefs[:, 2:3] * xs ** 2
        + coefs[:, 3:4] * xs ** 3
    ).astype(np.float64)
    Y[0, 3] = np.nan                    # one gap -> exact fit back
    Y[1, :6] = np.nan                   # 3 finite <= polyorder
    pix = np.arange(50)
    rows = polyfill_values(
        _wide(pix, Y), [f"y{b}" for b in range(9)], x, polyorder=3,
    ).sort("pix").take_all()
    # gap pixel: cubic through cubic data reproduces every band
    for b in range(9):
        want = (coefs[0, 0] + coefs[0, 1] * xs[b]
                + coefs[0, 2] * xs[b] ** 2 + coefs[0, 3] * xs[b] ** 3)
        assert rows[0][f"fill_y{b}"] == pytest.approx(want, abs=1e-6)
    # too-few-samples pixel: all NULL
    assert all(rows[1][f"fill_y{b}"] is None for b in range(9))
    # gap-free pixels: passthrough bit-exact
    for r in range(2, 50):
        for b in range(9):
            assert rows[r][f"fill_y{b}"] == Y[r, b]


def test_polyfill_close_to_numpy_polyfit(ray_session):
    x = [1, 2, 4, 5, 7, 9, 11, 12, 14]
    rng = np.random.RandomState(11)
    Y = rng.randint(0, 200, size=(30, 9)).astype(np.float64)
    gaps = rng.randint(0, 9, size=30)
    Y[np.arange(30), gaps] = np.nan
    rows = polyfill_values(
        _wide(np.arange(30), Y), [f"y{b}" for b in range(9)], x,
        polyorder=3,
    ).sort("pix").take_all()
    xs = np.asarray(x, dtype=np.float64)
    for r in range(30):
        fm = np.isfinite(Y[r])
        c = np.polyfit(xs[fm], Y[r][fm], deg=3)
        pred = np.polyval(c, xs)
        for b in range(9):
            assert rows[r][f"fill_y{b}"] == pytest.approx(
                pred[b], rel=1e-8, abs=1e-6
            )


def test_polyfill_mean_abs_diff_clamp(ray_session):
    x = [1, 2, 4, 5, 7, 9, 11, 12, 14]
    # wild cubic data: predictions far from the mean get clamped
    Y = np.array([[0, 1, 8, 1000, 3, 2, 1, 900, np.nan]],
                 dtype=np.float64)
    rows = polyfill_values(
        _wide(np.array([0]), Y), [f"y{b}" for b in range(9)], x,
        polyorder=3, mean_abs_diff=50.0,
    ).take_all()
    mean = np.nanmean(Y[0])
    vals = np.array([rows[0][f"fill_y{b}"] for b in range(9)])
    assert np.any(vals == mean)
    assert np.all(np.abs(vals - mean) <= 50.0 + 1e-9)
