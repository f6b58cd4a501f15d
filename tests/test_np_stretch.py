"""np_stretch_panel vs the literal tools/plotting.py numpy chains
(limit_range/linear/cumulative/stdev/manual stretch) transcribed
verbatim — validates the distributed histogram fold + pinned
percentile against np.nanpercentile/np.nanmean on the same data."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_limit_range(arr, min_thres, min_out, max_thres, max_out):
    out = arr.copy()
    out[arr < min_thres] = min_out
    out[arr > max_thres] = max_out
    return out


def _ref_linear(arr, nodata, gain=1.0, off=0.0, lo_out=0.0, hi_out=1.0,
                int_out=False):
    out = arr.astype(float)
    out[arr == nodata] = np.nan
    mn, mx = np.nanmin(out), np.nanmax(out)
    out = (((out - mn) / (mx - mn)) * gain) + off
    out = _ref_limit_range(out, lo_out, lo_out, hi_out, hi_out)
    if int_out:
        out = out.astype(int)
    return out


def _ref_cumulative(arr, nodata, lower=2, upper=98):
    out = arr.astype(float)
    out[arr == nodata] = np.nan
    mn, mx = np.nanpercentile(out, [lower, upper])
    out = (((out - mn) / (mx - mn)) * 1.0) + 0.0
    return _ref_limit_range(out, 0.0, 0.0, 1.0, 1.0)


def _ref_stdev(arr, nodata, n_stdevs=2.0):
    out = arr.astype(float)
    out[arr == nodata] = np.nan
    mn, mx = np.nanmin(out), np.nanmax(out)
    mean, std = np.nanmean(out), np.nanstd(out)
    lo, hi = mean - std * n_stdevs, mean + std * n_stdevs
    lo = mn if lo < mn else lo
    hi = mx if hi > mx else hi
    out = (((out - lo) / (hi - lo)) * 1.0) + 0.0
    out[out < 0.0] = 0.0
    out[out > 1.0] = 1.0
    return _ref_limit_range(out, 0.0, 0.0, 1.0, 1.0)


def _ref_manual(arr, nodata, mn, mx):
    out = arr.astype(float)
    out[arr == nodata] = np.nan
    out = (((out - mn) / (mx - mn)) * 1.0) + 0.0
    return _ref_limit_range(out, 0.0, 0.0, 1.0, 1.0)


@pytest.fixture(scope="module")
def panel(ray_session):
    from rsgislib_ray.pipelines.queries import queries

    df = (
        queries()["np_stretch_panel"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("cell_key")
        .reset_index(drop=True)
    )
    return df


def test_lim_lin_man_exact(panel):
    v = panel["v"].to_numpy()
    assert np.array_equal(
        panel["lim"].to_numpy(),
        _ref_limit_range(v.astype(np.int64), 10, 10, 40, 40),
    )
    ref = _ref_linear(v, 13)
    got = panel["lin"].to_numpy()
    m = v != 13
    assert panel["lin"].isna().to_numpy()[~m].all()
    assert np.array_equal(got[m], ref[m])
    refm = _ref_manual(v, 13, 5, 45)
    assert np.array_equal(panel["man"].to_numpy()[m], refm[m])


def test_lin255_truncation(panel):
    v = panel["v"].to_numpy()
    m = v != 13
    ref = _ref_linear(v, 13, gain=255.0, lo_out=0.0, hi_out=255.0,
                      int_out=False)
    got = panel["lin255"].to_numpy()
    assert np.array_equal(got[m].astype(np.int64),
                          np.trunc(ref[m]).astype(np.int64))


def test_cumulative_matches_nanpercentile(panel):
    v = panel["v"].to_numpy()
    m = v != 13
    ref = _ref_cumulative(v, 13)
    assert np.array_equal(panel["cum"].to_numpy()[m], ref[m])


def test_stdev_close_to_nanstd(panel):
    # moment-form std is pinned; np.nanstd differs only by pairwise
    # summation rounding -> agree to ~1e-12 relative
    v = panel["v"].to_numpy()
    m = v != 13
    ref = _ref_stdev(v, 13)
    np.testing.assert_allclose(
        panel["sdv"].to_numpy()[m], ref[m], rtol=0, atol=1e-9
    )
