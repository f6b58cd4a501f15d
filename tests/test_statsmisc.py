"""tools/stats + tools/projection straggler tests: kurt-skew
threshold (brute-force subset statistics), geodesy round-trips, and
the correlation feature-selection decision layer."""

import math

import numpy as np
import pytest

from rsgislib_ray.functions import geodesy as gd
from rsgislib_ray.stages.imagestats import kurt_skew_threshold
from rsgislib_ray.stages.scores import (
    complete_linkage_labels,
    corr_feature_select,
    silhouette_precomputed,
)


def _brute_obj(data, x, low=True):
    sub = data[data > x] if low else data[data < x]
    n = len(sub)
    mu = sub.mean()
    m2 = ((sub - mu) ** 2).mean()
    m3 = ((sub - mu) ** 3).mean()
    m4 = ((sub - mu) ** 4).mean()
    kurt = m4 / m2**2 - 3.0
    skew = m3 / m2**1.5
    return abs(kurt) + abs(skew)


def test_kurt_skew_threshold_is_lattice_argmin():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 120, size=20000)
    hist = np.bincount(data, minlength=256)
    r = kurt_skew_threshold(hist, 100.0, 3.0, contamination=10.0)
    lo = int(math.ceil(3.0))
    pct = float(np.percentile(data, 10.0))
    hi = int(math.floor(min(100.0, pct)))
    objs = {
        x: _brute_obj(data, x)
        for x in range(lo, hi + 1)
        if (data > x).sum() >= 2
    }
    best = min(objs.items(), key=lambda kv: (kv[1], kv[0]))
    assert r["thr"] == best[0]
    assert r["obj"] == pytest.approx(best[1], rel=1e-9)


def test_kurt_skew_high_side():
    rng = np.random.default_rng(6)
    data = rng.integers(0, 120, size=20000)
    hist = np.bincount(data, minlength=256)
    r = kurt_skew_threshold(
        hist, 118.0, 10.0, low_thres=False, contamination=10.0
    )
    pct = float(np.percentile(data, 90.0))
    lo = int(math.ceil(max(10.0, pct)))
    objs = {
        x: _brute_obj(data, x, low=False)
        for x in range(lo, 119)
        if (data < x).sum() >= 2
    }
    best = min(objs.items(), key=lambda kv: (kv[1], kv[0]))
    assert r["thr"] == best[0]


def test_geodesy_roundtrip_and_known_values():
    lat = np.array([0.0, 52.0, -45.0])
    xm, ym = gd.degrees_to_metres(lat, 1.0, 1.0)
    # equator: one degree of longitude on the normal sphere ~111.3 km
    assert xm[0] == pytest.approx(111319.49, abs=1.0)
    # reference docstring example: degrees_to_metres(52, 1, 1)
    assert xm[1] == pytest.approx(68678.0, abs=150.0)
    lon_rt, lat_rt = gd.metres_to_degrees(lat, xm, ym)
    assert np.allclose(lon_rt, 1.0, rtol=1e-12)
    assert np.allclose(lat_rt, 1.0, rtol=1e-12)


def test_great_circle_quarter_meridian():
    d = gd.great_circle_distance(
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([90.0])
    )
    assert d[0] == pytest.approx(6378137.0 * math.pi / 2.0, rel=1e-12)
    # symmetric in the |dlon| fold
    a = gd.great_circle_distance(
        np.array([10.0]), np.array([20.0]), np.array([60.0]), np.array([30.0])
    )
    b = gd.great_circle_distance(
        np.array([60.0]), np.array([30.0]), np.array([10.0]), np.array([20.0])
    )
    assert a[0] == b[0]


def test_complete_linkage_two_blocks():
    C = np.array(
        [
            [1.0, 0.95, 0.1, 0.2],
            [0.95, 1.0, 0.15, 0.1],
            [0.1, 0.15, 1.0, 0.9],
            [0.2, 0.1, 0.9, 1.0],
        ]
    )
    D = 1.0 - np.abs(C)
    np.fill_diagonal(D, 0.0)
    labels = complete_linkage_labels(D, 2)
    assert labels.tolist() == [0, 0, 1, 1]
    # silhouette of the true 2-block structure beats 3 clusters
    s2 = silhouette_precomputed(D, labels)
    s3 = silhouette_precomputed(D, complete_linkage_labels(D, 3))
    assert s2 > s3
    out = corr_feature_select(C, np.array([0.8, 0.7, 0.3, 0.6]))
    assert out["n_clusters"] == 2
    assert out["selected"] == [0, 3]


def test_silhouette_matches_sklearn_formula():
    rng = np.random.default_rng(9)
    n = 12
    P = rng.normal(size=(n, 2))
    P[:6] += 8.0
    D = np.sqrt(((P[:, None, :] - P[None, :, :]) ** 2).sum(-1))
    labels = np.array([0] * 6 + [1] * 6)
    got = silhouette_precomputed(D, labels)
    ss = []
    for i in range(n):
        own = labels == labels[i]
        a = D[i, own].sum() / (own.sum() - 1)
        b = D[i, ~own].mean()
        ss.append((b - a) / max(a, b))
    assert got == pytest.approx(float(np.mean(ss)), rel=1e-12)
