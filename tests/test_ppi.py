"""Pixel purity index (stages/imagestats.ppi_counts) vs a literal
scalar transcription of specunmixing calc_ppi:1373 with the same
pinned projection matrix."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.imagestats import ppi_counts


def _scalar_ppi(X, R, lthres, uthres):
    Xc = X.astype(np.float64) - X.mean(axis=0)
    cnt = np.zeros(X.shape[0], np.int64)
    for i in range(R.shape[0]):
        s = Xc @ R[i]
        if lthres == 0:
            cnt[np.argmin(s)] += 1
        else:
            cnt[s <= s[np.argmin(s)] + lthres] += 1
        if uthres == 0:
            cnt[np.argmax(s)] += 1
        else:
            cnt[s >= s[np.argmax(s)] - uthres] += 1
    return cnt


def _run(X, R, lthres, uthres):
    cols = {"pix": np.arange(len(X), dtype=np.int64)}
    for b in range(X.shape[1]):
        cols[f"x{b}"] = X[:, b]
    ds = ray.data.from_arrow(pa.table(cols)).repartition(4)
    out = ppi_counts(
        ds, [f"x{b}" for b in range(X.shape[1])], R,
        lthres=lthres, uthres=uthres,
    ).sort("pix").take_all()
    return np.array([r["ppi"] for r in out])


def test_ppi_extremes_mode_matches_scalar(ray_session):
    rng = np.random.RandomState(2)
    X = rng.randint(0, 500, size=(300, 4)).astype(np.int64)
    R = rng.rand(25, 4) - 0.5
    got = _run(X, R, 0.0, 0.0)
    want = _scalar_ppi(X, R, 0.0, 0.0)
    assert np.array_equal(got, want)
    assert want.sum() == 50          # 2 extremes per iteration


def test_ppi_threshold_mode_matches_scalar(ray_session):
    rng = np.random.RandomState(7)
    X = rng.randint(0, 200, size=(250, 5)).astype(np.int64)
    R = rng.rand(15, 5) - 0.5
    got = _run(X, R, 0.5, 0.5)
    want = _scalar_ppi(X, R, 0.5, 0.5)
    # the scalar uses mean(axis=0) + BLAS dot; the engine's pinned
    # chain may differ by an ulp exactly AT the threshold boundary —
    # allow equality to within one count on boundary collisions
    assert np.abs(got - want).max() <= 1
    assert (got != want).mean() < 0.02
