"""semivariogram vs a brute-force O(n^2) reference."""

import numpy as np
import pyarrow as pa
import pytest


def _pts(n=300):
    k = np.arange(1, n + 1, dtype=np.int64)
    return pa.table(
        {
            "cell_key": k,
            "x": ((k * 3571) % 10000) / 100.0 + 0.005,
            "y": ((k * 9901) % 10000) / 100.0 + 0.005,
            "val": (k * 7) % 50 + 1,
        }
    )


def _brute(tbl, max_lag, n_lags, int_scale=200):
    ix = np.rint(tbl["x"].to_numpy() * int_scale).astype(np.int64)
    iy = np.rint(tbl["y"].to_numpy() * int_scale).astype(np.int64)
    v = tbl["val"].to_numpy().astype(np.int64)
    edges = np.array(
        [
            int(round(max_lag * int_scale * (b + 1) / n_lags)) ** 2
            for b in range(n_lags)
        ],
        dtype=np.int64,
    )
    n_pairs = np.zeros(n_lags, dtype=np.int64)
    sq = np.zeros(n_lags, dtype=np.int64)
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (ix[i] - ix[j]) ** 2 + (iy[i] - iy[j]) ** 2
            if d2 > edges[-1]:
                continue
            b = int(np.searchsorted(edges, d2, side="left"))
            n_pairs[b] += 1
            sq[b] += (v[i] - v[j]) ** 2
    return n_pairs, sq


@pytest.mark.parametrize("blocks", [1, 9])
def test_semivariogram_matches_brute(ray_session, blocks):
    import ray

    from rsgislib_ray.stages.geostat import semivariogram

    tbl = _pts()
    max_lag, n_lags = 8.0, 4
    got = semivariogram(
        ray.data.from_arrow(tbl).repartition(blocks),
        tbl,
        max_lag,
        n_lags,
        "val",
    ).to_pandas()
    n_pairs, sq = _brute(tbl, max_lag, n_lags)
    assert got["n_pairs"].tolist() == n_pairs.tolist()
    assert got["sq_diff_sum"].tolist() == sq.tolist()
    for b in range(n_lags):
        if n_pairs[b]:
            assert got["semivariance"].iloc[b] == sq[b] / (2 * n_pairs[b])


def test_semivariogram_coincident_pair_bin1(ray_session):
    """Two points at the same location -> d2=0 pair lands in bin 1."""
    import ray

    from rsgislib_ray.stages.geostat import semivariogram

    tbl = pa.table(
        {
            "cell_key": np.array([1, 2], dtype=np.int64),
            "x": np.array([10.005, 10.005]),
            "y": np.array([20.005, 20.005]),
            "val": np.array([3, 10], dtype=np.int64),
        }
    )
    got = semivariogram(
        ray.data.from_arrow(tbl), tbl, 4.0, 4, "val"
    ).to_pandas()
    assert got["n_pairs"].tolist() == [1, 0, 0, 0]
    assert int(got["sq_diff_sum"].iloc[0]) == 49
