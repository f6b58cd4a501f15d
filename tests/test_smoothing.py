"""SG(5,3) spectral smoothing: the rational projection rows must equal
the least-squares cubic fit (checked against numpy polyfit), and the
stage must match a brute-force per-pixel polyfit smoother."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.smoothing import sg5_matrix, spectral_smoothing


def test_sg5_rows_equal_polyfit():
    N, den = sg5_matrix(9)
    rng = np.random.default_rng(3)
    for _ in range(20):
        x = rng.integers(0, 100, size=9).astype(float)
        # brute force: scipy savgol mode='interp' equivalent
        exp = np.empty(9)
        for j in range(9):
            if j < 2:
                w0 = 0
            elif j > 6:
                w0 = 4
            else:
                w0 = j - 2
            cf = np.polyfit(np.arange(5), x[w0 : w0 + 5], 3)
            exp[j] = np.polyval(cf, j - w0)
        got = (x @ N.T) / den
        assert np.allclose(got, exp, rtol=1e-9, atol=1e-9)


def test_spectral_smoothing_stage(ray_session):
    n = 500
    pid = np.arange(n, dtype=np.int64)
    cols = {"pixel_id": pid, "m": (pid % 3 != 0).astype(np.int64)}
    for b in range(8):
        cols[f"b{b}"] = (pid % 17) + b * 2 + (pid * (b + 1)) % 7
    t = pa.table(cols)
    out = (
        spectral_smoothing(
            ray.data.from_arrow(t).repartition(5),
            [f"b{b}" for b in range(8)],
            mask_col="m",
            mask_val=1,
        )
        .to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True)
    )
    N, den = sg5_matrix(8)
    X = np.stack([cols[f"b{b}"] for b in range(8)], axis=1)
    exp = (X @ N.T).astype(np.float64) / den
    valid = cols["m"] == 1
    for b in range(8):
        got = out[f"sm_b{b}"].to_numpy()
        assert np.array_equal(got[valid], exp[valid, b])
        assert (got[~valid] == -99.0).all()
