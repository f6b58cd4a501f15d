"""GCP polynomial warp (stages/registration.warp_with_gcps)."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.registration import (
    fit_gcp_poly1,
    warp_with_gcps,
)


def _sums(x, y, X, Y):
    return {
        "n": len(x), "sx": int(x.sum()), "sy": int(y.sum()),
        "sxx": int((x * x).sum()), "sxy": int((x * y).sum()),
        "syy": int((y * y).sum()), "sX": int(X.sum()),
        "sxX": int((x * X).sum()), "syX": int((y * X).sum()),
        "sY": int(Y.sum()), "sxY": int((x * Y).sum()),
        "syY": int((y * Y).sum()),
    }


def test_fit_recovers_exact_affine():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 100, 60).astype(np.int64)
    y = rng.randint(0, 100, 60).astype(np.int64)
    X = 7 + 2 * x - 3 * y
    Y = -4 + x + 5 * y
    det, a, b = fit_gcp_poly1(_sums(x, y, X, Y))
    assert [v / det for v in a] == [7.0, 2.0, -3.0]
    assert [v / det for v in b] == [-4.0, 1.0, 5.0]


def test_fit_matches_lstsq_with_noise():
    rng = np.random.RandomState(5)
    x = rng.randint(0, 100, 80).astype(np.int64)
    y = rng.randint(0, 100, 80).astype(np.int64)
    X = 3 + x + rng.randint(0, 5, 80)
    Y = y - 2 + rng.randint(0, 5, 80)
    det, a, b = fit_gcp_poly1(_sums(x, y, X, Y))
    A = np.stack([np.ones(80), x, y], axis=1).astype(np.float64)
    wa = np.linalg.lstsq(A, X.astype(np.float64), rcond=None)[0]
    wb = np.linalg.lstsq(A, Y.astype(np.float64), rcond=None)[0]
    assert np.allclose([v / det for v in a], wa, atol=1e-9)
    assert np.allclose([v / det for v in b], wb, atol=1e-9)


def test_warp_identity_and_oob(ray_session):
    n = 16
    pid = np.arange(n * n, dtype=np.int64)
    r, c = np.divmod(pid, n)
    val = (r * 5 + c) % 11
    src = ray.data.from_arrow(
        pa.table({"pixel_id": pid, "val": val})
    )
    targets = ray.data.from_arrow(
        pa.table({"tgt_id": pid, "x": c, "y": r})
    )
    # GCPs defining an exact shift by (+2, +3)
    gx = np.array([0, 10, 3, 7, 12], np.int64)
    gy = np.array([0, 2, 9, 14, 6], np.int64)
    gcps = ray.data.from_arrow(
        pa.table(
            {"x": gx, "y": gy, "X": gx + 2, "Y": gy + 3}
        )
    )
    out = {
        row["tgt_id"]: row["val"]
        for row in warp_with_gcps(
            src, targets, gcps, src_n=n
        ).take_all()
    }
    for t in range(n * n):
        rr, cc = divmod(t, n)
        sc, sr = cc + 2, rr + 3
        want = (
            float((sr * 5 + sc) % 11)
            if 0 <= sc < n and 0 <= sr < n
            else -99.0
        )
        assert out[t] == want, t
