"""IR-MAD (changedetect.imgchngmthds.multivariate_alteration_detection)
and the scipy-free chi-square survival function: closed-form parity,
general-path vs mirrored-2-band parity, partition independence."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.pipelines.queries import _mad_src_tbl
from rsgislib_ray.stages.changedetect import (
    chi2_sf,
    mad_fit,
    mad_fit_2band,
)


def test_chi2_sf_against_numeric_integration():
    # independent check: integrate the chi2 pdf numerically
    for k in (2, 3, 4, 5, 6):
        for t in (0.5, 1.0, 2.7, 5.0, 11.0):
            xs = np.linspace(t, t + 200.0, 2_000_001)
            pdf = (
                xs ** (k / 2 - 1)
                * np.exp(-xs / 2)
                / (2 ** (k / 2) * math.gamma(k / 2))
            )
            num = np.trapz(pdf, xs)
            got = float(chi2_sf(np.array([t]), k)[0])
            assert abs(got - num) < 1e-7, (k, t, got, num)


def test_chi2_sf_boundaries():
    assert np.allclose(chi2_sf(np.zeros(3), 4), 1.0)
    assert float(chi2_sf(np.array([1e4]), 3)[0]) < 1e-300 or float(
        chi2_sf(np.array([1e4]), 3)[0]
    ) >= 0.0
    # monotone decreasing in t
    t = np.linspace(0, 50, 101)
    for k in (2, 3, 7):
        v = chi2_sf(t, k)
        assert np.all(np.diff(v) <= 1e-15)


def test_mad_2band_partition_independent(ray_session):
    tbl = _mad_src_tbl()
    outs = []
    for parts in (1, 13):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out, _ = mad_fit_2band(
            ds, ["x1", "x2"], ["y1", "y2"], n_iters=2, batch_size=500
        )
        outs.append(
            out.to_pandas().sort_values("pixel_id").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_mad_general_matches_mirrored_2band(ray_session):
    # chi2 is sign-invariant; mad variates may differ in sign between
    # the two paths' conventions, so compare |mad| and chi2.
    tbl = _mad_src_tbl()
    ds = ray.data.from_arrow(tbl).repartition(4)
    mirrored, _ = mad_fit_2band(ds, ["x1", "x2"], ["y1", "y2"], n_iters=2)
    mdf = mirrored.to_pandas().sort_values("pixel_id")
    general, info = mad_fit(
        ds, ["x1", "x2"], ["y1", "y2"], max_iter=2, epsilon=0.0
    )
    gdf = general.to_pandas().sort_values("pixel_id")
    assert np.allclose(
        np.abs(mdf["mad1_q"].to_numpy() / 1e6),
        np.abs(gdf["mad1"].to_numpy()),
        atol=2e-6,
    )
    assert np.allclose(
        np.abs(mdf["mad2_q"].to_numpy() / 1e6),
        np.abs(gdf["mad2"].to_numpy()),
        atol=2e-6,
    )
    assert np.allclose(
        mdf["chi2_q"].to_numpy() / 1e6,
        gdf["chi2"].to_numpy(),
        atol=2e-6,
    )
    assert info["rho"].shape == (2,)
    assert np.all(np.diff(info["rho"]) >= 0)


def test_mad_general_converges_on_static_scene(ray_session):
    # y == x (plus tiny deterministic noise) => canonical correlations
    # near 1 and chi2 concentrated near small values for most pixels
    p = np.arange(2048, dtype=np.int64)
    tbl = pa.table(
        {
            "pixel_id": p,
            "x1": (p * 13) % 50,
            "x2": (p * 29) % 60,
            "y1": (p * 13) % 50 + (p * 7) % 5,
            "y2": (p * 29) % 60 + (p * 11) % 7,
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out, info = mad_fit(ds, ["x1", "x2"], ["y1", "y2"], max_iter=10)
    assert float(info["rho"][-1]) > 0.99
    assert out.count() == 2048


# ---------------------------------------------------------------------------
# ISFA (slow_feature_analysis)
# ---------------------------------------------------------------------------


def _direct_isfa(tbl, n_iters):
    """Single-process transcription of the reference ISFA loop
    (imgchngmthds.py:683-775) over centered ARRAYS (not the engine's
    moment expansion), with the same 2^-24 weight quantization."""
    from rsgislib_ray.stages.changedetect import chi2_sf

    X = np.stack(
        [tbl[c].to_numpy().astype(np.float64) for c in ("x1", "x2", "x3")]
    )
    Y = np.stack(
        [tbl[c].to_numpy().astype(np.float64) for c in ("y1", "y2", "y3")]
    )
    c, P = X.shape
    w = np.ones(P)
    for _ in range(n_iters):
        sw = w.sum()
        mx = (w * X).sum(axis=1, keepdims=True) / sw
        my = (w * Y).sum(axis=1, keepdims=True) / sw
        cx = X - mx
        cy = Y - my
        dd = (P - 1) * sw / P
        vx = (w * cx * cx).sum(axis=1, keepdims=True) / dd
        vy = (w * cy * cy).sum(axis=1, keepdims=True) / dd
        nx = cx / np.sqrt(vx)
        ny = cy / np.sqrt(vy)
        df = nx - ny
        mat_a = (w * df) @ df.T / dd
        mat_b = ((w * nx) @ nx.T + (w * ny) @ ny.T) / (2 * dd)
        eigval, eigvec = np.linalg.eig(np.linalg.solve(mat_b, mat_a))
        eigval = eigval.real
        idx = eigval.argsort()
        eigval = eigval[idx]
        eigvec = eigvec.real / np.abs(eigvec.real).max(axis=0)
        trans = eigvec[:, idx]
        isfa = trans.T @ nx - trans.T @ ny
        tt = (isfa * isfa / np.sqrt(eigval)[:, None]).sum(axis=0)
        wf = chi2_sf(tt, c)
        w = np.floor(wf * 16777216.0 + 0.5) / 16777216.0
    return tt, eigval


def test_isfa_general_matches_direct_transcription(ray_session):
    from rsgislib_ray.pipelines.queries import _sfa_src_tbl
    from rsgislib_ray.stages.changedetect import isfa_fit

    tbl = _sfa_src_tbl()
    exp_t, exp_lamb = _direct_isfa(tbl, 2)
    ds = ray.data.from_arrow(tbl).repartition(6)
    out, info = isfa_fit(
        ds,
        ["x1", "x2", "x3"],
        ["y1", "y2", "y3"],
        max_iter=2,
        epsilon=0.0,
    )
    df = out.to_pandas().sort_values("pixel_id")
    assert np.allclose(df["t_chi2"].to_numpy(), exp_t, rtol=1e-9, atol=1e-9)
    assert np.allclose(info["lamb"], exp_lamb, rtol=1e-9)


def test_sfa_mirrored_matches_general(ray_session):
    # The mirrored path swaps exact erfc for the shared A-S erfc
    # (|err| <= 1.5e-7 in the weight) — T parity within that bound.
    from rsgislib_ray.pipelines.queries import _sfa_src_tbl
    from rsgislib_ray.stages.changedetect import isfa_fit, sfa_fit_3band

    tbl = _sfa_src_tbl()
    ds = ray.data.from_arrow(tbl).repartition(4)
    mir, _ = sfa_fit_3band(ds, ["x1", "x2", "x3"], ["y1", "y2", "y3"], 2)
    mdf = mir.to_pandas().sort_values("pixel_id")
    gen, _ = isfa_fit(
        ds, ["x1", "x2", "x3"], ["y1", "y2", "y3"], max_iter=2, epsilon=0.0
    )
    gdf = gen.to_pandas().sort_values("pixel_id")
    assert np.allclose(
        mdf["t_q"].to_numpy() / 1e6,
        gdf["t_chi2"].to_numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_sfa_mirrored_partition_independent(ray_session):
    from rsgislib_ray.pipelines.queries import _sfa_src_tbl
    from rsgislib_ray.stages.changedetect import sfa_fit_3band

    tbl = _sfa_src_tbl()
    outs = []
    for parts in (1, 11):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out, _ = sfa_fit_3band(
            ds, ["x1", "x2", "x3"], ["y1", "y2", "y3"], 2, batch_size=700
        )
        outs.append(
            out.to_pandas().sort_values("pixel_id").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_pyod_knn_outliers_vs_naive(ray_session):
    """pyod_knn_outliers vs a naive per-point transcription (fit
    scores self-excluded, predict scores self-included, exact
    rational 90th-percentile threshold on the squared scale); the
    planted +500/+700 change population must be flagged and at least
    one in-distribution point must not."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.stages.changedetect import pyod_knn_outliers

    rng_ids = np.arange(400, dtype=np.int64)
    b1 = (rng_ids * 37) % 100 + np.where(rng_ids % 83 == 0, 500, 0)
    b2 = (rng_ids * 61) % 100 + np.where(rng_ids % 83 == 0, 700, 0)
    tbl = pa.table({"pixel_id": rng_ids, "band1": b1, "band2": b2})
    X = np.stack([b1, b2], 1).astype(np.int64)
    k = 5
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(2)
    fit = np.sort(d2, axis=1)[:, k]      # self (0) occupies col 0
    pred = np.sort(d2, axis=1)[:, k - 1]  # self included
    s = np.sort(fit)
    m = len(s)
    j, r = ((m - 1) * 9) // 10, ((m - 1) * 9) % 10
    thr10 = int(s[j]) * (10 - r) + int(s[min(j + 1, m - 1)]) * r
    want = np.where(10 * pred > thr10, 2, 1)

    ds = ray.data.from_arrow(tbl).repartition(5)
    got = (
        pyod_knn_outliers(ds, "pixel_id", ["band1", "band2"], k=k)
        .to_pandas().sort_values("pixel_id")
    )
    assert (got["label"].to_numpy() == want).all()
    assert (got["score"].to_numpy() == pred).all()
    planted = rng_ids % 83 == 0
    assert (got["label"].to_numpy()[planted] == 2).all()
    assert (got["label"].to_numpy()[~planted] == 1).any()
