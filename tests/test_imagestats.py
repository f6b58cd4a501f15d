"""imagestats + segsum: moment exactness, PCA invariants, EMD/PMI
helpers, AUC vs brute pandas, and the sort-based segment_sum vs
pandas groupby on adversarial partitionings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rsgislib_ray.stages.imagestats import (
    band_cross_moments,
    correlation_from_moments,
    covariance_from_moments,
    curve_auc,
    histogram_emd,
    image_pca,
    joint_histogram_pmi,
    mutual_information_nats,
)
from rsgislib_ray.stages.segsum import segment_sum


def _rand_table(rng, n=5000):
    return pa.table(
        {
            "cell_key": np.arange(n, dtype=np.int64),
            "a": rng.integers(0, 50, n),
            "b": rng.integers(0, 11, n),
            "c": rng.integers(0, 9, n),
        }
    )


def test_moments_match_numpy(ray_session):
    import ray

    rng = np.random.default_rng(3)
    t = _rand_table(rng)
    m = band_cross_moments(
        ray.data.from_arrow(t).repartition(7), ["a", "b", "c"]
    )
    a = t["a"].to_numpy()
    b = t["b"].to_numpy()
    assert m["n"] == len(t)
    assert m["s"][0] == int(a.sum())
    assert m["q"][(0, 1)] == int(np.dot(a, b))
    cov = covariance_from_moments(m)
    ref = np.cov(np.stack([a, b, t["c"].to_numpy()]), ddof=1)
    assert np.allclose(cov, ref, rtol=1e-12)
    r = correlation_from_moments(m, 0, 1)
    assert np.isclose(r, np.corrcoef(a, b)[0, 1], rtol=1e-12)


def test_pca_invariants(ray_session):
    import ray

    rng = np.random.default_rng(5)
    t = _rand_table(rng, n=3000)
    ds = ray.data.from_arrow(t).repartition(4)
    scores, comps, evals = image_pca(ds, ["a", "b", "c"], k=3)
    # orthonormal, deterministic sign
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-10)
    for r in range(3):
        assert comps[r, np.argmax(np.abs(comps[r]))] > 0
    sdf = scores.to_pandas()
    # score variance equals the eigenvalues, scores uncorrelated
    sc = sdf[["pc1", "pc2", "pc3"]].to_numpy()
    got = np.cov(sc.T, ddof=1)
    assert np.allclose(np.diag(got), evals, rtol=1e-8)
    assert np.allclose(got - np.diag(np.diag(got)), 0, atol=1e-6)
    # eigenvalue sum == total variance (trace conservation)
    m = band_cross_moments(ds, ["a", "b", "c"])
    assert np.isclose(
        evals.sum(), np.trace(covariance_from_moments(m)), rtol=1e-12
    )


def test_pmi_and_mi(ray_session):
    import ray

    rng = np.random.default_rng(9)
    n = 4000
    a = rng.integers(0, 4, n)
    b = np.where(rng.random(n) < 0.7, a, rng.integers(0, 4, n))  # dependent
    ds = ray.data.from_arrow(
        pa.table({"a": a.astype(np.int64), "b": b.astype(np.int64)})
    ).repartition(5)
    tbl = joint_histogram_pmi(ds, "a", "b", 4, 4)
    assert int(tbl["cnt"].to_numpy().sum()) == n
    mi = mutual_information_nats(tbl)
    # dependent variables -> clearly positive MI
    assert mi > 0.3
    # diagonal cells over-represented -> positive PMI
    df = tbl.to_pandas()
    diag = df[df["val_a"] == df["val_b"]]["pmi_micro"]
    assert (diag > 0).all()


def test_emd_matches_scipy_style_brute(ray_session):
    import ray

    rng = np.random.default_rng(2)
    v = np.concatenate([rng.integers(0, 10, 500), rng.integers(5, 20, 400)])
    s = np.array(["A"] * 500 + ["N"] * 400)
    ds = ray.data.from_arrow(pa.table({"val": v, "flag": s})).repartition(4)
    tbl, emd = histogram_emd(ds, "val", "flag", "A", "N", card=21)
    ca = np.bincount(v[:500], minlength=21)
    cb = np.bincount(v[500:], minlength=21)
    brute = np.abs(
        np.cumsum(ca) / 500 - np.cumsum(cb) / 400
    )[:-1].sum()
    assert np.isclose(emd, brute, rtol=1e-12)
    assert int(tbl["cum_a"].to_numpy()[-1]) == 500


def test_curve_auc_matches_pandas(ray_session):
    import ray

    rng = np.random.default_rng(4)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 300, n).astype(np.int64),
            "x": rng.integers(1, 8, n).astype(np.int64),
            "y": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = (
        curve_auc(ds, "k", "x", "y", x_stride=16)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    # brute: aggregate duplicates, pair consecutive-x samples
    agg = df.groupby(["k", "x"], as_index=False)["y"].sum()
    rows = []
    for k, g in agg.groupby("k"):
        g = g.sort_values("x")
        xs, ys = g["x"].to_numpy(), g["y"].to_numpy()
        tot = 0
        for i in range(len(xs) - 1):
            if xs[i + 1] == xs[i] + 1:
                tot += ys[i] + ys[i + 1]
        if tot:
            rows.append((k, tot))
    ref = pd.DataFrame(rows, columns=["key", "auc2"]).sort_values(
        "key"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@pytest.mark.parametrize("parts", [1, 3, 13])
def test_segment_sum_matches_pandas(ray_session, parts):
    import ray

    rng = np.random.default_rng(parts)
    n = 20000
    t = pa.table(
        {
            "key": rng.integers(0, 15000, n),  # high cardinality
            "v1": rng.integers(-5, 50, n),
            "v2": rng.integers(0, 3, n),
        }
    )
    got = (
        segment_sum(
            ray.data.from_arrow(t).repartition(parts), "key", ["v1", "v2"]
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    ref = (
        t.to_pandas()
        .groupby("key", as_index=False)[["v1", "v2"]]
        .sum()
        .sort_values("key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # no duplicated keys leak through the edge stitch
    assert got["key"].is_unique


def test_segment_sum_min_max(ray_session):
    import ray

    rng = np.random.default_rng(42)
    n = 8000
    t = pa.table(
        {
            "key": rng.integers(0, 5000, n),
            "lo": rng.integers(-100, 100, n),
            "hi": rng.integers(-100, 100, n),
        }
    )
    got = (
        segment_sum(
            ray.data.from_arrow(t).repartition(9),
            "key",
            ["lo", "hi"],
            aggs=["min", "max"],
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    ref = (
        t.to_pandas()
        .groupby("key", as_index=False)
        .agg({"lo": "min", "hi": "max"})
        .sort_values("key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_segment_sum_single_giant_group(ray_session):
    import ray

    t = pa.table(
        {
            "key": np.zeros(5000, dtype=np.int64),
            "v1": np.ones(5000, dtype=np.int64),
        }
    )
    got = segment_sum(
        ray.data.from_arrow(t).repartition(11), "key", ["v1"]
    ).to_pandas()
    assert len(got) == 1 and int(got["v1"].iloc[0]) == 5000


def test_split_window_otsu_bimodal(ray_session):
    import ray

    from rsgislib_ray.stages.imagestats import split_window_otsu

    rng = np.random.default_rng(8)
    # tile 0: clean bimodal {2, 40}; tile 1: uniform
    v0 = np.concatenate([np.full(200, 2), np.full(150, 40)])
    v1 = rng.integers(0, 50, 300)
    t = pa.table(
        {
            "tile_id": np.concatenate(
                [np.zeros(350, dtype=np.int64), np.ones(300, dtype=np.int64)]
            ),
            "val": np.concatenate([v0, v1]).astype(np.int64),
        }
    )
    out = split_window_otsu(
        ray.data.from_arrow(t).repartition(4), "tile_id", "val", card=50
    ).to_pandas()
    assert len(out) == 2
    thr0 = int(out[out["tile_id"] == 0]["threshold"].iloc[0])
    # bimodal split lands strictly between the two modes
    assert 2 <= thr0 < 40
    assert int(out[out["tile_id"] == 0]["n_vals"].iloc[0]) == 350


def test_pixel_percentiles_rank_select(ray_session):
    import ray

    from rsgislib_ray.stages.imagestats import pixel_percentiles

    t = pa.table(
        {
            "pixel_id": np.arange(4, dtype=np.int64),
            "a": np.array([9, 1, 5, 5], dtype=np.int64),
            "b": np.array([3, 2, 5, 6], dtype=np.int64),
            "c": np.array([7, 3, 5, 7], dtype=np.int64),
            "d": np.array([1, 4, 5, 8], dtype=np.int64),
        }
    )
    out = (
        pixel_percentiles(
            ray.data.from_arrow(t), ["a", "b", "c", "d"], [0, 50, 75, 100]
        )
        .to_pandas()
        .sort_values("pixel_id")
    )
    assert out["p0"].tolist() == [1, 1, 5, 5]
    assert out["p50"].tolist() == [3, 2, 5, 6]
    assert out["p75"].tolist() == [7, 3, 5, 7]
    assert out["p100"].tolist() == [9, 4, 5, 8]


def test_neighbor_differences_match_brute(ray_session):
    import ray

    from rsgislib_ray.stages.imagestats import neighbor_differences

    n = 32
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    b1 = (pid * 37) % 100
    b2 = (pid * 61) % 100
    t = pa.table(
        {"pixel_id": pid, "row": row, "col": col, "band1": b1, "band2": b2}
    )
    got = (
        neighbor_differences(
            ray.data.from_arrow(t).repartition(7), ["band1", "band2"], width=n
        )
        .to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True)
    )
    # brute: d(p) = x(r,c+1) - x(r,c) for c < n-1, keyed by left pixel
    left = col < n - 1
    assert got["pixel_id"].tolist() == pid[left].tolist()
    assert got["d0"].to_numpy().tolist() == (
        b1.reshape(n, n)[:, 1:] - b1.reshape(n, n)[:, :-1]
    ).ravel().tolist()
    assert got["d1"].to_numpy().tolist() == (
        b2.reshape(n, n)[:, 1:] - b2.reshape(n, n)[:, :-1]
    ).ravel().tolist()


def test_image_mnf_invariants(ray_session):
    import ray

    from rsgislib_ray.stages.imagestats import (
        band_cross_moments,
        covariance_from_moments,
        image_mnf,
        neighbor_differences,
    )

    n = 48
    rng = np.random.default_rng(42)
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    # signal: smooth row gradient in b1; noise: iid integer jitter
    b1 = row * 3 + rng.integers(-2, 3, n * n)
    b2 = rng.integers(0, 10, n * n) + col  # column gradient + noise
    t = pa.table(
        {"pixel_id": pid, "row": row, "col": col, "b1": b1, "b2": b2}
    )
    ds = ray.data.from_arrow(t).repartition(5)
    scores, comps, snr = image_mnf(
        ds, ["b1", "b2"], k=2, width=n
    )
    # SNR eigenvalues sorted descending
    assert snr[0] >= snr[1] > 0
    # components noise-whiten: V Σ_N Vᵀ = I
    diffs = neighbor_differences(ds, ["b1", "b2"], width=n)
    cov_n = covariance_from_moments(
        band_cross_moments(diffs, ["d0", "d1"])
    )
    eye = comps @ cov_n @ comps.T
    assert np.allclose(eye, np.eye(2), atol=1e-8)
    # projected scores have sample covariance diag(snr) in whitened units
    sc = scores.to_pandas().sort_values("pixel_id")
    x = sc[["mnf1", "mnf2"]].to_numpy()
    cov_sc = np.cov(x, rowvar=False)
    # scores covariance equals comps Σ_S compsᵀ = diag(snr)
    assert np.allclose(np.diag(cov_sc), snr, rtol=1e-6)
    assert abs(cov_sc[0, 1]) < 1e-6


def test_histogram_thresholds_match_raw_data_reference(ray_session):
    """histogram_thresholds vs the reference formulas run directly on
    the raw array (li iterates raw-data means exactly as
    tools/stats.py:894-905; isodata/yen/otsu brute over every cut)."""
    import ray

    from rsgislib_ray.stages.imagestats import (
        global_histogram,
        histogram_thresholds,
    )

    rng = np.random.default_rng(11)
    d = np.concatenate(
        [rng.integers(1, 15, 5000), rng.integers(28, 46, 3000)]
    ).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": d})).repartition(6)
    hist = global_histogram(ds, "v", 64)
    assert hist.sum() == len(d)
    got = histogram_thresholds(hist)

    # li reference: raw-data iteration (stats.py:882-905)
    tol = np.diff(np.unique(d)).min() / 2
    t_next, t_curr = d.mean(), -2 * tol
    while abs(t_next - t_curr) > tol:
        t_curr = t_next
        fore = d > t_curr
        mf, mb = d[fore].mean(), d[~fore].mean()
        t_next = (mb - mf) / (np.log(mb) - np.log(mf))
    assert got["li"] == pytest.approx(t_next, abs=1e-9)

    # otsu reference: float between-class variance brute over cuts
    vals = np.arange(d.min(), d.max() + 1)
    best, bt = -1.0, None
    n = len(d)
    for t in vals[:-1]:
        lo, hi = d[d <= t], d[d > t]
        if len(lo) == 0 or len(hi) == 0:
            continue
        bc = len(lo) / n * len(hi) / n * (lo.mean() - hi.mean()) ** 2
        if bc > best + 1e-12:
            best, bt = bc, t
    assert got["otsu"] == bt

    # isodata fixed point: t = (mean(<=t) + mean(>t)) / 2 within a bin
    t = got["isodata"]
    mids = (d[d <= t].mean() + d[d > t].mean()) / 2
    assert 0 <= mids - t < 1.0

    # yen: brute criterion over cuts (stats.py:699-720 with unit bins)
    h = np.bincount(d - d.min(), minlength=len(vals)) / n
    p1 = np.cumsum(h)
    p1sq = np.cumsum(h**2)
    p2sq = np.cumsum(h[::-1] ** 2)[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        crit = np.log(
            ((p1sq[:-1] * p2sq[1:]) ** -1) * (p1[:-1] * (1 - p1[:-1])) ** 2
        )
    assert got["yen"] == vals[np.nanargmax(crit)]


def test_vif_matches_ols_definition(ray_session):
    """VIF via correlation-inverse == 1/(1-R2) from per-feature OLS."""
    import ray

    from rsgislib_ray.stages.imagestats import band_cross_moments

    rng = np.random.default_rng(21)
    f1 = rng.integers(0, 50, 4000)
    f2 = f1 * 3 + rng.integers(0, 17, 4000)
    f3 = rng.integers(0, 23, 4000)
    t = pa.table({"f1": f1, "f2": f2, "f3": f3})
    m = band_cross_moments(
        ray.data.from_arrow(t).repartition(5), ["f1", "f2", "f3"]
    )
    n, s, q, d = m["n"], m["s"], m["q"], m["d"]
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(d):
            key = (min(i, j), max(i, j))
            cov[i, j] = float(n * q[key] - s[i] * s[j])
    sd = np.sqrt(np.diag(cov))
    corr = cov / np.outer(sd, sd)
    vif = np.diag(np.linalg.inv(corr))

    X = np.stack([f1, f2, f3], axis=1).astype(np.float64)
    for j in range(3):
        others = np.delete(X, j, axis=1)
        A = np.column_stack([np.ones(len(X)), others])
        beta, *_ = np.linalg.lstsq(A, X[:, j], rcond=None)
        resid = X[:, j] - A @ beta
        r2 = 1 - resid.var() / X[:, j].var()
        assert vif[j] == pytest.approx(1.0 / (1.0 - r2), rel=1e-9)
    assert (vif >= 1.0 - 1e-12).all()
    assert vif[0] > 5 and vif[1] > 5  # collinear pair inflated


def test_utm_forward_invariants():
    from rsgislib_ray.functions.utm import utm_from_latlon, zone_number

    # central meridian of zone 30 is -3 deg -> easting exactly 500000
    e, n, zn, li = utm_from_latlon(
        np.array([51.0, 0.000001]), np.array([-3.0, -3.0])
    )
    assert zn.tolist() == [30, 30]
    assert e[0] == 500000.0 and e[1] == 500000.0
    # equator -> northing ~ 0; 51N -> ~5.65e6 m (sanity window)
    assert abs(n[1]) < 0.2
    assert 5.6e6 < n[0] < 5.7e6
    # easting grows monotonically with longitude within the zone
    lons = np.linspace(-5.9, -0.1, 20)
    e2, *_ = utm_from_latlon(np.full(20, 51.0), lons)
    assert (np.diff(e2) > 0).all()
    # Norway exception: (60, 5) is zone 32, not 31
    assert zone_number(np.array([60.0]), np.array([5.0]))[0] == 32


def test_mnf_closed_form_matches_eigh(ray_session):
    """The 2x2 closed-form MNF projection (queries.mnf_project_2d)
    agrees with the whitened-eigh image_mnf up to float tolerance."""
    import ray

    from rsgislib_ray.pipelines.queries import _seg_raster, queries
    from rsgislib_ray.stages.imagestats import image_mnf

    closed = (
        queries()["mnf_project_2d"]("unused")
        .to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True)
    )
    ds = ray.data.from_arrow(_seg_raster()).repartition(8)
    scores, comps, snr = image_mnf(ds, ["band1", "band2"], k=2, width=80)
    eigh = (
        scores.to_pandas().sort_values("pixel_id").reset_index(drop=True)
    )
    np.testing.assert_allclose(
        closed["mnf1"].to_numpy(), eigh["mnf1"].to_numpy(), atol=1e-8
    )
    np.testing.assert_allclose(
        closed["mnf2"].to_numpy(), eigh["mnf2"].to_numpy(), atol=1e-8
    )


def test_sym3_closed_form_matches_eigh():
    from rsgislib_ray.stages.imagestats import sym3_eig_closed

    rng = np.random.default_rng(13)
    for _ in range(25):
        M = rng.normal(size=(3, 3))
        A = M @ M.T + np.eye(3)
        lams, vecs = sym3_eig_closed(A)
        w, v = np.linalg.eigh(A)
        np.testing.assert_allclose(lams, w[::-1], rtol=1e-10)
        for k in range(3):
            ref = v[:, 2 - k]
            if ref[int(np.argmax(np.abs(ref)))] < 0:
                ref = -ref
            np.testing.assert_allclose(vecs[k], ref, atol=1e-8)


def test_sym3_isotropic_degenerate():
    """Exactly isotropic A = q*I (p2 == 0) must not produce NaNs —
    eigenvalues are the diagonal, eigenvectors the identity axes."""
    from rsgislib_ray.stages.imagestats import sym3_eig_closed

    lams, vecs = sym3_eig_closed(np.eye(3) * 2.5)
    assert np.isfinite(lams).all() and np.isfinite(vecs).all()
    np.testing.assert_allclose(lams, [2.5, 2.5, 2.5])
    np.testing.assert_allclose(vecs, np.eye(3))


def test_mnf3_closed_form_matches_whitened_eigh():
    from rsgislib_ray.stages.imagestats import mnf3_closed

    rng = np.random.default_rng(31)
    for seed in range(6):
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(3, 3))
        S = A @ A.T + np.eye(3) * 2
        B = rng.normal(size=(3, 3))
        N = B @ B.T + np.eye(3)
        lams, comps = mnf3_closed(S, N)
        wn, vn = np.linalg.eigh(N)
        ihalf = vn @ np.diag(1.0 / np.sqrt(wn)) @ vn.T
        w, v = np.linalg.eigh(ihalf @ S @ ihalf)
        order = np.argsort(w)[::-1]
        ref = (ihalf @ v[:, order]).T
        np.testing.assert_allclose(lams, w[order], rtol=1e-9)
        for k in range(3):
            r = ref[k]
            if r[int(np.argmax(np.abs(r)))] < 0:
                r = -r
            np.testing.assert_allclose(comps[k], r, atol=1e-8)
            np.testing.assert_allclose(comps[k] @ N @ comps[k], 1.0, atol=1e-9)


def test_jacobi_eigh_pinned_vs_lapack():
    """The pinned cyclic Jacobi agrees with np.linalg.eigh on random
    symmetric matrices (eigenvalues to 1e-12 rel; eigenvectors up to
    sign), its V is orthonormal, and 8 sweeps reach machine-precision
    off-diagonals for d up to 6."""
    from rsgislib_ray.stages.imagestats import jacobi_eigh_pinned

    rng = np.random.default_rng(17)
    for d in (2, 3, 4, 6):
        for _ in range(5):
            B = rng.normal(size=(d, d))
            C = B @ B.T + np.eye(d)
            evs, V = jacobi_eigh_pinned(C)
            w = np.linalg.eigh(C)[0]
            assert np.allclose(sorted(evs), w, rtol=1e-12)
            Vn = np.array(V)
            assert np.allclose(Vn @ Vn.T, np.eye(d), atol=1e-12)
            # V diagonalizes C
            D = Vn.T @ C @ Vn
            off = D - np.diag(np.diag(D))
            assert np.abs(off).max() < 1e-9 * np.abs(D).max()
