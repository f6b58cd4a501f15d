"""Regression-stage tests: brute-force single-process references for
the k-fold linear fit + metric panel, the kNN regressor, the histogram
regression tree, and the elastic-net coordinate descent (reference
surface: regression/regresssklearn.py perform_kfold_fit / estimator
grids; regression/__init__.py get_regression_stats)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.stages import regress as rg

FC = ["x1", "x2", "x3"]
NF = 5


def _fixture(n=4000, seed=11, parallelism=8):
    rng = np.random.default_rng(seed)
    ck = np.arange(n, dtype=np.int64) * 3 + 2
    x1 = (ck * 7) % 23
    x2 = (ck * 3) % 17
    x3 = (ck * 11) % 13
    y = 3 * x1 - 2 * x2 + x3 + ((ck * 5) % 7 - 3)
    t = pa.table(
        {"ck": ck, "fold": ck % NF, "x1": x1, "x2": x2, "x3": x3, "y": y}
    )
    perm = rng.permutation(n)
    ds = ray.data.from_arrow(t.take(pa.array(perm))).repartition(parallelism)
    return t, ds


def test_kfold_fit_matches_lstsq(ray_session):
    t, ds = _fixture()
    m = rg.fold_moments(ds, FC, "y", "fold", NF)
    coefs = rg.kfold_lsq_fit(m, 3, NF)
    fold = t["fold"].to_numpy()
    X = np.column_stack(
        [np.ones(len(t))] + [t[c].to_numpy().astype(float) for c in FC]
    )
    yv = t["y"].to_numpy().astype(float)
    for fo in range(NF):
        tr = fold != fo
        ref, *_ = np.linalg.lstsq(X[tr], yv[tr], rcond=None)
        assert np.allclose(coefs[fo], ref, rtol=1e-9, atol=1e-9)


def test_kfold_panel_matches_bruteforce(ray_session):
    t, ds = _fixture()
    panel = rg.kfold_lsq_panel(ds, FC, "y", "fold", NF)
    m = rg.fold_moments(ds, FC, "y", "fold", NF)
    coefs = rg.kfold_lsq_fit(m, 3, NF)
    fold = t["fold"].to_numpy()
    X = np.column_stack(
        [np.ones(len(t))] + [t[c].to_numpy().astype(float) for c in FC]
    )
    yv = t["y"].to_numpy().astype(float)
    p = panel.to_pandas().set_index("fold")
    for fo in range(NF):
        te = fold == fo
        yh = X[te] @ coefs[fo]
        e = yv[te] - yh
        mse = float(np.mean(e * e))
        assert p.loc[fo, "mse"] == pytest.approx(mse, rel=1e-12)
        assert p.loc[fo, "rmse"] == pytest.approx(math.sqrt(mse), rel=1e-12)
        sst = float(np.sum((yv[te] - yv[te].mean()) ** 2))
        assert p.loc[fo, "r2"] == pytest.approx(
            1.0 - mse * te.sum() / sst, rel=1e-10
        )
        assert p.loc[fo, "bias"] == pytest.approx(
            float(np.mean(yh - yv[te])), abs=1e-9
        )
        q = np.floor(np.abs(e) * 1e6 + 0.5).astype(np.int64)
        assert int(p.loc[fo, "mae_q"]) == int(q.sum())
        qs = np.sort(q)
        n = len(qs)
        med = (float(qs[(n + 1) // 2 - 1]) + float(qs[n // 2])) / 2.0
        assert p.loc[fo, "med_q"] == med
        assert p.loc[fo, "explained_variance"] == pytest.approx(
            1.0 - np.var(e) / np.var(yv[te]), rel=1e-10
        )
        assert p.loc[fo, "noise"] >= 0.0


def test_kfold_panel_partition_independent(ray_session):
    t, _ = _fixture()
    a = rg.kfold_lsq_panel(
        ray.data.from_arrow(t).repartition(3), FC, "y", "fold", NF
    )
    b = rg.kfold_lsq_panel(
        ray.data.from_arrow(t).repartition(17), FC, "y", "fold", NF
    )
    assert a.to_pandas().equals(b.to_pandas())


def test_knn_regressor_bruteforce(ray_session):
    t, _ = _fixture(n=400)
    tr = t.slice(0, 300)
    te = t.slice(300, 100)
    ds = ray.data.from_arrow(te).repartition(4)
    out = (
        rg.knn_regress(
            ds,
            train_x=np.stack([tr[c].to_numpy() for c in FC], axis=1),
            train_y=tr["y"].to_numpy(),
            train_id=tr["ck"].to_numpy(),
            feature_cols=FC,
            k=4,
        )
        .to_pandas()
        .set_index("ck")
        .sort_index()
    )
    tx = np.stack([tr[c].to_numpy() for c in FC], axis=1)
    ty = tr["y"].to_numpy()
    tid = tr["ck"].to_numpy()
    for row in te.to_pylist():
        x = np.array([row[c] for c in FC])
        d2 = ((tx - x) ** 2).sum(axis=1)
        order = np.lexsort((tid, d2))[:4]
        ny, nd2 = ty[order], d2[order]
        assert out.loc[row["ck"], "ysum"] == ny.sum()
        assert out.loc[row["ck"], "pred_u"] == pytest.approx(
            ny.mean(), rel=1e-12
        )
        if (nd2 == 0).any():
            exp = ny[nd2 == 0].mean()
        else:
            w = 1.0 / np.sqrt(nd2)
            exp = float((ny * w).sum() / w.sum())
        assert out.loc[row["ck"], "pred_w"] == pytest.approx(exp, rel=1e-9)


def test_knn_zero_distance_fallback(ray_session):
    # a test point identical to two train points -> prediction is the
    # exact mean of the zero-distance neighbours (sklearn semantics)
    tr_x = np.array([[1, 1, 1], [1, 1, 1], [5, 5, 5], [9, 9, 9]])
    tr_y = np.array([10, 20, 300, 400])
    te = pa.table({"ck": [1], "x1": [1], "x2": [1], "x3": [1]})
    out = rg.knn_regress(
        ray.data.from_arrow(te),
        train_x=tr_x,
        train_y=tr_y,
        train_id=np.array([1, 2, 3, 4]),
        feature_cols=FC,
        k=3,
    ).to_pandas()
    assert out["pred_w"][0] == pytest.approx(15.0)


def test_reg_tree_bruteforce_split_search(ray_session):
    t, ds = _fixture(n=3000)
    domains = [23, 17, 13]
    model = rg.train_reg_tree(ds, FC, "y", domains, max_depth=2)
    # brute-force: root split must minimize SSE_L + SSE_R exactly
    xs = [t[c].to_numpy().astype(np.int64) for c in FC]
    yv = t["y"].to_numpy().astype(np.int64)

    def best_split(mask):
        best = None
        for f in range(3):
            for v in np.unique(xs[f][mask])[:-1]:
                l = mask & (xs[f] <= v)
                r = mask & ~(xs[f] <= v)
                out = 0.0
                ok = True
                for side in (l, r):
                    ys = yv[side]
                    if len(ys) == 0:
                        ok = False
                        break
                    n = len(ys)
                    sse = float(
                        n * int(np.dot(ys, ys)) - int(ys.sum()) ** 2
                    ) / float(n)
                    out = out + sse
                if not ok:
                    continue
                key = (out, f, int(v))
                if best is None or key < best:
                    best = key
        return best

    root = best_split(np.ones(len(yv), dtype=bool))
    assert model["splits"][(0, 0)] == (root[1], root[2])
    f0, v0 = model["splits"][(0, 0)]
    left = best_split(xs[f0] <= v0)
    right = best_split(xs[f0] > v0)
    assert model["splits"][(1, 0)] == (left[1], left[2])
    assert model["splits"][(1, 1)] == (right[1], right[2])
    # leaf means are the exact node means
    out = rg.apply_reg_tree(ds, model).to_pandas().set_index("ck")
    node = np.where(xs[f0] <= v0, 0, 1)
    lf = np.empty(len(yv), dtype=np.int64)
    m0 = node == 0
    lf[m0] = np.where(xs[left[1]][m0] <= left[2], 0, 1)
    m1 = node == 1
    lf[m1] = np.where(xs[right[1]][m1] <= right[2], 2, 3)
    cks = t["ck"].to_numpy()
    for l_ in range(4):
        m = lf == l_
        if not m.any():
            continue
        exp = float(int(yv[m].sum())) / float(int(m.sum()))
        got = out.loc[cks[m], "pred"].to_numpy()
        assert (got == exp).all()


def test_elasticnet_cd_matches_scalar_reference(ray_session):
    t, ds = _fixture()
    m = rg.fold_moments(ds, FC, "y", "fold", NF)
    beta = rg.elasticnet_cd(m["global"], 3, 0.1, 0.5, 6)
    # scalar re-implementation over raw arrays (same update maths,
    # data-level sums) must agree to float tolerance
    X = np.stack([t[c].to_numpy().astype(float) for c in FC], axis=1)
    yv = t["y"].to_numpy().astype(float)
    n = len(yv)
    lam1 = 0.1 * 0.5 * n
    lam2 = 0.1 * 0.5 * n
    b0, b = 0.0, np.zeros(3)
    for _ in range(6):
        b0 = (yv - X @ b).sum() / n
        for i in range(3):
            r = yv - b0 - X @ b + X[:, i] * b[i]
            rho = float(X[:, i] @ r)
            zi = float(X[:, i] @ X[:, i]) + lam2
            if rho > lam1:
                b[i] = (rho - lam1) / zi
            elif rho < -lam1:
                b[i] = (rho + lam1) / zi
            else:
                b[i] = 0.0
    assert beta[0] == pytest.approx(b0, rel=1e-9)
    assert np.allclose(beta[1:], b, rtol=1e-9)


def test_pls_fit_matches_explicit_nipals(ray_session):
    t, ds = _fixture()
    m = rg.fold_moments(ds, FC, "y", "fold", NF)
    out = rg.pls_fit(m["global"], 3, 2)
    X = np.stack([t[c].to_numpy().astype(float) for c in FC], axis=1)
    yv = t["y"].to_numpy().astype(float)
    Xc = X - X.mean(0)
    yc = yv - yv.mean()
    W, P, Q = [], [], []
    Xa, ya = Xc.copy(), yc.copy()
    for _a in range(2):
        w = Xa.T @ ya
        w = w / np.linalg.norm(w)
        tv = Xa @ w
        tt = tv @ tv
        p = Xa.T @ tv / tt
        q = ya @ tv / tt
        Xa = Xa - np.outer(tv, p)
        ya = ya - q * tv
        W.append(w)
        P.append(p)
        Q.append(q)
    Wm = np.array(W).T
    Pm = np.array(P).T
    beta = Wm @ np.linalg.solve(Pm.T @ Wm, np.array(Q))
    b0 = yv.mean() - X.mean(0) @ beta
    assert np.allclose(out["beta"], beta, rtol=1e-8)
    assert out["b0"] == pytest.approx(b0, rel=1e-8)
    assert np.allclose(out["q"], Q, rtol=1e-8)


def test_reg_tree_partition_independent(ray_session):
    t, _ = _fixture(n=2000)
    ms = []
    for parts in (3, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        ms.append(rg.train_reg_tree(ds, FC, "y", [23, 17, 13], 2))
    assert ms[0]["splits"] == ms[1]["splits"]
    assert ms[0]["leaf"] == ms[1]["leaf"]
