"""Scoring panels vs brute-force references on raw arrays."""

import math

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages import scores as sc


def _data(rng, n=4000, S=20):
    y = (rng.random(n) < 0.3).astype(np.int64)
    s = np.clip(
        rng.integers(0, 14, n) + y * rng.integers(3, 8, n), 0, S
    ).astype(np.int64)
    return y, s


def test_prob_panel_vs_brute(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    y, s = _data(rng)
    S = 20
    ds = ray.data.from_arrow(pa.table({"y": y, "s": s})).repartition(5)
    hist = sc.prob_score_histogram(ds, "y", "s", S)
    out = sc.bin_accuracy_scores_prob(hist, S).to_pandas().iloc[0]
    # AUC: brute-force pair counting with 0.5 tie credit
    pos = s[y == 1]
    neg = s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert out["auc"] == pytest.approx(auc, rel=1e-12)
    # point-biserial == Pearson corr
    r = np.corrcoef(y.astype(float), s.astype(float))[0, 1]
    assert out["point_biserial"] == pytest.approx(r, rel=1e-10)
    # average precision: sklearn formula on raw arrays
    order = np.argsort(-s, kind="stable")
    ys = y[order]
    svals = s[order]
    ap = 0.0
    tp = fp = prev_tp = 0
    for v in np.unique(svals)[::-1]:
        m = svals == v
        tp += int(ys[m].sum())
        fp += int((1 - ys[m]).sum())
        ap += (tp - prev_tp) / y.sum() * (tp / (tp + fp))
        prev_tp = tp
    assert out["avg_precision"] == pytest.approx(ap, rel=1e-12)
    # Brier
    brier = np.mean((s / S - y) ** 2)
    assert out["brier"] == pytest.approx(brier, rel=1e-12)
    # log loss
    p = np.clip(s / S, sc.LOG_EPS, 1 - sc.LOG_EPS)
    ll = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert out["log_loss_nano"] / 1e9 == pytest.approx(ll, abs=2e-9)


def test_binary_panel_vs_brute(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    y = (rng.random(3000) < 0.4).astype(np.int64)
    pred = np.where(rng.random(3000) < 0.15, 1 - y, y)
    ds = ray.data.from_arrow(
        pa.table({"y": y, "pred": pred})
    ).repartition(4)
    counts = sc.binary_confusion(ds, "y", "pred")
    TP = int(((y == 1) & (pred == 1)).sum())
    TA = int(((y == 0) & (pred == 0)).sum())
    FP = int(((y == 1) & (pred == 0)).sum())
    FA = int(((y == 0) & (pred == 1)).sum())
    assert counts == {"TP": TP, "TA": TA, "FP": FP, "FA": FA}
    out = sc.accuracy_scores_binary(counts).to_pandas()
    val = dict(zip(out["metric"], out["score_nano"] / 1e9))
    n = len(y)
    assert val["Sensitivity"] == pytest.approx(TP / (TP + FP), abs=1e-9)
    assert val["Specificity"] == pytest.approx(TA / (TA + FA), abs=1e-9)
    assert val["Accuracy"] == pytest.approx((TP + TA) / n, abs=1e-9)
    # the reference's quirky prevalence formula, faithfully
    assert val["Prevalence"] == pytest.approx(
        (TP / FA) / n, abs=1e-9
    )
    assert val["F1 Score"] == pytest.approx(
        2 * TP / (2 * TP + FP + FA), abs=1e-9
    )
    mcc = ((TP * TA) - (FP * FA)) / math.sqrt(
        (TP + FP) * (TP + FA) * (TA + FP) * (TA + FA)
    )
    assert val["Matthews Correlation"] == pytest.approx(mcc, abs=1e-9)
    assert val["Hanssen-Kuiper skill"] == pytest.approx(
        TP / (TP + FP) + TA / (TA + FA) - 1, abs=1e-9
    )
    # NMI bounds + perfect-prediction sanity
    assert 0.0 < val["Normalised Mutual Information"] < 1.0
    perfect = sc.accuracy_scores_binary(
        {"TP": 100, "TA": 200, "FP": 0, "FA": 50}
    ).to_pandas()
    assert perfect is not None


def test_bias_variance(ray_session):
    import ray.data

    rng = np.random.default_rng(19)
    t = rng.integers(1, 50, 2000).astype(np.int64)
    p = t + rng.integers(-3, 4, 2000)
    ds = ray.data.from_arrow(pa.table({"t": t, "p": p})).repartition(3)
    out = sc.bias_variance_panel(ds, "t", "p").to_pandas().iloc[0]
    d = (p - t).astype(float)
    assert out["bias"] == pytest.approx(d.mean(), rel=1e-12)
    assert out["mse"] == pytest.approx((d**2).mean(), rel=1e-12)
    assert out["variance"] == pytest.approx(d.var(), rel=1e-9)
    assert out["norm_bias"] == pytest.approx(
        d.mean() / t.mean() * 100, rel=1e-12
    )
    assert out["noise"] >= 0.0


def test_breusch_pagan_vs_direct(ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    n = 3000
    x = rng.integers(1, 21, n).astype(np.int64)
    # heteroskedastic: noise scale grows with x
    y = (3 * x + np.rint(rng.normal(0, 1, n) * x).astype(np.int64)).astype(
        np.int64
    )
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y})).repartition(4)
    out = sc.breusch_pagan(ds, "x", "y", range(1, 21)).to_pandas().iloc[0]
    # direct: OLS fit, squared residuals, aux regression R^2
    X = np.stack([x.astype(float), np.ones(n)], axis=1)
    beta, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    err = (y - X @ beta) ** 2
    Xa = np.stack([x.astype(float), np.ones(n)], axis=1)
    ab, *_ = np.linalg.lstsq(Xa, err, rcond=None)
    pred = Xa @ ab
    ss_tot = np.sum((err - err.mean()) ** 2)
    ss_res = np.sum((err - pred) ** 2)
    r2 = 1 - ss_res / ss_tot
    assert out["aux_r2"] == pytest.approx(r2, rel=1e-6)
    assert out["lm_stat"] == pytest.approx(n * r2, rel=1e-6)
    # heteroskedastic fixture should light up the statistic
    assert out["lm_stat"] > 50.0
