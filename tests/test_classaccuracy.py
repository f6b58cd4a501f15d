"""Classification accuracy metrics vs independent vectorized numpy
references (sklearn formulas re-derived) and partition independence."""

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages import classaccuracy as ca


def _labels(rng, n, k=4, err=0.2):
    ref = rng.integers(1, k + 1, n)
    pred = ref.copy()
    flip = rng.random(n) < err
    pred[flip] = ((pred[flip] + rng.integers(0, k - 1, flip.sum())) % k) + 1
    return ref.astype(np.int64), pred.astype(np.int64)


def _np_cm(ref, pred, k):
    cm = np.zeros((k, k), dtype=np.int64)
    np.add.at(cm, (ref - 1, pred - 1), 1)
    return cm


def test_confusion_matches_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    ref, pred = _labels(rng, 5000)
    ds = ray.data.from_arrow(
        pa.table({"ref": ref, "pred": pred})
    ).repartition(6)
    counts = ca.confusion_counts(ds, "ref", "pred")
    cm = _np_cm(ref, pred, 4)
    for i in range(4):
        for j in range(4):
            assert counts.get((i + 1, j + 1), 0) == cm[i, j]


def test_per_class_and_global_metrics(ray_session):
    import ray.data

    rng = np.random.default_rng(13)
    ref, pred = _labels(rng, 8000)
    ds = ray.data.from_arrow(
        pa.table({"ref": ref, "pred": pred})
    ).repartition(4)
    counts = ca.confusion_counts(ds, "ref", "pred")
    classes = [1, 2, 3, 4]
    per = ca.per_class_metrics(counts, classes).to_pandas()
    cm = _np_cm(ref, pred, 4)
    support = cm.sum(axis=1)
    predtot = cm.sum(axis=0)
    diag = np.diag(cm)
    prec = diag / predtot
    rec = diag / support
    f1 = 2 * prec * rec / (prec + rec)
    assert per["support"].tolist() == support.tolist()
    assert np.allclose(per["precision"], prec, rtol=1e-12)
    assert np.allclose(per["recall"], rec, rtol=1e-12)
    assert np.allclose(per["f1"], f1, rtol=1e-12)
    assert np.allclose(per["user_acc_pct"], prec * 100, rtol=1e-12)

    area = [400.0, 300.0, 200.0, 100.0]
    glob = ca.global_metrics(counts, classes, area).to_pandas().iloc[0]
    n = cm.sum()
    acc = diag.sum() / n
    assert glob["overall_acc"] == pytest.approx(acc, rel=1e-14)
    assert glob["hamming_loss"] == pytest.approx(1 - acc, rel=1e-12)
    pe = (support * predtot).sum() / (n * n)
    assert glob["cohen_kappa"] == pytest.approx(
        (acc - pe) / (1 - pe), rel=1e-12
    )
    assert glob["balanced_acc"] == pytest.approx(rec.mean(), rel=1e-12)
    s, c = float(n), float(diag.sum())
    mcc = (c * s - (support * predtot).sum()) / np.sqrt(
        (s * s - (predtot.astype(float) ** 2).sum())
        * (s * s - (support.astype(float) ** 2).sum())
    )
    assert glob["matthews"] == pytest.approx(mcc, rel=1e-10)
    # Pontius: reference transcription (cm.T, proportional areas)
    cmT = cm.T.astype(float)
    prop = (np.array(area) / np.sum(area)).reshape(-1, 1)
    norm = cmT / cmT.sum(axis=1).reshape(-1, 1) * prop
    comp = norm.sum(axis=1)
    reft = norm.sum(axis=0)
    q = np.abs(reft - comp).sum() / 2
    commission = comp - np.diag(norm)
    omission = reft - np.diag(norm)
    a_dis = (2 * np.minimum(commission, omission)).sum() / 2
    assert glob["quantity_dis"] == pytest.approx(q, rel=1e-12)
    assert glob["allocation_dis"] == pytest.approx(a_dis, rel=1e-12)
    assert glob["prop_correct"] == pytest.approx(
        np.diag(norm).sum() / norm.sum(), rel=1e-12
    )
    assert glob["total_dis"] == pytest.approx(q + a_dis, rel=1e-12)


def test_perfect_and_empty_class(ray_session):
    import ray.data

    ref = np.array([1, 1, 2, 2, 3], dtype=np.int64)
    pred = ref.copy()
    ds = ray.data.from_arrow(pa.table({"ref": ref, "pred": pred}))
    counts = ca.confusion_counts(ds, "ref", "pred")
    per = ca.per_class_metrics(counts, [1, 2, 3, 4]).to_pandas()
    # class 4 absent: sklearn zero_division=0 semantics
    row4 = per[per["cls"] == 4].iloc[0]
    assert row4["precision"] == 0.0 and row4["recall"] == 0.0
    assert row4["f1"] == 0.0 and row4["support"] == 0
    glob = ca.global_metrics(counts, [1, 2, 3, 4]).to_pandas().iloc[0]
    assert glob["overall_acc"] == 1.0
    assert glob["hamming_loss"] == 0.0


def test_partition_independence(ray_session):
    import ray.data

    rng = np.random.default_rng(29)
    ref, pred = _labels(rng, 3000)
    t = pa.table({"ref": ref, "pred": pred})
    outs = []
    for parts in (1, 8):
        ds = ray.data.from_arrow(t).repartition(parts)
        counts = ca.confusion_counts(ds, "ref", "pred")
        outs.append(
            ca.global_metrics(counts, [1, 2, 3, 4]).to_pandas()
        )
    assert (outs[0].to_numpy() == outs[1].to_numpy()).all()
