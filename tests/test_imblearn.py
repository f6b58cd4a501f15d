"""imblearn-style undersamplers: brute-force property checks and
partition independence."""

import numpy as np
import ray.data

from rsgislib_ray.pipelines.queries import _imb_src_tbl, _IMB_FEATS
from rsgislib_ray.stages.imblearn import (
    edited_nn_undersample,
    minority_class,
    near_miss_undersample,
    tomek_links_undersample,
)


def _brute_knn(tbl, k, restrict_cls=None):
    ids = tbl["id"].to_numpy()
    cls = tbl["cls"].to_numpy()
    X = np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1).astype(
        np.int64
    )
    out = {}
    for i in range(len(ids)):
        d2 = ((X - X[i]) ** 2).sum(1)
        cand = [
            (int(d2[j]), int(ids[j]))
            for j in range(len(ids))
            if j != i
            and (restrict_cls is None or cls[j] == restrict_cls)
        ]
        cand.sort()
        out[int(ids[i])] = cand[:k]
    return out


def test_tomek_links_properties(ray_session):
    tbl = _imb_src_tbl()
    cls = dict(zip(tbl["id"].to_numpy().tolist(), tbl["cls"].to_numpy().tolist()))
    mino = minority_class(tbl["cls"].to_numpy())
    ds = ray.data.from_arrow(tbl).repartition(4)
    kept = set(
        tomek_links_undersample(ds, "id", "cls", _IMB_FEATS)
        .to_pandas()["id"]
        .tolist()
    )
    nn = {i: v[0][1] for i, v in _brute_knn(tbl, 1).items()}
    dropped = set(cls) - kept
    # every minority row survives
    assert all(cls[i] != mino for i in dropped)
    # dropped rows are exactly the non-minority mutual-NN
    # different-class pairs
    expect = {
        i
        for i, j in nn.items()
        if nn.get(j) == i and cls[i] != cls[j] and cls[i] != mino
    }
    assert dropped == expect


def test_enn_properties(ray_session):
    tbl = _imb_src_tbl()
    cls = dict(zip(tbl["id"].to_numpy().tolist(), tbl["cls"].to_numpy().tolist()))
    mino = minority_class(tbl["cls"].to_numpy())
    ds = ray.data.from_arrow(tbl).repartition(4)
    kept = set(
        edited_nn_undersample(ds, "id", "cls", _IMB_FEATS)
        .to_pandas()["id"]
        .tolist()
    )
    knn = _brute_knn(tbl, 3)
    for i, c in cls.items():
        agree = all(cls[j] == c for _, j in knn[i])
        assert (i in kept) == (c == mino or agree), i


def test_nearmiss_counts_and_partition_independence(ray_session):
    tbl = _imb_src_tbl()
    cls_arr = tbl["cls"].to_numpy()
    mino = minority_class(cls_arr)
    n_min = int((cls_arr == mino).sum())
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = (
            near_miss_undersample(ds, "id", "cls", _IMB_FEATS)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        outs.append(df)
        # every class is downsampled to exactly the minority count
        assert (df.groupby("cls").size() == n_min).all()
    assert outs[0].equals(outs[1])


def test_smote_synthetics_on_segments(ray_session):
    from rsgislib_ray.stages.imblearn import smote_oversample

    tbl = _imb_src_tbl()
    cls_arr = tbl["cls"].to_numpy()
    u, cnt = np.unique(cls_arr, return_counts=True)
    maj = int(cnt.max())
    ds = ray.data.from_arrow(tbl).repartition(5)
    outs = []
    for parts in (1, 5):
        d = ray.data.from_arrow(tbl).repartition(parts)
        df = (
            smote_oversample(d, "id", "cls", _IMB_FEATS)
            .to_pandas()
            .sort_values("syn_id")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    # per-class synthetic counts top every class up to the majority
    got = df.groupby("cls").size().to_dict()
    want = {int(c): maj - int(n) for c, n in zip(u, cnt) if n < maj}
    assert got == want
    # every synthetic lies inside the bounding box of its class
    X = np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1)
    for c in want:
        sub = df[df["cls"] == c]
        cx = X[cls_arr == c]
        for j, col in enumerate(_IMB_FEATS):
            v = sub[col].to_numpy()
            assert v.min() >= cx[:, j].min() - 1e-9
            assert v.max() <= cx[:, j].max() + 1e-9
