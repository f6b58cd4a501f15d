"""Classifier-stage tests: brute-force single-process references for
the least-squares OVR model, Gaussian NB, the histogram tree, and the
balanced resamplers (reference surface: classification/classsklearn.py
train/apply + classimblearn.py random samplers)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rsgislib_ray.functions.hashing import splitmix64
from rsgislib_ray.stages import classify as cl


def _fixture(n=4000, seed=7, parallelism=8):
    rng = np.random.default_rng(seed)
    ck = np.arange(n, dtype=np.int64) * 2 + 1
    y = ck % 3 + 1
    x1 = y * 8 + (ck * 7) % 11
    x2 = y * y + (ck * 3) % 4
    x3 = (ck * 11) % 13
    t = pa.table({"ck": ck, "y": y, "x1": x1, "x2": x2, "x3": x3})
    perm = rng.permutation(n)
    ds = ray.data.from_arrow(t.take(pa.array(perm))).repartition(parallelism)
    return t, ds


FC = ["x1", "x2", "x3"]
KS = [1, 2, 3]


def test_lsq_ovr_matches_lstsq(ray_session):
    t, ds = _fixture()
    m = cl.class_moments(ds, FC, "y", KS)
    coefs = cl.train_lsq_ovr(m)
    X = np.column_stack(
        [np.ones(len(t))] + [t[c].to_numpy().astype(float) for c in FC]
    )
    for r, c in enumerate(KS):
        yv = np.where(t["y"].to_numpy() == c, 1.0, -1.0)
        ref, *_ = np.linalg.lstsq(X, yv, rcond=None)
        assert np.allclose(coefs[r], ref, rtol=1e-8, atol=1e-8)


def test_apply_linear_mask_and_lut(ray_session):
    t, ds = _fixture()
    m = cl.class_moments(ds, FC, "y", KS)
    coefs = cl.train_lsq_ovr(m)

    def add_mask(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "msk", pa.array(batch["ck"].to_numpy() % 2)
        )

    mds = ds.map_batches(add_mask, batch_format="pyarrow")
    out = (
        cl.apply_linear_classifier(
            mds,
            coefs=coefs,
            classes=KS,
            feature_cols=FC,
            out_ids={1: 11, 2: 22, 3: 33},
            mask_col="msk",
            msk_val=1,
        )
        .to_pandas()
        .set_index("ck")
        .sort_index()
    )
    X = np.column_stack(
        [np.ones(len(t))] + [t[c].to_numpy().astype(float) for c in FC]
    )
    scores = X @ coefs.T
    lab = np.array(KS)[np.argmax(scores, axis=1)]
    exp = np.where(t["ck"].to_numpy() % 2 == 1, lab * 11, 0)
    assert np.array_equal(out["out_id"].to_numpy(), exp)
    masked = t["ck"].to_numpy() % 2 == 0
    assert (out["s1"].to_numpy()[masked] == 0.0).all()
    assert np.allclose(
        out["s2"].to_numpy()[~masked], scores[~masked, 1]
    )


def test_gnb_matches_bruteforce(ray_session):
    t, ds = _fixture()
    m = cl.class_moments(ds, FC, "y", KS)
    model = cl.train_gnb(m)
    yv = t["y"].to_numpy()
    X = np.column_stack([t[c].to_numpy().astype(float) for c in FC])
    for r, c in enumerate(KS):
        sel = X[yv == c]
        assert np.allclose(model["mu"][r], sel.mean(axis=0))
        assert np.allclose(model["var"][r], sel.var(axis=0))
    out = (
        cl.apply_gnb(ds, model, FC)
        .to_pandas()
        .set_index("ck")
        .sort_index()
    )
    # brute-force log-likelihood argmax
    K = len(KS)
    scores = np.empty((len(t), K))
    for r in range(K):
        scores[:, r] = model["lnp"][r] - 0.5 * (
            np.log(2 * np.pi * model["var"][r])
            + ((X - model["mu"][r]) ** 2) / model["var"][r]
        ).sum(axis=1)
    lab = np.array(KS)[np.argmax(scores, axis=1)]
    assert np.array_equal(out["pred"].to_numpy(), lab)
    # GNB should be highly accurate on this separable fixture
    assert (lab == yv).mean() > 0.9


def test_hist_tree_matches_exhaustive(ray_session):
    t, ds = _fixture()
    tree = cl.train_hist_tree(ds, FC, "y", KS, max_depth=2)
    X = np.column_stack([t[c].to_numpy() for c in FC])
    yv = t["y"].to_numpy()

    def brute_split(mask):
        best = None
        for f in range(len(FC)):
            vals = np.unique(X[mask, f])
            for v in vals[:-1]:
                lm = mask & (X[:, f] <= v)
                rm = mask & ~(X[:, f] <= v)
                nl, nr = int(lm.sum()), int(rm.sum())
                al = nl * nl - sum(
                    int((yv[lm] == c).sum()) ** 2 for c in KS
                )
                ar = nr * nr - sum(
                    int((yv[rm] == c).sum()) ** 2 for c in KS
                )
                imp = float(al) / float(nl) + float(ar) / float(nr)
                key = (imp, f, int(v))
                if best is None or key < best:
                    best = key
        return best

    root = brute_split(np.ones(len(t), dtype=bool))
    assert tree["splits"][0] == (root[1], root[2], root[0])
    f0, t0, _ = tree["splits"][0]
    left = X[:, f0] <= t0
    bl = brute_split(left)
    br = brute_split(~left)
    assert tree["splits"][1] == (bl[1], bl[2], bl[0])
    assert tree["splits"][2] == (br[1], br[2], br[0])
    # leaves = majority with lowest-class ties
    out = (
        cl.apply_hist_tree(ds, tree, FC)
        .to_pandas()
        .set_index("ck")
        .sort_index()
    )
    for leaf in np.unique(out["leaf"]):
        rows = out["leaf"].to_numpy() == leaf
        ys = yv[np.isin(t["ck"].to_numpy(), out.index[rows])]
        cnt = {c: int((ys == c).sum()) for c in KS}
        best = max(sorted(KS), key=lambda c: (cnt[c], -c))
        assert (out["pred"].to_numpy()[rows] == best).all()


def test_balanced_undersample(ray_session):
    t, ds = _fixture(n=3001)  # unequal class counts
    out = cl.balanced_undersample(ds, "y", "ck", seed=42).to_pandas()
    yv = t["y"].to_numpy()
    counts = {c: int((yv == c).sum()) for c in KS}
    n_min = min(counts.values())
    got = out.groupby("y").size()
    assert (got == n_min).all()
    # reference selection: n_min lowest (splitmix64(ck+seed), ck) per class
    z = splitmix64(t["ck"].to_numpy().astype(np.uint64) + np.uint64(42))
    keep = set()
    for c in KS:
        m = np.flatnonzero(yv == c)
        order = np.lexsort((t["ck"].to_numpy()[m], z[m]))
        keep |= set(t["ck"].to_numpy()[m[order[:n_min]]].tolist())
    assert set(out["ck"].tolist()) == keep


def test_balanced_oversample(ray_session):
    t, ds = _fixture(n=3001)
    out = cl.balanced_oversample(ds, "y", "ck", seed=42).to_pandas()
    yv = t["y"].to_numpy()
    counts = {c: int((yv == c).sum()) for c in KS}
    n_maj = max(counts.values())
    got = out.groupby("y").size()
    assert (got == n_maj).all()
    # every original row appears at least base times, copy_idx dense 0..reps-1
    reps = out.groupby("ck").size()
    for c in KS:
        cks = t["ck"].to_numpy()[yv == c]
        assert reps.loc[list(cks)].min() >= n_maj // counts[c]
    mx = out.groupby("ck")["copy_idx"].max()
    assert (mx + 1 == reps).all()


def test_partitioning_invariance(ray_session):
    t, _ = _fixture()
    outs = []
    for p in (1, 13):
        ds = ray.data.from_arrow(t).repartition(p)
        m = cl.class_moments(ds, FC, "y", KS)
        coefs = cl.train_lsq_ovr(m)
        outs.append(coefs)
        tree = cl.train_hist_tree(ds, FC, "y", KS, max_depth=2)
        outs.append((tree["splits"], tree["leaves"]))
    assert np.array_equal(outs[0], outs[2])
    assert outs[1] == outs[3]
