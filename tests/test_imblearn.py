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


def test_adasyn_allocation_and_balance(ray_session):
    """ADASYN: per-class synthetic counts hit the majority top-up
    exactly; the allocation favours borderline bases (higher
    different-class 5-NN share) and is partition-independent."""
    from rsgislib_ray.stages.imblearn import adasyn_oversample
    from rsgislib_ray.pipelines.queries import _imb_src_tbl, _IMB_FEATS

    tbl = _imb_src_tbl()
    cls_arr = tbl["cls"].to_numpy()
    u, cnt = np.unique(cls_arr, return_counts=True)
    maj = int(cnt.max())
    outs = []
    for parts in (1, 6):
        d = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(
            adasyn_oversample(d, "id", "cls", _IMB_FEATS)
            .to_pandas().sort_values("syn_id").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    got = outs[0].groupby("cls").size().to_dict()
    want = {int(c): maj - int(n) for c, n in zip(u, cnt) if n < maj}
    assert got == want


def test_borderline_bases_are_danger(ray_session):
    """Borderline-SMOTE: synthetics exist (the fixture has danger
    samples), balance to the majority, and interpolate inside the
    class bbox."""
    from rsgislib_ray.stages.imblearn import (
        borderline_smote_oversample,
    )
    from rsgislib_ray.pipelines.queries import _imb_src_tbl, _IMB_FEATS

    tbl = _imb_src_tbl()
    cls_arr = tbl["cls"].to_numpy()
    u, cnt = np.unique(cls_arr, return_counts=True)
    maj = int(cnt.max())
    d = ray.data.from_arrow(tbl).repartition(6)
    df = (
        borderline_smote_oversample(d, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("syn_id")
    )
    got = df.groupby("cls").size().to_dict()
    want = {int(c): maj - int(n) for c, n in zip(u, cnt) if n < maj}
    assert got == want
    X = np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1)
    for c in want:
        sub = df[df["cls"] == c]
        cx = X[cls_arr == c]
        for j, col in enumerate(_IMB_FEATS):
            v = sub[col].to_numpy()
            assert v.min() >= cx[:, j].min() - 1e-9
            assert v.max() <= cx[:, j].max() + 1e-9


def test_allknn_vs_sequential_enn(ray_session):
    """AllKNN == literally chaining ENN rounds k=1,2,3 over
    survivors (scalar reference loop), and is at most as large as a
    single ENN(k=3) pass is NOT guaranteed — only the exact chain is."""
    from rsgislib_ray.stages.imblearn import (
        _d2_block, all_knn_undersample, minority_class,
    )
    from rsgislib_ray.pipelines.queries import _imb_src_tbl, _IMB_FEATS

    tbl = _imb_src_tbl()
    ids = tbl["id"].to_numpy().astype(np.int64)
    cls_arr = tbl["cls"].to_numpy().astype(np.int64)
    X = np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1).astype(
        np.int64
    )
    mino = minority_class(cls_arr)
    alive = np.ones(len(ids), dtype=bool)
    for kk in (1, 2, 3):
        aids, acls, aX = ids[alive], cls_arr[alive], X[alive]
        keep_local = np.zeros(len(aids), dtype=bool)
        for i in range(len(aids)):
            d2 = _d2_block(aX[i: i + 1], aX)[0]
            order = np.lexsort((aids, d2))
            order = order[aids[order] != aids[i]][:kk]
            agree = (acls[order] == acls[i]).all()
            keep_local[i] = (acls[i] == mino) or agree
        nxt = np.zeros(len(ids), dtype=bool)
        nxt[np.flatnonzero(alive)[keep_local]] = True
        alive = nxt
    want = set(ids[alive].tolist())
    d = ray.data.from_arrow(tbl).repartition(6)
    got = set(
        all_knn_undersample(d, "id", "cls", _IMB_FEATS)
        .to_pandas()["id"].tolist()
    )
    assert got == want


def test_smoteenn_cleans_all_classes(ray_session):
    """SMOTEENN: the x997 integer internal scale reproduces the float
    interpolation exactly, every surviving row's 3-NN agrees with it
    (sampling_strategy='all' — majority rows get dropped too), and
    some synthetic rows survive."""
    from rsgislib_ray.stages.imblearn import (
        _d2_block, smote_enn_combined,
    )
    from rsgislib_ray.pipelines.queries import _imb_src_tbl, _IMB_FEATS

    tbl = _imb_src_tbl()
    d = ray.data.from_arrow(tbl).repartition(6)
    df = (
        smote_enn_combined(d, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("out_id").reset_index(drop=True)
    )
    assert (df["out_id"] >= 100000).any()       # synthetics survive
    orig_ids = set(tbl["id"].to_numpy().tolist())
    kept_orig = set(df[df["out_id"] < 100000]["out_id"]) & orig_ids
    assert len(kept_orig) < len(orig_ids)       # some originals cleaned
    # verify the all-agree property on the SCALED integers
    Xq = np.rint(
        np.stack([df[c].to_numpy() for c in _IMB_FEATS], 1) * 997.0
    ).astype(np.int64)
    # (survivor check is against the full combined set, which we
    # rebuild here from the stage's own contract)
    from rsgislib_ray.stages.imblearn import smote_oversample
    syn = (
        smote_oversample(d, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("syn_id")
    )
    all_ids = np.concatenate(
        [tbl["id"].to_numpy(), syn["syn_id"].to_numpy()]
    ).astype(np.int64)
    all_cls = np.concatenate(
        [tbl["cls"].to_numpy(), syn["cls"].to_numpy()]
    ).astype(np.int64)
    allX = np.concatenate(
        [
            np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1) * 997,
            np.rint(
                np.stack([syn[c].to_numpy() for c in _IMB_FEATS], 1)
                * 997.0
            ).astype(np.int64),
        ]
    )
    order = np.argsort(all_ids)
    all_ids, all_cls, allX = all_ids[order], all_cls[order], allX[order]
    for row in range(0, len(df), 17):  # spot-check every 17th
        rid = int(df["out_id"][row])
        i = int(np.searchsorted(all_ids, rid))
        d2 = _d2_block(allX[i: i + 1], allX)[0]
        o = np.lexsort((all_ids, d2))
        o = o[all_ids[o] != rid][:3]
        assert (all_cls[o] == int(df["cls"][row])).all()


def test_smotetomek_drops_both_link_members(ray_session):
    """SMOTETomek: sampling_strategy='all' — for every dropped row
    its mutual differing-class 1-NN partner is dropped too (BOTH
    members go, unlike the 'auto' Tomek); synthetics survive; and
    the result is partition-independent."""
    from rsgislib_ray.stages.imblearn import (
        _d2_block, _knn_ids, smote_oversample, smote_tomek_combined,
    )

    tbl = _imb_src_tbl()
    d = ray.data.from_arrow(tbl).repartition(6)
    df = (
        smote_tomek_combined(d, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("out_id").reset_index(drop=True)
    )
    assert (df["out_id"] >= 100000).any()
    # rebuild the combined x997 set from the stage contracts
    syn = (
        smote_oversample(d, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("syn_id")
    )
    all_ids = np.concatenate(
        [tbl["id"].to_numpy(), syn["syn_id"].to_numpy()]
    ).astype(np.int64)
    all_cls = np.concatenate(
        [tbl["cls"].to_numpy(), syn["cls"].to_numpy()]
    ).astype(np.int64)
    allX = np.concatenate(
        [
            np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1) * 997,
            np.rint(
                np.stack([syn[c].to_numpy() for c in _IMB_FEATS], 1)
                * 997.0
            ).astype(np.int64),
        ]
    )
    order = np.argsort(all_ids)
    all_ids, all_cls, allX = all_ids[order], all_cls[order], allX[order]
    nn1 = _knn_ids(
        _d2_block(allX, allX), all_ids, 1, exclude_ids=all_ids
    )[0][:, 0]
    pos = np.searchsorted(all_ids, nn1)
    link = (nn1[pos] == all_ids) & (all_cls != all_cls[pos])
    dropped = set(all_ids[link].tolist())
    kept = set(df["out_id"].tolist())
    assert dropped and kept == set(all_ids.tolist()) - dropped
    # every dropped row's partner is dropped (pairs go together)
    partner = dict(zip(all_ids.tolist(), nn1.tolist()))
    for i in dropped:
        assert partner[i] in dropped
    # minority originals CAN be dropped under 'all'
    mino = minority_class(tbl["cls"].to_numpy())
    mino_ids = set(
        tbl["id"].to_numpy()[tbl["cls"].to_numpy() == mino].tolist()
    )
    assert mino_ids - kept, "'all' strategy must not exempt minority"
    d2p = ray.data.from_arrow(tbl).repartition(2)
    df2 = (
        smote_tomek_combined(d2p, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("out_id").reset_index(drop=True)
    )
    assert (df.to_numpy() == df2.to_numpy()).all()


def test_oss_one_shot_scan_and_tomek(ray_session):
    """OneSidedSelection vs a naive per-row transcription: fixed
    1-NN store (minority + lowest-id seed per class), one-shot
    misclassification keep, then 'auto' Tomek; minority never
    dropped by the scan, seeds kept unless Tomek-linked."""
    from rsgislib_ray.stages.imblearn import (
        one_sided_selection_undersample,
    )

    tbl = _imb_src_tbl()
    ids = tbl["id"].to_numpy().astype(np.int64)
    cls = tbl["cls"].to_numpy().astype(np.int64)
    X = np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1).astype(
        np.int64
    )
    mino = minority_class(cls)
    kept = set(ids[cls == mino].tolist())
    for c in sorted(set(cls.tolist())):
        if c == mino:
            continue
        cid = ids[cls == c]
        seed = int(cid.min())
        store = [(int(i), int(cc)) for i, cc in zip(ids, cls)
                 if cc == mino or i == seed]
        kept.add(seed)
        for i in cid:
            if int(i) == seed:
                continue
            xi = X[ids == i][0]
            best = min(
                (int(((X[ids == j] - xi) ** 2).sum()), j, cj)
                for j, cj in store
            )
            if best[2] != c:
                kept.add(int(i))
    # naive auto-Tomek over kept
    kl = sorted(kept)
    kX = np.stack([X[ids == i][0] for i in kl])
    kc = np.array([cls[ids == i][0] for i in kl])
    nn = []
    for a in range(len(kl)):
        d2 = ((kX - kX[a]) ** 2).sum(1)
        cand = sorted(
            (int(d2[b]), kl[b]) for b in range(len(kl)) if b != a
        )
        nn.append(cand[0][1])
    idx = {v: i for i, v in enumerate(kl)}
    final = set()
    for a in range(len(kl)):
        b = idx[nn[a]]
        is_link = nn[b] == kl[a] and kc[a] != kc[b]
        if not (is_link and kc[a] != mino):
            final.add(kl[a])
    d = ray.data.from_arrow(tbl).repartition(6)
    df = (
        one_sided_selection_undersample(d, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("id")
    )
    assert set(df["id"].tolist()) == final
    # scan must have excluded some majority rows
    assert len(final) < len(ids)


def test_condensed_nn_sequential_scan(ray_session):
    """Hart CNN vs a naive pure-Python transcription (growing store,
    multi-pass, (d2,id) ties); the mid-scan growth must MATTER on
    this fixture (some scanned sample classifies correctly only
    because an earlier addition in the same pass is its 1-NN — i.e.
    the result differs from the one-shot decoupled scan), and the
    result is partition-independent."""
    from rsgislib_ray.stages.imblearn import condensed_nn_undersample

    tbl = _imb_src_tbl()
    ids = tbl["id"].to_numpy().astype(np.int64)
    cls = tbl["cls"].to_numpy().astype(np.int64)
    X = np.stack([tbl[c].to_numpy() for c in _IMB_FEATS], 1).astype(
        np.int64
    )
    mino = minority_class(cls)
    kept = set(ids[cls == mino].tolist())
    one_shot = set(kept)
    for c in sorted(set(cls.tolist())):
        if c == mino:
            continue
        cid = sorted(ids[cls == c].tolist())
        store = set(ids[cls == mino].tolist()) | {cid[0]}
        frozen = sorted(store)

        def nn_cls(i, members):
            xi = X[ids == i][0]
            best = min(
                (int(((X[ids == j][0] - xi) ** 2).sum()), j)
                for j in members
            )
            return int(cls[ids == best[1]][0])

        changed = True
        while changed:
            changed = False
            for i in cid:
                if nn_cls(i, sorted(store)) != c:
                    if i not in store:
                        store.add(i)
                        changed = True
        kept |= {i for i in store if cls[ids == i][0] == c}
        one_shot |= {cid[0]} | {
            i for i in cid if nn_cls(i, frozen) != c
        }
    d = ray.data.from_arrow(tbl).repartition(6)
    df = (
        condensed_nn_undersample(d, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("id")
    )
    assert set(df["id"].tolist()) == kept
    assert kept != one_shot, (
        "fixture must exercise the sequential (growing-store) path"
    )
    d2p = ray.data.from_arrow(tbl).repartition(2)
    df2 = (
        condensed_nn_undersample(d2p, "id", "cls", _IMB_FEATS)
        .to_pandas().sort_values("id")
    )
    assert (df.to_numpy() == df2.to_numpy()).all()
