"""kNN-based class-balancing resamplers (imbalanced-learn family).

Reference surface: classification/classimblearn.py —
``near_miss_undersample_smpls`` (:280, NearMiss v1),
``edited_near_neigh_undersample_smpls`` (:309, ENN, n_neighbors=3,
kind_sel='all'), and the Tomek-link halves of
``one_sided_sel_undersample_smpls``/``smotetomek_combined_sample_smpls``
(:419/:504).  The reference delegates to the imbalanced-learn
package (absent here); these are from-scratch implementations of the
published algorithms with this engine's deterministic tie rules.

Physical plan: training-sample tables are the SMALL side of a
pipeline (they fit a worker by the same contract as the reference's
in-memory H5 reads), so the feature matrix is broadcast once via
``ray.put`` and every kNN batch is a vectorized distance matmul —
zero shuffles, streaming over the candidate rows.

Determinism contract (drives the SQL oracles): features are ints, so
squared distances are exact ints; neighbour ties break by (d2, id)
ascending; NearMiss ranks by the SUM of 2^-24-quantized Euclidean
distances (exact ints — the sqrt reorders sums, so quantizing each
distance keeps the engine and DuckDB bit-identical); boundary ties
break by id; the minority class is the (count, class_id)-min class.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _gather(ds: ray.data.Dataset, id_col, class_col, feat_cols):
    tbl = pa.concat_tables(
        ray.get(ds.to_arrow_refs()), promote_options="default"
    )
    ids = tbl[id_col].to_numpy().astype(np.int64)
    cls = tbl[class_col].to_numpy().astype(np.int64)
    X = np.stack(
        [tbl[c].to_numpy().astype(np.int64) for c in feat_cols], axis=1
    )
    order = np.argsort(ids)
    return ids[order], cls[order], X[order]


def _d2_block(Xa: np.ndarray, Xb: np.ndarray) -> np.ndarray:
    """Exact integer squared Euclidean distances (int64 matmul)."""
    aa = (Xa * Xa).sum(axis=1)[:, None]
    bb = (Xb * Xb).sum(axis=1)[None, :]
    return aa + bb - 2 * (Xa @ Xb.T)


def _knn_ids(
    d2: np.ndarray, cand_ids: np.ndarray, k: int, exclude_ids=None
) -> tuple[np.ndarray, np.ndarray]:
    """Per row: the k candidates by (d2, id) ascending.  Returns
    (k-column id matrix, k-column d2 matrix)."""
    d2 = d2.astype(np.float64)
    if exclude_ids is not None:
        d2 = d2 + np.where(
            cand_ids[None, :] == exclude_ids[:, None], np.inf, 0.0
        )
    # lexicographic (d2, id): stable double key via argsort over
    # structured ranking — d2 fits exactly in f64 for int features
    order = np.lexsort(
        (np.broadcast_to(cand_ids, d2.shape), d2), axis=1
    )[:, :k]
    rows = np.arange(d2.shape[0])[:, None]
    return cand_ids[order], d2[rows, order]


def minority_class(cls: np.ndarray) -> int:
    u, cnt = np.unique(cls, return_counts=True)
    i = np.lexsort((u, cnt))[0]
    return int(u[i])


def tomek_links_undersample(
    ds: ray.data.Dataset,
    id_col: str,
    class_col: str,
    feat_cols: list[str],
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """TomekLinks (sampling_strategy='auto'): a link is a pair of
    different-class samples that are mutual 1-NNs; every NON-minority
    member of a link is dropped.  Returns the kept rows."""
    ids, cls, X = _gather(ds, id_col, class_col, feat_cols)
    mino = minority_class(cls)
    nn1 = np.empty(len(ids), dtype=np.int64)
    for lo in range(0, len(ids), batch_size):
        hi = min(lo + batch_size, len(ids))
        d2 = _d2_block(X[lo:hi], X)
        nn1[lo:hi] = _knn_ids(d2, ids, 1, exclude_ids=ids[lo:hi])[0][:, 0]
    pos = {int(i): k for k, i in enumerate(ids)}
    nn_of = dict(zip(ids.tolist(), nn1.tolist()))
    drop = set()
    for i, j in nn_of.items():
        if nn_of.get(j) == i and cls[pos[i]] != cls[pos[j]]:
            if cls[pos[i]] != mino:
                drop.add(i)
            if cls[pos[j]] != mino:
                drop.add(j)
    dref = ray.put(drop)

    def f(batch: pa.Table) -> pa.Table:
        d = ray.get(dref)
        keep = ~np.isin(
            batch[id_col].to_numpy().astype(np.int64), list(d)
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def edited_nn_undersample(
    ds: ray.data.Dataset,
    id_col: str,
    class_col: str,
    feat_cols: list[str],
    n_neighbors: int = 3,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """EditedNearestNeighbours (defaults: n_neighbors=3,
    kind_sel='all', strategy='auto'): every NON-minority sample is
    kept only if ALL of its n_neighbors nearest neighbours (self
    excluded) share its class; minority rows always survive."""
    ids, cls, X = _gather(ds, id_col, class_col, feat_cols)
    mino = minority_class(cls)
    iref = ray.put((ids, cls, X, mino))

    def f(batch: pa.Table) -> pa.Table:
        aids, acls, aX, amino = ray.get(iref)
        bids = batch[id_col].to_numpy().astype(np.int64)
        bcls = batch[class_col].to_numpy().astype(np.int64)
        bX = np.stack(
            [batch[c].to_numpy().astype(np.int64) for c in feat_cols],
            axis=1,
        )
        d2 = _d2_block(bX, aX)
        nbr_ids, _ = _knn_ids(d2, aids, n_neighbors, exclude_ids=bids)
        cls_of = acls[np.searchsorted(aids, nbr_ids)]
        agree = (cls_of == bcls[:, None]).all(axis=1)
        keep = (bcls == amino) | agree
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def near_miss_undersample(
    ds: ray.data.Dataset,
    id_col: str,
    class_col: str,
    feat_cols: list[str],
    n_neighbors: int = 3,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """NearMiss version 1 (classimblearn.py:280 defaults): each
    non-minority class keeps its n_minority samples with the SMALLEST
    sum of quantized Euclidean distances to their n_neighbors nearest
    MINORITY samples (sum of FLOOR(sqrt(d2)*2^24 + 0.5) — exact int,
    ties by id)."""
    ids, cls, X = _gather(ds, id_col, class_col, feat_cols)
    mino = minority_class(cls)
    mmask = cls == mino
    mX, mids = X[mmask], ids[mmask]
    n_min = int(mmask.sum())
    keep_ids: set[int] = set(mids.tolist())
    for c in np.unique(cls):
        if int(c) == mino:
            continue
        cmask = cls == c
        cX, cids = X[cmask], ids[cmask]
        sums = np.empty(len(cids), dtype=np.int64)
        for lo in range(0, len(cids), batch_size):
            hi = min(lo + batch_size, len(cids))
            d2 = _d2_block(cX[lo:hi], mX)
            _, nd2 = _knn_ids(d2, mids, n_neighbors)
            dq = np.floor(np.sqrt(nd2) * 16777216.0 + 0.5).astype(
                np.int64
            )
            sums[lo:hi] = dq.sum(axis=1)
        order = np.lexsort((cids, sums))[:n_min]
        keep_ids.update(cids[order].tolist())
    kref = ray.put(keep_ids)

    def f(batch: pa.Table) -> pa.Table:
        k = ray.get(kref)
        keep = np.isin(batch[id_col].to_numpy().astype(np.int64), list(k))
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def smote_oversample(
    ds: ray.data.Dataset,
    id_col: str,
    class_col: str,
    feat_cols: list[str],
    k: int = 5,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """SMOTE (classimblearn.py:138 via imblearn, from the Chawla et
    al. 2002 algorithm): every non-MAJORITY class is oversampled to
    the majority count with synthetics x_b + lam * (x_nbr - x_b),
    where x_nbr is one of the k nearest SAME-class neighbours of the
    base sample.  imblearn draws base/neighbour/lambda from its RNG;
    this engine's deterministic contract (mirrored by the oracle):
    synthetic t of class c uses base = (t mod n_c)-th id ascending,
    neighbour slot (t*7 + 3) mod k (of the (d2,id)-ordered k-NN,
    self excluded) and lam = ((t*31 + 11) mod 997)/997.

    Returns the synthetic rows (syn_id = c*100000 + t, cls, float
    features); union with the input for the balanced set.  The
    feature matrix is broadcast (training-set contract); synthesis
    itself streams over a range dataset."""
    ids, cls, X = _gather(ds, id_col, class_col, feat_cols)
    u, cnt = np.unique(cls, return_counts=True)
    maj_i = np.lexsort((u, -cnt))[0]
    maj_cnt = int(cnt[maj_i])
    plan = []  # (class, n_needed, class ids asc, kNN id matrix)
    for ci, c in enumerate(u):
        if ci == maj_i or cnt[ci] == maj_cnt:
            continue
        cmask = cls == c
        cX, cids = X[cmask], ids[cmask]
        nbrs = np.empty((len(cids), k), dtype=np.int64)
        for lo in range(0, len(cids), batch_size):
            hi = min(lo + batch_size, len(cids))
            d2 = _d2_block(cX[lo:hi], cX)
            nbrs[lo:hi] = _knn_ids(
                d2, cids, k, exclude_ids=cids[lo:hi]
            )[0]
        plan.append((int(c), maj_cnt - int(cnt[ci]), cids, cX, nbrs))
    pref = ray.put(plan)
    total = sum(p[1] for p in plan)

    def gen(batch: pa.Table) -> pa.Table:
        t_all = batch["id"].to_numpy().astype(np.int64)
        p = ray.get(pref)
        outs = {
            "syn_id": [],
            "cls": [],
            **{c: [] for c in feat_cols},
        }
        off = 0
        for c, need, cids, cX, nbrs in p:
            tt = t_all[(t_all >= off) & (t_all < off + need)] - off
            if len(tt):
                base = tt % len(cids)
                slot = (tt * 7 + 3) % nbrs.shape[1]
                lam = ((tt * 31 + 11) % 997) / 997.0
                nid = nbrs[base, slot]
                npos = np.searchsorted(cids, nid)
                outs["syn_id"].append(c * 100000 + tt)
                outs["cls"].append(np.full(len(tt), c, dtype=np.int64))
                for j, col in enumerate(feat_cols):
                    xb = cX[base, j]
                    xn = cX[npos, j]
                    outs[col].append(xb + lam * (xn - xb))
            off += need
        return pa.table(
            {
                "syn_id": np.concatenate(outs["syn_id"])
                if outs["syn_id"]
                else np.array([], dtype=np.int64),
                "cls": np.concatenate(outs["cls"])
                if outs["cls"]
                else np.array([], dtype=np.int64),
                **{
                    c: np.concatenate(outs[c])
                    if outs[c]
                    else np.array([], dtype=np.float64)
                    for c in feat_cols
                },
            }
        )

    rng = ray.data.range(total).map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="pyarrow"
    )
    return rng.map_batches(gen, batch_format="pyarrow", batch_size=batch_size)
