"""SLIC superpixels: brute-force single-process parity and partition
independence."""

import numpy as np
import ray.data

from rsgislib_ray.pipelines.queries import _slic_src_tbl, _SLIC_N, _SLIC_K
from rsgislib_ray.stages.slic import slic_superpixels


def _brute(tbl, n, ks, m, iters):
    s = n // ks
    r = tbl["row"].to_numpy()
    c = tbl["col"].to_numpy()
    v = tbl["value"].to_numpy().astype(np.int64)
    cid0 = np.arange(ks * ks)
    cr = (cid0 // ks) * s + s // 2
    cc = (cid0 % ks) * s + s // 2
    vmap = {(int(a), int(b)): int(x) for a, b, x in zip(r, c, v)}
    ctr = np.stack(
        [cr, cc, [vmap[(int(a), int(b))] for a, b in zip(cr, cc)]], 1
    ).astype(np.float64)
    icell = np.stack([cr // s, cc // s], 1)

    def assign(ctr):
        best = np.full(len(r), -1)
        bd = np.full(len(r), np.inf)
        for k in range(len(ctr)):
            ok = (np.abs(icell[k, 0] - r // s) <= 1) & (
                np.abs(icell[k, 1] - c // s) <= 1
            )
            d = float(s * s) * ((v - ctr[k, 2]) * (v - ctr[k, 2])) + float(
                m * m
            ) * ((r - ctr[k, 0]) * (r - ctr[k, 0]) + (c - ctr[k, 1]) * (c - ctr[k, 1]))
            d = np.where(ok, d, np.inf)
            better = (d < bd) | ((d == bd) & (k < best))
            bd = np.where(better, d, bd)
            best = np.where(better, k, best)
        return best, bd

    for _ in range(iters):
        lab, _ = assign(ctr)
        for k in range(len(ctr)):
            sel = lab == k
            if sel.any():
                ctr[k] = [
                    r[sel].sum() / sel.sum(),
                    c[sel].sum() / sel.sum(),
                    v[sel].sum() / sel.sum(),
                ]
    return assign(ctr)


def test_slic_matches_bruteforce(ray_session):
    tbl = _slic_src_tbl()
    exp_lab, exp_d = _brute(tbl, _SLIC_N, _SLIC_K, 10, 2)
    ds = ray.data.from_arrow(tbl).repartition(5)
    out, centers = slic_superpixels(ds, _SLIC_N, _SLIC_K, 10, 2)
    df = out.to_pandas().sort_values("pixel_id")
    assert np.array_equal(df["slic_id"].to_numpy(), exp_lab)
    assert np.array_equal(
        df["dist_q"].to_numpy(), np.floor(exp_d * 1e6 + 0.5).astype(np.int64)
    )
    assert centers.shape == (_SLIC_K * _SLIC_K, 3)
    # every cluster is populated and labels cover exactly the raster
    assert len(np.unique(df["slic_id"])) == _SLIC_K * _SLIC_K


def test_slic_partition_independent(ray_session):
    tbl = _slic_src_tbl()
    outs = []
    for parts in (1, 13):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out, _ = slic_superpixels(
            ds, _SLIC_N, _SLIC_K, 10, 2, batch_size=600
        )
        outs.append(
            out.to_pandas().sort_values("pixel_id").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
