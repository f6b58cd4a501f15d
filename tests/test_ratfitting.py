"""Histogram GMM fit (stages/ratfitting.py): partition independence
of the lattice-pinned fixpoint, a scalar-replay parity check of
_fit_hist, and semantic sanity of the fitted peaks / class split on
a planted bimodal fixture."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.ratfitting import (
    GMM_LAT,
    PEAK_THRES,
    _fit_hist,
    class_split_gmm,
    fit_hist_gaussian_mixture,
)

SHAPE = np.array([0, 1, 1, 2, 2, 2, 3, 3, 4], np.int64)


def _fixture_table(n: int = 4000) -> pa.Table:
    k = np.arange(1, n + 1, dtype=np.int64)
    return pa.table(
        {
            "fid": k,
            "cls": np.where(k % 2 == 0, "a", "b"),
            "val": (
                SHAPE[(k * 13) % 9] + 10 * (1 + (k // 2) % 2)
            ).astype(np.float64),
        }
    )


def test_fit_partition_independent(ray_session):
    tbl = _fixture_table()
    outs = []
    for parts in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = (
            fit_hist_gaussian_mixture(ds, "fid", "val", "cls", 1.0)
            .to_pandas()
            .sort_values(["cls", "peak"])
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    # two planted bumps per class at 10..14 and 20..24; peak offsets
    # must sit at the bump-mode bin centres (12.5, 22.5)
    assert list(df["peak"]) == [1, 2, 1, 2]
    assert np.allclose(df["offset"].to_numpy() % 10, 2.5, atol=2.0)
    assert (df["fwhm"].to_numpy() > 0.01).all()
    assert (df["fwhm"].to_numpy() < 10.0).all()
    assert (df["noise"].to_numpy() <= PEAK_THRES).all()


def test_fit_hist_scalar_replay():
    """_fit_hist over a dense histogram == a literal per-op scalar
    replay of its documented lattice recipe (one iteration checked
    end-to-end; later iterations reuse the same ops)."""
    rng = np.arange(15)
    cnt = np.array(
        [10, 25, 40, 26, 11, 0, 0, 0, 0, 0, 9, 24, 39, 23, 12],
        np.int64,
    )
    out = _fit_hist(cnt, 10.0, 1.0, iters=1)
    L = float(GMM_LAT)
    n = cnt.sum()
    h = cnt / n
    c = 10.0 + 0.5 + rng * 1.0
    pks = [2, 12]
    noise = PEAK_THRES / 3.0
    amp = h[pks].copy()
    off = c[pks].copy()
    wid = np.array([2.0, 2.0])
    # one scalar Jacobi step
    gq = np.zeros((15, 2), np.int64)
    eq = np.zeros((15, 2))
    dd = np.zeros((15, 2))
    for i in range(15):
        for j in range(2):
            dd[i, j] = c[i] - off[j]
            aq = (
                np.floor(
                    -(dd[i, j] * dd[i, j] / (2.0 * (wid[j] * wid[j])))
                    * L
                    + 0.5
                )
                / L
            )
            eq[i, j] = np.floor(np.exp(aq) * L + 0.5) / L
            gq[i, j] = int(np.floor(amp[j] * eq[i, j] * L + 0.5))
    r = h - (noise + gq.sum(axis=1) / L)
    d_noise = (float(np.floor(r * L + 0.5).astype(np.int64).sum()) / L) / 15
    exp_noise = min(max(noise + d_noise, 0.0), PEAK_THRES)
    assert out["noise"][0] == exp_noise
    for j in range(2):
        na = sum(
            int(np.floor(r[i] * eq[i, j] * L + 0.5)) for i in range(15)
        )
        da = sum(
            int(np.floor(eq[i, j] * eq[i, j] * L + 0.5))
            for i in range(15)
        )
        d = na / da if da > 0 else 0.0
        exp_amp = min(
            max(amp[j] + d, max(amp[j] - 0.01, 0.001)), amp[j] + 0.01
        )
        assert out["amp"][j] == exp_amp


def test_class_split_labels(ray_session):
    tbl = _fixture_table()
    ds = ray.data.from_arrow(tbl).repartition(5)
    df = class_split_gmm(ds, "fid", "val", "cls", 1.0).to_pandas()
    merged = df.merge(
        pa.table(tbl).to_pandas() if not isinstance(tbl, pa.Table)
        else tbl.to_pandas(),
        on="fid",
    )
    # every feature is assigned; low bump -> sub-class 1, high -> 2
    assert set(merged["subcls"].unique()) <= {1, 2}
    low = merged[merged["val"] < 15]
    high = merged[merged["val"] >= 15]
    assert (low["subcls"] == 1).all()
    assert (high["subcls"] == 2).all()
