"""Histogram Gaussian-mixture fitting over RAT-style feature tables.

Reference: ``rsgislib.rastergis.fit_hist_gausian_mixture_model``
(src/rastergis/RSGISRATFunctionFitting.cpp:28 — per-class value
histogram -> peak detection -> constrained Gaussian-sum fit) and
``class_split_fit_hist_gausian_mixture_model``
(src/rastergis/RSGISSelectClumps.cpp:602 splitClassUsingGMM — the
same fit, then every feature is assigned the sub-class of its
histogram bin's strongest Gaussian).

The reference optimizes the Gaussian sum with the bundled mpfit
Levenberg-Marquardt port (RSGISFitGaussianMixModel.cpp:206).  mpfit
is replaced here — exactly like statsmodels RLM was replaced by
:func:`timeseries.tukey_irls` — with a from-scratch FIXED-ITERATION
projected Jacobi Gauss-Newton on the public model
``pred(x) = noise + sum_j amp_j * exp(-(x-off_j)^2 / (2*fwhm_j^2))``
(RSGISFitGaussianMixModel.h:73 gaussianSum), keeping the reference's
exact histogram construction, peak rule, initial parameters and
constraint boxes (noise in [0, peak_thres], amp in +-amp_var with
the 0.001 floor, offset in +-peak_loc_var*bin_width, width in
[min_width, max_width] — RSGISFitGaussianMixModel.cpp:113-170).

Every float op is pinned to the 1/GMM_LAT lattice so the 5-iteration
fixpoint is order-independent (deterministic under any partitioning)
and replayable op-for-op by a DuckDB oracle: exp arguments and
outputs are lattice-snapped, and every cross-bin reduction sums
lattice-quantized int64 terms.

Scale shape: the value table streams once for per-class min/max
partials and once for per-class histogram counts (composite-key
:func:`segsum.segment_sum`, no driver row pull); the fit itself runs
per class inside ``groupby(cls).map_groups`` over the bounded
histogram rows; the split assignment is a broadcast (cls, bin) ->
sub-class map applied in one ``map_batches`` pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.segsum import segment_sum

#: quantization lattice (2^20): exp outputs and reduction terms are
#: multiples of 1/GMM_LAT, so int64 sums over <= 2^30 bins are exact.
GMM_LAT = 1 << 20

# reference fit constants (RSGISRATFunctionFitting.cpp:62-69)
PEAK_THRES = 0.005
AMP_VAR = 0.01
PEAK_LOC_VAR = 2
INIT_WIDTH = 2
MIN_WIDTH = 0.01
MAX_WIDTH = 10.0
GMM_ITERS = 5

#: composite segment_sum key stride: cls_id * KEY_STRIDE + bin index
KEY_STRIDE = 1 << 24


def _fit_hist(
    cnt: np.ndarray, minv: float, bin_width: float, iters: int
) -> dict[str, np.ndarray]:
    """The lattice-pinned fit over one class's dense histogram counts.

    Returns peak arrays (amp/off/wid + the scalar noise broadcast);
    empty arrays when no bin passes the peak rule (the reference
    emits no Gaussians then, RSGISFitGaussianMixModel.cpp:72).
    Every expression's operand order is the parity contract with
    queries._sql_gmm_fit — change one side only with the other."""
    L = float(GMM_LAT)
    nbins = len(cnt)
    num_vals = int(cnt.sum())
    h = cnt.astype(np.float64) / num_vals
    c = minv + bin_width / 2.0 + np.arange(nbins, dtype=np.float64) * bin_width
    # peak rule (RSGISFitGaussianMixModel.cpp:50-60): strictly rising
    # into, strictly falling out of, above the normalized threshold
    inner = np.arange(1, nbins - 1)
    is_peak = (
        (h[inner] - h[inner - 1] > 0)
        & (h[inner + 1] - h[inner] < 0)
        & (h[inner] > PEAK_THRES)
    )
    pk = inner[is_peak]
    if len(pk) == 0:
        z = np.zeros(0)
        return {"noise": z, "amp": z, "off": z, "wid": z}
    noise = PEAK_THRES / 3.0
    amp = h[pk].copy()
    off = c[pk].copy()
    wid = np.full(len(pk), INIT_WIDTH * bin_width)
    amp_lo = np.maximum(amp - AMP_VAR, 0.001)
    amp_hi = amp + AMP_VAR
    off_lo = off - PEAK_LOC_VAR * bin_width
    off_hi = off + PEAK_LOC_VAR * bin_width

    def qsum(terms: np.ndarray) -> np.ndarray:
        # per-term lattice quantization -> exact int64 column sums
        return np.floor(terms * L + 0.5).astype(np.int64).sum(axis=0)

    for _ in range(iters):
        dd = c[:, None] - off[None, :]
        s2 = 2.0 * (wid * wid)
        aq = np.floor(-(dd * dd / s2[None, :]) * L + 0.5) / L
        eq = np.floor(np.exp(aq) * L + 0.5) / L
        gq = np.floor(amp[None, :] * eq * L + 0.5).astype(np.int64)
        pred = noise + gq.sum(axis=1).astype(np.float64) / L
        r = h - pred
        d_noise = (
            float(np.floor(r * L + 0.5).astype(np.int64).sum()) / L
        ) / nbins
        ja = eq
        jo = (gq.astype(np.float64) / L) * (dd / (wid * wid)[None, :])
        jw = (gq.astype(np.float64) / L) * (
            (dd * dd) / ((wid * wid) * wid)[None, :]
        )
        deltas = []
        for j in (ja, jo, jw):
            num = qsum(r[:, None] * j)
            den = qsum(j * j)
            deltas.append(
                np.where(
                    den > 0,
                    num.astype(np.float64) / den.astype(np.float64),
                    0.0,
                )
            )
        noise = min(max(noise + d_noise, 0.0), PEAK_THRES)
        amp = np.minimum(np.maximum(amp + deltas[0], amp_lo), amp_hi)
        off = np.minimum(np.maximum(off + deltas[1], off_lo), off_hi)
        wid = np.minimum(np.maximum(wid + deltas[2], MIN_WIDTH), MAX_WIDTH)
    return {
        "noise": np.full(len(pk), noise),
        "amp": amp,
        "off": off,
        "wid": wid,
    }


def _class_tables(
    ds: ray.data.Dataset,
    fid_col: str,
    val_col: str,
    cls_col: str,
    bin_width: float,
) -> tuple[dict, ray.data.Dataset]:
    """Per-class (min, max, nbins, cls_id) driver dict (pre-reduced
    one-row-per-class-per-batch partials — bounded like the kmeans
    centroid pattern) + the dense per-(cls, bin) count Dataset via a
    composite-key segment_sum."""

    def mm_partial(batch: pa.Table) -> pa.Table:
        fid = batch[fid_col].to_numpy()
        keep = fid > 0
        cls = np.asarray(batch[cls_col])[keep]
        v = batch[val_col].to_numpy().astype(np.float64)[keep]
        order = np.argsort(cls, kind="stable")
        cls, v = cls[order], v[order]
        first = np.concatenate(
            ([True], cls[1:] != cls[:-1])
        ) if len(cls) else np.zeros(0, bool)
        st = np.flatnonzero(first)
        return pa.table(
            {
                "cls": cls[first],
                "mn": np.minimum.reduceat(v, st) if len(st) else v,
                "mx": np.maximum.reduceat(v, st) if len(st) else v,
            }
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()
        .groupby("cls")
        .agg(mn=("mn", "min"), mx=("mx", "max"))
        .reset_index()
        .sort_values("cls")
    )
    info = {}
    for cid, row in enumerate(mm.itertuples(index=False)):
        nbins = int((row.mx - row.mn) / bin_width) + 1
        if nbins >= KEY_STRIDE:
            raise ValueError("histogram too wide for composite key")
        info[row.cls] = (float(row.mn), float(row.mx), nbins, cid)

    def hist_partial(batch: pa.Table) -> pa.Table:
        fid = batch[fid_col].to_numpy()
        keep = fid > 0
        cls = np.asarray(batch[cls_col])[keep]
        v = batch[val_col].to_numpy().astype(np.float64)[keep]
        keys = np.empty(len(v), np.int64)
        ok = np.zeros(len(v), bool)
        for cname, (mn, mx, _nb, cid) in info.items():
            m = (cls == cname) & (v >= mn) & (v <= mx)
            keys[m] = cid * KEY_STRIDE + ((v[m] - mn) / bin_width).astype(
                np.int64
            )
            ok |= m
        keys = keys[ok]
        return pa.table(
            {"key": keys, "cnt": np.ones(len(keys), np.int64)}
        )

    counts = segment_sum(
        ds.map_batches(
            hist_partial, batch_format="pyarrow", batch_size=65536
        ),
        "key",
        ["cnt"],
    )
    return info, counts


def fit_hist_gaussian_mixture(
    ds: ray.data.Dataset,
    fid_col: str,
    val_col: str,
    cls_col: str,
    bin_width: float,
    iters: int = GMM_ITERS,
) -> ray.data.Dataset:
    """Per-class histogram Gaussian-mixture fit
    (fit_hist_gausian_mixture_model, RSGISRATFunctionFitting.cpp:28,
    generalized to fit every class in one pass instead of one
    classVal per call).  Output one row per fitted Gaussian:
    (cls, peak, noise, amplitude, offset, fwhm) with ``peak`` the
    1-based index in bin order — the reference's output H5 row
    order."""
    info, counts = _class_tables(ds, fid_col, val_col, cls_col, bin_width)

    def fit_group(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy()
        cid = int(key[0]) // KEY_STRIDE
        cname, (mn, _mx, nbins, _) = next(
            (k, v) for k, v in info.items() if v[3] == cid
        )
        cnt = np.zeros(nbins, np.int64)
        cnt[key % KEY_STRIDE] = g["cnt"].to_numpy()
        p = _fit_hist(cnt, mn, bin_width, iters)
        n = len(p["amp"])
        return pa.table(
            {
                "cls": pa.array([cname] * n),
                "peak": np.arange(1, n + 1, dtype=np.int64),
                "noise": p["noise"],
                "amplitude": p["amp"],
                "offset": p["off"],
                "fwhm": p["wid"],
            }
        )

    def add_cid(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cid", pa.array(batch["key"].to_numpy() // KEY_STRIDE)
        )

    return (
        counts.map_batches(add_cid, batch_format="pyarrow")
        .groupby("cid")
        .map_groups(fit_group, batch_format="pyarrow")
    )


def class_split_gmm(
    ds: ray.data.Dataset,
    fid_col: str,
    val_col: str,
    cls_col: str,
    bin_width: float,
    iters: int = GMM_ITERS,
) -> ray.data.Dataset:
    """class_split_fit_hist_gausian_mixture_model
    (RSGISSelectClumps.cpp:602): fit the per-class GMM, label every
    histogram bin with its strongest Gaussian (1-based, first-wins
    ties, 0 where the mixture density < 0.00001), then assign each
    feature its bin's label; features outside any fitted class (or
    fid 0) keep the reference's -1 initialization.  The bin labeling
    reuses the lattice ints, so ties are exact."""
    info, counts = _class_tables(ds, fid_col, val_col, cls_col, bin_width)
    L = float(GMM_LAT)

    # bounded driver state: one row per (class, bin) — same smallness
    # contract as the histogram itself
    binmap: dict[tuple[str, int], int] = {}
    cdf = counts.to_pandas().sort_values("key")
    key = cdf["key"].to_numpy()
    cntv = cdf["cnt"].to_numpy()
    for cname, (mn, _mx, nbins, cid) in info.items():
        m = key // KEY_STRIDE == cid
        cnt = np.zeros(nbins, np.int64)
        cnt[key[m] % KEY_STRIDE] = cntv[m]
        p = _fit_hist(cnt, mn, bin_width, iters)
        c = mn + bin_width / 2.0 + np.arange(nbins, dtype=np.float64) * bin_width
        if len(p["amp"]) == 0:
            gq = np.zeros((nbins, 0), np.int64)
        else:
            dd = c[:, None] - p["off"][None, :]
            s2 = 2.0 * (p["wid"] * p["wid"])
            aq = np.floor(-(dd * dd / s2[None, :]) * L + 0.5) / L
            eq = np.floor(np.exp(aq) * L + 0.5) / L
            gq = np.floor(p["amp"][None, :] * eq * L + 0.5).astype(np.int64)
        total = gq.sum(axis=1).astype(np.float64) / L
        lab = np.zeros(nbins, np.int64)
        if gq.shape[1]:
            lab = np.argmax(gq, axis=1) + 1  # first-wins on int ties
        lab[total < 0.00001] = 0
        for i in range(nbins):
            binmap[(cname, i)] = int(lab[i])

    def assign(batch: pa.Table) -> pa.Table:
        fid = batch[fid_col].to_numpy()
        cls = np.asarray(batch[cls_col])
        v = batch[val_col].to_numpy().astype(np.float64)
        out = np.full(len(fid), -1, np.int64)
        for cname, (mn, mx, nbins, _cid) in info.items():
            m = (cls == cname) & (fid > 0) & (v >= mn) & (v <= mx)
            if not m.any():
                continue
            idx = ((v[m] - mn) / bin_width).astype(np.int64)
            lut = np.array(
                [binmap[(cname, i)] for i in range(nbins)], np.int64
            )
            out[m] = lut[idx]
        return pa.table({fid_col: fid, "subcls": out})

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)
