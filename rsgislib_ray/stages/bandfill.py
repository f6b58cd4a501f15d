"""Band-stack gap utilities — reference imageutils/__init__.py:4914
``mask_outliners_data_values`` (per-pixel percentile clip along the
band axis: values outside [nanpercentile(lower), nanpercentile(upper)]
become NaN) and :5015 ``polyfill_nan_data_values`` (per-pixel
polynomial fit over the finite band samples, predictions replacing
every band; pixels with <= polyorder finite samples go all-NaN;
optional mean-abs-diff clamp back to the pixel mean).

Both are pure ``map_batches`` over a wide pixel table (one row per
pixel, one column per band) — zero shuffles, trivially 100-TB-safe.

Exactness contracts (the SQL oracle replays both bit for bit):

* Percentile: the engine re-implements numpy's default 'linear'
  quantile (numpy 1.26 ``_quantile``/``_lerp``) instead of calling
  ``np.nanpercentile`` so the operation sequence is pinned:
  ``virtual = (q/100) * (n_f - 1)`` (``q/100`` folded to one double
  constant), ``prev = floor(virtual)``, gather a = sorted[prev],
  b = sorted[min(prev+1, n_f-1)], then the BRANCHY lerp
  ``t >= 0.5 ? b - (b-a)*(1-t) : a + (b-a)*t``. A pytest checks the
  re-implementation against ``np.nanpercentile`` on random data.
  Integer band values make a and b exact doubles, so every step is
  one correctly-rounded IEEE op on both sides.

* Polyfit: numpy.polyfit's scaled SVD is not SQL-mirrorable, so the
  engine fits via exact-int64 normal-equation moments over the
  literal band-position powers + the fixed-order Cholesky
  (timeseries.chol_solve_np — the established parity contract) and
  predicts with an explicit Horner chain
  ``((c_d*x + c_{d-1})*x + ...)*x + c_0``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.timeseries import chol_solve_np

NODATA = -99.0


def _np_linear_quantile(srt: np.ndarray, n_f: np.ndarray,
                        q_over_100: float) -> np.ndarray:
    """Row-wise linear-method quantile over ``srt`` (rows sorted
    ascending, NaN pushed to the tail) with ``n_f`` finite counts
    (>= 1). Mirrors numpy 1.26 _quantile/_lerp op for op; the SQL
    oracle replays the identical expression shapes."""
    p = srt.shape[0]
    virtual = q_over_100 * (n_f - 1).astype(np.float64)
    prev = np.floor(virtual)
    ia = prev.astype(np.int64)
    ib = np.minimum(ia + 1, n_f - 1)
    rows = np.arange(p)
    a = srt[rows, ia]
    b = srt[rows, ib]
    t = virtual - prev
    diff = b - a
    return np.where(t >= 0.5, b - diff * (1.0 - t), a + diff * t)


def mask_outlier_values(
    ds: ray.data.Dataset,
    value_cols: list[str],
    *,
    lower: float = 5.0,
    upper: float = 95.0,
    mask_col: str | None = None,
    mask_val: int = 1,
    key_col: str = "pix",
    nodata: float = NODATA,
) -> ray.data.Dataset:
    """Per-pixel percentile outlier masking along the band axis
    (imageutils/__init__.py:4914). Input: one row per pixel, band
    columns ``value_cols`` (float, NaN/null = missing), optional
    validity mask column. Output: key + ``out_<col>`` doubles —
    clipped-out and originally-missing cells are NULL, invalid-mask
    pixels carry ``nodata`` on every band (the reference writes
    in_no_date outside the valid mask)."""
    q_lo = lower / 100.0
    q_hi = upper / 100.0
    nb = len(value_cols)

    def f(batch: pa.Table) -> pa.Table:
        p = batch.num_rows
        V = np.empty((p, nb), dtype=np.float64)
        for j, c in enumerate(value_cols):
            col = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            V[:, j] = col
        valid = (
            batch[mask_col].to_numpy() == mask_val
            if mask_col is not None
            else np.ones(p, dtype=bool)
        )
        srt = np.sort(V, axis=1)          # NaN sorts to the tail
        n_f = np.sum(np.isfinite(V), axis=1).astype(np.int64)
        safe = np.maximum(n_f, 1)
        p_lo = _np_linear_quantile(srt, safe, q_lo)
        p_hi = _np_linear_quantile(srt, safe, q_hi)
        out = {key_col: batch[key_col]}
        for j, c in enumerate(value_cols):
            v = V[:, j]
            keep = np.isfinite(v) & ~(v < p_lo) & ~(v > p_hi)
            vals = np.where(valid, np.where(keep, v, 0.0), nodata)
            null = valid & ~keep
            out[f"out_{c}"] = pa.array(vals, mask=null,
                                       type=pa.float64())
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)


def polyfill_values(
    ds: ray.data.Dataset,
    value_cols: list[str],
    band_vals: list[int],
    *,
    polyorder: int = 3,
    mean_abs_diff: float | None = None,
    mask_col: str | None = None,
    mask_val: int = 1,
    key_col: str = "pix",
    nodata: float = NODATA,
) -> ray.data.Dataset:
    """Per-pixel polynomial band fill (imageutils/__init__.py:5015).
    Pixels with no missing band pass through unchanged; pixels with
    missing bands and > polyorder finite samples are REPLACED on
    every band by the degree-``polyorder`` fit evaluated at
    ``band_vals`` (the reference writes pred_vals wholesale), with
    the optional ``mean_abs_diff`` clamp back to the pixel mean;
    pixels with <= polyorder finite samples go all-NULL; invalid-mask
    pixels carry ``nodata``. Fit = exact-int64 normal equations +
    fixed-order Cholesky (chol_solve_np parity contract), predict =
    explicit Horner."""
    nb = len(value_cols)
    if len(band_vals) != nb:
        raise ValueError("band_vals must match value_cols")
    k = polyorder + 1
    x = np.asarray(band_vals, dtype=np.int64)
    # P[b, i] = x_b ** i, exact int64 (band positions are small ints)
    P = np.ones((nb, k), dtype=np.int64)
    for i in range(1, k):
        P[:, i] = P[:, i - 1] * x

    def f(batch: pa.Table) -> pa.Table:
        p = batch.num_rows
        V = np.empty((p, nb), dtype=np.float64)
        for j, c in enumerate(value_cols):
            V[:, j] = batch[c].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
        valid = (
            batch[mask_col].to_numpy() == mask_val
            if mask_col is not None
            else np.ones(p, dtype=bool)
        )
        F = np.isfinite(V)
        n_f = F.sum(axis=1).astype(np.int64)
        has_gap = ~F.all(axis=1)
        fit = has_gap & (n_f > polyorder)
        # exact integer moments: G_ij = sum_b F * x^i * x^j,
        # b_i = sum_b F * x^i * y  (y integral by input contract)
        Fi = F.astype(np.int64)
        Y = np.where(F, V, 0.0).astype(np.int64)
        G = np.empty((p, k, k), dtype=np.float64)
        for i in range(k):
            for j in range(i, k):
                g = (Fi * (P[:, i] * P[:, j])[None, :]).sum(axis=1)
                G[:, i, j] = g
                G[:, j, i] = g
        B = np.empty((p, k), dtype=np.float64)
        for i in range(k):
            B[:, i] = (Y * P[:, i][None, :]).sum(axis=1)
        # guard non-fit rows with the identity so the vectorized
        # Cholesky never divides by zero (results discarded)
        G[~fit] = np.eye(k)
        B[~fit] = 0.0
        coef = chol_solve_np(G, B)      # (p, k), c0..c_d
        # Horner: ((c_d*x + c_{d-1})*x + ... )*x + c0, per band
        xd = x.astype(np.float64)
        pred = np.empty((p, nb), dtype=np.float64)
        for b in range(nb):
            acc = coef[:, k - 1].copy()
            for i in range(k - 2, -1, -1):
                acc = acc * xd[b] + coef[:, i]
            pred[:, b] = acc
        if mean_abs_diff is not None:
            ysum = Y.sum(axis=1).astype(np.float64)
            mean = ysum / n_f.astype(np.float64)
            clamp = np.abs(pred - mean[:, None]) > mean_abs_diff
            pred = np.where(clamp, mean[:, None], pred)
        out = {key_col: batch[key_col]}
        for b, c in enumerate(value_cols):
            vals = np.where(
                fit, pred[:, b], np.where(F[:, b], V[:, b], 0.0)
            )
            # all-NULL when gap but too few samples (fit rows emit
            # pred everywhere; passthrough rows are fully finite)
            null = valid & has_gap & ~fit
            vals = np.where(valid, vals, nodata)
            out[f"fill_{c}"] = pa.array(vals, mask=null,
                                        type=pa.float64())
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)
