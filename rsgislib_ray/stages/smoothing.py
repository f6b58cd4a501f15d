"""Spectral (band-axis) Savitzky-Golay smoothing — reference
imageutils/__init__.py:4618 ``spectral_smoothing`` (scipy.signal
savgol_filter, win_len=5, polyorder=3, mode='interp', applied per
pixel along the band axis inside the valid mask; no scipy in this
sandbox).

SG smoothing is a fixed linear map: for window 5 / cubic fit the
projection of each 5-sample window is RATIONAL, including the
'interp' edge rows (the least-squares cubic evaluated at the window's
first/last nodes):

    row0 = [69, 4, -6, 4, -1] / 70     (eval at node 0)
    row1 = [ 2, 27, 12, -8, 2] / 35    (eval at node 1)
    rowC = [-3, 12, 17, 12, -3] / 35   (interior, centered)
    row3 = [ 2, -8, 12, 27, 2] / 35    (eval at node 3)
    row4 = [-1,  4, -6, 4, 69] / 70    (eval at node 4)

(derived exactly as V (VᵀV)⁻¹ Vᵀ over integer nodes — the pytest
re-checks every row against numpy polyfit.) Over integer band values
each output is therefore ``exact-int numerator / {35,70}``: ONE
correctly-rounded float division, bit-reproducible in SQL. Masked
pixels emit the nodata value on every band (the reference writes the
input nodata outside the valid mask)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SG5_NUM = {
    "edge0": np.array([69, 4, -6, 4, -1], dtype=np.int64),
    "edge1": np.array([2, 27, 12, -8, 2], dtype=np.int64),
    "center": np.array([-3, 12, 17, 12, -3], dtype=np.int64),
    "edge3": np.array([2, -8, 12, 27, 2], dtype=np.int64),
    "edge4": np.array([-1, 4, -6, 4, 69], dtype=np.int64),
}
SG5_DEN = {"edge0": 70, "edge1": 35, "center": 35, "edge3": 35, "edge4": 70}


def sg5_matrix(n_bands: int) -> tuple[np.ndarray, np.ndarray]:
    """(numerators[n_bands, n_bands], denominators[n_bands]) of the
    full band-axis smoothing map with 'interp' edges."""
    if n_bands < 5:
        raise ValueError("spectral smoothing window 5 needs >= 5 bands")
    N = np.zeros((n_bands, n_bands), dtype=np.int64)
    den = np.empty(n_bands, dtype=np.int64)
    for j in range(n_bands):
        if j == 0:
            key, w0 = "edge0", 0
        elif j == 1:
            key, w0 = "edge1", 0
        elif j == n_bands - 2:
            key, w0 = "edge3", n_bands - 5
        elif j == n_bands - 1:
            key, w0 = "edge4", n_bands - 5
        else:
            key, w0 = "center", j - 2
        N[j, w0 : w0 + 5] = SG5_NUM[key]
        den[j] = SG5_DEN[key]
    return N, den


def spectral_smoothing(
    ds: ray.data.Dataset,
    band_cols: list[str],
    mask_col: str,
    mask_val: int,
    nodata: float = -99.0,
    key_col: str = "pixel_id",
    batch_size: int = 65536,
) -> ray.data.Dataset:
    """Per-pixel SG(5,3) smoothing along ``band_cols`` (ascending
    wavelength order); rows where ``mask_col != mask_val`` emit
    ``nodata`` on every output band. Pure map_batches — zero shuffles.
    Output: key + ``sm_<band>`` columns (float64)."""
    N, den = sg5_matrix(len(band_cols))

    def f(batch: pa.Table) -> pa.Table:
        X = np.stack(
            [batch[c].to_numpy().astype(np.int64) for c in band_cols],
            axis=1,
        )
        valid = batch[mask_col].to_numpy() == mask_val
        out = {key_col: batch[key_col]}
        for j, c in enumerate(band_cols):
            num = X @ N[j]  # exact int64 (band values bounded)
            sm = num.astype(np.float64) / float(den[j])
            out[f"sm_{c}"] = np.where(valid, sm, nodata)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
