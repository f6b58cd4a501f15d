"""FFT DEM fusion as a separable circular convolution
(elevation/__init__.py:fft_dem_fusion, after Karkee, Steward & Aziz
2008).

The reference FFTs both DEMs, replaces the CENTRAL ``2c×2c`` block of
the shifted low-res spectrum with the high-res one (note: despite the
docstring, the code therefore takes the LOW frequencies from the
HIGH-res DEM — the code's behaviour is what we mirror), inverse-FFTs
and takes the magnitude. Because the operation is linear,

    fused = |lo + IFFT2(mask ⊙ FFT2(hi − lo))|
          = |lo + (hi − lo) ⊛ h|                     (circular ⊛)

where ``h = IFFT2(mask)`` and the shifted-centred rectangular mask
(indices ``[N/2−c, N/2+c)`` per axis — ASYMMETRIC, so h is complex and
the output magnitude matters) factorises into the 1-D Dirichlet-style
kernel

    h1[n] = (1/N) Σ_{k=−c}^{c−1} e^{2πikn/N},   h[r,c] = h1[r]·h1[c].

So the whole-image FFT becomes two banded, embarrassingly-parallel
passes (rows then columns) — the EDT/`distance_transform` physical
plan — with NO global transform. For bit-reproducibility the kernel is
quantized to ``2^-KQ`` fixed point and an arithmetic shift is applied
between the passes, making every reduction an ORDER-INDEPENDENT exact
int64 sum (DuckDB mirrors it with the offset floor-division form —
``//`` truncates, numpy floors); only the final magnitude is one fixed
float chain. The quantization deviates from the float-FFT reference by
≤ N·2^{1−KQ}·max|hi−lo| per pass (pytest-bounded against a direct
numpy FFT transcription)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

KQ = 24  # kernel fixed-point bits
SHIFT = 12  # inter-pass arithmetic shift
FINAL_DEN = float(1 << (2 * KQ - SHIFT))  # 2^36, the SQL literal


def dirichlet_kernel_q(n: int, c_size: int):
    """Quantized complex 1-D kernel: ``round(h1 · 2^KQ)`` (half-even
    np.rint, mirrored by inlining these exact integers in the SQL
    oracle). Returns (re_q, im_q) int64 arrays of length n."""
    idx = np.arange(n)
    k = np.arange(-c_size, c_size)
    h = np.exp(2j * np.pi * np.outer(idx, k) / n).sum(axis=1) / n
    return (
        np.rint(h.real * (1 << KQ)).astype(np.int64),
        np.rint(h.imag * (1 << KQ)).astype(np.int64),
    )


def _circ_matmul(kq: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Exact int64 circular convolution ``out[m] = Σ_d kq[d]·v[(m−d)
    mod N]`` via a rolled index matrix (N ≤ a few thousand per line;
    lines are the parallel unit)."""
    n = len(v)
    m = np.arange(n)
    idx = (m[:, None] - m[None, :]) % n  # out m, shift d -> v index
    return (kq[None, :] * v[idx]).sum(axis=1)


def fft_dem_fusion(
    ds: ray.data.Dataset, n: int, c_size: int
) -> ray.data.Dataset:
    """Input: (row, col, hi, lo) integer-valued pixels of two aligned
    N×N DEMs. Output: (row, col, fused_u) with the half-up
    micro-quantized fused magnitude. Two groupby shuffles (rows then
    columns) — each group is one image line, vectorized exact int64
    inside."""
    kre, kim = dirichlet_kernel_q(n, c_size)

    def diff(batch: pa.Table) -> pa.Table:
        hi = batch["hi"].to_numpy().astype(np.int64)
        lo = batch["lo"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "row": batch["row"],
                "col": batch["col"],
                "lo": lo,
                "d": hi - lo,
            }
        )

    dd = ds.map_batches(diff, batch_format="pyarrow")

    def row_pass(tbl: pa.Table) -> pa.Table:
        c = tbl["col"].to_numpy().astype(np.int64)
        order = np.argsort(c)
        d = tbl["d"].to_numpy().astype(np.int64)[order]
        t1re = _circ_matmul(kre, d) >> SHIFT
        t1im = _circ_matmul(kim, d) >> SHIFT
        return pa.table(
            {
                "row": tbl["row"].to_numpy()[order],
                "col": c[order],
                "lo": tbl["lo"].to_numpy()[order],
                "t1re": t1re,
                "t1im": t1im,
            }
        )

    p1 = dd.groupby("row").map_groups(row_pass, batch_format="pyarrow")

    def col_pass(tbl: pa.Table) -> pa.Table:
        r = tbl["row"].to_numpy().astype(np.int64)
        order = np.argsort(r)
        t1re = tbl["t1re"].to_numpy().astype(np.int64)[order]
        t1im = tbl["t1im"].to_numpy().astype(np.int64)[order]
        lo = tbl["lo"].to_numpy().astype(np.int64)[order]
        # complex (kre + i·kim) ⊛ (t1re + i·t1im)
        t2re = _circ_matmul(kre, t1re) - _circ_matmul(kim, t1im)
        t2im = _circ_matmul(kre, t1im) + _circ_matmul(kim, t1re)
        re = lo.astype(np.float64) + t2re.astype(np.float64) / FINAL_DEN
        im = t2im.astype(np.float64) / FINAL_DEN
        fused = np.sqrt(re * re + im * im)
        return pa.table(
            {
                "row": r[order],
                "col": tbl["col"].to_numpy()[order],
                "fused_u": np.floor(fused * 1000000.0 + 0.5).astype(
                    np.int64
                ),
            }
        )

    return p1.groupby("col").map_groups(col_pass, batch_format="pyarrow")


def fft_fusion_reference(
    hi: np.ndarray, lo: np.ndarray, c_size: int
) -> np.ndarray:
    """Direct transcription of the reference's FFT path (block
    replacement on the shifted spectra + |ifft2|) — the pytest bound
    for the quantized separable plan."""
    fh = np.fft.fftshift(np.fft.fft2(hi.astype(float)))
    fl = np.fft.fftshift(np.fft.fft2(lo.astype(float)))
    rows, cols = lo.shape
    cr, cc = int(rows / 2), int(cols / 2)
    fl[cr - c_size : cr + c_size, cc - c_size : cc + c_size] = fh[
        cr - c_size : cr + c_size, cc - c_size : cc + c_size
    ]
    return np.abs(np.fft.ifft2(np.fft.ifftshift(fl)))
