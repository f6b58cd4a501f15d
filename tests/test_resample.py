"""Grid resampling: brute-force parity for nearest + bilinear, edge
replication semantics, and partition independence."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.pipelines.queries import (
    _rs_src_tbl,
    _rs_tgt_tbl,
    _RS_SN,
    _RS_SRES,
)
from rsgislib_ray.stages.resample import resample_to_grid


def _brute(method):
    src = _rs_src_tbl()["val"].to_numpy().reshape(_RS_SN, _RS_SN)
    tgt = _rs_tgt_tbl()
    cx = tgt["cx"].to_numpy()
    cy = tgt["cy"].to_numpy()
    out = np.empty(len(cx))
    for i in range(len(cx)):
        if method == "nearest":
            sc = int(np.floor(cx[i] / _RS_SRES))
            sr = int(np.floor(cy[i] / _RS_SRES))
            out[i] = (
                float(src[sr, sc])
                if 0 <= sc < _RS_SN and 0 <= sr < _RS_SN
                else -99.0
            )
        else:
            u = (cx[i] - _RS_SRES / 2) / _RS_SRES
            v = (cy[i] - _RS_SRES / 2) / _RS_SRES
            i0 = int(np.floor(u))
            j0 = int(np.floor(v))
            fx = u - i0
            fy = v - j0
            if i0 < 0:
                i0, fx = 0, 0.0
            if i0 > _RS_SN - 2:
                i0, fx = _RS_SN - 2, 1.0
            if j0 < 0:
                j0, fy = 0, 0.0
            if j0 > _RS_SN - 2:
                j0, fy = _RS_SN - 2, 1.0
            out[i] = (
                src[j0, i0] * (1 - fx) * (1 - fy)
                + src[j0, i0 + 1] * fx * (1 - fy)
                + src[j0 + 1, i0] * (1 - fx) * fy
                + src[j0 + 1, i0 + 1] * fx * fy
            )
    return out


def test_resample_matches_bruteforce(ray_session):
    for method in ("nearest", "bilinear"):
        exp = _brute(method)
        for parts in (2, 9):
            src = ray.data.from_arrow(_rs_src_tbl()).repartition(parts)
            tgt = ray.data.from_arrow(_rs_tgt_tbl()).repartition(parts)
            got = (
                resample_to_grid(
                    src, tgt, method, src_n=_RS_SN, src_res=_RS_SRES
                )
                .to_pandas()
                .sort_values("tgt_id")["val"]
                .to_numpy()
            )
            assert np.allclose(got, exp, rtol=0, atol=1e-12), method


# ---------------------------------------------------------------------------
# dem_resample_detrend (elevation.resampling_detread_dem)
# ---------------------------------------------------------------------------


def _rd_run(tbl, n, factor, parts):
    from rsgislib_ray.stages.resample import dem_resample_detrend

    ds = ray.data.from_arrow(tbl).repartition(parts)
    return (
        dem_resample_detrend(ds, n, factor)
        .to_pandas()
        .sort_values(["row", "col"])["detr"]
        .to_numpy()
    )


def _rd_tbl(n, z):
    p = np.arange(n * n, dtype=np.int64)
    r, c = np.divmod(p, n)
    return pa.table({"row": r, "col": c, "z": z})


def test_detrend_constant_is_exact_zero(ray_session):
    # B-spline taps sum to 6(2R)^3 exactly, so upsampling a constant
    # coarse grid reproduces the constant with zero float error.
    n, f = 32, 4
    z = np.full(n * n, 777, dtype=np.int64)
    got = _rd_run(_rd_tbl(n, z), n, f, 5)
    assert np.all(got == 0.0)


def test_detrend_matches_direct_bspline(ray_session):
    # Direct float evaluation of the separable cubic B-spline at the
    # fine-pixel center offsets against the clamped coarse grid.
    n, f = 48, 6
    rng = np.random.default_rng(7)
    z = rng.integers(0, 4000, n * n).astype(np.int64)
    m = n // f
    coarse = z.reshape(m, f, m, f).mean(axis=(1, 3))

    def b3(t):  # cubic B-spline basis on |t| in pixel units
        a = np.abs(t)
        return np.where(
            a < 1,
            (4 - 6 * a * a + 3 * a**3) / 6,
            np.where(a < 2, (2 - a) ** 3 / 6, 0.0),
        )

    p = np.arange(n * n)
    r, c = np.divmod(p, n)
    u = (2 * r + 1 - f) / (2 * f)  # coarse-space coordinate
    v = (2 * c + 1 - f) / (2 * f)
    bu = np.floor(u).astype(int)
    bv = np.floor(v).astype(int)
    up = np.zeros(n * n)
    for i in range(-1, 3):
        wi = b3(u - (bu + i))
        ri = np.clip(bu + i, 0, m - 1)
        for j in range(-1, 3):
            wj = b3(v - (bv + j))
            cj = np.clip(bv + j, 0, m - 1)
            up += wi * wj * coarse[ri, cj]
    exp = z - up
    got = _rd_run(_rd_tbl(n, z), n, f, 4)
    assert np.allclose(got, exp, rtol=0, atol=1e-8)


def test_detrend_partition_independent(ray_session):
    n, f = 32, 8
    z = (np.arange(n * n, dtype=np.int64) * 131) % 977
    a = _rd_run(_rd_tbl(n, z), n, f, 1)
    b = _rd_run(_rd_tbl(n, z), n, f, 11)
    assert np.array_equal(a, b)
