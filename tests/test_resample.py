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
