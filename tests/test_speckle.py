"""SAR texture + Lee filters: brute-force single-process window
parity and partition independence."""

import math

import numpy as np
import ray.data

from rsgislib_ray.pipelines.queries import _sar_src_tbl, _MAD_N
from rsgislib_ray.stages.speckle import sar_texture_speckle


def _brute(tbl, n_looks=3):
    v = tbl["value"].to_numpy().reshape(_MAD_N, _MAD_N)
    pad = np.zeros((_MAD_N + 2, _MAD_N + 2), dtype=np.int64)
    pad[1:-1, 1:-1] = v
    cu = math.sqrt(1.0 / n_looks)
    out = []
    for r in range(_MAD_N):
        for c in range(_MAD_N):
            win = pad[r : r + 3, c : c + 3].ravel()
            nzv = win[win != 0].astype(np.float64)
            n = len(nzv)
            cv = int(pad[r + 1, c + 1])
            row = {"n_valid": n}
            if cv != 0 and n > 3:
                s = nzv.sum()
                im = s / n
                row["norm_var"] = (nzv**2).sum() / n / (im * im) - 1
                sq = np.floor(np.sqrt(nzv) * 16777216.0 + 0.5).sum()
                am = sq / 16777216.0 / n
                row["norm_var_amp"] = im / (am * am) - 1
                lq = np.floor(np.log(nzv) * 16777216.0 + 0.5)
                lm = lq.sum() / 16777216.0 / n
                l2 = (lq * lq).sum() / 16777216.0 / 16777216.0 / n
                row["norm_var_ln"] = l2 / (lm * lm) - 1
                std = math.sqrt(((nzv - im) ** 2).sum() / n)
                row["texture_var"] = (std / im) ** 2
            else:
                row.update(
                    norm_var=0.0,
                    norm_var_amp=0.0,
                    norm_var_ln=0.0,
                    texture_var=0.0,
                )
            if n > 0:
                sm = (nzv * 100).sum() / n
                var = (((nzv * 100) - sm) ** 2).sum() / n
                k = var / (sm * sm * cu + var)
                row["lee"] = (sm + k * (cv * 100 - 1 + sm)) / 100
            else:
                row["lee"] = 0.0
            out.append(row)
    return out


def test_sar_filters_match_bruteforce(ray_session):
    tbl = _sar_src_tbl()
    exp = _brute(tbl)
    ds = ray.data.from_arrow(tbl).repartition(5)
    df = (
        sar_texture_speckle(ds, n_looks=3)
        .to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True)
    )
    assert len(df) == len(exp)
    for col in (
        "n_valid",
        "norm_var",
        "norm_var_amp",
        "norm_var_ln",
        "texture_var",
        "lee",
    ):
        got = df[col].to_numpy()
        want = np.array([e[col] for e in exp], dtype=np.float64)
        assert np.allclose(got, want, rtol=1e-10, atol=1e-10), col


def test_sar_filters_partition_independent(ray_session):
    tbl = _sar_src_tbl()
    outs = []
    for parts in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(
            sar_texture_speckle(ds)
            .to_pandas()
            .sort_values("pixel_id")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
