"""fill_class_timeseries: direct transcription of the RIOS kernel
loop vs the stage + partition independence."""

import numpy as np
import ray.data

from rsgislib_ray.pipelines.queries import _fct_src_tbl, _FCT_T
from rsgislib_ray.stages.timeseries import fill_class_timeseries


def _direct(tbl, n_iters=3, double_direction=True, recheck_ends=True):
    # transcription of classification/__init__.py:1421 _fill_cls_imgs
    imgs = [
        tbl[f"cls{t}"].to_numpy().astype(np.int64).copy()
        for t in range(_FCT_T)
    ]
    nd = 0
    for _ in range(n_iters):
        for n in range(_FCT_T - 1):
            m = imgs[n] == nd
            imgs[n][m] = imgs[n + 1][m]
        if double_direction:
            for n in range(_FCT_T - 1, 0, -1):
                m = imgs[n] == nd
                imgs[n][m] = imgs[n - 1][m]
        if recheck_ends:
            m = imgs[0] == nd
            imgs[0][m] = imgs[1][m]
            m = imgs[_FCT_T - 1] == nd
            imgs[_FCT_T - 1][m] = imgs[_FCT_T - 2][m]
    return imgs


def test_fill_matches_rios_transcription(ray_session):
    tbl = _fct_src_tbl()
    exp = _direct(tbl)
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = (
            fill_class_timeseries(ds, [f"cls{t}" for t in range(_FCT_T)])
            .to_pandas()
            .sort_values("pixel_id")
            .reset_index(drop=True)
        )
        outs.append(df)
        for t in range(_FCT_T):
            assert np.array_equal(df[f"cls{t}"].to_numpy(), exp[t]), t
    assert outs[0].equals(outs[1])
    # all-nodata pixels stay nodata; others are fully filled after 3
    # double-direction iterations on this fixture
    tot = sum(exp)
    allnd = np.flatnonzero(tot == 0)
    src = np.stack(
        [tbl[f"cls{t}"].to_numpy() for t in range(_FCT_T)]
    ).sum(axis=0)
    assert np.array_equal(allnd, np.flatnonzero(src == 0))
