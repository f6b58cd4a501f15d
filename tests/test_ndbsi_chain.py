"""ndbsi_chain query semantics (reference calc_ndbsi,
imagecalc/calcindices.py:1047): the four-pass tmp-image chain with
TYPE_32FLOAT intermediates, fused into one Ray pass.

These tests pin the parts the DuckDB oracle alone can't show are
load-bearing: the float32 inter-stage casts change bits vs a pure
float64 chain, the k<0 sign branch actually fires both ways, and
nodata propagates through all four stages.
"""

import numpy as np
import pyarrow as pa
import ray

from rsgislib_ray.pipelines.queries import queries


def _run():
    res = queries()["ndbsi_chain"]("/root/testdata/sf0.001")
    assert isinstance(res, ray.data.Dataset)
    return res.to_pandas().sort_values("pixel_id")


def _bands(pid):
    return {
        "blue": ((pid * 13) % 101).astype(np.float64),
        "green": ((pid * 41) % 101).astype(np.float64),
        "red": ((pid * 37) % 101).astype(np.float64),
        "nir": ((pid * 61) % 101).astype(np.float64),
        "swir1": ((pid * 89) % 101).astype(np.float64),
    }


def test_chain_matches_naive_float32_transcription(ray_session):
    """Naive per-stage transcription of the reference chain (double
    compute, float32 store per band_math call) equals the fused
    engine output bit-for-bit."""
    df = _run()
    pid = df["pixel_id"].to_numpy()
    b = _bands(pid)
    F = np.float32
    v = np.full(pid.shape, -999.0)
    ok_v = (b["red"] != 0) & (b["green"] != 0)
    v[ok_v] = (b["red"][ok_v] / 1000 - b["green"][ok_v] / 1000)
    v = v.astype(F)
    r = np.full(pid.shape, -999.0)
    ok_r = (b["red"] != 0) & (b["nir"] != 0) & (b["swir1"] != 0)
    r[ok_r] = 1.0 - (
        (b["swir1"][ok_r] / 1000 - b["nir"][ok_r] / 1000)
        / (3 * np.abs(b["nir"][ok_r] / 1000 - b["red"][ok_r] / 1000))
    )
    r = r.astype(F)
    k = np.where(
        (r == F(-999)) | (v == F(-999)),
        F(-999),
        (v.astype(np.float64) * r.astype(np.float64)).astype(F),
    )
    s = b["swir1"] / 1000 + b["blue"] / 1000
    num = b["swir1"] / 1000 - b["blue"] / 1000
    with np.errstate(divide="ignore", invalid="ignore"):
        pos = num / s
        neg = np.abs(num) / s * (-1)
    out = np.where(
        k == F(-999),
        F(-999),
        np.where(k.astype(np.float64) < 0, neg, pos).astype(F),
    )
    assert np.array_equal(df["v"].to_numpy(), v.astype(np.float64))
    assert np.array_equal(df["r"].to_numpy(), r.astype(np.float64))
    assert np.array_equal(df["k"].to_numpy(), k.astype(np.float64))
    assert np.array_equal(
        df["ndbsi"].to_numpy(), out.astype(np.float64)
    )


def test_float32_casts_are_load_bearing(ray_session):
    """A pure-float64 chain (no inter-stage casts) diverges from the
    engine on some pixels — proving the query actually models the
    reference's TYPE_32FLOAT tmp images rather than an idealized
    double pipeline."""
    df = _run()
    pid = df["pixel_id"].to_numpy()
    b = _bands(pid)
    ok = (
        (b["red"] != 0)
        & (b["green"] != 0)
        & (b["nir"] != 0)
        & (b["swir1"] != 0)
    )
    v64 = b["red"] / 1000 - b["green"] / 1000
    r64 = 1.0 - (
        (b["swir1"] / 1000 - b["nir"] / 1000)
        / np.where(
            ok, 3 * np.abs(b["nir"] / 1000 - b["red"] / 1000), 1.0
        )
    )
    k64 = v64 * r64
    s = np.where(ok, b["swir1"] / 1000 + b["blue"] / 1000, 1.0)
    num = b["swir1"] / 1000 - b["blue"] / 1000
    out64 = np.where(k64 < 0, np.abs(num) / s * (-1), num / s)
    got = df["ndbsi"].to_numpy()[ok]
    assert not np.array_equal(got, out64[ok])
    # but they agree to float32 precision everywhere
    assert np.allclose(got, out64[ok], rtol=1e-5, atol=1e-7)


def test_branches_all_fire(ray_session):
    df = _run()
    nd = df["ndbsi"].to_numpy()
    k = df["k"].to_numpy()
    assert (nd == -999.0).sum() == 64  # pid % 101 == 0 guard pixels
    neg_k = (k < 0) & (k != -999.0)
    assert neg_k.any() and (k > 0).any()
    # the k<0 branch forces a non-positive index (abs(...)*(-1)); the
    # k>=0 branch emits the raw normalized difference (either sign)
    assert np.all(nd[neg_k & (nd != -999.0)] <= 0)
    pos_out = nd[(k > 0)]
    assert (pos_out > 0).any() and (pos_out < 0).any()
