"""IR-MAD (changedetect.imgchngmthds.multivariate_alteration_detection)
and the scipy-free chi-square survival function: closed-form parity,
general-path vs mirrored-2-band parity, partition independence."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.pipelines.queries import _mad_src_tbl
from rsgislib_ray.stages.changedetect import (
    chi2_sf,
    mad_fit,
    mad_fit_2band,
)


def test_chi2_sf_against_numeric_integration():
    # independent check: integrate the chi2 pdf numerically
    for k in (2, 3, 4, 5, 6):
        for t in (0.5, 1.0, 2.7, 5.0, 11.0):
            xs = np.linspace(t, t + 200.0, 2_000_001)
            pdf = (
                xs ** (k / 2 - 1)
                * np.exp(-xs / 2)
                / (2 ** (k / 2) * math.gamma(k / 2))
            )
            num = np.trapz(pdf, xs)
            got = float(chi2_sf(np.array([t]), k)[0])
            assert abs(got - num) < 1e-7, (k, t, got, num)


def test_chi2_sf_boundaries():
    assert np.allclose(chi2_sf(np.zeros(3), 4), 1.0)
    assert float(chi2_sf(np.array([1e4]), 3)[0]) < 1e-300 or float(
        chi2_sf(np.array([1e4]), 3)[0]
    ) >= 0.0
    # monotone decreasing in t
    t = np.linspace(0, 50, 101)
    for k in (2, 3, 7):
        v = chi2_sf(t, k)
        assert np.all(np.diff(v) <= 1e-15)


def test_mad_2band_partition_independent(ray_session):
    tbl = _mad_src_tbl()
    outs = []
    for parts in (1, 13):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out, _ = mad_fit_2band(
            ds, ["x1", "x2"], ["y1", "y2"], n_iters=2, batch_size=500
        )
        outs.append(
            out.to_pandas().sort_values("pixel_id").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_mad_general_matches_mirrored_2band(ray_session):
    # chi2 is sign-invariant; mad variates may differ in sign between
    # the two paths' conventions, so compare |mad| and chi2.
    tbl = _mad_src_tbl()
    ds = ray.data.from_arrow(tbl).repartition(4)
    mirrored, _ = mad_fit_2band(ds, ["x1", "x2"], ["y1", "y2"], n_iters=2)
    mdf = mirrored.to_pandas().sort_values("pixel_id")
    general, info = mad_fit(
        ds, ["x1", "x2"], ["y1", "y2"], max_iter=2, epsilon=0.0
    )
    gdf = general.to_pandas().sort_values("pixel_id")
    assert np.allclose(
        np.abs(mdf["mad1_q"].to_numpy() / 1e6),
        np.abs(gdf["mad1"].to_numpy()),
        atol=2e-6,
    )
    assert np.allclose(
        np.abs(mdf["mad2_q"].to_numpy() / 1e6),
        np.abs(gdf["mad2"].to_numpy()),
        atol=2e-6,
    )
    assert np.allclose(
        mdf["chi2_q"].to_numpy() / 1e6,
        gdf["chi2"].to_numpy(),
        atol=2e-6,
    )
    assert info["rho"].shape == (2,)
    assert np.all(np.diff(info["rho"]) >= 0)


def test_mad_general_converges_on_static_scene(ray_session):
    # y == x (plus tiny deterministic noise) => canonical correlations
    # near 1 and chi2 concentrated near small values for most pixels
    p = np.arange(2048, dtype=np.int64)
    tbl = pa.table(
        {
            "pixel_id": p,
            "x1": (p * 13) % 50,
            "x2": (p * 29) % 60,
            "y1": (p * 13) % 50 + (p * 7) % 5,
            "y2": (p * 29) % 60 + (p * 11) % 7,
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out, info = mad_fit(ds, ["x1", "x2"], ["y1", "y2"], max_iter=10)
    assert float(info["rho"][-1]) > 0.99
    assert out.count() == 2048
