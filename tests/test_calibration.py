"""Calibration stage invariants: scalar helpers, the reference's
TOA-inverse quirk, full-image nodata probing, DOS percentile
offsets vs a brute-force reference, and the 6S elevation-LUT
interpolation vs a literal per-row transcription of the C++ loop."""

import math

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages import calibration as cal


def test_julian_day_known_values():
    assert cal.julian_day(2000, 1, 1) == 2451545
    assert cal.julian_day(1858, 11, 17) == 2400001
    assert cal.julian_day(2011, 7, 1) == 2455744
    # vectorized form identical
    y = np.array([2000, 1858, 2011, 1970, 2100])
    m = np.array([1, 11, 7, 1, 2])
    d = np.array([1, 17, 1, 1, 28])
    got = cal.julian_day_np(y, m, d)
    want = [cal.julian_day(*t) for t in zip(y, m, d)]
    assert got.tolist() == want


def test_solar_distance_perihelion_aphelion():
    d_jan = cal.solar_distance(cal.julian_day(2011, 1, 3))
    d_jul = cal.solar_distance(cal.julian_day(2011, 7, 4))
    assert d_jan < 0.9845
    assert d_jul > 1.0160
    assert abs(d_jan - 0.98329) < 2e-3
    assert abs(d_jul - 1.01671) < 2e-3


def test_esun_round_trip():
    # forward TOA with known ESUN, then invert via get_esun_value
    esun, zen, L = 1957.0, 35.0, 80.0
    d = cal.solar_distance(cal.julian_day(2011, 7, 1))
    rho = (math.pi * L * d * d) / (esun * math.cos(math.radians(zen)))
    got = cal.get_esun_value(L, rho, 1, 7, 2011, zen)
    assert abs(got - esun) / esun < 1e-12


def test_visibility_to_aot():
    assert abs(cal.visibility_to_aot(10.0) - (0.39449 + 0.08498)) < 1e-12


def _one_band(vals, extra=None):
    t = {"dn": np.asarray(vals, dtype=np.int64)}
    if extra:
        t.update(extra)
    import ray.data

    return ray.data.from_arrow(pa.table(t)).repartition(2)


def test_toa_inverse_quirk(ray_session):
    """The reference's TOA->radiance sets distSq = 1/d, so the round
    trip multiplies by d^3 (exact only when d == 1) — pin the quirk."""
    esun, zen = 1554.0, 20.0
    ds = _one_band([5, 17, 200])
    rad = cal.landsat_to_radiance_multi_add(ds, {"L": ("dn", 0.9, 1.0)})
    for d_au in (1.0, cal.solar_distance(2455744)):
        jd_dummy = 2451545  # jd only feeds d in the forward op
        # forward with an explicit distance: reuse the formula
        dist_sq = d_au * d_au
        cz = math.cos(math.radians(zen))

        def fwd(b: pa.Table) -> pa.Table:
            L = b["L"].to_numpy()
            return pa.table(
                {"L": L, "rho": ((np.pi * L * dist_sq) / (esun * cz))}
            )

        back = cal.toa_refl_to_radiance(
            rad.map_batches(fwd, batch_format="pyarrow"),
            {"L2": ("rho", esun)},
            zen,
            d_au,
            keep_cols=["L"],
        ).to_pandas()
        ratio = back["L2"].to_numpy() / back["L"].to_numpy()
        assert np.allclose(ratio, d_au**3, rtol=1e-12)


def test_nodata_probe_cols(ray_session):
    """The C++ border probe scans EVERY image band: a row with dn2=0
    but dn1!=0 is live; only all-probe-zero rows emit 0."""
    import ray.data

    t = pa.table(
        {
            "dn1": np.array([3, 0, 0], dtype=np.int64),
            "dn2": np.array([0, 5, 0], dtype=np.int64),
        }
    )
    ds = ray.data.from_arrow(t)
    got = (
        cal.landsat_to_radiance_multi_add(
            ds, {"L2": ("dn2", 2.0, 1.0)}, probe_cols=["dn1", "dn2"]
        )
        .to_pandas()["L2"]
        .tolist()
    )
    assert got == [1.0, 11.0, 0.0]
    # default probe = listed band only: row 0 becomes nodata
    got2 = (
        cal.landsat_to_radiance_multi_add(ds, {"L2": ("dn2", 2.0, 1.0)})
        .to_pandas()["L2"]
        .tolist()
    )
    assert got2 == [0.0, 11.0, 0.0]


@pytest.mark.parametrize("blocks", [2, 7])
def test_dos_offsets_brute(ray_session, blocks):
    """Dark-object percentile offsets == brute-force ceil-rank over
    the nodata-masked values, partition-independent; the applied
    chain matches a literal numpy transcription."""
    import ray.data

    rng = np.random.default_rng(7)
    v1 = rng.integers(0, 200, 4000)
    v2 = rng.integers(0, 40, 4000)
    v1[rng.random(4000) < 0.1] = 0
    t = pa.table({"b1": v1.astype(np.int64), "b2": v2.astype(np.int64)})
    ds = ray.data.from_arrow(t).repartition(blocks)
    out, offs = cal.perform_dos_calc(
        ds, {"d1": "b1", "d2": "b2"}, dark_obj_percentile=0.01
    )
    for col, v in (("b1", v1), ("b2", v2)):
        masked = np.sort(v[v != 0])
        rank = max(math.ceil(len(masked) * 0.01), 1)
        assert offs[col] == int(masked[rank - 1])
    df = out.to_pandas()
    for dcol, col, v in (("d1", "b1", v1), ("d2", "b2", v2)):
        tv = (v.astype(np.float64) - float(offs[col])) + 0.0
        tv = np.where(tv <= 0, 1.0, tv)
        tv = np.where(v == 0, 0.0, tv)
        # row order is partition-dependent; compare as multisets
        assert sorted(df[dcol].tolist()) == sorted(tv.tolist())


def _elev_lut_scalar(elev, vals, lut, scale, dem_nodata):
    """Literal transcription of the C++ per-pixel loop
    (RSGISApply6SCoefficients.cpp:145-270), scalar."""
    elevs = [e for e, _s in lut]
    if elev == dem_nodata:
        elev = min(elevs)
    # first-wins nearest scan
    i1, best = 0, (elevs[0] - elev) ** 2
    for i in range(1, len(lut)):
        d = (elevs[i] - elev) ** 2
        if d < best:
            best, i1 = d, i
    if len(lut) > 1:
        if i1 == 0:
            i2 = 1
        elif i1 == len(lut) - 1:
            i2 = i1 - 1
        else:
            i2 = i1 - 1 if (elev - elevs[i1]) < 0 else i1 + 1
        diff = abs(elevs[i1] - elevs[i2])
        p1 = 1 - abs(elev - elevs[i1]) / diff
        p2 = 1 - abs(elev - elevs[i2]) / diff
    out = []
    for bi, v in enumerate(vals):
        def chain(idx):
            _c, ax, bx, cx = list(lut[idx][1].values())[bi]
            tmp = ax * v - bx
            return (tmp / (1.0 + cx * tmp)) * scale

        r = (
            chain(i1) * p1 + chain(i2) * p2
            if len(lut) > 1
            else chain(i1)
        )
        out.append(min(r, scale))
    return out


def test_elev_lut_vs_scalar_reference(ray_session):
    import ray.data

    lut = [
        (0.0, {"s1": ("v1", 0.005, 0.2, 0.16), "s2": ("v2", 0.004, 0.1, 0.2)}),
        (400.0, {"s1": ("v1", 0.006, 0.22, 0.17), "s2": ("v2", 0.005, 0.12, 0.21)}),
        (800.0, {"s1": ("v1", 0.007, 0.24, 0.18), "s2": ("v2", 0.006, 0.14, 0.22)}),
    ]
    rng = np.random.default_rng(11)
    n = 500
    elev = rng.uniform(-100.0, 1100.0, n)  # incl. extrapolation range
    elev[:5] = [-32768.0, 0.0, 200.0, 400.0, 800.0]  # nodata + edges
    v1 = rng.uniform(0.0, 150.0, n)
    v2 = rng.uniform(0.0, 150.0, n)
    t = pa.table(
        {"pid": np.arange(n), "elev": elev, "v1": v1, "v2": v2}
    )
    got = (
        cal.apply_6s_elev_lut(
            ray.data.from_arrow(t).repartition(3),
            "elev",
            lut,
            1000.0,
            dem_no_data_val=-32768.0,
            keep_cols=["pid"],
        )
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    for i in range(n):
        w1, w2 = _elev_lut_scalar(
            elev[i], [v1[i], v2[i]], lut, 1000.0, -32768.0
        )
        assert got["s1"][i] == pytest.approx(w1, rel=1e-12)
        assert got["s2"][i] == pytest.approx(w2, rel=1e-12)


def test_solar_angles_sanity(ray_session):
    """Equator/equinox noon sun is near zenith; a UK summer evening
    sun sits west at low elevation."""
    import ray.data

    # integer JDN == 12:00 UT; 2000-03-20 noon at (0, 0): sun within
    # ~4 deg of zenith
    jd_noon = float(cal.julian_day(2000, 3, 20))
    t = pa.table({"lat": [0.0, 52.0], "lon": [0.0, -1.0]})
    out = cal.solar_azimuth_zenith(
        ray.data.from_arrow(t), jd_noon
    ).to_pandas()
    assert out["solar_zenith"][0] < 4.0
    # 2011-07-01 18:00 UT at (52, -1): sun west, moderate-low
    out2 = cal.solar_azimuth_zenith(
        ray.data.from_arrow(t), cal.julian_day(2011, 7, 1) + 0.25
    ).to_pandas()
    assert 250.0 < out2["solar_azimuth"][1] < 310.0
    assert 55.0 < out2["solar_zenith"][1] < 90.0
    assert (out["solar_azimuth"] >= 0).all()
    assert (out["solar_azimuth"] < 360).all()
