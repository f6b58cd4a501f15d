"""UTM zone helpers (functions/utm.py) vs literal transcriptions of
tools/utm.py — the rint-variant's sequential-overwrite Svalbard quirk
and the epsg round-trip."""

import numpy as np

from rsgislib_ray.functions.utm import zone_number, zone_number_rint


def _ref_arr_zone(lat, lon):
    """Literal transcription of latlon_arr_to_utm_zone_number:432 —
    sequential overwrites, conditions as written."""
    z = np.rint((lon + 180) / 6 + 1).astype(np.int64)
    z[(56 <= lat) & (lat < 64) & (3 <= lon) & (lon < 12)] = 32
    z[(72 <= lat) & (lat <= 84) & (lon >= 0) & (lon < 9)] = 31
    z[(72 <= lat) & (lat <= 84) & (lon >= 0) & (lon < 21)] = 33
    z[(72 <= lat) & (lat <= 84) & (lon >= 0) & (lon < 33)] = 35
    z[(72 <= lat) & (lat <= 84) & (lon >= 0) & (lon < 42)] = 37
    return z


def test_zone_rint_matches_reference_quirk():
    rng = np.random.RandomState(3)
    lat = rng.uniform(-80, 84, 20000)
    lon = rng.uniform(-180, 180, 20000)
    # force coverage of the Svalbard band
    lat[:2000] = rng.uniform(72, 84, 2000)
    lon[:2000] = rng.uniform(0, 45, 2000)
    got = zone_number_rint(lat, lon)
    want = _ref_arr_zone(lat, lon)
    assert np.array_equal(got, want)
    # the quirk: 31/33/35 never survive in the band
    band = (lat >= 72) & (lat <= 84) & (lon >= 0) & (lon < 42)
    assert band.any()
    assert np.all(got[band] == 37)
    # and the floor variant differs there (it keeps 31/33/35)
    std = zone_number(lat, lon)
    assert np.any(std[band] == 31) or np.any(std[band] == 33)


def test_epsg_roundtrip():
    zones = np.arange(1, 61)
    for hemi, ns in (("N", 600), ("S", 700)):
        epsg = 32000 + ns + zones
        h = epsg - 32000
        back = np.where(h < 700, h - 600, h - 700)
        assert np.array_equal(back, zones)
