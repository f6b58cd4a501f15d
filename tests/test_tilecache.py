"""Tile-cache math: quadkey roundtrip vs a direct transcription of
get_tile_path_from_quadkey, tile-index sanity, bbox ordering."""

import numpy as np
import ray.data

from rsgislib_ray.functions.mirrorchain import eval_chain
from rsgislib_ray.functions.tilecache import quadkeys, tile_point_chain
from rsgislib_ray.pipelines.queries import _tc_src_tbl, _TC_ZOOM


def _decode_quadkey(qk):
    # transcription of tools/tilecacheutils.py:221
    tx = ty = 0
    for i, digit in enumerate(reversed(qk)):
        mask = 1 << i
        if digit == "1":
            tx |= mask
        elif digit == "2":
            ty |= mask
        elif digit == "3":
            tx |= mask
            ty |= mask
    return tx, ty, len(qk)


def test_quadkey_roundtrip_and_bbox(ray_session):
    tbl = _tc_src_tbl()
    lon = tbl["lon100"].to_numpy() / 100.0
    lat = tbl["lat100"].to_numpy() / 100.0
    e = eval_chain(
        tile_point_chain(_TC_ZOOM), {"lon": lon, "lat": lat}, vector=True
    )
    tx = e["txf"].astype(np.int64)
    tyx = e["tyx"].astype(np.int64)
    tyt = e["tyt"].astype(np.int64)
    n = 1 << _TC_ZOOM
    assert np.all((tx >= 0) & (tx < n))
    assert np.all((tyx >= 0) & (tyx < n))
    # TMS <-> XYZ flip is an involution
    assert np.array_equal(tyt, (n - 1) - tyx)
    for qk, x, y in zip(quadkeys(tx, tyx, _TC_ZOOM), tx, tyx):
        dx, dy, z = _decode_quadkey(qk)
        assert (dx, dy, z) == (int(x), int(y), _TC_ZOOM)
    # bbox must bracket the point in longitude
    assert np.all(e["lon_tl"] <= lon + 1e-9)
    assert np.all(e["lon_br"] > e["lon_tl"])
    # the reference's get_tile_bbox forwards (x+1, y+1) through the
    # TMS flip, landing one XYZ row UP — so for tms=True its
    # "MinLat" (b.lat) is actually ABOVE "MaxLat" (a.lat).  The
    # engine mirrors that literal behavior; pin it.
    assert np.all(e["lat_br"] > e["lat_tl"])
    # mercator roundtrip recovers the input
    assert np.allclose(e["lon_inv"], lon, atol=1e-9)
    assert np.allclose(e["lat_inv"], lat, atol=1e-9)
