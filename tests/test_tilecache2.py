"""Tile-cache part 2: quadkey inverse roundtrip and the get_tiles
range quirks vs a literal reference transcription."""

import math

import numpy as np

from rsgislib_ray.functions.tilecache import (
    quadkeys,
    tile_path_from_quadkeys,
)


def test_quadkey_roundtrip_xyz_and_tms():
    rng = np.random.RandomState(4)
    zoom = 9
    tx = rng.randint(0, 1 << zoom, 300).astype(np.int64)
    ty_xyz = rng.randint(0, 1 << zoom, 300).astype(np.int64)
    qks = quadkeys(tx, ty_xyz, zoom)
    # tms=False: ty back is the XYZ row fed in
    bx, by, bz = tile_path_from_quadkeys(qks, tms=False)
    assert np.array_equal(bx, tx)
    assert np.array_equal(by, ty_xyz)
    assert np.all(bz == zoom)
    # tms=True applies the flip the reference does
    bx, by, bz = tile_path_from_quadkeys(qks, tms=True)
    assert np.array_equal(by, (1 << zoom) - 1 - ty_xyz)
    # empty quadkey -> (0, 0, 0)
    assert tile_path_from_quadkeys([""])[2][0] == 0


def _ref_tile_for_point(lon, lat, zoom):
    """Literal transcription of get_tile_for_point:47 (tms=True),
    with round() as in CPython (banker's)."""
    ORIGIN_SHIFT = 2 * math.pi * 6378137 / 2.0
    res = (2 * math.pi * 6378137 / 256.0) / (1 << zoom)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = (
        math.log(math.tan((90.0 + lat) * math.pi / 360.0))
        / (math.pi / 180.0)
        * ORIGIN_SHIFT / 180.0
    )
    px = abs(round((mx + ORIGIN_SHIFT) / res))
    py = abs(round((my - ORIGIN_SHIFT) / res))
    tx = int(math.ceil(px / 256.0) - 1)
    ty = int(math.ceil(py / 256.0) - 1)
    return tx, ((1 << zoom) - 1) - ty


def test_get_tiles_quirks_vs_reference_transcription():
    """The engine's range logic == the reference's epsilon/floor and
    count arithmetic for a spread of bboxes."""
    from rsgislib_ray.functions.mirrorchain import eval_chain
    from rsgislib_ray.functions.tilecache import tile_idx_chain

    zoom, N = 6, 64
    rng = np.random.RandomState(8)
    for _ in range(100):
        w = rng.uniform(-179, 170)
        e = w + rng.uniform(0.5, 25)
        s = rng.uniform(-84, 78)
        n = s + rng.uniform(0.5, 6)
        # engine chain corner tiles
        ea = eval_chain(
            tile_idx_chain("a", "cw", "cs", zoom),
            {"cw": np.array([w]), "cs": np.array([s])}, vector=True,
        )
        eb = eval_chain(
            tile_idx_chain("b", "ce", "cn", zoom),
            {"ce": np.array([e]), "cn": np.array([n])}, vector=True,
        )
        llx = int(ea["tx_a"][0])
        lly_t = int(ea["ty_a"][0])
        urx_t = int(eb["tx_b"][0])
        ury = int(eb["ty_b"][0])
        assert (llx, lly_t) == _ref_tile_for_point(w, s, zoom)
        assert (urx_t, ury) == _ref_tile_for_point(e, n, zoom)
        # reference's literal epsilon dance on exact-int tiles
        eps = 1.0e-9
        lly_f = lly_t - eps if lly_t % 1 < eps / 10 else float(lly_t)
        urx_f = urx_t - eps if urx_t % 1 < eps / 10 else float(urx_t)
        llx_c = max(llx, 0)
        ury_c = max(ury, 0)
        lly = int(math.floor(lly_f))
        urx = int(math.floor(urx_f))
        assert lly == lly_t - 1 and urx == urx_t - 1
        # count arithmetic
        if llx_c == urx:
            n_x = 1
        elif llx_c < urx:
            n_x = urx - min(llx_c + 1, N)
        else:
            n_x = llx_c - min(urx + 1, N)
        n_x = 1 if n_x == 0 else n_x
        assert n_x >= 1
