"""Web-mercator tile-cache math (tools/tilecacheutils.py).

Reference surface: get_tile_for_point:47, get_tile_tl_lonlat:76,
get_tile_bbox:98, flip_xyz_tms_tiles:116, get_web_mercator_xy:132,
get_xy_mercator_lonlat:151, get_quadkey_for_tile_path:194.

The whole per-point computation is ONE mirrorchain, so the SQL
oracle replays it bit-exactly.  Two documented deviations from the
reference's scalar Python: ``round(pixel)`` is mirrored as
FLOOR(x + 0.5) (Python's banker's rounding differs only at exact .5
pixel coordinates, impossible for generic lon/lat); ``math.sinh`` is
mirrored as (EXP(x) - EXP(-x))/2 because DuckDB 1.0 has no sinh —
the engine uses the same composition on both sides."""

from __future__ import annotations

import math

import numpy as np

from rsgislib_ray.functions.mirrorchain import Chain

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = 2.0 * math.pi * EARTH_RADIUS / 2.0
INITIAL_RESOLUTION = 2.0 * math.pi * EARTH_RADIUS / 256.0

_OS = repr(ORIGIN_SHIFT)
_IR = repr(INITIAL_RESOLUTION)


def tile_point_chain(zoom: int) -> Chain:
    """lon/lat -> web-mercator xy, TMS tile indices, flipped XYZ
    indices, tile top-left lon/lat, tile bbox, and the mercator
    inverse roundtrip — the reference's formulas verbatim."""
    n = 1 << zoom
    res = f"({_IR} / {n})"

    def tl(tag: str, yx: str, tx: str) -> Chain:
        # get_tile_tl_lonlat with the TMS flip already applied: ``yx``
        # is the internal XYZ row
        return [
            (f"lon_{tag}", f"{tx} / {float(n)!r} * 360.0e0 - 180.0e0"),
            (f"sha_{tag}", f"PI() * (1.0e0 - 2.0e0 * {yx} / {float(n)!r})"),
            (
                f"sh_{tag}",
                f"(EXP(sha_{tag}) - EXP(-(sha_{tag}))) / 2.0e0",
            ),
            (f"lat_{tag}", f"ATAN(sh_{tag}) * (180.0e0 / PI())"),
        ]

    ch: Chain = [
        ("mx", f"lon * {_OS} / 180.0e0"),
        ("tm", "TAN((90.0e0 + lat) * PI() / 360.0e0)"),
        ("my0", "LN(tm) / (PI() / 180.0e0)"),
        ("my", f"my0 * {_OS} / 180.0e0"),
        ("pxx", f"(mx + {_OS}) / {res}"),
        ("pyy", f"(my - {_OS}) / {res}"),
        ("pxr", "ABS(FLOOR(pxx + 0.5e0))"),
        ("pyr", "ABS(FLOOR(pyy + 0.5e0))"),
        ("txf", "CEIL(pxr / 256.0e0) - 1"),
        ("tyx", "CEIL(pyr / 256.0e0) - 1"),  # XYZ row
        ("tyt", f"({n} - 1) - tyx"),  # TMS row
    ]
    ch += tl("tl", "tyx", "txf")  # top-left of the tile
    # bbox partner: get_tile_tl_lonlat(tx+1, ty_tms+1) -> XYZ row - 1
    ch += tl("br", "(tyx - 1)", "(txf + 1)")
    ch += [
        ("lon_inv", f"(mx / {_OS}) * 180.0e0"),
        ("lat0_inv", f"(my / {_OS}) * 180.0e0"),
        (
            "lat_inv",
            "180.0e0 / PI()"
            " * (2 * ATAN(EXP(lat0_inv * PI() / 180.0e0)) - PI() / 2.0e0)",
        ),
    ]
    return ch


def quadkeys(tx: np.ndarray, ty_xyz: np.ndarray, zoom: int) -> list[str]:
    """get_quadkey_for_tile_path:194 over XYZ indices (flip already
    applied), vectorized digit extraction."""
    digits = [
        ((tx >> (z - 1)) & 1) + 2 * ((ty_xyz >> (z - 1)) & 1)
        for z in range(zoom, 0, -1)
    ]
    arr = np.stack(digits, axis=1)
    return ["".join(str(int(d)) for d in row) for row in arr]


def quadkey_sql(tx: str, ty: str, zoom: int) -> str:
    """The same digit chain as unrolled SQL string concatenation."""
    parts = [
        f"CAST((({tx} >> {z - 1}) & 1) + 2*((({ty}) >> {z - 1}) & 1)"
        " AS VARCHAR)"
        for z in range(zoom, 0, -1)
    ]
    return " || ".join(parts)


def tile_idx_chain(sfx: str, lon: str, lat: str, zoom: int) -> Chain:
    """lon/lat -> (tile_x, tms_row) float chain (get_tile_for_point:47,
    tms=True), name-suffixed so two corners can share one CTE cascade.
    round() mirrored as FLOOR(x+0.5) (module-doc deviation)."""
    n = 1 << zoom
    res = f"({_IR} / {n})"
    s = sfx
    return [
        (f"mx_{s}", f"{lon} * {_OS} / 180.0e0"),
        (f"tm_{s}", f"TAN((90.0e0 + {lat}) * PI() / 360.0e0)"),
        (f"my0_{s}", f"LN(tm_{s}) / (PI() / 180.0e0)"),
        (f"my_{s}", f"my0_{s} * {_OS} / 180.0e0"),
        (f"pxx_{s}", f"(mx_{s} + {_OS}) / {res}"),
        (f"pyy_{s}", f"(my_{s} - {_OS}) / {res}"),
        (f"pxr_{s}", f"ABS(FLOOR(pxx_{s} + 0.5e0))"),
        (f"pyr_{s}", f"ABS(FLOOR(pyy_{s} + 0.5e0))"),
        (f"tx_{s}", f"CEIL(pxr_{s} / 256.0e0) - 1"),
        (f"tyx_{s}", f"CEIL(pyr_{s} / 256.0e0) - 1"),
        (f"ty_{s}", f"({n} - 1) - tyx_{s}"),
    ]


def tile_merc_bounds_chain(zoom: int) -> Chain:
    """(tile_x, tile_y TMS as cols ti, tj) -> web-mercator bbox
    (xy_mercator_bounds:? via get_tile_bbox + get_web_mercator_xy):
    tl corner = XYZ row (n-1-tj), br corner = (ti+1, XYZ row - 1)."""
    n = 1 << zoom
    fn = f"{float(n)!r}"

    def corner(tag: str, tx: str, row: str) -> Chain:
        return [
            (f"lon_{tag}", f"{tx} / {fn} * 360.0e0 - 180.0e0"),
            (f"sha_{tag}", f"PI() * (1.0e0 - 2.0e0 * {row} / {fn})"),
            (
                f"sh_{tag}",
                f"(EXP(sha_{tag}) - EXP(-(sha_{tag}))) / 2.0e0",
            ),
            (f"lat_{tag}", f"ATAN(sh_{tag}) * (180.0e0 / PI())"),
            (f"bmx_{tag}", f"lon_{tag} * {_OS} / 180.0e0"),
            (
                f"btm_{tag}",
                f"TAN((90.0e0 + lat_{tag}) * PI() / 360.0e0)",
            ),
            (f"bmy0_{tag}", f"LN(btm_{tag}) / (PI() / 180.0e0)"),
            (f"bmy_{tag}", f"bmy0_{tag} * {_OS} / 180.0e0"),
        ]

    ch: Chain = []
    ch += corner("tl", "ti", f"({n - 1} - tj)")
    ch += corner("br", "(ti + 1)", f"(({n - 1} - tj) - 1)")
    return ch


def tile_path_from_quadkeys(quadkeys_lst: list[str], tms: bool = True):
    """get_tile_path_from_quadkey:214 vectorized: digit bit
    reassembly; zoom = len(quadkey); TMS flip on request. Empty keys
    return (0, 0, 0) as the reference does."""
    tx = np.zeros(len(quadkeys_lst), np.int64)
    ty = np.zeros(len(quadkeys_lst), np.int64)
    zoom = np.array([len(q) for q in quadkeys_lst], np.int64)
    for r, q in enumerate(quadkeys_lst):
        for i, digit in enumerate(reversed(q)):
            d = int(digit)
            if d & 1:
                tx[r] |= 1 << i
            if d & 2:
                ty[r] |= 1 << i
    if tms:
        ty = np.where(zoom > 0, (1 << zoom) - 1 - ty, ty)
    return tx, ty, zoom
