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
