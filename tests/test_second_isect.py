"""second_line_intersections (stages/lines.py) — brute-force parity
with an exact-arithmetic transcription of
vectorgeoms/__init__.py:988 scnd_line_intersection_range, and the
single-crossing (0,0) quirk."""

from fractions import Fraction

import numpy as np
import pytest

from rsgislib_ray.pipelines.queries import q_second_line_isect

SF = "/root/testdata/sf0.001"


def _fixture_edges():
    # mirror of the query fixture at sf0.001 (200 parts)
    import pyarrow.parquet as pq

    pk = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey"]
    )["p_partkey"].to_numpy().astype(np.int64)
    ix0 = ((pk * 53) % 9000) * 2
    ix1 = ix0 + 400 + (pk % 7) * 200
    iy0 = ((pk * 29) % 9000) * 2
    iy1 = iy0 + 400 + (pk % 5) * 200
    out = []
    for ax, ay, bx, by in [
        (ix0, iy0, ix0, iy1), (ix1, iy0, ix1, iy1),
        (ix0, iy0, ix1, iy0), (ix0, iy1, ix1, iy1),
    ]:
        out.append(np.stack([ax, ay, bx, by], axis=1))
    return np.concatenate(out, axis=0)


def _line(k):
    sxi = (k * 4099 + 7) % 10000
    syi = (k * 7411 + 3) % 10000
    exi = sxi + 120 + (k % 50) * 3
    eyi = syi + (1 if k % 2 == 0 else -1) * (100 + (k % 61) * 3)
    return sxi * 2 + 1, syi * 2 + 1, exi * 2 + 1, eyi * 2 + 1


def _crossings(k, edges):
    isx, isy, iex, iey = _line(k)
    ts = []
    for ax, ay, bx, by in edges:
        rx, ry = iex - isx, iey - isy
        swx, swy = bx - ax, by - ay
        den = rx * swy - ry * swx
        if den == 0:
            continue
        tn = (ax - isx) * swy - (ay - isy) * swx
        un = (ax - isx) * ry - (ay - isy) * rx
        if den > 0:
            ok = 0 < tn < den and 0 < un < den
        else:
            ok = den < tn < 0 and den < un < 0
        if ok:
            ts.append(Fraction(int(tn), int(den)))
    return sorted(ts)


def test_second_isect_parity_and_quirk(ray_session):
    rows = {r["uid"]: r for r in q_second_line_isect(SF).take_all()}
    edges = _fixture_edges()
    n_quirk = n_multi = 0
    for k in range(1, 151):
        ts = _crossings(k, edges)
        if not ts:
            assert k not in rows
            continue
        got = rows[k]
        assert got["n_isect"] == len(ts)
        sx = ((k * 4099 + 7) % 10000) / 100.0 + 0.005
        sy = ((k * 7411 + 3) % 10000) / 100.0 + 0.005
        assert got["start_x"] == sx and got["start_y"] == sy
        if len(ts) == 1:
            n_quirk += 1
            assert got["end_x"] == 0.0 and got["end_y"] == 0.0
            assert got["len"] == np.sqrt(sx * sx + sy * sy)
        else:
            n_multi += 1
            t2 = float(ts[1])
            ex = ((k * 4099 + 7) % 10000 + 120 + (k % 50) * 3) / 100.0 + 0.005
            ey = ((k * 7411 + 3) % 10000
                  + (1 if k % 2 == 0 else -1) * (100 + (k % 61) * 3)
                  ) / 100.0 + 0.005
            assert got["end_x"] == pytest.approx(
                sx + t2 * (ex - sx), abs=1e-9
            )
            assert got["end_y"] == pytest.approx(
                sy + t2 * (ey - sy), abs=1e-9
            )
            # the cut length never exceeds the segment length
            seg = np.hypot(ex - sx, ey - sy)
            assert got["len"] <= seg + 1e-9
    assert n_quirk >= 1 and n_multi >= 5
