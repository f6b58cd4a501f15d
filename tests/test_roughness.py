"""Roughness families (elevation/roughness.py transcriptions): the
engine's pinned chains vs a literal numpy transcription of the
reference math (scipy formulas written out — scipy absent), brute
force per window."""

import numpy as np
import pytest

from rsgislib_ray.pipelines.queries import (
    _SEG_N,
    q_roughness_extrema,
    q_roughness_munro,
    q_roughness_smith,
)

SF = "/root/testdata/sf0.001"


def _val(r, c):
    return (r + c) // 4 + ((31 * r + 17 * c) % 37 == 0).astype(np.int64)


def _grid():
    rr, cc = np.mgrid[0:_SEG_N, 0:_SEG_N]
    return _val(rr, cc)


def _profiles(g, r, c):
    x = g[r, c - 2 : c + 3].astype(np.float64)
    y = g[r - 2 : r + 3, c].astype(np.float64)
    return x, y


def test_extrema_vs_reference_transcription(ray_session):
    rows = {r["pixel_id"]: r for r in q_roughness_extrema(SF).take_all()}
    g = _grid()
    rng = np.random.RandomState(5)
    for _ in range(150):
        r = rng.randint(2, _SEG_N - 2)
        c = rng.randint(2, _SEG_N - 2)
        got = rows[r * _SEG_N + c]
        for p, arr in zip(("x", "y"), _profiles(g, r, c)):
            mean = np.mean(arr)
            d = arr - mean
            # reference MIF (roughness.py:178-189) on the raw profile
            mif = int(np.sum(
                (arr[1:-1] - arr[0:-2] > 0) & (arr[2:] - arr[0:-2] > 0)
            ))
            assert got[f"{p}_mif"] == mif
            assert got[f"{p}_rv"] == pytest.approx(np.min(d), abs=1e-12)
            assert got[f"{p}_rp"] == pytest.approx(np.max(d), abs=1e-12)
            assert got[f"{p}_rz"] == pytest.approx(
                np.max(d) - np.min(d), abs=1e-12
            )
            # scipy.stats.skew / kurtosis (fisher) literal formulas
            m = np.mean(d)
            dev = d - m
            m2 = np.mean(dev ** 2)
            if m2 == 0.0:
                assert got[f"{p}_rsk"] is None
                assert got[f"{p}_rku"] is None
            else:
                assert got[f"{p}_rsk"] == pytest.approx(
                    np.mean(dev ** 3) / m2 ** 1.5, rel=1e-9, abs=1e-9
                )
                assert got[f"{p}_rku"] == pytest.approx(
                    np.mean(dev ** 4) / m2 ** 2 - 3.0, rel=1e-9,
                    abs=1e-9,
                )


def test_munro_vs_reference_transcription(ray_session):
    rows = {r["pixel_id"]: r for r in q_roughness_munro(SF).take_all()}
    g = _grid()
    rng = np.random.RandomState(9)
    seen_peaks = set()
    for _ in range(150):
        r = rng.randint(2, _SEG_N - 2)
        c = rng.randint(2, _SEG_N - 2)
        got = rows[r * _SEG_N + c]
        for p, arr in zip(("x", "y"), _profiles(g, r, c)):
            d = arr - np.mean(arr)
            base, right, left = d[1:-1], d[:-2], d[2:]
            n_peaks = max(
                int(np.sum((right < 0) & (base > 0))),
                int(np.sum((base > 0) & (left < 0))),
            )
            seen_peaks.add(n_peaks)
            assert got[f"{p}_peaks"] == n_peaks
            if n_peaks == 0:
                assert got[f"{p}_z0"] is None
                continue
            h = 2 * np.std(d)
            ls = (h * 5.0) / (2 * n_peaks)
            bs = (5.0 / n_peaks) ** 2
            assert got[f"{p}_s"] == pytest.approx(ls, rel=1e-9)
            assert got[f"{p}_big_s"] == pytest.approx(bs, rel=1e-9)
            assert got[f"{p}_z0"] == pytest.approx(
                0.5 * h * (ls / bs), rel=1e-9, abs=1e-12
            )
    assert len(seen_peaks) > 1          # fixture exercises 0 and >0


def test_smith_vs_reference_transcription(ray_session):
    rows = {r["pixel_id"]: r for r in q_roughness_smith(SF).take_all()}
    g = _grid().astype(np.float64)
    rng = np.random.RandomState(13)
    for _ in range(100):
        r = rng.randint(2, _SEG_N - 2)
        c = rng.randint(2, _SEG_N - 2)
        got = rows[r * _SEG_N + c]
        win = g[r - 2 : r + 3, c - 2 : c + 3]
        h_star = 2 * np.std(win)
        assert got["h_star"] == pytest.approx(h_star, rel=1e-9)
        ctr = win[1:-1, 1:-1]
        for t, shifted in (
            ("e", win[1:-1, 2:]), ("w", win[1:-1, :-2]),
            ("n", win[:-2, 1:-1]), ("s", win[2:, 1:-1]),
        ):
            area = np.sum(np.maximum(ctr - shifted, 0.0))
            assert got[f"f{t}"] == area
            assert got[f"z0_{t}"] == pytest.approx(
                0.5 * h_star * (area / 25.0), rel=1e-9, abs=1e-12
            )
