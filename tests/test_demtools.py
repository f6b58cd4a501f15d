"""DEM tool extras: recode sectors, incidence angle geometry,
plane-fit detrend vs per-pixel lstsq."""

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages import demtools as dt


def test_recode_aspect_sectors():
    a = np.array(
        [0.0, 44.9, 45.0, 89.9, 135.0, 359.9, 360.0, 365.0, -1.0, np.nan]
    )
    got = dt.recode_aspect_np(a).tolist()
    #   360 stays sector 8 (C++ <=360 branch); 365 wraps to 5 deg -> 1
    assert got == [1, 1, 2, 2, 4, 8, 8, 1, 0, 0]


def test_incidence_angle_geometry():
    # flat ground (gx=gy=0) -> incidence = sun zenith
    out = dt.incidence_angle_np(
        np.array([0]), np.array([0]), 135.0, 50.0
    )
    assert out[0] == 50.0
    # sun at zenith (zen=0): incidence == slope angle
    gx, gy = np.array([8]), np.array([0])
    out = dt.incidence_angle_np(gx, gy, 0.0, 0.0)
    slope_deg = np.degrees(np.arctan(np.sqrt(64.0) / 8.0))
    assert out[0] == pytest.approx(slope_deg, abs=1e-9)
    # incidence bounded [0, 180]
    rng = np.random.default_rng(5)
    g1 = rng.integers(-20, 21, 100)
    g2 = rng.integers(-20, 21, 100)
    out = dt.incidence_angle_np(g1, g2, 210.0, 65.0)
    assert (out >= 0).all() and (out <= 180).all()


def test_detrend_plane_vs_lstsq(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    n = 40
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    z = rng.integers(0, 100, n * n).astype(np.int64)
    keep = rng.random(n * n) > 0.05
    t = pa.table(
        {
            "pixel_id": pid[keep],
            "row": row[keep],
            "col": col[keep],
            "value": z[keep],
        }
    )
    got = (
        dt.detrend_plane(
            ray.data.from_arrow(t).repartition(5), n, tile_size=16
        )
        .to_pandas()
        .set_index("pixel_id")["plane_c"]
    )
    present = np.zeros((n, n), dtype=bool)
    present[row[keep], col[keep]] = True
    zg = np.zeros((n, n), dtype=np.int64)
    zg[row[keep], col[keep]] = z[keep]
    assert len(got) == int(keep.sum())
    for p in rng.choice(pid[keep], 60, replace=False):
        r, c = divmod(int(p), n)
        xs, ys, zs = [], [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                rr, cc = r + dy, c + dx
                if 0 <= rr < n and 0 <= cc < n and present[rr, cc]:
                    xs.append(dx)
                    ys.append(dy)
                    zs.append(zg[rr, cc])
        X = np.stack(
            [np.array(xs, float), np.array(ys, float), np.ones(len(xs))],
            axis=1,
        )
        beta, *_ = np.linalg.lstsq(X, np.array(zs, float), rcond=None)
        assert got[p] == pytest.approx(beta[2], rel=1e-9, abs=1e-9)


def test_detrend_plane_flat_plane_exact(ray_session):
    import ray.data

    n = 16
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    z = 3 * col + 2 * row + 10  # exact plane
    t = pa.table(
        {"pixel_id": pid, "row": row, "col": col, "value": z.astype(np.int64)}
    )
    got = (
        dt.detrend_plane(ray.data.from_arrow(t).repartition(3), n)
        .to_pandas()
        .set_index("pixel_id")["plane_c"]
    )
    # plane height at centre == the DEM itself, everywhere
    for p in pid:
        assert got[p] == pytest.approx(float(z[p]), rel=1e-12)


def test_shadow_mask_planted_spike(ray_session):
    """A tall spike on a flat-ish tilted plane shadows the pixels on
    its away-from-sun side along the discretized ray; pixels outside
    the shadow line stay lit."""
    import ray.data

    n = 48
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    # gentle south-rising slope (non-flat everywhere, so the
    # mirrored flat-pixel quirk doesn't mask the cast shadow)
    z = (row // 2).astype(np.int64)
    z[(row == 20) & (col == 20)] = 40  # spike
    t = pa.table({"pixel_id": pid, "row": row, "col": col, "value": z})
    # sun due north (az 0), zenith 70 -> shadow cast southwards
    got = (
        dt.shadow_mask(
            ray.data.from_arrow(t).repartition(4), n, 0.0, 70.0,
            n_steps=10, tile_size=24,
        )
        .to_pandas()
        .set_index("pixel_id")["shadow"]
    )
    # pixels just south of the spike look north into it: ray sample
    # k rows north has dem 40 > z + k*cot(70 deg)
    assert got[(21) * n + 20] == 1
    assert got[(25) * n + 20] == 1
    # far south on the same column: out of n_steps range -> depends
    # only on local slope; a lit pixel well away from the spike
    assert got[(40) * n + 40] == 0


def test_shadow_mask_vs_scalar(ray_session):
    """Full scalar transcription over a random DEM."""
    import math

    import ray.data

    rng = np.random.default_rng(3)
    n = 40
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    z = rng.integers(0, 30, n * n).astype(np.int64)
    t = pa.table({"pixel_id": pid, "row": row, "col": col, "value": z})
    az_deg, zen_deg, K = 240.0, 60.0, 8
    got = (
        dt.shadow_mask(
            ray.data.from_arrow(t).repartition(5), n, az_deg, zen_deg,
            n_steps=K, tile_size=16,
        )
        .to_pandas()
        .set_index("pixel_id")["shadow"]
    )
    zg = z.reshape(n, n)
    az = math.radians(az_deg)
    zen = math.radians(zen_deg)
    offs = [
        (
            int(math.floor(-k * math.cos(az) + 0.5)),
            int(math.floor(k * math.sin(az) + 0.5)),
            k / math.tan(zen),
        )
        for k in range(1, K + 1)
    ]
    checked = 0
    for r in range(1, n - 1):
        for c in range(1, n - 1):
            w = zg[r - 1 : r + 2, c - 1 : c + 2].astype(float)
            gx = float(
                (w[0, 2] + 2 * w[1, 2] + w[2, 2])
                - (w[0, 0] + 2 * w[1, 0] + w[2, 0])
            )
            gy = float(
                (w[2, 0] + 2 * w[2, 1] + w[2, 2])
                - (w[0, 0] + 2 * w[0, 1] + w[0, 2])
            )
            if gx == 0 and gy == 0:
                want = 0
            else:
                slope = math.atan(math.sqrt(gx * gx + gy * gy) / 8.0)
                asp = math.degrees(math.atan2(-gx, gy))
                if asp < 0:
                    asp += 360.0
                if asp == 360.0:
                    asp = 0.0
                ic = math.cos(zen) * math.cos(slope) + math.sin(
                    zen
                ) * math.sin(slope) * math.cos(az - math.radians(asp))
                hit = False
                for (orow, ocol, tk) in offs:
                    r2, c2 = r + orow, c + ocol
                    if 0 <= r2 < n and 0 <= c2 < n:
                        if float(zg[r2, c2]) > float(zg[r, c]) + tk:
                            hit = True
                            break
                want = 1 if (ic < 0 or hit) else 0
            assert got[r * n + c] == want
            checked += 1
    assert checked == (n - 2) * (n - 2)
