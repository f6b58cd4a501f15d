"""DEM depression filling vs a single-grid brute-force fixpoint."""

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages import demfill as df


def _brute_fill(dem, present):
    """Reference fixpoint on one grid: F = max(dem, min_N4 F), seeded
    with dem on border pixels (edge or absent neighbour)."""
    h, w = dem.shape
    INF = np.int64(2**62)
    border = np.zeros((h, w), dtype=bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    border[1:, :] |= ~present[:-1, :]
    border[:-1, :] |= ~present[1:, :]
    border[:, 1:] |= ~present[:, :-1]
    border[:, :-1] |= ~present[:, 1:]
    F = np.where(border & present, dem, INF)
    F[~present] = INF
    d = np.where(present, dem, INF)
    while True:
        prev = F.copy()
        # naive full relaxation: min over shifted neighbours
        cand = np.full((h, w), INF, dtype=np.int64)
        cand[1:, :] = np.minimum(cand[1:, :], F[:-1, :])
        cand[:-1, :] = np.minimum(cand[:-1, :], F[1:, :])
        cand[:, 1:] = np.minimum(cand[:, 1:], F[:, :-1])
        cand[:, :-1] = np.minimum(cand[:, :-1], F[:, 1:])
        F = np.minimum(F, np.maximum(d, cand))
        F[~present] = INF
        if np.array_equal(F, prev):
            break
    return F


def _raster_table(dem, present):
    r, c = np.nonzero(present)
    return pa.table(
        {
            "pixel_id": (r * dem.shape[1] + c).astype(np.int64),
            "row": r.astype(np.int64),
            "col": c.astype(np.int64),
            "dem": dem[r, c].astype(np.int64),
        }
    )


@pytest.mark.parametrize("row_band", [4, 16, 64])
def test_dem_fill_vs_brute(ray_session, row_band):
    import ray.data

    rng = np.random.default_rng(7)
    h = w = 48
    dem = rng.integers(10, 60, (h, w)).astype(np.int64)
    present = rng.random((h, w)) > 0.04
    got = (
        df.dem_fill(
            ray.data.from_arrow(_raster_table(dem, present)).repartition(6),
            w,
            h,
            row_band=row_band,
        )
        .to_pandas()
        .sort_values("pixel_id")
    )
    want = _brute_fill(dem, present)
    r, c = np.nonzero(present)
    want_vals = want[r, c]
    assert got["pixel_id"].to_numpy().tolist() == (
        (r * w + c).astype(np.int64).tolist()
    )
    assert (got["fill"].to_numpy() == want_vals).all()


def test_crater_fills_to_pour_point(ray_session):
    import ray.data

    h = w = 32
    dem = np.full((h, w), 20, dtype=np.int64)
    # crater on a 20-high plain: rim 55, basin 10, one 30-high pour
    # notch -> min-max pour level through the notch is max(20,30)=30
    dem[10:20, 10:20] = 10
    dem[9:21, 9] = 55
    dem[9:21, 20] = 55
    dem[9, 9:21] = 55
    dem[20, 9:21] = 55
    dem[9, 14] = 30  # the notch
    present = np.ones((h, w), dtype=bool)
    got = (
        df.dem_fill(
            ray.data.from_arrow(_raster_table(dem, present)).repartition(4),
            w,
            h,
            row_band=8,
        )
        .to_pandas()
        .set_index("pixel_id")["fill"]
    )
    # basin fills to the notch level (30); rim unchanged
    for r in range(10, 20):
        for c in range(10, 20):
            assert got[r * w + c] == 30
    assert got[9 * w + 9] == 55
    assert got[0] == 20
