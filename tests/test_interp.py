"""grid_scattered_points vs a brute-force numpy reference."""

import numpy as np
import pyarrow as pa
import pytest


def _targets(n=60):
    k = np.arange(1, n + 1, dtype=np.int64)
    return pa.table(
        {
            "target_id": k,
            "x": ((k * 4967 + 17) % 10000) / 100.0 + 0.005,
            "y": ((k * 6823 + 29) % 10000) / 100.0 + 0.005,
            "val": (k * 73) % 1000,
        }
    )


def _brute(grid_n, tbl, radius, int_scale=200, idw_scale=10**8):
    tx = np.rint(tbl["x"].to_numpy() * int_scale).astype(np.int64)
    ty = np.rint(tbl["y"].to_numpy() * int_scale).astype(np.int64)
    tid = tbl["target_id"].to_numpy().astype(np.int64)
    tv = tbl["val"].to_numpy().astype(np.int64)
    r2 = int(round(radius * int_scale)) ** 2
    cw = 100.0 / grid_n
    rows = []
    for pid in range(grid_n * grid_n):
        r, c = divmod(pid, grid_n)
        ipx = int(round((c + 0.5) * cw * int_scale))
        ipy = int(round((r + 0.5) * cw * int_scale))
        d2 = (ipx - tx) ** 2 + (ipy - ty) ** 2
        hit = d2 <= r2
        if not hit.any():
            rows.append((pid, 0, None, None, 0, None, 0, 0, None, None, None))
            continue
        dv, dd, di = tv[hit], d2[hit], tid[hit]
        num = int(((dv * idw_scale) // dd).sum())
        den = int((idw_scale // dd).sum())
        order = np.lexsort((di, dd))
        b = order[0]
        rows.append(
            (
                pid,
                int(hit.sum()),
                int(dv.min()),
                int(dv.max()),
                int(dv.sum()),
                dv.sum() / hit.sum(),
                num,
                den,
                num / den,
                int(di[b]),
                int(dv[b]),
            )
        )
    return rows


@pytest.mark.parametrize("blocks", [1, 7])
def test_grid_matches_brute(ray_session, blocks):
    from rsgislib_ray.stages.interp import (
        grid_scattered_points,
        make_grid_centers,
    )

    grid_n, radius = 20, 18.0
    tbl = _targets()
    got = (
        grid_scattered_points(
            make_grid_centers(grid_n, num_blocks=blocks), tbl, radius, "val"
        )
        .to_pandas()
        .sort_values("pix_id")
        .reset_index(drop=True)
    )
    want = _brute(grid_n, tbl, radius)
    assert len(got) == grid_n * grid_n
    for i, (pid, n, vmin, vmax, vsum, vavg, num, den, idw, nid, nval) in (
        enumerate(want)
    ):
        g = got.iloc[i]
        assert g["pix_id"] == pid and g["n_pts"] == n
        assert int(g["v_sum"]) == vsum
        assert int(g["idw_num"]) == num and int(g["idw_den"]) == den
        if n == 0:
            assert (
                g[["v_min", "v_max", "v_avg", "idw", "nearest_id"]]
                .isna()
                .all()
            )
        else:
            assert int(g["v_min"]) == vmin and int(g["v_max"]) == vmax
            assert g["v_avg"] == vavg and g["idw"] == idw
            assert int(g["nearest_id"]) == nid
            assert int(g["nearest_val"]) == nval


def test_grid_nearest_tie_lowest_id(ray_session):
    """Two points exactly equidistant from a pixel center -> lowest id."""
    import ray

    from rsgislib_ray.stages.interp import grid_scattered_points

    # pixel center at (50, 50); points symmetric about it
    tbl = pa.table(
        {
            "target_id": np.array([9, 4], dtype=np.int64),
            "x": np.array([40.0, 60.0]),
            "y": np.array([50.0, 50.0]),
            "val": np.array([111, 222], dtype=np.int64),
        }
    )
    px = ray.data.from_arrow(
        pa.table(
            {"pix_id": np.array([0], dtype=np.int64),
             "x": np.array([50.0]), "y": np.array([50.0])}
        )
    )
    got = grid_scattered_points(px, tbl, 15.0, "val").to_pandas()
    assert int(got["nearest_id"].iloc[0]) == 4
    assert int(got["nearest_val"].iloc[0]) == 222


def test_extract_chips_complete(ray_session):
    """Every emitted chip has exactly 25 pixels and consistent splits."""
    from rsgislib_ray.pipelines.queries import queries

    got = (
        queries()["extract_chips"]("/root/testdata/sf0.001")
        .to_pandas()
    )
    sizes = got.groupby("point_id").size()
    assert (sizes == 25).all()
    # one split label per point
    assert (got.groupby("point_id")["split"].nunique() == 1).all()
    # rel coords cover the full 5x5 window
    g0 = got[got["point_id"] == got["point_id"].iloc[0]]
    assert sorted(zip(g0["rel_r"], g0["rel_c"])) == [
        (r, c) for r in range(-2, 3) for c in range(-2, 3)
    ]
