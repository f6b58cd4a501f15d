"""Exact EDT vs brute-force min over target pixels."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.distance import distance_transform


def _raster(n=60):
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    value = ((row // 4 + col // 4) % 5).astype(np.int64)
    value[((row * 31 + col * 17) % 37) == 0] = 7
    return pa.table(
        {"pixel_id": pid, "row": row, "col": col, "value": value}
    ), row, col, value


def _brute(row, col, value, targets):
    tm = np.isin(value, targets)
    tr, tc = row[tm], col[tm]
    if len(tr) == 0:
        return np.full(len(row), -1, dtype=np.int64)
    return (
        (row[:, None] - tr[None, :]) ** 2 + (col[:, None] - tc[None, :]) ** 2
    ).min(axis=1)


def test_edt_matches_brute(ray_session):
    t, row, col, value = _raster()
    ds = ray.data.from_arrow(t).repartition(5)
    out = (
        distance_transform(ds, [7], row_band=16)
        .to_pandas()
        .sort_values("pixel_id")
    )
    assert np.array_equal(out["dist2"].to_numpy(), _brute(row, col, value, [7]))


def test_edt_multi_value_and_cap(ray_session):
    t, row, col, value = _raster()
    ds = ray.data.from_arrow(t).repartition(3)
    want = _brute(row, col, value, [7, 2])
    out = (
        distance_transform(ds, [7, 2], row_band=16, max_dist2=9)
        .to_pandas()
        .sort_values("pixel_id")
    )
    assert np.array_equal(
        out["dist2"].to_numpy(), np.where(want > 9, -1, want)
    )


def test_edt_no_targets(ray_session):
    t, row, col, value = _raster(20)
    ds = ray.data.from_arrow(t)
    out = distance_transform(ds, [99], row_band=8).to_pandas()
    assert (out["dist2"] == -1).all()


def test_edt_partition_independent(ray_session):
    t, row, col, value = _raster(40)
    outs = []
    for parts, band in ((2, 8), (9, 32)):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (
            distance_transform(ds, [7], row_band=band)
            .to_pandas()
            .sort_values("pixel_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])


def test_clump_min_distances_bruteforce(ray_session):
    import pyarrow as pa

    from rsgislib_ray.stages.distance import clump_min_distances

    rng = np.random.default_rng(13)
    n = 64
    pts = rng.choice(n * n, size=220, replace=False)
    r, c = np.divmod(pts.astype(np.int64), n)
    clump = (r // 16) * 4 + (c // 16) + 1  # 16 blocks as label regions
    t = pa.table({"row": r, "col": c, "clump": clump})
    maxd = 9
    for parts in (2, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (
            clump_min_distances(ds, n, maxd)
            .to_pandas()
            .set_index("clump")
            .sort_index()
        )
        for k in np.unique(clump):
            m = clump == k
            d2 = (
                (r[m][:, None] - r[~m][None, :]) ** 2
                + (c[m][:, None] - c[~m][None, :]) ** 2
            )
            d2 = d2[d2 <= maxd * maxd]
            exp = int(d2.min()) if d2.size else -1
            assert int(out.loc[k, "min_d2"]) == exp
            if exp >= 0:
                assert out.loc[k, "dist"] == np.sqrt(float(exp))
            else:
                assert out.loc[k, "dist"] == -1.0


def test_clump_min_distances_boundary_inclusive(ray_session):
    import pyarrow as pa

    from rsgislib_ray.stages.distance import clump_min_distances

    # two pixels exactly max_dist apart (and crossing a cell border)
    t = pa.table(
        {"row": [0, 0, 40], "col": [0, 7, 40], "clump": [1, 2, 3]}
    )
    out = (
        clump_min_distances(
            ray.data.from_arrow(t).repartition(2), 64, 7
        )
        .to_pandas()
        .set_index("clump")
        .sort_index()
    )
    assert int(out.loc[1, "min_d2"]) == 49
    assert int(out.loc[2, "min_d2"]) == 49
    assert int(out.loc[3, "min_d2"]) == -1
