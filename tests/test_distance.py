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
