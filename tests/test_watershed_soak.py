"""Size soak for the banded watershed and halo-tiled quickshift:
a 240x240 raster (36x the contract fixture) must agree across band /
tile sizes — the partition-independence claim at a size where many
band boundaries and cross-tile trees exist."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.quickshift import quickshift_parents
from rsgislib_ray.stages.watershed import watershed_segmentation

N = 240


def _raster():
    pid = np.arange(N * N, dtype=np.int64)
    r, c = np.divmod(pid, N)
    dem = (r * 31 + c * 17) % 47 + (
        (r - 120) * (r - 120) + (c - 120) * (c - 120)
    ) // 600
    marker = np.where((r * 7 + c * 13) % 997 == 0, pid + 1, 0)
    return pa.table(
        {
            "pixel_id": pid, "row": r, "col": c,
            "dem": dem, "marker": marker, "value": dem,
        }
    )


def test_watershed_band_size_independence_at_scale(ray_session):
    t = _raster()
    a = watershed_segmentation(
        ray.data.from_arrow(t).repartition(8), N, N, row_band=16
    ).sort("pixel_id").take_all()
    b = watershed_segmentation(
        ray.data.from_arrow(t).repartition(3), N, N, row_band=70
    ).sort("pixel_id").take_all()
    assert a == b
    labels = {r["label"] for r in a}
    assert len(labels) > 10          # many basins
    assert all(r["crest"] is not None for r in a)


def test_quickshift_tile_size_independence_at_scale(ray_session):
    t = _raster()
    a = quickshift_parents(
        ray.data.from_arrow(t).repartition(8), tile_size=24
    ).sort("pixel_id").take_all()
    b = quickshift_parents(
        ray.data.from_arrow(t).repartition(5), tile_size=96
    ).sort("pixel_id").take_all()
    assert a == b
