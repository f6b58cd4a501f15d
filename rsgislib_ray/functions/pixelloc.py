"""Per-pixel coordinate grids.

Mirrors reference python/rsgislib/imageutils/__init__.py:
``calc_pixel_locations`` (:2915, a RIOS applier whose per-block
kernel is ``info.getBlockCoordArrays()`` — the world coordinates of
every pixel CENTRE, i.e. x = tlx + res_x*(col+0.5),
y = tly - res_y*(row+0.5) for a north-up geotransform) and
``calc_wgs84_pixel_locations`` (:2953 — the approximate EPSG:4326
grid built with numpy.arange over the reprojected bbox).

Parity contract for the wgs84 grid (pinned by the ``pixel_locations``
query + oracle, which mirrors numpy's arange fill scheme exactly:
a[0]=start, a[1]=start+step, a[i>=2]=start+i*((start+step)-start),
length=ceil((stop-start)/step)):

- cell res = (bbox width)/x_size computed in double; when the first
  arange comes out ONE TOO LONG the reference re-runs it with stop
  shortened by half a cell (the ``len > size`` branch — reachable,
  ~1/400k of random bboxes); the ``len < size`` lengthening branch is
  mathematically unreachable for exact inputs (ceil(w/(w/n)) >= n
  always) and is kept as dead-branch parity only.
- the y axis arange is REVERSED (north-up rows).
- the output bands are stacked [x_grid, y_grid] even though the
  reference names them lat_grid/lon_grid the other way round — the
  band the reference calls "lat" holds LONGITUDES (x). We keep the
  band order, not the misnomer.
- the output image is TYPE_32FLOAT, so values are float32-rounded.
"""

from __future__ import annotations

import numpy as np


def pixel_center_locations(
    x_size: int,
    y_size: int,
    tlx: float,
    tly: float,
    res_x: float,
    res_y: float,
):
    """calc_pixel_locations:2915 — (x, y) pixel-centre grids, float64.

    Returns two (y_size, x_size) arrays: eastings and northings of
    every pixel centre for a north-up geotransform.
    """
    cols = np.arange(x_size, dtype=np.float64)
    rows = np.arange(y_size, dtype=np.float64)
    xs = tlx + res_x * (cols + 0.5)
    ys = tly - res_y * (rows + 0.5)
    return (
        np.repeat(xs[np.newaxis, :], y_size, axis=0),
        np.repeat(ys[:, np.newaxis], x_size, axis=1),
    )


def wgs84_pixel_locations(x_size: int, y_size: int, bbox_4326):
    """calc_wgs84_pixel_locations:2953 — the literal numpy chain.

    ``bbox_4326`` is (xMin, xMax, yMin, yMax) in EPSG:4326. Returns
    (data_arr, branch_x, branch_y): data_arr is the float32
    (2, y_size, x_size) stack with band 0 = x/longitude and band 1 =
    y/latitude (the reference's swapped lat/lon naming kept only in
    its variable names); branch_* record which arange length fix
    fired (0 none, 1 lengthen, 2 shorten).
    """
    width = bbox_4326[1] - bbox_4326[0]
    height = bbox_4326[3] - bbox_4326[2]
    cell_res_x = width / x_size
    cell_res_y = height / y_size

    branch_x = 0
    x_row_cells = np.arange(bbox_4326[0], bbox_4326[1], cell_res_x)
    if len(x_row_cells) < x_size:
        branch_x = 1
        x_row_cells = np.arange(
            bbox_4326[0], bbox_4326[1] + cell_res_x / 2, cell_res_x
        )
    elif len(x_row_cells) > x_size:
        branch_x = 2
        x_row_cells = np.arange(
            bbox_4326[0], bbox_4326[1] - cell_res_x / 2, cell_res_x
        )
    x_row_cells = np.expand_dims(x_row_cells, axis=0)

    branch_y = 0
    y_row_cells = np.arange(bbox_4326[2], bbox_4326[3], cell_res_y)[::-1]
    if len(y_row_cells) < y_size:
        branch_y = 1
        y_row_cells = np.arange(
            bbox_4326[2], bbox_4326[3] + cell_res_y / 2, cell_res_y
        )[::-1]
    elif len(y_row_cells) > y_size:
        branch_y = 2
        y_row_cells = np.arange(
            bbox_4326[2], bbox_4326[3] - cell_res_y / 2, cell_res_y
        )[::-1]
    y_row_cells = np.expand_dims(y_row_cells, axis=0)

    # the reference's own (swapped) names: lat_grid holds x values
    lat_grid = np.repeat(x_row_cells, y_size, axis=0)
    lon_grid = np.repeat(y_row_cells, x_size, axis=0).T
    data_arr = np.stack([lat_grid, lon_grid])
    # TYPE_32FLOAT output image
    return data_arr.astype(np.float32), branch_x, branch_y
