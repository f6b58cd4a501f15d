"""Soille & Gratin (1994) hierarchical-queue DEM depression filling,
re-expressed as a distributed min-max fixpoint.

Reimplements the reference's hydrological DEM fill
(/root/reference/src/calibration/RSGISHydroDEMFillSoilleGratin94.{h,cpp}
— ``performSoilleGratin94Fill``): the filled surface is the
morphological reconstruction by erosion of the DEM from its border,

    F(p) = max(dem(p), min over 4-neighbours q of F(q)),

seeded with F = dem on BORDER pixels (valid pixels at the raster edge
or adjacent to a nodata/absent pixel) and +INF elsewhere. The
reference computes this fixpoint with a driver-resident hierarchical
queue (one bucket list per elevation level, strictly sequential);
ours runs the same fixpoint as banded block-parallel relaxation —
the :mod:`rsgislib_ray.stages.costpath` physical plan with the
(min, max) semiring in place of (min, +): row bands as dense int64
grids in the object store, vectorized directional sweeps to a
band-local fixed point, boundary-row delta exchange, convergence when
no boundary improves. Integer DEMs make every F exact int64, so the
result is partitioning-independent and bit-comparable to the
iteration-indexed recursive-CTE oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_INF = np.int64(2**62)


def _fill_relax_grid(dem: np.ndarray, fill: np.ndarray) -> bool:
    """In-place 4-direction (min, max) sweeps to a band-local fixed
    point; absent pixels carry dem = +INF so they never seed or
    improve anything."""
    changed_any = False
    h, w = dem.shape
    while True:
        before = fill.copy()
        for r in range(1, h):
            np.minimum(
                fill[r], np.maximum(dem[r], fill[r - 1]), out=fill[r]
            )
        for r in range(h - 2, -1, -1):
            np.minimum(
                fill[r], np.maximum(dem[r], fill[r + 1]), out=fill[r]
            )
        for c in range(1, w):
            np.minimum(
                fill[:, c],
                np.maximum(dem[:, c], fill[:, c - 1]),
                out=fill[:, c],
            )
        for c in range(w - 2, -1, -1):
            np.minimum(
                fill[:, c],
                np.maximum(dem[:, c], fill[:, c + 1]),
                out=fill[:, c],
            )
        if np.array_equal(before, fill):
            break
        changed_any = True
    return changed_any


@ray.remote
def _fill_init_band(
    dem: np.ndarray,
    present: np.ndarray,
    top_present: np.ndarray | None,
    bot_present: np.ndarray | None,
    is_global_top: bool,
    is_global_bot: bool,
):
    """Seed the band: border pixels (raster edge, or any absent
    4-neighbour — including across the band boundary via the
    neighbour band's presence row) start at their own elevation."""
    h, w = dem.shape
    border = np.zeros((h, w), dtype=bool)
    border[:, 0] = True
    border[:, -1] = True
    if is_global_top:
        border[0, :] = True
    elif top_present is not None:
        border[0, :] |= ~top_present
    else:
        border[0, :] = True  # gap of absent rows above: edge
    if is_global_bot:
        border[-1, :] = True
    elif bot_present is not None:
        border[-1, :] |= ~bot_present
    else:
        border[-1, :] = True
    # in-band absent neighbours
    border[1:, :] |= ~present[:-1, :]
    border[:-1, :] |= ~present[1:, :]
    border[:, 1:] |= ~present[:, :-1]
    border[:, :-1] |= ~present[:, 1:]
    fill = np.where(border & present, dem, _INF)
    fill[~present] = _INF
    return fill


@ray.remote
def _fill_relax_band(
    dem: np.ndarray,
    fill: np.ndarray,
    top_in: np.ndarray | None,
    bot_in: np.ndarray | None,
):
    fill = fill.copy()
    if top_in is not None:
        np.minimum(
            fill[0], np.maximum(dem[0], top_in), out=fill[0]
        )
    if bot_in is not None:
        np.minimum(
            fill[-1], np.maximum(dem[-1], bot_in), out=fill[-1]
        )
    changed = _fill_relax_grid(dem, fill)
    return ray.put(fill), fill[0].copy(), fill[-1].copy(), changed


@ray.remote
def _fill_table(
    fill: np.ndarray, present: np.ndarray, r0: int, width: int
) -> pa.Table:
    h = fill.shape[0]
    pid = (
        (np.arange(h) + r0)[:, None] * width + np.arange(width)
    ).ravel()
    keep = present.ravel()
    return pa.table(
        {
            "pixel_id": pid[keep].astype(np.int64),
            "fill": fill.ravel()[keep],
        }
    )


def dem_fill(
    raster: ray.data.Dataset,
    width: int,
    height: int,
    dem_col: str = "dem",
    row_band: int = 16,
    max_iters: int = 10_000,
) -> ray.data.Dataset:
    """Depression-filled DEM over a (pixel_id, row, col, dem) raster
    (absent rows = nodata). Returns (pixel_id, fill) for present
    pixels. See module docstring for the semantics and physical
    plan."""

    def band_of(batch: pa.Table) -> pa.Table:
        r = batch["row"].to_numpy().astype(np.int64)
        return batch.append_column("band", pa.array(r // row_band))

    dem_refs: dict = {}
    pres_refs: dict = {}
    shapes: dict = {}
    r0s: dict = {}
    # driver transiently holds one band's dense grid during assembly
    grouped = (
        raster.map_batches(band_of, batch_format="pyarrow")
        .groupby("band")
        .map_groups(
            lambda d: pa.table(
                {
                    "band": [int(d["band"].iloc[0])],
                    "r0": [int(d["row"].min())],
                    "rows": [
                        int(d["row"].max() - d["row"].min() + 1)
                    ],
                    "dem_blob": [
                        np.ascontiguousarray(
                            _dense_dem(d, width, dem_col)
                        ).tobytes()
                    ],
                    "pres_blob": [
                        np.ascontiguousarray(
                            _dense_present(d, width)
                        ).tobytes()
                    ],
                }
            ),
            batch_format="pandas",
        )
    )
    pres_rows: dict = {}
    for batch in grouped.iter_batches(batch_size=1, batch_format="pyarrow"):
        b = int(batch["band"][0].as_py())
        rows = int(batch["rows"][0].as_py())
        r0 = int(batch["r0"][0].as_py())
        dem = np.frombuffer(
            batch["dem_blob"][0].as_py(), dtype=np.int64
        ).reshape(rows, width)
        pres = np.frombuffer(
            batch["pres_blob"][0].as_py(), dtype=bool
        ).reshape(rows, width)
        dem_refs[b] = ray.put(dem)
        pres_refs[b] = ray.put(pres)
        shapes[b] = (rows, width)
        r0s[b] = r0
        pres_rows[b] = (pres[0].copy(), pres[-1].copy())

    bands = sorted(dem_refs)
    n_b = len(bands)
    pos = {b: i for i, b in enumerate(bands)}
    adj_prev = {
        b: pos[b] > 0
        and r0s[bands[pos[b] - 1]] + shapes[bands[pos[b] - 1]][0]
        == r0s[b]
        for b in bands
    }
    fill_ref: dict = {}
    tops: dict = {}
    bots: dict = {}
    for b in bands:
        i = pos[b]
        top_p = (
            pres_rows[bands[i - 1]][1] if adj_prev[b] else None
        )
        bot_p = (
            pres_rows[bands[i + 1]][0]
            if i < n_b - 1 and adj_prev[bands[i + 1]]
            else None
        )
        fill_ref[b] = _fill_init_band.remote(
            dem_refs[b],
            pres_refs[b],
            top_p,
            bot_p,
            r0s[b] == 0,
            r0s[b] + shapes[b][0] == height,
        )
        tops[b] = np.full(width, _INF, dtype=np.int64)
        bots[b] = np.full(width, _INF, dtype=np.int64)
    dirty = set(bands)
    iters = 0
    while dirty and iters < max_iters:
        iters += 1
        futs = {
            b: _fill_relax_band.remote(
                dem_refs[b],
                fill_ref[b],
                bots[bands[pos[b] - 1]] if adj_prev[b] else None,
                tops[bands[pos[b] + 1]]
                if pos[b] < n_b - 1 and adj_prev[bands[pos[b] + 1]]
                else None,
            )
            for b in sorted(dirty)
        }
        dirty = set()
        for b, f in futs.items():
            nd_ref, top, bot, _changed = ray.get(f)
            i = pos[b]
            if not np.array_equal(top, tops[b]):
                tops[b] = top
                if adj_prev[b]:
                    dirty.add(bands[i - 1])
            if not np.array_equal(bot, bots[b]):
                bots[b] = bot
                if i < n_b - 1 and adj_prev[bands[i + 1]]:
                    dirty.add(bands[i + 1])
            fill_ref[b] = nd_ref
    tables = ray.get(
        [
            _fill_table.remote(
                fill_ref[b], pres_refs[b], r0s[b], width
            )
            for b in bands
        ]
    )
    out = (
        pa.concat_tables(tables)
        if tables
        else pa.table(
            {
                "pixel_id": pa.array([], pa.int64()),
                "fill": pa.array([], pa.int64()),
            }
        )
    )
    return ray.data.from_arrow(out)


def _dense_dem(d, width: int, dem_col: str) -> np.ndarray:
    r = d["row"].to_numpy().astype(np.int64)
    c = d["col"].to_numpy().astype(np.int64)
    v = d[dem_col].to_numpy().astype(np.int64)
    r0 = r.min()
    g = np.full((int(r.max() - r0 + 1), width), _INF, dtype=np.int64)
    g[r - r0, c] = v
    return g


def _dense_present(d, width: int) -> np.ndarray:
    r = d["row"].to_numpy().astype(np.int64)
    c = d["col"].to_numpy().astype(np.int64)
    r0 = r.min()
    g = np.zeros((int(r.max() - r0 + 1), width), dtype=bool)
    g[r - r0, c] = True
    return g
