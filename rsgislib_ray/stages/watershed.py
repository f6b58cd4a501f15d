"""Marker-based watershed segmentation as two distributive fixpoints.

Reference surface: segmentation/skimgseg.py:270
``perform_watershed_segmentation`` (wraps
``skimage.segmentation.watershed``, compactness=0,
watershed_line=False; skimage absent in this sandbox). Pinned
semantics — watershed by immersion with a DETERMINISTIC tie rule:

  1. flooding level   V(p) = min over markers m of minimax(m -> p),
     where minimax is the minimum over 4-connected paths of the MAX
     elevation along the path (endpoints included);
  2. label(p) = the SMALLEST marker label among markers that flood p
     at level V(p).

skimage breaks flooding ties by priority-queue insertion age, which
is unreproducible distributedly — smallest-label-wins is the pinned
deviation (identical away from equal-flood boundaries).

Both phases are genuinely distributive semiring fixpoints, so sweep
order and partitioning cannot change the answer (a packed
lexicographic relaxation is NOT — max(s//K, e)*K + s%K is not
monotone in the packed value, so Jacobi/Gauss-Seidel would diverge
from each other; hence two phases):

  phase 1   V(p) = min(V(p), max(V(q), elev(p)))      (min, max)
            seeded V = elev at markers, +INF elsewhere
            (marker pixels keep V = own elevation: every path into p
            includes elev(p), so V(p) >= elev(p) always);
  phase 2   an edge q -> p is OPTIMAL iff
            max(V(q), elev(p)) == V(p)  (appending p to q's optimal
            path achieves p's level — chains of optimal edges from
            markers are exactly the optimal-marker set), and
            lbl(p) = min(lbl(p), lbl(q)) over optimal edges   (min).

Physical plan per phase = stages/demfill.py's: row bands as dense
int64 grids in the object store, vectorized directional sweeps to
band-local fixed points, boundary-row delta exchange, outer loop
until no boundary improves. Integer elevations keep every value
exact; the SQL oracle replays both fixpoints as iteration-indexed
recursive CTEs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_INF = np.int64(1) << 62


def _minimax_relax_grid(elev: np.ndarray, v: np.ndarray) -> None:
    h, w = elev.shape
    while True:
        before = v.copy()
        for r in range(1, h):
            np.minimum(v[r], np.maximum(v[r - 1], elev[r]), out=v[r])
        for r in range(h - 2, -1, -1):
            np.minimum(v[r], np.maximum(v[r + 1], elev[r]), out=v[r])
        for c in range(1, w):
            np.minimum(
                v[:, c], np.maximum(v[:, c - 1], elev[:, c]),
                out=v[:, c],
            )
        for c in range(w - 2, -1, -1):
            np.minimum(
                v[:, c], np.maximum(v[:, c + 1], elev[:, c]),
                out=v[:, c],
            )
        if np.array_equal(before, v):
            return


def _label_relax_grid(
    elev: np.ndarray, v: np.ndarray, lbl: np.ndarray
) -> None:
    """min-label sweeps over the fixed optimal-edge subgraph."""
    h, w = elev.shape
    while True:
        before = lbl.copy()
        for r in range(1, h):
            ok = np.maximum(v[r - 1], elev[r]) == v[r]
            lbl[r] = np.where(
                ok, np.minimum(lbl[r], lbl[r - 1]), lbl[r]
            )
        for r in range(h - 2, -1, -1):
            ok = np.maximum(v[r + 1], elev[r]) == v[r]
            lbl[r] = np.where(
                ok, np.minimum(lbl[r], lbl[r + 1]), lbl[r]
            )
        for c in range(1, w):
            ok = np.maximum(v[:, c - 1], elev[:, c]) == v[:, c]
            lbl[:, c] = np.where(
                ok, np.minimum(lbl[:, c], lbl[:, c - 1]), lbl[:, c]
            )
        for c in range(w - 2, -1, -1):
            ok = np.maximum(v[:, c + 1], elev[:, c]) == v[:, c]
            lbl[:, c] = np.where(
                ok, np.minimum(lbl[:, c], lbl[:, c + 1]), lbl[:, c]
            )
        if np.array_equal(before, lbl):
            return


@ray.remote
def _ws_phase_band(
    phase: int,
    elev: np.ndarray,
    v: np.ndarray,
    state: np.ndarray,
    top_in,
    bot_in,
):
    """One band pass of either phase. ``state`` is V (phase 1, v
    ignored) or labels (phase 2, v = the finished V grid). Boundary
    inputs are (value_row,) for phase 1 and (v_row, lbl_row) for
    phase 2."""
    state = state.copy()
    if phase == 1:
        if top_in is not None:
            np.minimum(
                state[0], np.maximum(top_in[0], elev[0]),
                out=state[0],
            )
        if bot_in is not None:
            np.minimum(
                state[-1], np.maximum(bot_in[0], elev[-1]),
                out=state[-1],
            )
        _minimax_relax_grid(elev, state)
        key = state
    else:
        if top_in is not None:
            ok = np.maximum(top_in[0], elev[0]) == v[0]
            state[0] = np.where(
                ok, np.minimum(state[0], top_in[1]), state[0]
            )
        if bot_in is not None:
            ok = np.maximum(bot_in[0], elev[-1]) == v[-1]
            state[-1] = np.where(
                ok, np.minimum(state[-1], bot_in[1]), state[-1]
            )
        _label_relax_grid(elev, v, state)
        key = state
    return ray.put(state), key[0].copy(), key[-1].copy()


@ray.remote
def _ws_table(
    v: np.ndarray,
    lbl: np.ndarray,
    present: np.ndarray,
    r0: int,
    width: int,
) -> pa.Table:
    h = v.shape[0]
    pid = (
        (np.arange(h) + r0)[:, None] * width + np.arange(width)
    ).ravel()
    keep = present.ravel()
    vv = v.ravel()[keep]
    ll = lbl.ravel()[keep]
    reached = ll < _INF
    return pa.table(
        {
            "pixel_id": pid[keep].astype(np.int64),
            "label": np.where(reached, ll, 0).astype(np.int64),
            "crest": pa.array(
                np.where(reached, vv, 0),
                mask=~reached,
                type=pa.int64(),
            ),
        }
    )


def watershed_segmentation(
    raster: ray.data.Dataset,
    width: int,
    height: int,
    elev_col: str = "dem",
    marker_col: str = "marker",
    row_band: int = 16,
    max_iters: int = 10_000,
) -> ray.data.Dataset:
    """Watershed labels over a (pixel_id, row, col, elev, marker)
    raster (marker > 0 = seed with that label; absent rows = nodata).
    Returns (pixel_id, label, crest): crest = the flooding level V
    that claimed the pixel; label 0 / NULL crest where no marker
    reaches."""
    from rsgislib_ray.stages.demfill import (
        _dense_dem,
        _dense_present,
    )

    def band_of(batch: pa.Table) -> pa.Table:
        r = batch["row"].to_numpy().astype(np.int64)
        return batch.append_column("band", pa.array(r // row_band))

    elev_refs: dict = {}
    mark_refs: dict = {}
    pres_refs: dict = {}
    shapes: dict = {}
    r0s: dict = {}
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
                    "elev_blob": [
                        np.ascontiguousarray(
                            _dense_dem(d, width, elev_col)
                        ).tobytes()
                    ],
                    "mark_blob": [
                        np.ascontiguousarray(
                            _dense_dem(d, width, marker_col)
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
    for batch in grouped.iter_batches(
        batch_size=1, batch_format="pyarrow"
    ):
        b = int(batch["band"][0].as_py())
        rows = int(batch["rows"][0].as_py())
        r0 = int(batch["r0"][0].as_py())
        elev = np.frombuffer(
            batch["elev_blob"][0].as_py(), dtype=np.int64
        ).reshape(rows, width)
        mark = np.frombuffer(
            batch["mark_blob"][0].as_py(), dtype=np.int64
        ).reshape(rows, width)
        pres = np.frombuffer(
            batch["pres_blob"][0].as_py(), dtype=bool
        ).reshape(rows, width)
        # absent pixels block propagation through both phases
        elev = np.where(pres, elev, _INF)
        mark = np.where(pres, mark, 0)
        elev_refs[b] = ray.put(elev)
        mark_refs[b] = ray.put(mark)
        pres_refs[b] = ray.put(pres)
        shapes[b] = (rows, width)
        r0s[b] = r0

    bands = sorted(elev_refs)
    n_b = len(bands)
    pos = {b: i for i, b in enumerate(bands)}
    adj_prev = {
        b: pos[b] > 0
        and r0s[bands[pos[b] - 1]] + shapes[bands[pos[b] - 1]][0]
        == r0s[b]
        for b in bands
    }

    def run_phase(phase: int, init: dict, v_refs: dict | None):
        """Generic banded fixpoint; boundary messages carry the
        phase's key row (+ the V row in phase 2)."""
        state_ref = dict(init)
        tops = {b: None for b in bands}
        bots = {b: None for b in bands}
        v_tops: dict = {}
        v_bots: dict = {}
        if phase == 2:
            # boundary rows only — the grids stay in the object store
            row_refs = {b: _edge_rows.remote(v_refs[b]) for b in bands}
            for b, fr in row_refs.items():
                v_tops[b], v_bots[b] = ray.get(fr)
        dirty = set(bands)
        iters = 0
        while dirty and iters < max_iters:
            iters += 1
            futs = {}
            for b in sorted(dirty):
                i = pos[b]
                top_in = bot_in = None
                if adj_prev[b]:
                    nb = bands[i - 1]
                    if bots[nb] is not None:
                        top_in = (
                            (bots[nb],) if phase == 1
                            else (v_bots[nb], bots[nb])
                        )
                if i < n_b - 1 and adj_prev[bands[i + 1]]:
                    nb = bands[i + 1]
                    if tops[nb] is not None:
                        bot_in = (
                            (tops[nb],) if phase == 1
                            else (v_tops[nb], tops[nb])
                        )
                futs[b] = _ws_phase_band.remote(
                    phase,
                    elev_refs[b],
                    v_refs[b] if phase == 2 else elev_refs[b],
                    state_ref[b],
                    top_in,
                    bot_in,
                )
            dirty = set()
            for b, f in futs.items():
                nd_ref, top, bot = ray.get(f)
                i = pos[b]
                if tops[b] is None or not np.array_equal(
                    top, tops[b]
                ):
                    tops[b] = top
                    if adj_prev[b]:
                        dirty.add(bands[i - 1])
                if bots[b] is None or not np.array_equal(
                    bot, bots[b]
                ):
                    bots[b] = bot
                    if i < n_b - 1 and adj_prev[bands[i + 1]]:
                        dirty.add(bands[i + 1])
                state_ref[b] = nd_ref
        return state_ref

    v_init = {
        b: _seed.remote(elev_refs[b], mark_refs[b], True)
        for b in bands
    }
    v_refs = run_phase(1, v_init, None)
    l_init = {
        b: _seed.remote(elev_refs[b], mark_refs[b], False)
        for b in bands
    }
    l_refs = run_phase(2, l_init, v_refs)

    tables = ray.get(
        [
            _ws_table.remote(
                v_refs[b], l_refs[b], pres_refs[b], r0s[b], width
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
                "label": pa.array([], pa.int64()),
                "crest": pa.array([], pa.int64()),
            }
        )
    )
    return ray.data.from_arrow(out)


@ray.remote
def _seed(
    elev: np.ndarray, markers: np.ndarray, values: bool
) -> np.ndarray:
    if values:
        return np.where(markers > 0, elev, _INF).astype(np.int64)
    return np.where(markers > 0, markers, _INF).astype(np.int64)


@ray.remote
def _edge_rows(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return arr[0].copy(), arr[-1].copy()
