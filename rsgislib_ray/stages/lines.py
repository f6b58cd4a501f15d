"""Polyline (linear-referencing) operators.

Reimplements the vectorgeoms line family:

- ``split_lines_to_reg_pts`` (/root/reference/python/rsgislib/
  vectorgeoms/__init__.py:431-530): points at regular ``pt_step``
  intervals along each line, attributed with line id, point index,
  x/y and distance from the line start. ``get_pt_on_line`` (:141) is
  the same interpolation for a single fraction.
- ``convert_polygon_to_polyline`` (:25) is the trivial vertex
  re-emission (the fixture side below).

Physical plan: one range sort on (line_id, seq) — the same
sorted-run shape as ``stages/events`` — then every line fully inside
a block is processed VECTORIZED across lines (no per-line Python);
only the <=2 lines touching a block edge fall back to a tiny grouped
pass.

Exactness contract (mirrors the repo's micro-nat pattern): segment
lengths are integerized as ``floor(sqrt(d2_scaled) * micro)`` micro-
units (d2_scaled is the exact integer squared length on the
``int_scale`` lattice; sqrt of an integer-valued double is IEEE-exact
and engine-independent). Cumulative lengths are then int64 sums —
order-independent, and safe against DuckDB's pairwise window
aggregation. The interpolated coordinate uses ONE float division
``(d - cum0) / seg_len`` plus one multiply-add per axis, the same
expression the SQL oracle evaluates. Points are emitted for
``k * pt_step < total_length`` (k >= 0): a degenerate (zero-length
or single-vertex) line emits nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.events import sorted_user_apply

MICRO = 1_000_000  # micro-units per coordinate unit


def _points_core(
    line: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    step_micro: int,
    int_scale: int,
) -> dict:
    """Vectorized points-at-intervals over (line, seq)-sorted vertex
    arrays containing any number of complete lines."""
    m = len(line)
    empty = {
        "line_id": np.empty(0, np.int64),
        "pt_id": np.empty(0, np.int64),
        "x": np.empty(0, np.float64),
        "y": np.empty(0, np.float64),
        "dist_micro": np.empty(0, np.int64),
    }
    if m < 2:
        return empty
    seg = line[1:] == line[:-1]
    if not seg.any():
        return empty
    i0 = np.flatnonzero(seg)  # vertex index of each segment start
    ix = np.rint(x * int_scale).astype(np.int64)
    iy = np.rint(y * int_scale).astype(np.int64)
    dxs = ix[i0 + 1] - ix[i0]
    dys = iy[i0 + 1] - iy[i0]
    d2 = dxs * dxs + dys * dys
    ilen = np.floor(
        np.sqrt(d2.astype(np.float64)) * (MICRO / int_scale)
    ).astype(np.int64)
    seg_line = line[i0]
    # global (non-resetting) cumulative axis over the sorted segments
    cs = np.concatenate([[0], np.cumsum(ilen)])
    starts = np.flatnonzero(
        np.concatenate([[True], seg_line[1:] != seg_line[:-1]])
    )
    ends = np.concatenate([starts[1:], [len(seg_line)]])
    totals = cs[ends] - cs[starts]
    npts = np.where(
        totals > 0, (totals + step_micro - 1) // step_micro, 0
    ).astype(np.int64)
    if npts.sum() == 0:
        return empty
    pt_line_idx = np.repeat(np.arange(len(starts)), npts)
    k = np.arange(int(npts.sum())) - np.repeat(
        np.cumsum(npts) - npts, npts
    )
    d = k * step_micro
    g = d + cs[starts][pt_line_idx]  # global distance of each point
    si = np.searchsorted(cs[1:], g, side="right")
    frac = (g - cs[si]).astype(np.float64) / ilen[si].astype(np.float64)
    px = x[i0[si]] + frac * (x[i0[si] + 1] - x[i0[si]])
    py = y[i0[si]] + frac * (y[i0[si] + 1] - y[i0[si]])
    return {
        "line_id": seg_line[starts][pt_line_idx],
        "pt_id": k.astype(np.int64),
        "x": px,
        "y": py,
        "dist_micro": d.astype(np.int64),
    }


def points_along_lines(
    vertices: ray.data.Dataset,
    pt_step: float,
    line_col: str = "line_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    int_scale: int = 200,
) -> ray.data.Dataset:
    """split_lines_to_reg_pts over a (line_id, seq, x, y) vertex
    table: returns (line_id, pt_id, x, y, dist_micro) point features
    every ``pt_step`` units along each polyline."""
    step_micro = int(round(pt_step * MICRO))

    def block_fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                _points_core(
                    np.empty(0, np.int64),
                    np.empty(0, np.float64),
                    np.empty(0, np.float64),
                    step_micro,
                    int_scale,
                )
            )
        return pa.table(
            _points_core(
                batch[line_col].to_numpy().astype(np.int64),
                batch[x_col].to_numpy().astype(np.float64),
                batch[y_col].to_numpy().astype(np.float64),
                step_micro,
                int_scale,
            )
        )

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(seq_col)
        return pd.DataFrame(
            _points_core(
                g[line_col].to_numpy().astype(np.int64),
                g[x_col].to_numpy().astype(np.float64),
                g[y_col].to_numpy().astype(np.float64),
                step_micro,
                int_scale,
            )
        )

    return sorted_user_apply(
        vertices, block_fn, group_fn, user_col=line_col,
        sort_cols=(seq_col,),
    )
